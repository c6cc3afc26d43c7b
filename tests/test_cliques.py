import itertools

import numpy as np
import pytest

from haploconduct_tpu.graph.cliques import (
    enumerate_cliques,
    enumerate_cliques_py,
    degeneracy_order,
    _build_adj,
    max_clique_size,
    write_cliques,
    read_cliques,
)
from haploconduct_tpu.native import load_cliques_ext


def brute_force_maximal_cliques(n, edges):
    adj = [set() for _ in range(n)]
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    cliques = set()
    # all cliques by expansion
    def is_clique(vs):
        return all(b in adj[a] for a, b in itertools.combinations(vs, 2))

    for size in range(1, n + 1):
        for vs in itertools.combinations(range(n), size):
            if is_clique(vs):
                cliques.add(frozenset(vs))
    maximal = {c for c in cliques if not any(c < d for d in cliques)}
    return maximal


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_python_bk_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n = 12
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(25, 2)) if a != b]
    v1 = np.array([e[0] for e in edges])
    v2 = np.array([e[1] for e in edges])
    got = {frozenset(c) for c in enumerate_cliques_py(n, v1, v2)}
    want = brute_force_maximal_cliques(n, edges)
    assert got == want


def test_native_matches_python_exactly():
    ext = load_cliques_ext()
    assert ext is not None, "native clique extension failed to build"
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 40
        m = 150
        v1 = rng.integers(0, n, m)
        v2 = rng.integers(0, n, m)
        py = enumerate_cliques_py(n, v1, v2)
        flat, offsets = ext.enumerate_cliques(n, v1, v2)
        nat = [flat[offsets[i]:offsets[i + 1]].tolist() for i in range(len(offsets) - 1)]
        assert nat == py, f"trial {trial}: order or content mismatch"


def test_triangle_plus_pendant():
    # triangle 0-1-2 with pendant 3 attached to 2; isolated 4
    v1 = np.array([0, 1, 0, 2])
    v2 = np.array([1, 2, 2, 3])
    cliques = {frozenset(c) for c in enumerate_cliques(5, v1, v2)}
    assert cliques == {frozenset({0, 1, 2}), frozenset({2, 3}), frozenset({4})}
    assert max_clique_size(5, v1, v2) == 3


def test_degeneracy_order_is_smallest_last():
    v1 = np.array([0, 0, 0, 1, 1, 2])
    v2 = np.array([1, 2, 3, 2, 3, 3])  # K4 on {0,1,2,3}
    adj = _build_adj(5, v1, v2)
    order = degeneracy_order(5, adj)
    assert list(order)[0] == 4  # isolated vertex has degree 0, removed first


@pytest.mark.parametrize("algorithm", ["tomita", "adjlist", "hybrid"])
@pytest.mark.parametrize("seed", [0, 5])
def test_algorithm_variants_agree(algorithm, seed):
    rng = np.random.default_rng(seed)
    n = 30
    v1 = rng.integers(0, n, 120)
    v2 = rng.integers(0, n, 120)
    want = {frozenset(c) for c in enumerate_cliques(n, v1, v2)}
    got = {frozenset(c) for c in enumerate_cliques(n, v1, v2, algorithm=algorithm)}
    assert got == want


def test_variant_dispatch_errors():
    v = np.zeros(0, np.int64)
    with pytest.raises(ValueError):
        enumerate_cliques(3, v, v, algorithm="nope")


def test_cliques_file_roundtrip(tmp_path):
    cliques = [[3, 1, 2], [0], [5, 4]]
    p = tmp_path / "cliques.txt"
    write_cliques(str(p), cliques)
    assert read_cliques(str(p)) == cliques
    # format matches quick-cliques: space-separated, trailing space
    assert p.read_text().splitlines()[0] == "3 1 2 "
