"""backend="auto" selection (ops/autoback.py): the pure decision rule
with faked probes, and end-to-end routing of verify_overlaps on this
(CPU-only test) host."""

import numpy as np
import pytest

from haploconduct_tpu.ops import autoback
from haploconduct_tpu.ops import verify as V


def test_decide_cpu_platform_is_native():
    backend, info = autoback.decide("cpu", None, 0.0)
    assert backend == "native"


def test_decide_pcie_host_picks_chip():
    # a production PCIe v5e host: ~12GB/s link, ~100us latency — the
    # BASELINE.md arithmetic says the dispatch path serves ~hundreds of
    # millions of verifs/s of link, far beyond any host engine
    probe = {"h2d_Bps": 12e9, "d2h_Bps": 12e9, "lat_s": 1e-4}
    backend, info = autoback.decide("tpu", probe, native_rate=2.0e5)
    assert backend == "jax"
    assert info["projected_device_rate"] > 2 * 2.0e5


def test_decide_tunneled_host_picks_native():
    # this deployment: ~22ms per transfer, single-digit MB/s bursty link
    probe = {"h2d_Bps": 10e6, "d2h_Bps": 40e6, "lat_s": 0.022}
    backend, info = autoback.decide("tpu", probe, native_rate=2.0e5)
    assert backend == "native"


def test_decide_no_native_engine_falls_to_chip():
    backend, _ = autoback.decide("tpu", None, 0.0)
    assert backend == "jax"


def test_resolve_backend_env_override(monkeypatch):
    monkeypatch.setattr(autoback, "_cache", {})
    monkeypatch.setenv("HC_BACKEND", "numpy")
    assert autoback.resolve_backend() == "numpy"


def test_auto_routes_verify_to_native_on_this_host(monkeypatch):
    """Settings(backend='auto') must reach the native engine on a CPU-only
    deployment, with decisions identical to the f64 oracle."""
    from haploconduct_tpu.core.reads import ReadStore
    from haploconduct_tpu.utils.config import Settings
    from haploconduct_tpu.utils.simulate import random_genome, simulate_reads
    from haploconduct_tpu.ops.kmer import find_overlap_candidates
    from haploconduct_tpu.io.sfo import sfo_to_overlaps

    monkeypatch.setattr(autoback, "_cache", {})
    monkeypatch.delenv("HC_BACKEND", raising=False)
    rng = np.random.default_rng(9)
    genome = random_genome(rng, 1500)
    seqs, quals = simulate_reads([genome], coverage=15, read_len=120,
                                 rng=rng, error_rate=0.005)
    store = ReadStore()
    for i, (sq, q) in enumerate(zip(seqs, quals)):
        store.add_single(i, sq, q)
    store.readcount_single = len(seqs)
    sseqs = [store.unit_codes(u) for u in range(store.n_units)]
    sfo = find_overlap_candidates(sseqs, min_overlap_len=60, k=20,
                                  error_rate=0.01)
    ov = sfo_to_overlaps(sfo, len(store), 0)
    packed = store.pack()

    before = dict(V.BACKEND_COUNTS)
    s = Settings(min_overlap_len=60, edge_threshold=0.97, backend="auto")
    vr = V.verify_overlaps(store, packed, ov, s)
    assert (V.BACKEND_COUNTS["native"] > before["native"]
            or V.BACKEND_COUNTS["numpy"] > before["numpy"])  # ext fallback

    vr_np = V.verify_overlaps(store, packed, ov, s.derive(backend="numpy"))
    for f in ("v1", "v2", "pos1", "mismatch_rate"):
        assert np.array_equal(vr.edges[f], vr_np.edges[f]), f
