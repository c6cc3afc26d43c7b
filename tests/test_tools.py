import os

import numpy as np

from haploconduct_tpu.core.reads import ReadStore
from haploconduct_tpu.io.converters import (
    blast_to_overlaps, blast_to_sfo, minimap_to_sfo, overlap_histogram,
    overlaps_to_sfo)
from haploconduct_tpu.io.overlaps import make_overlaps
from haploconduct_tpu.utils.checkpoint import load_state, save_state


def test_blast_to_overlaps():
    # q 0 aligns to s 1: q[51..250] == s[1..200], both forward
    line = "0\t1\t99.5\t200\t1\t0\t51\t250\t1\t200\t250\t240\n"
    ov = blast_to_overlaps([line], min_overlap_len=100)
    assert len(ov) == 1
    assert (ov["id1"][0], ov["id2"][0], ov["pos1"][0]) == (0, 1, 50)
    assert ov["len1"][0] == 200
    # self-overlaps skipped
    assert len(blast_to_overlaps(["0\t0\t99\t200\t1\t0\t1\t200\t1\t200\t250\t250\n"])) == 0


def test_blast_to_sfo_roundtrip_canonicalization():
    line = "5\t2\t99.5\t150\t2\t0\t1\t150\t101\t250\t200\t250\n"
    sfo = blast_to_sfo([line], min_overlap_len=100)
    assert len(sfo) == 1
    # ids swapped to idA < idB (string compare '2' < '5')
    assert (sfo["ida"][0], sfo["idb"][0]) == (2, 5)
    assert sfo["k"][0] == 2


def test_overlaps_to_sfo():
    ov = make_overlaps(id1=np.array([0]), id2=np.array([1]),
                       pos1=np.array([50]), len1=np.array([150]))
    sfo = overlaps_to_sfo(ov, {0: 200, 1: 180})
    assert len(sfo) == 1
    assert sfo["oha"][0] == 50
    assert sfo["ola"][0] == 150


def test_minimap_to_sfo():
    line = "0\t250\t50\t250\t+\t1\t240\t0\t200\t198\t200\t60\tcg:Z:200M\n"
    sfo = minimap_to_sfo([line], min_overlap_len=100, min_pident=98)
    assert len(sfo) == 1
    assert sfo["oha"][0] == 50
    assert sfo["k"][0] == 2  # 200 - 198 mismatches


def test_overlap_histogram():
    ov = make_overlaps(
        id1=np.array([0, 1, 2]), id2=np.array([3, 4, 5]),
        pos1=np.array([1, 2, 3]), len1=np.array([100, 100, 100]),
        ori1=np.array([b"+", b"-", b"+"]), ori2=np.array([b"+", b"+", b"-"]))
    h = overlap_histogram(ov)
    assert h["ss"] == [1, 1, 1, 0]


def test_checkpoint_roundtrip(tmp_path):
    store = ReadStore()
    store.add_single(0, "ACGTACGT", "IIIIIIII")
    store.readcount_single = 1
    store.add_paired(1, "ACGT", "IIII", "TTTT", "JJJJ")
    from haploconduct_tpu.io.subreads import OriginalIndex

    subreads = {0: {0: OriginalIndex(index1=0, len1=8)},
                1: {1: OriginalIndex(index1=0, index2=0, is_paired=True,
                                     len1=4, len2=4)}}
    ov = make_overlaps(id1=np.array([0]), id2=np.array([1]),
                       pos1=np.array([2]), len1=np.array([4]))
    save_state(str(tmp_path), store, subreads, ov)
    store2, sub2, ov2 = load_state(str(tmp_path))
    assert len(store2) == 2
    assert store2.seq_str(0, 0) == "ACGTACGT"
    assert store2.seq_str(1, 2) == "TTTT"
    assert sub2[1][1].is_paired
    assert np.array_equal(ov, ov2)


def test_run_logger(tmp_path):
    from haploconduct_tpu.assemble.stages import StageParams, run_stage
    from haploconduct_tpu.io.overlaps import make_overlaps
    from tests_helpers import chain_store_and_overlaps

    store, ov = chain_store_and_overlaps()
    p = StageParams(stage="b", min_overlap_len=30, edge_threshold=0.9,
                    remove_branches=True, max_tip_len=100,
                    original_readcount=len(store), backend="numpy",
                    output_dir=str(tmp_path))
    run_stage(p, store, ov)
    assert (tmp_path / "pipeline.log").exists()
    assert (tmp_path / "stats.txt").read_text().strip() != ""
    assert (tmp_path / "history.jsonl").exists()
    assert (tmp_path / "graph_trimmed.gfa").exists()


def test_native_kmer_join_byte_equal_to_numpy(monkeypatch):
    """The OpenMP candidate join + diagonal verifier (native/kmerjoin.cpp)
    must emit a byte-equal SFO array to the numpy sort-join on a noisy
    two-haplotype workload (incl. reversals, inclusions, N bases)."""
    import numpy as np

    from haploconduct_tpu.core.reads import encode_seq
    from haploconduct_tpu.native import load_kmerjoin_ext
    from haploconduct_tpu.ops.kmer import find_overlap_candidates
    from haploconduct_tpu.utils.simulate import (mutate_sequence,
                                                 random_genome,
                                                 simulate_reads)

    if load_kmerjoin_ext() is None:
        pytest.skip("native kmerjoin ext unavailable")

    rng = np.random.default_rng(11)
    genome = random_genome(rng, 1200)
    haps = [genome, mutate_sequence(genome, rng, sub_rate=0.02)]
    seqs_s, _ = simulate_reads(haps, coverage=25, read_len=120, rng=rng,
                               error_rate=0.005)
    seqs = [encode_seq(s) for s in seqs_s]
    # sprinkle N's so the N-window and pad paths are exercised
    for i in range(0, len(seqs), 17):
        seqs[i][rng.integers(0, len(seqs[i]))] = 4

    monkeypatch.setenv("HC_KMERJOIN", "numpy")
    ref = find_overlap_candidates(seqs, min_overlap_len=60, k=16,
                                  error_rate=0.01, verify=True)
    monkeypatch.delenv("HC_KMERJOIN")
    got = find_overlap_candidates(seqs, min_overlap_len=60, k=16,
                                  error_rate=0.01, verify=True)
    assert len(ref) > 100
    assert np.array_equal(ref, got)
