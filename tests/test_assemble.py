import math

import numpy as np
import pytest

from haploconduct_tpu.core.reads import ReadStore, encode_seq, decode_seq
from haploconduct_tpu.graph.overlap_graph import OverlapGraph
from haploconduct_tpu.io.overlaps import make_overlaps
from haploconduct_tpu.assemble.iteration import run_iteration, trivial_originals
from haploconduct_tpu.assemble.superreads import SuperreadBuilder
from haploconduct_tpu.utils.config import Settings
from haploconduct_tpu.ops.verify import verify_overlaps, EDGE_DTYPE


TEMPLATE = ("ACGGTTACGATCGATTACGGCATTACGGATCGGATACGATCAGGCATTACGATCAGGCTA"
            "TTACGGATCAGGCATCGATTACGGCATTACCCGATCGATTACGGCATTACGGATCGGATT" * 3)


def reads_from_template(template, n, length, step, qual="I"):
    store = ReadStore()
    for i in range(n):
        start = (i * step) % (len(template) - length)
        store.add_single(i, template[start:start + length], qual * length)
    store.readcount_single = n
    return store


def overlaps_for_chain(store, length, step):
    """Consecutive-read overlaps along the template chain."""
    ids1, ids2, pos = [], [], []
    n = len(store)
    for i in range(n - 1):
        ids1.append(i)
        ids2.append(i + 1)
        pos.append(step)
    ov_len = length - step
    return make_overlaps(
        id1=np.array(ids1), id2=np.array(ids2), pos1=np.array(pos),
        len1=np.full(len(ids1), ov_len),
        perc1=np.full(len(ids1), min(100 * ov_len // length, 100)))


def test_consensus_two_reads():
    # two reads overlapping; the shared column has agreeing bases
    store = reads_from_template(TEMPLATE, 2, 60, 30)
    s = Settings(min_overlap_len=20, edge_threshold=0.9, backend="numpy",
                 remove_trans=0, remove_tips=False)
    g = OverlapGraph(2, store, s)
    ov = overlaps_for_chain(store, 60, 30)
    res = verify_overlaps(store, store.pack(), ov, s)
    assert len(res.edges) == 1
    g.insert_candidates(res.edges)
    from haploconduct_tpu.graph.algos import vertex_labelling_heuristic

    g.sort_edges()
    vertex_labelling_heuristic(g)
    builder = SuperreadBuilder(store, g, s, trivial_originals(store))
    sr = builder.construct_superread([0, 1])
    assert not sr.is_paired
    assert decode_seq(sr.seq1) == TEMPLATE[:90]
    # subread map: read 0 at offset 0, read 1 at offset 30
    assert sr.subread_map[0].index1 == 0
    assert sr.subread_map[1].index1 == 30
    assert sr.originals[0].index1 == 0
    assert sr.originals[1].index1 == 30


def test_consensus_quality_wins():
    # disagreement at one position: high-quality base should win
    seq_a = "ACGTACGTACGTACGTACGT"
    seq_b = "ACGTACGTACTTACGTACGT"  # G->T at position 10
    store = ReadStore()
    store.add_single(0, seq_a, "I" * 20)  # q40
    store.add_single(1, seq_b, "&" * 20)  # q5
    store.readcount_single = 2
    s = Settings(min_qual=0.0, backend="numpy")
    g = OverlapGraph(2, store, s)
    builder = SuperreadBuilder(store, g, s, trivial_originals(store))
    codes, quals, trim = builder.consensus(
        20, [0, 0], [store.unit_codes(0), store.unit_codes(1)],
        [store.unit_quals(0), store.unit_quals(1)], error_correction=False)
    assert decode_seq(codes) == seq_a  # high quality wins position 10
    assert trim == 0


def test_consensus_min_qual_masks_n():
    # equal qualities disagreeing -> correctness prob 0.5 < min_qual -> N
    store = ReadStore()
    store.add_single(0, "AAAA", "IIII")
    store.add_single(1, "AATA", "IIII")
    store.readcount_single = 2
    s = Settings(min_qual=0.9, backend="numpy")
    g = OverlapGraph(2, store, s)
    builder = SuperreadBuilder(store, g, s, trivial_originals(store))
    codes, quals, _ = builder.consensus(
        4, [0, 0], [store.unit_codes(0), store.unit_codes(1)],
        [store.unit_quals(0), store.unit_quals(1)], error_correction=False)
    assert decode_seq(codes) == "AANA"
    assert quals[2] == ord("$") - 33


def test_iteration_merges_chain():
    # 6 overlapping reads -> one merged contig after a merge iteration
    store = reads_from_template(TEMPLATE, 6, 80, 40)
    ov = overlaps_for_chain(store, 80, 40)
    s = Settings(
        min_overlap_len=30, edge_threshold=0.9, cliques=False, fno=1,
        first_it=True, keep_singletons=0, remove_trans=1, remove_tips=False,
        backend="numpy", min_clique_size=2, optimize=False,
        original_readcount=6,
    )
    res = run_iteration(store, ov, s)
    assert not res.terminated
    # merge pairs (0,1),(2,3),(4,5) -> 3 contigs of 120bp
    assert len(res.store) == 3
    lens = sorted(res.store.read_len(i) for i in range(len(res.store)))
    assert lens == [120, 120, 120]
    # FNO1 must induce overlaps between the merged contigs
    assert len(res.overlap_lines) >= 2
    # a second iteration should keep merging
    from haploconduct_tpu.assemble.iteration import overlaps_from_lines

    s2 = s.derive(first_it=False)
    res2 = run_iteration(res.store, overlaps_from_lines(res.overlap_lines), s2, res.subreads)
    assert len(res2.store) < 3
    longest = max(res2.store.read_len(i) for i in range(len(res2.store)))
    assert longest >= 200
    # provenance: the longest contig contains original reads
    top = max(res2.subreads, key=lambda cid: len(res2.subreads[cid]))
    assert len(res2.subreads[top]) >= 4


def test_ec_iteration_with_cliques():
    # deep coverage of one template region -> EC produces consensus reads
    rng = np.random.default_rng(0)
    store = ReadStore()
    n = 12
    for i in range(n):
        start = 5 * (i % 4)
        seq = TEMPLATE[start:start + 70]
        store.add_single(i, seq, "I" * 70)
    store.readcount_single = n
    ids1, ids2, pos1 = [], [], []
    for i in range(n):
        for j in range(i + 1, n):
            si, sj = 5 * (i % 4), 5 * (j % 4)
            ids1.append(i)
            ids2.append(j)
            pos1.append(abs(si - sj) if si <= sj else 0)
    # express as overlaps with id order by position
    rows = []
    for i, j, p in zip(ids1, ids2, pos1):
        si, sj = 5 * (i % 4), 5 * (j % 4)
        if si <= sj:
            rows.append((i, j, sj - si))
        else:
            rows.append((j, i, si - sj))
    ov = make_overlaps(
        id1=np.array([r[0] for r in rows]),
        id2=np.array([r[1] for r in rows]),
        pos1=np.array([r[2] for r in rows]),
        len1=np.array([70 - r[2] for r in rows]),
        perc1=np.array([min(100 * (70 - r[2]) // 70, 100) for r in rows]))
    s = Settings(
        min_overlap_len=40, edge_threshold=0.9, cliques=True,
        error_correction=True, fno=3, first_it=True, keep_singletons=1000,
        remove_trans=2, min_clique_size=3, backend="numpy", optimize=False,
        original_readcount=n,
    )
    res = run_iteration(store, ov, s)
    assert not res.terminated
    assert len(res.store) > 0
    # EC trims consensus to >=3-support regions; all contigs match template
    for i in range(len(res.store)):
        seq = decode_seq(res.store.unit_codes(res.store.unit1[i]))
        assert seq in TEMPLATE


def test_min_ev_table_matches_scipy():
    from scipy.stats import norm

    from haploconduct_tpu.workflows.min_ev_table import _norm_cdf, build_threshold_table

    for x, m, sd in [(0, 100, 20), (-50, 10, 30), (123, 86.6, 146.7)]:
        assert _norm_cdf(x, m, sd) == pytest.approx(norm(m, sd).cdf(x), abs=1e-12)
    table = build_threshold_table(readlen=200, intseg=86.6, stddev=146.7, hcov=14)
    assert table[1] >= 1
    assert max(table) > 200  # PE evidence extends past read length
    # verify the expected-evidence integral against direct scipy at dist=1
    readlen, intseg, stddev, hcov = 200, 86.6, 146.7, 14
    dist = 1
    exp_ev = hcov * max(0, readlen - dist) / readlen
    p_sum = sum(
        norm(intseg, stddev).cdf(dist - readlen + x)
        - norm(intseg, stddev).cdf(dist - 2 * readlen + x + 1)
        for x in range(0, readlen))
    exp_ev = int(math.floor(exp_ev + hcov * p_sum / readlen))
    from haploconduct_tpu.workflows.min_ev_table import _find_min_ev

    assert table[1] == _find_min_ev(exp_ev, 1, 0.01, 1e-3)


def test_freq_est_quick():
    from haploconduct_tpu.io.subreads import OriginalIndex
    from haploconduct_tpu.workflows.freq_est import estimate_frequencies

    lengths = {0: 2000, 1: 1000, 2: 300}
    subreads = {
        0: {i: OriginalIndex(index1=0, len1=100) for i in range(20)},
        1: {i: OriginalIndex(index1=0, len1=100) for i in range(20, 30)},
        2: {i: OriginalIndex(index1=0, len1=100) for i in range(30, 32)},
    }
    res = estimate_frequencies(lengths, subreads, min_len=500)
    assert sorted(res.contig_ids) == [0, 1]
    assert res.total_subread_count == 30
    assert sum(res.frequencies) == pytest.approx(1.0)
    # contig 0 has 2x the reads but 2x the length -> similar frequency
    f = dict(zip(res.contig_ids, res.frequencies))
    assert f[0] == pytest.approx(f[1], rel=0.01)


def test_add_duplicates_waived():
    from haploconduct_tpu.utils.config import Settings

    with pytest.raises(ValueError, match="add_duplicates"):
        Settings(add_duplicates=True)


def test_cycles_txt_reporting(tmp_path):
    from haploconduct_tpu.utils.log import RunLogger

    logger = RunLogger(str(tmp_path))
    logger.cycles({(3, 1), (0, 2)})
    logger.cycles(set())  # no-op append
    logger.cycles({(5, 4)})
    lines = (tmp_path / "cycles.txt").read_text().splitlines()
    assert lines == ["0\t2", "3\t1", "5\t4"]


def test_native_consensus_bit_identical_to_numpy(monkeypatch):
    """The OpenMP consensus kernel (native/consensus.cpp) must reproduce the
    numpy scatter path bit for bit: same codes, quals, and trim on random
    jobs covering N bases, phred 0 (=> -inf log-likelihood), EC trims,
    support failures, and degenerate aborts (SRBuilder.cpp:297-533)."""
    from haploconduct_tpu.assemble.superreads import SuperreadBuilder
    from haploconduct_tpu.native import load_consensus_ext
    from haploconduct_tpu.utils.config import Settings

    if load_consensus_ext() is None:
        pytest.skip("native consensus ext unavailable")

    rng = np.random.default_rng(7)
    jobs = []
    for _ in range(400):
        nm = int(rng.integers(2, 12))
        total = int(rng.integers(30, 220))
        pos = np.sort(rng.integers(0, max(1, total // 2), nm))
        pos[0] = 0
        seqs, quals = [], []
        for p in pos:
            length = int(rng.integers(10, total - p + 5))
            seqs.append(rng.integers(0, 5, length).astype(np.int8))
            quals.append(rng.integers(0, 94, length).astype(np.uint8))
        jobs.append((total, list(pos), seqs, quals, bool(rng.integers(0, 2))))

    builder = SuperreadBuilder.__new__(SuperreadBuilder)
    builder.s = Settings(min_clique_size=2, min_qual=0.99,
                         error_correction=True)
    monkeypatch.setenv("HC_CONSENSUS", "numpy")
    ref = builder.batch_consensus(jobs)
    monkeypatch.delenv("HC_CONSENSUS")
    got = builder.batch_consensus(jobs)
    for i, (r, g) in enumerate(zip(ref, got)):
        assert r[2] == g[2], i
        assert np.array_equal(r[0], g[0]), i
        assert np.array_equal(r[1], g[1]), i


def test_fno_batch_matches_scalar(monkeypatch):
    """The vectorized FNO1 batch path (fno.py:_update_overlaps_batch) must
    emit the exact overlap-line set and dedup decisions of the scalar port
    (FindNextOverlaps.cpp:568-601), including on paired-end mixes that
    exercise the scalar-fallback interleave."""
    rng = np.random.default_rng(7)

    def noisy_store(n_single, n_paired, length=80, step=17):
        store = ReadStore()
        rid = 0
        for i in range(n_single):
            start = (i * step) % (len(TEMPLATE) - length)
            seq = list(TEMPLATE[start:start + length])
            # sprinkle mismatches so scores differ and edges tie-break
            for p in rng.integers(0, length, 2):
                seq[p] = "ACGT"[rng.integers(0, 4)]
            store.add_single(rid, "".join(seq), "I" * length)
            rid += 1
        for i in range(n_paired):
            start = (i * step + 11) % (len(TEMPLATE) - 2 * length - 40)
            store.add_paired(rid, TEMPLATE[start:start + length],
                             "I" * length,
                             TEMPLATE[start + length + 40:start + 2 * length + 40],
                             "I" * length)
            rid += 1
        store.readcount_single = n_single
        store.readcount_paired = n_paired
        return store

    def all_pairs_overlaps(store, length=80, step=17):
        ids1, ids2, pos = [], [], []
        n = len(store)
        for i in range(n - 1):
            for j in range(i + 1, min(i + 4, n)):
                if store.is_paired[i] or store.is_paired[j]:
                    continue
                ids1.append(i)
                ids2.append(j)
                pos.append(min((j - i) * step, length - 20))
        ov_len = [length - p for p in pos]
        return make_overlaps(
            id1=np.array(ids1), id2=np.array(ids2), pos1=np.array(pos),
            len1=np.array(ov_len),
            perc1=np.minimum(100 * np.array(ov_len) // length, 100))

    store = noisy_store(14, 3)
    ov = all_pairs_overlaps(store)
    s = Settings(
        min_overlap_len=30, edge_threshold=0.9, cliques=False, fno=1,
        first_it=True, keep_singletons=0, remove_trans=1, remove_tips=False,
        backend="numpy", min_clique_size=2, optimize=False,
        original_readcount=len(store),
    )
    results = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("HC_FNO_BATCH", mode)
        res = run_iteration(store, ov, s)
        results[mode] = (list(res.overlap_lines), len(res.store),
                         [decode_seq(res.store.unit_codes(res.store.units_of(i)[0]))
                          for i in range(len(res.store))])
    assert results["0"][0] == results["1"][0]
    assert results["0"][1] == results["1"][1]
    assert results["0"][2] == results["1"][2]


def test_perc_f32_reference_semantics():
    """_perc_f32 must reproduce the reference's single-precision percent
    math (FindNextOverlaps.cpp:375): f32 divisions AND f32 *100 product.
    87/150 is the boundary case envelope-patch parity exposed — 58 in
    f32, 57 in f64."""
    import math

    from haploconduct_tpu.assemble.fno import _perc_f32

    assert _perc_f32(87, 150) == 58
    assert math.floor(max(87 / float(150), 87 / float(150)) * 100) == 57
    assert _perc_f32(87, 150, 150) == 58
    assert _perc_f32(100, 100) == 100
    assert _perc_f32(1, 3) == 33
    assert _perc_f32(2, 3) == 66
    # max over two lengths picks the larger ratio
    assert _perc_f32(50, 100, 200) == 50
