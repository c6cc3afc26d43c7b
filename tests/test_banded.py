"""Tests for the banded gapped aligner (ops/banded.py + ops/align.py)."""

import numpy as np
import pytest

from haploconduct_tpu.core.reads import (
    PAD_CODE, ReadStore, decode_seq, encode_seq, revcomp_str)
from haploconduct_tpu.ops.align import ReferenceIndex, align_store
from haploconduct_tpu.ops.banded import banded_align, extract_windows


def _tasks(read_strs, ref_str, diags, band):
    L = max(len(r) for r in read_strs)
    reads = np.full((len(read_strs), L), PAD_CODE, dtype=np.int8)
    lens = np.zeros(len(read_strs), dtype=np.int64)
    for i, r in enumerate(read_strs):
        reads[i, :len(r)] = encode_seq(r)
        lens[i] = len(r)
    win, ws = extract_windows(encode_seq(ref_str), np.asarray(diags, np.int64),
                              L, band, pad_code=PAD_CODE)
    return reads, lens, win, ws


def test_exact_match_all_M():
    ref = "ACGTACGTTGCAGGTCCATAACGTGCA" * 3
    read = ref[10:40]
    reads, lens, win, ws = _tasks([read], ref, [10], band=4)
    res = banded_align(reads, lens, win, band=4)
    assert res.cigars[0] == "30M"
    assert res.nm[0] == 0
    assert int(ws[0]) + int(res.ref_start[0]) == 10
    assert res.score[0] == 30


def test_mismatches_counted():
    ref = "ACGTACGTTGCAGGTCCATAACGTGCAACGTTTGCA" * 2
    read = list(ref[5:35])
    read[10] = "A" if read[10] != "A" else "C"
    reads, lens, win, ws = _tasks(["".join(read)], ref, [5], band=4)
    res = banded_align(reads, lens, win, band=4)
    assert res.cigars[0] == "30M"
    assert res.nm[0] == 1
    assert res.matches[0] == 29


def test_deletion_in_read():
    """Read missing 3 ref bases -> CIGAR contains 3D, position exact."""
    rng = np.random.default_rng(0)
    ref = "".join("ACGT"[b] for b in rng.integers(0, 4, 120))
    read = ref[20:50] + ref[53:83]  # 3bp deletion relative to ref
    reads, lens, win, ws = _tasks([read], ref, [20], band=8)
    res = banded_align(reads, lens, win, band=8)
    assert "3D" in res.cigars[0]
    assert res.nm[0] == 3
    assert int(ws[0]) + int(res.ref_start[0]) == 20
    # total ref consumption = 63 bases
    assert int(res.ref_end[0]) - int(res.ref_start[0]) == 63


def test_insertion_in_read():
    rng = np.random.default_rng(1)
    ref = "".join("ACGT"[b] for b in rng.integers(0, 4, 120))
    read = ref[20:50] + "ACGT" + ref[50:80]  # 4bp insertion
    reads, lens, win, ws = _tasks([read], ref, [20], band=8)
    res = banded_align(reads, lens, win, band=8)
    # read consumption must equal read length
    consumed = sum(int(n) for n, op in _cigar_ops(res.cigars[0]) if op in "MI")
    assert consumed == len(read)
    assert "I" in res.cigars[0]
    assert res.nm[0] <= 5  # 4 insertion bases (+ possible placement slack)


def test_start_drift_within_band():
    """Seed diagonal off by a few bases still recovers the exact start."""
    ref = "ACGTTGCAGGTCCATAACGTGCAACGTTTGCAGGACCA" * 3
    read = ref[30:70]
    reads, lens, win, ws = _tasks([read], ref, [27], band=8)  # diag off by 3
    res = banded_align(reads, lens, win, band=8)
    assert int(ws[0]) + int(res.ref_start[0]) == 30
    assert res.nm[0] == 0


def _cigar_ops(cigar):
    import re

    return [(int(n), op) for n, op in re.findall(r"(\d+)([MID])", cigar)]


def test_align_store_gapped_placement():
    """Reads from a strain with an indel vs the reference still align."""
    rng = np.random.default_rng(2)
    ref = "".join("ACGT"[b] for b in rng.integers(0, 4, 500))
    strain = ref[:200] + ref[206:]  # 6bp deletion at position 200
    store = ReadStore()
    n = 0
    for start in range(150, 260, 10):  # reads spanning the indel
        store.add_single(n, strain[start:start + 80], "I" * 80)
        n += 1
    store.readcount_single = n
    index = ReferenceIndex(["ref"], [encode_seq(ref)])
    singles, paired = align_store(store, index)
    assert len(singles) == n  # gapless placement would drop the spanning reads
    spanning = [r for r in singles if r.pos - 1 < 200 - 20]
    assert any("D" in r.cigar for r in spanning)


def test_align_store_reverse_strand():
    rng = np.random.default_rng(3)
    ref = "".join("ACGT"[b] for b in rng.integers(0, 4, 300))
    store = ReadStore()
    store.add_single(0, revcomp_str(ref[100:180]), "I" * 80)
    store.readcount_single = 1
    index = ReferenceIndex(["ref"], [encode_seq(ref)])
    singles, _ = align_store(store, index)
    assert len(singles) == 1
    assert singles[0].reverse
    assert singles[0].pos == 101
    assert singles[0].seq == ref[100:180]  # stored as forward-ref strand
