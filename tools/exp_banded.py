"""Experiment (VERDICT r2 item 5): do edit-distance-tolerant candidates
move savage/example stage a toward the published golden (9 contigs /
16,887 bp, savage/example/frequencies_stage_a.denovo.txt)?

rust-overlaps' FM-index search is EDIT-distance based (-e, savage.py:664),
so candidates containing indels that the gapless k-mer engine rejects
would still reach the reference's EdgeCalculator. This script reproduces
that behavior end to end:

1. near-exhaustive k=12 seed candidates (any shared 12-mer, any diagonal);
2. the production gapless acceptance (<=2% mismatches on the diagonal) as
   the BASELINE candidate set;
3. every REJECTED seed candidate goes through a banded Needleman-Wunsch
   (ops/banded.py, band=8, i.e. indels up to 8bp) on its overlap window —
   a cheap score prefilter first, exact traceback for survivors; accepted
   under rust-overlaps' criterion (edits <= ceil(0.02 * alignment
   columns), overlap >= min len) with gap-corrected diagonals;
4. stage a runs on baseline vs baseline+banded and prints both profiles.

Outcome recorded in docs/PARITY.md: if the profiles are identical (the
expected result — the verification math is strictly gapless in BOTH
implementations, src/EdgeCalculator.cpp:26-139, so an indel inside the
scored window can never score above edge_threshold), the 3-vs-9 golden
gap is a tool-version artifact, not missing candidate recall.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from haploconduct_tpu.core.reads import ReadStore, revcomp_codes
from haploconduct_tpu.io.sfo import SFO_DTYPE, sfo_to_overlaps
from haploconduct_tpu.ops.banded import banded_align, extract_windows
from haploconduct_tpu.ops.kmer import _verify_candidates, find_overlap_candidates
from haploconduct_tpu.assemble.stages import StageParams, run_stage

EXAMPLE = "/root/reference/savage/example/input_fas"
ERR = 0.02  # rust-overlaps -e for stage a (sfo_err = 1/sfo_mm = 1/50)
BAND = 8


def unit_seqs(store):
    ns = store.readcount_single
    npair = len(store) - ns
    seqs = [store.unit_codes(store.unit1[i]) for i in range(ns)]
    seqs += [store.unit_codes(store.unit1[ns + i]) for i in range(npair)]
    seqs += [store.unit_codes(store.unit2[ns + i]) for i in range(npair)]
    return seqs, ns, npair


def banded_rescue(seqs, lens, rejected, sfo_len):
    """Banded-NW acceptance for gapless-rejected seed candidates; returns
    SFO rows at gap-corrected diagonals."""
    shift = rejected["oha"].astype(np.int64)
    rev = rejected["ori"] == b"I"
    la = lens[rejected["ida"]]
    lb = lens[rejected["idb"]]
    # B segment inside the overlap (in B-oriented coordinates)
    b0 = np.maximum(0, -shift)
    b1 = np.minimum(lb, la - shift)
    L_read = (b1 - b0).astype(np.int64)
    ok = L_read >= sfo_len
    idx = np.flatnonzero(ok)
    if len(idx) == 0:
        return np.zeros(0, dtype=SFO_DTYPE)
    Lmax = int(L_read[idx].max())

    def build(rows):
        reads = np.full((len(rows), Lmax), 5, dtype=np.int8)
        rlens = np.zeros(len(rows), dtype=np.int64)
        wins = np.full((len(rows), Lmax + 2 * BAND), 5, dtype=np.int8)
        for t, r in enumerate(rows):
            bseq = seqs[int(rejected["idb"][r])]
            if rev[r]:
                bseq = revcomp_codes(bseq)
            seg = bseq[int(b0[r]):int(b1[r])]
            reads[t, :len(seg)] = seg
            rlens[t] = len(seg)
            a = seqs[int(rejected["ida"][r])]
            w, _ = extract_windows(a, np.array([shift[r] + b0[r]]),
                                   len(seg), BAND, 5)
            wins[t, :w.shape[1]] = w[0]
        return reads, rlens, wins

    # pass 1: score-only prefilter (conservative bound: each edit costs at
    # most match - gap = 4 vs an all-match alignment)
    reads, rlens, wins = build(idx)
    r1 = banded_align(reads, rlens, wins, BAND, want_traceback=False)
    allowed = np.ceil(ERR * rlens).astype(np.int64)
    pre = r1.score >= rlens - 6 * np.maximum(allowed, 1)
    surv = idx[pre]
    print(f"  banded prefilter: {len(idx)} aligned, {len(surv)} score-plausible")
    if len(surv) == 0:
        return np.zeros(0, dtype=SFO_DTYPE)

    reads, rlens, wins = build(surv)
    r2 = banded_align(reads, rlens, wins, BAND, want_traceback=True)
    allowed = np.ceil(ERR * np.maximum(r2.aligned_cols, 1)).astype(np.int64)
    accept = (r2.nm <= allowed) & (r2.aligned_cols >= sfo_len)
    keep = np.flatnonzero(accept)
    print(f"  banded accepted: {len(keep)} (edit-distance criterion)")
    if len(keep) == 0:
        return np.zeros(0, dtype=SFO_DTYPE)

    rows = surv[keep]
    # gap-corrected diagonal: read[0] (= B'[b0]) aligned at window offset
    # ref_start, window starts at shift+b0-BAND in A
    new_shift = (shift[rows] + b0[rows] - BAND + r2.ref_start[keep]
                 - b0[rows])
    out = np.zeros(len(rows), dtype=SFO_DTYPE)
    out["ida"] = rejected["ida"][rows]
    out["idb"] = rejected["idb"][rows]
    out["ori"] = rejected["ori"][rows]
    out["oha"] = new_shift
    out["ohb"] = new_shift + lb[rows] - la[rows]
    start = np.maximum(0, new_shift)
    end = np.minimum(la[rows], new_shift + lb[rows])
    out["ola"] = end - start
    out["olb"] = end - start
    out["k"] = np.ceil(ERR * np.maximum(end - start, 1)).astype(np.int64)
    return out[out["ola"] >= sfo_len]


def profile(res):
    lens = sorted((res.store.read_len(i) for i in range(len(res.store))),
                  reverse=True)
    big = [l for l in lens if l >= 1000]
    return (f"{len(lens)} contigs / {sum(lens)} bp; >=1kb: {len(big)} "
            f"({sum(big)} bp); top: {lens[:10]}")


def main():
    store = ReadStore.from_files(
        singles=f"{EXAMPLE}/singles.fastq",
        paired1=f"{EXAMPLE}/paired1.fastq", paired2=f"{EXAMPLE}/paired2.fastq")
    seqs, ns, npair = unit_seqs(store)
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    sfo_len = 100  # halved min_overlap_len (PE present), savage.py:658-664

    t0 = time.time()
    sfo_all = find_overlap_candidates(seqs, min_overlap_len=sfo_len, k=12,
                                      error_rate=ERR, max_group=100000,
                                      verify=False, subsample=1)
    base = _verify_candidates(seqs, lens, sfo_all, ERR)
    print(f"seed candidates: {len(sfo_all)}, gapless-accepted: {len(base)} "
          f"({time.time()-t0:.0f}s)")

    # gapless-rejected = the set an edit-distance engine could rescue
    def keys(s):
        return (s["ida"].astype(np.int64) << 40) ^ (s["idb"].astype(np.int64) << 16) \
            ^ ((s["oha"].astype(np.int64) & 0x7FFF) << 1) ^ (s["ori"] == b"I")

    rejected = sfo_all[~np.isin(keys(sfo_all), keys(base))]
    print(f"gapless-rejected seed candidates: {len(rejected)}")
    t0 = time.time()
    rescued = banded_rescue(seqs, lens, rejected, sfo_len)
    # drop rescues landing on an already-accepted diagonal
    if len(rescued):
        rescued = rescued[~np.isin(keys(rescued), keys(base))]
    print(f"banded-rescued NEW candidates: {len(rescued)} ({time.time()-t0:.0f}s)")

    params = StageParams(stage="a", min_overlap_len=200, edge_threshold=0.97,
                         clique_size_EC=4, remove_branches=True,
                         max_tip_len=251, original_readcount=len(store),
                         backend="native")
    ov_base = sfo_to_overlaps(base, num_singles=ns, num_pairs=npair)
    res_base = run_stage(params, store, ov_base)
    print(f"BASELINE ({len(ov_base)} overlaps): {profile(res_base)}")

    if len(rescued):
        aug = np.concatenate([base, rescued])
        order = np.lexsort((aug["oha"], aug["idb"], aug["ida"]))
        ov_aug = sfo_to_overlaps(aug[order], num_singles=ns, num_pairs=npair)
        res_aug = run_stage(params, store, ov_aug)
        print(f"AUGMENTED ({len(ov_aug)} overlaps): {profile(res_aug)}")
    else:
        print("AUGMENTED: no new candidates — identical to baseline")
    print("golden: 9 contigs >=1kb / 16,887 bp "
          "(savage/example/frequencies_stage_a.denovo.txt)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
