"""Built-in read-to-reference aligner (seed + gapless verify).

Stands in for bwa mem in reference-guided mode when no external aligner is
installed (the reference shells out to bwa at savage.py:328-336 /
polyte.py:300-303; this environment has none). Seeds each read against the
reference with exact k-mers on both strands, groups seeds by diagonal, and
scores the best diagonals gapless with the verification oracle; the best
(fewest-mismatch) diagonal becomes a SAM record with an all-match CIGAR.

Limitations vs bwa: no gapped alignment (reads from strains with indels
relative to the reference are placed on their best gapless diagonal or
dropped when the mismatch rate exceeds `max_mismatch_rate`), no split
alignments, no mapping quality model (MAPQ = 60 for unique best diagonal,
0 otherwise).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.reads import N_CODE, PAD_CODE, ReadStore, decode_seq, revcomp_codes
from ..io.sam import SamRecord
from .kmer import _kmer_hashes


class ReferenceIndex:
    def __init__(self, names: List[str], seqs: List[np.ndarray], k: int = 18):
        self.names = names
        self.seqs = seqs
        self.k = k
        hashes = []
        rids = []
        pos = []
        for r, sq in enumerate(seqs):
            h = _kmer_hashes(sq, k)
            keep = h >= 0
            hashes.append(h[keep])
            rids.append(np.full(int(keep.sum()), r, dtype=np.int64))
            pos.append(np.flatnonzero(keep).astype(np.int64))
        self.h = np.concatenate(hashes) if hashes else np.zeros(0, np.int64)
        order = np.argsort(self.h, kind="stable")
        self.h = self.h[order]
        self.rid = np.concatenate(rids)[order] if hashes else np.zeros(0, np.int64)
        self.pos = np.concatenate(pos)[order] if hashes else np.zeros(0, np.int64)

    @classmethod
    def from_fasta(cls, path: str, k: int = 18) -> "ReferenceIndex":
        from ..io.fastq import read_fasta
        from ..core.reads import encode_seq

        ids, seqs = read_fasta(path)
        return cls(ids, [encode_seq(s) for s in seqs], k)

    def lengths(self) -> Dict[str, int]:
        return {n: len(s) for n, s in zip(self.names, self.seqs)}


def _best_diagonal(index: ReferenceIndex, codes: np.ndarray, max_candidates: int = 8):
    """Candidate (ref, diag, seed_count) list for one read orientation."""
    h = _kmer_hashes(codes, index.k)
    qpos = np.flatnonzero(h >= 0)
    h = h[h >= 0]
    if len(h) == 0:
        return []
    left = np.searchsorted(index.h, h, side="left")
    right = np.searchsorted(index.h, h, side="right")
    counts = right - left
    total = int(counts.sum())
    if total == 0:
        return []
    q_idx = np.repeat(np.arange(len(h)), counts)
    csum = np.cumsum(counts)
    offs = np.arange(total, dtype=np.int64) - np.repeat(csum - counts, counts)
    t_idx = np.repeat(left, counts) + offs
    rids = index.rid[t_idx]
    diag = index.pos[t_idx] - qpos[q_idx]
    key = rids * (1 << 32) + (diag + (1 << 30))
    uniq, cnt = np.unique(key, return_counts=True)
    order = np.argsort(-cnt)[:max_candidates]
    out = []
    for u, c in zip(uniq[order], cnt[order]):
        out.append((int(u >> 32), int((u & 0xFFFFFFFF) - (1 << 30)), int(c)))
    return out


def _gapless_mismatches(ref_seq: np.ndarray, codes: np.ndarray, diag: int) -> Tuple[int, int]:
    """(#mismatches over aligned span, aligned length) for read placed at
    ref position `diag` (may be clipped at either end)."""
    start = max(0, diag)
    end = min(len(ref_seq), diag + len(codes))
    if end <= start:
        return (1 << 30), 0
    w_ref = ref_seq[start:end]
    w_read = codes[start - diag:end - diag]
    valid = (w_ref < N_CODE) & (w_read < N_CODE)
    mism = int(np.count_nonzero(valid & (w_ref != w_read)))
    return mism, int(np.count_nonzero(valid))


def align_store(
    store: ReadStore,
    index: ReferenceIndex,
    max_mismatch_rate: float = 0.25,
) -> Tuple[List[SamRecord], List[Tuple[SamRecord, SamRecord, bool]]]:
    """Align all reads; returns (single records, paired tuples) in the
    shapes io/sam.sam_to_overlaps expects."""
    singles: List[SamRecord] = []
    paired: List[Tuple[SamRecord, SamRecord, bool]] = []

    def align_unit(codes: np.ndarray, qual_str: str, name: str) -> Optional[SamRecord]:
        best = None
        for rev in (False, True):
            c = revcomp_codes(codes) if rev else codes
            for rid, diag, _seeds in _best_diagonal(index, c):
                mism, span = _gapless_mismatches(index.seqs[rid], c, diag)
                if span == 0 or mism > max_mismatch_rate * span:
                    continue
                cand = (mism / span, -span, rid, diag, rev)
                if best is None or cand < best:
                    best = cand
        if best is None:
            return None
        _, _, rid, diag, rev = best
        c = revcomp_codes(codes) if rev else codes
        q = qual_str[::-1] if rev else qual_str
        return SamRecord(
            qname=name, flag=16 if rev else 0, rname=index.names[rid],
            pos=diag + 1, mapq=60, cigar=f"{len(c)}M",
            seq=decode_seq(c), qual=q)

    for i in range(len(store)):
        rid = int(store.ids[i])
        u1, u2 = store.units_of(i)
        if not store.is_paired[i]:
            rec = align_unit(store.unit_codes(u1), store.phred_str(i, 0), str(rid))
            if rec is not None:
                singles.append(rec)
        else:
            rec1 = align_unit(store.unit_codes(u1), store.phred_str(i, 1), str(rid))
            rec2 = align_unit(store.unit_codes(u2), store.phred_str(i, 2), str(rid))
            if rec1 is None or rec2 is None:
                continue
            # pairing rules mirror read_paired_sam_to_list
            # (scripts/sam2overlaps.py:237-257)
            if rec1.pos >= rec2.pos:
                if rec1.reverse and rec2.reverse:
                    paired.append((rec2, rec1, True))
            else:
                if not rec1.reverse and not rec2.reverse:
                    paired.append((rec1, rec2, False))
    return singles, paired
