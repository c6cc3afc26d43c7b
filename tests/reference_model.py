"""Scalar, string-based model of the reference scoring path.

A direct re-expression (for testing only) of src/EdgeCalculator.cpp:26-385:
per-character loops over Python strings, float64 math. The production
vectorized planner/kernel is tested for exact agreement against this model.
"""

import math

COMP = str.maketrans("ACGTN", "TGCAN")


def revcomp(seq: str) -> str:
    return seq.translate(COMP)[::-1]


def phred_to_prob(q: int) -> float:
    return 10.0 ** (-q / 10.0)


def overlap_score(seq1, seq2, phred1, phred2, pos, mismatch_thresh=0.0, min_read_len=0):
    """Returns (score, mismatch_rate) per src/EdgeCalculator.cpp:67-139."""
    mismatch_rate = 1.0
    if pos >= len(seq1):
        return 0.0, mismatch_rate
    if len(seq1) < min_read_len or len(seq2) < min_read_len:
        return 0.0, mismatch_rate
    L = min(len(seq1) - pos, len(seq2))
    total_score = 0.0
    total_len = 0
    mismatch_count = 0
    for i in range(L):
        nt1, nt2 = seq1[i + pos], seq2[i]
        if nt1 == "N" or nt2 == "N":
            continue
        p1 = phred_to_prob(ord(phred1[i + pos]) - 33)
        p2 = phred_to_prob(ord(phred2[i]) - 33)
        if nt1 == nt2:
            p = (1 - p1) * (1 - p2) + (p1 * p2) / 3.0
        else:
            p = p1 * (1 - p2) / 3.0 + p2 * (1 - p1) / 3.0 + (2 / 9.0) * p1 * p2
            mismatch_count += 1
        if p < mismatch_thresh:
            return 0.0, 1.0
        total_score += math.log(p)
        total_len += 1
    if total_len == 0:
        return 0.0, 1.0
    mismatch_rate = mismatch_count / total_len
    return math.exp(total_score / total_len), mismatch_rate


class SimpleRead:
    def __init__(self, seqs, phreds):
        """seqs/phreds: (seq,) for single or (seq1, seq2) for paired."""
        self.paired = len(seqs) == 2
        self.seqs = seqs
        self.phreds = phreds

    def seq(self, i):
        return self.seqs[0 if not self.paired else i - 1]

    def phred(self, i):
        return self.phreds[0 if not self.paired else i - 1]

    def rc_seq(self, i):
        return revcomp(self.seq(i))

    def rc_phred(self, i):
        return self.phred(i)[::-1]


def compute_overlap(read1, read2, pos1, pos2, ord_ch, ori1, ori2,
                    edge_threshold, mismatch_thresh=0.0, min_read_len=0):
    """Returns (score, mismatch_rate, pos3, pos4) per the reference's 16
    cases (src/EdgeCalculator.cpp:196-385)."""
    t1 = "p" if read1.paired else "s"
    t2 = "p" if read2.paired else "s"

    def sc(s1, s2, q1, q2, pos):
        return overlap_score(s1, s2, q1, q2, pos, mismatch_thresh, min_read_len)

    if t1 == "s" and t2 == "s":
        s1 = read1.seq(0) if ori1 else read1.rc_seq(0)
        q1 = read1.phred(0) if ori1 else read1.rc_phred(0)
        s2 = read2.seq(0) if ori2 else read2.rc_seq(0)
        q2 = read2.phred(0) if ori2 else read2.rc_phred(0)
        score, mm = sc(s1, s2, q1, q2, pos1)
        pos3 = len(s1) - pos1 - len(s2)
        return score, mm, pos3, 0
    if t1 == "s" and t2 == "p":
        a = read1.seq(0) if ori1 else read1.rc_seq(0)
        qa = read1.phred(0) if ori1 else read1.rc_phred(0)
        if ori2:
            ov1, m1 = sc(a, read2.seq(1), qa, read2.phred(1), pos1)
            ov2, m2 = sc(a, read2.seq(2), qa, read2.phred(2), pos2)
        else:
            ov1, m1 = sc(a, read2.rc_seq(2), qa, read2.rc_phred(2), pos1)
            ov2, m2 = sc(a, read2.rc_seq(1), qa, read2.rc_phred(1), pos2)
        mm = max(m1, m2)
        score = 0.5 * (ov1 + ov2) if (ov1 > edge_threshold and ov2 > edge_threshold) else min(ov1, ov2)
        pos3 = len(read1.seq(0)) - pos2 - len(read2.seq(2))
        pos4 = len(read1.seq(0)) - pos1 - len(read2.seq(1))
        return score, mm, pos3, pos4
    if t1 == "p" and t2 == "s":
        b = read2.seq(0) if ori2 else read2.rc_seq(0)
        qb = read2.phred(0) if ori2 else read2.rc_phred(0)
        if ori1:
            ov1, m1 = sc(read1.seq(1), b, read1.phred(1), qb, pos1)
            ov2, m2 = sc(b, read1.seq(2), qb, read1.phred(2), pos2)
        else:
            ov1, m1 = sc(read1.rc_seq(2), b, read1.rc_phred(2), qb, pos1)
            ov2, m2 = sc(b, read1.rc_seq(1), qb, read1.rc_phred(1), pos2)
        mm = max(m1, m2)
        score = 0.5 * (ov1 + ov2) if (ov1 > edge_threshold and ov2 > edge_threshold) else min(ov1, ov2)
        pos3 = len(read1.seq(2)) + pos2 - len(read2.seq(0))
        pos4 = len(read2.seq(0)) + pos1 - len(read1.seq(1))
        return score, mm, pos3, pos4
    # paired-paired
    if not ori1 and ori2:
        ov1, m1 = sc(read1.rc_seq(2), read2.seq(1), read1.rc_phred(2), read2.phred(1), pos1)
        if ord_ch == "1":
            ov2, m2 = sc(read1.rc_seq(1), read2.seq(2), read1.rc_phred(1), read2.phred(2), pos2)
        else:
            ov2, m2 = sc(read2.seq(2), read1.rc_seq(1), read2.phred(2), read1.rc_phred(1), pos2)
    elif ori1 and not ori2:
        ov1, m1 = sc(read1.seq(1), read2.rc_seq(2), read1.phred(1), read2.rc_phred(2), pos1)
        if ord_ch == "1":
            ov2, m2 = sc(read1.seq(2), read2.rc_seq(1), read1.phred(2), read2.rc_phred(1), pos2)
        else:
            ov2, m2 = sc(read2.rc_seq(1), read1.seq(2), read2.rc_phred(1), read1.phred(2), pos2)
    elif ori1 and ori2:
        ov1, m1 = sc(read1.seq(1), read2.seq(1), read1.phred(1), read2.phred(1), pos1)
        if ord_ch == "1":
            ov2, m2 = sc(read1.seq(2), read2.seq(2), read1.phred(2), read2.phred(2), pos2)
        else:
            ov2, m2 = sc(read2.seq(2), read1.seq(2), read2.phred(2), read1.phred(2), pos2)
    else:
        ov1, m1 = sc(read1.rc_seq(2), read2.rc_seq(2), read1.rc_phred(2), read2.rc_phred(2), pos1)
        if ord_ch == "1":
            ov2, m2 = sc(read1.rc_seq(1), read2.rc_seq(1), read1.rc_phred(1), read2.rc_phred(1), pos2)
        else:
            ov2, m2 = sc(read2.rc_seq(1), read1.rc_seq(1), read2.rc_phred(1), read1.rc_phred(1), pos2)
    mm = max(m1, m2)
    score = 0.5 * (ov1 + ov2) if (ov1 > edge_threshold and ov2 > edge_threshold) else min(ov1, ov2)
    if ord_ch == "1":
        pos3 = len(read1.seq(2)) - pos2 - len(read2.seq(2))
    else:
        pos3 = len(read1.seq(2)) + pos2 - len(read2.seq(2))
    pos4 = len(read1.seq(1)) - pos1 - len(read2.seq(1))
    return score, mm, pos3, pos4
