"""SFO overlap-candidate interchange format and conversion to 13-col overlaps.

SFO is the 8-column output of the reference's candidate generator
(rust-overlaps): ``idA idB ori(N|I) OHA OHB OLA OLB K`` where OHA/OHB are
overhangs (bases outside the overlap; sign encodes which read starts first),
OLA/OLB bases inside the overlap, K the number of mismatches allowed.

The conversion below reproduces the reference's scripts/sfo2overlaps.py
exactly, including its group-flush behavior (a pending candidate group is
typed by the *incoming* line's single/paired status and the final group is
never flushed) so text outputs diff clean against reference intermediates.
Reads are assumed indexed in concatenated order: singles [0, S), /1 reads
[S, S+P), /2 reads [S+P, S+2P) (reference: scripts/sfo2overlaps.py:124-147).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .overlaps import OVERLAP_DTYPE, empty_overlaps

SFO_DTYPE = np.dtype(
    [
        ("ida", np.int64),
        ("idb", np.int64),
        ("ori", "S1"),  # b"N" same orientation, b"I" reverse
        ("oha", np.int64),
        ("ohb", np.int64),
        ("ola", np.int64),
        ("olb", np.int64),
        ("k", np.int64),
    ]
)


def read_sfo(path: str) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            assert len(parts) == 8, f"bad SFO line: {line!r}"
            rows.append(
                (int(parts[0]), int(parts[1]), parts[2].encode(), int(parts[3]),
                 int(parts[4]), int(parts[5]), int(parts[6]), int(parts[7]))
            )
    return np.array(rows, dtype=SFO_DTYPE) if rows else np.zeros(0, dtype=SFO_DTYPE)


def write_sfo(path: str, sfo: np.ndarray) -> None:
    with open(path, "w") as f:
        for r in sfo:
            f.write(
                f"{int(r['ida'])}\t{int(r['idb'])}\t{r['ori'].decode()}\t{int(r['oha'])}\t"
                f"{int(r['ohb'])}\t{int(r['ola'])}\t{int(r['olb'])}\t{int(r['k'])}\n"
            )


def _py2_round(x: float) -> int:
    """Python-2 round-half-away-from-zero, as used by the reference script."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _original_id(sfo_id: int, num_singles: int, num_pairs: int) -> int:
    if num_pairs == 0:
        return sfo_id
    return sfo_id if sfo_id < num_singles + num_pairs else sfo_id - num_pairs


def _is_paired(orig_id: int, num_singles: int, num_pairs: int) -> bool:
    return num_pairs > 0 and orig_id >= num_singles


def _s_s_overlap(row: Tuple) -> Optional[list]:
    """One candidate row -> 13-field single-single overlap (as a list of
    py values), mirroring scripts/sfo2overlaps.py:150-200."""
    ida, idb, _sa, _sb, ori_c, oha, ohb, ola, olb, _k = row
    ori = b"+" if ori_c == b"N" else b"-"
    ovlen = min(ola, olb)
    if oha >= 0:  # read A starts first
        readlen_a = ola + oha + (0 if ohb >= 0 else -ohb)
        readlen_b = olb + (ohb if ohb >= 0 else 0)
        id1, id2, pos1, ori1, ori2 = ida, idb, oha, b"+", ori
    else:  # read B starts first
        readlen_a = ola + (0 if ohb >= 0 else -ohb)
        readlen_b = -oha + olb + (ohb if ohb >= 0 else 0)
        id1, id2, pos1, ori1, ori2 = idb, ida, -oha, ori, b"+"
    minreadlen = min(readlen_a, readlen_b)
    assert minreadlen > 0
    perc = min(_py2_round(100.0 * ovlen / minreadlen), 100)
    # [id1 id2 pos1 pos2 ord ori1 ori2 perc1 perc2 len1 len2 type1 type2]
    return [id1, id2, pos1, 0, b"-", ori1, ori2, perc, 0, ovlen, 0, b"s", b"s"]


def _match_group(group: List[Tuple], type_a: bool, type_b: bool) -> List[list]:
    """All consistent per-end overlap pairings of one (idA, idB) candidate
    group, merged into paired overlaps (scripts/sfo2overlaps.py:203-329)."""
    out = []
    if len(group) < 2:
        return out
    for i in range(len(group)):
        for j in range(i + 1, len(group)):
            merged = _pair_up(group[i], group[j], type_a, type_b)
            if merged is not None:
                out.append(merged)
    return out


def _pair_up(c1: Tuple, c2: Tuple, type_a: bool, type_b: bool) -> Optional[list]:
    if c1[4] != c2[4]:  # both ends must have the same relative orientation
        return None
    fwd = c1[4] == b"N"
    c1_sa, c1_sb, c2_sa, c2_sb = c1[2], c1[3], c2[2], c2[3]
    o1 = o2 = None
    if type_a and type_b:  # paired-paired: order by sfo ids of both sides
        if fwd:
            if c1_sa < c2_sa and c1_sb < c2_sb:
                o1, o2 = c1, c2
            elif c1_sa > c2_sa and c1_sb > c2_sb:
                o1, o2 = c2, c1
        else:
            if c1_sa < c2_sa and c1_sb > c2_sb:
                o1, o2 = c1, c2
            elif c1_sa > c2_sa and c1_sb < c2_sb:
                o1, o2 = c2, c1
    elif type_a and not type_b:  # paired-single
        c1_p, c2_p = c1[5], c2[5]
        if fwd:
            if c1_sa < c2_sa and c1_p < c2_p:
                o1, o2 = c1, c2
            elif c1_sa > c2_sa and c1_p > c2_p:
                o1, o2 = c2, c1
        else:
            if c1_sa < c2_sa and c1_p > c2_p:
                o1, o2 = c2, c1
            elif c1_sa > c2_sa and c1_p < c2_p:
                o1, o2 = c1, c2
    else:  # single-paired
        c1_p, c2_p = c1[5], c2[5]
        if fwd:
            if c1_sb < c2_sb and c1_p < c2_p:
                o1, o2 = c1, c2
            elif c1_sb > c2_sb and c1_p > c2_p:
                o1, o2 = c2, c1
        else:
            if c1_sb < c2_sb and c1_p > c2_p:
                o1, o2 = c2, c1
            elif c1_sb > c2_sb and c1_p < c2_p:
                o1, o2 = c1, c2
    if o1 is None:
        return None
    ov1 = _s_s_overlap(o1)
    ov2 = _s_s_overlap(o2)
    if ov1 is None or ov2 is None:
        return None
    # Assign the p/s types according to which read ended up first in overlap1
    if ov1[0] == c1[0]:
        t1 = b"p" if type_a else b"s"
        t2 = b"p" if type_b else b"s"
    else:
        t1 = b"p" if type_b else b"s"
        t2 = b"p" if type_a else b"s"
    merged = list(ov1)
    merged[11], merged[12] = t1, t2
    if t1 == b"p" and t2 == b"p":
        merged[4] = b"2" if ov1[0] != ov2[0] else b"1"
    merged[3] = ov2[2]  # pos2
    merged[8] = ov2[7]  # perc2
    merged[10] = ov2[9]  # len2
    return merged


def sfo_to_overlaps(sfo: np.ndarray, num_singles: int, num_pairs: int) -> np.ndarray:
    """SFO candidates (concatenated s+p1+p2 indexing) -> 13-col overlaps.

    Reproduces scripts/sfo2overlaps.py end to end: canonicalize pair order by
    original ID (with the N/I overhang flips), sort + dedup, emit S-S
    overlaps directly and merge per-end candidates into paired overlaps.
    """
    if sfo.size == 0:
        return empty_overlaps(0)
    # Canonicalize so original-id1 <= original-id2 (flip_N / flip_I).
    rows = []
    for r in sfo:
        ida, idb = int(r["ida"]), int(r["idb"])
        na = _original_id(ida, num_singles, num_pairs)
        nb = _original_id(idb, num_singles, num_pairs)
        ori, oha, ohb = r["ori"], int(r["oha"]), int(r["ohb"])
        ola, olb, k = int(r["ola"]), int(r["olb"]), int(r["k"])
        if na > nb:
            if ori == b"I":
                rows.append((nb, na, idb, ida, ori, ohb, oha, olb, ola, k))
            else:
                rows.append((nb, na, idb, ida, ori, -oha, -ohb, olb, ola, k))
        else:
            rows.append((na, nb, ida, idb, ori, oha, ohb, ola, olb, k))
    # sort -k1,1n -k2,2n -k3,3n -k4,4n | uniq
    rows = sorted(set(rows), key=lambda t: (t[0], t[1], t[2], t[3]))

    out_rows: List[list] = []
    group: List[Tuple] = []
    for row in rows:
        ida, idb = row[0], row[1]
        if ida == idb:  # self-overlap
            continue
        pa = _is_paired(ida, num_singles, num_pairs)
        pb = _is_paired(idb, num_singles, num_pairs)
        if not pa and not pb:
            ov = _s_s_overlap(row)
            if ov is not None:
                out_rows.append(ov)
        else:
            if group and (group[0][0], group[0][1]) != (ida, idb):
                # NOTE reference quirk kept for parity: the flushed group is
                # typed by the *current* line's paired status, and the last
                # group is never flushed (scripts/sfo2overlaps.py:89-102).
                out_rows.extend(_match_group(group, pa, pb))
                group = []
            group.append(row)

    # final `uniq` pass: drop consecutive duplicates
    deduped: List[list] = []
    for ov in out_rows:
        if not deduped or ov != deduped[-1]:
            deduped.append(ov)
    out = empty_overlaps(len(deduped))
    for i, ov in enumerate(deduped):
        out[i] = tuple(ov)
    return out
