"""Pairwise quality-aware overlap scoring — the assembler's hot loop.

Math (reference src/EdgeCalculator.cpp:26-139): for an aligned pair of
sequence windows, each position contributes the probability that both bases
were sequenced from the same haplotype, derived from the two phred error
probabilities p1, p2:

    match:     p = (1-p1)(1-p2) + p1*p2/3
    mismatch:  p = (p1*(1-p2) + p2*(1-p1))/3 + (2/9)*p1*p2
    either N:  position skipped entirely

If any counted position has p < `mismatch_thresh` the overlap is rejected
outright. Otherwise score = exp(mean log p) over counted positions and
mismatch_rate = #mismatches / #counted.

A *task* is (row_a, row_b, pos): score row_a[pos:] against row_b[0:], with
rows taken from a PackedUnits matrix (orientation pre-resolved by row
index). Degenerate cases (pos >= len_a, read shorter than min_read_len,
zero counted positions) score 0 with mismatch_rate 1.0, exactly as the
reference's early returns leave it (src/EdgeCalculator.cpp:74-84, 129-131).

Two backends:
- numpy (float64): the oracle; bit-matches C++ double evaluation up to
  summation order.
- jax (float32 on device): the throughput path; callers re-check any result
  within `RECHECK_MARGIN` of a decision threshold on the oracle, so f32
  rounding can never flip an edge decision.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

from ..core.reads import N_CODE, PAD_CODE

RECHECK_MARGIN = 2e-3  # |score - threshold| below this -> redo in f64


class TaskScores(NamedTuple):
    """Raw per-task scoring results (arrays of shape (B,))."""

    score: np.ndarray  # exp(mean log p), 0 for rejected/degenerate
    mismatch_rate: np.ndarray  # mismatches / counted, 1.0 for degenerate
    sum_log: np.ndarray
    counted: np.ndarray
    mismatches: np.ndarray
    rejected: np.ndarray  # hard per-position reject (p < mismatch_thresh)


@functools.lru_cache(maxsize=4)
def _phred_lut(dtype_name: str) -> np.ndarray:
    """Per-phred error probability, tabulated once (quals are uint8, so
    256 entries cover every input; each entry is the same elementwise
    expression the direct computation would evaluate -> bit-identical)."""
    q = np.arange(256, dtype=np.dtype(dtype_name))
    return np.power(10.0, -q / 10.0).astype(np.dtype(dtype_name))


def phred_probs(quals: np.ndarray, dtype=np.float64) -> np.ndarray:
    """Phred (integer, ASCII-33 already removed) -> error probability."""
    if quals.dtype == np.uint8:
        return _phred_lut(np.dtype(dtype).name)[quals]
    return np.power(10.0, -quals.astype(dtype) / 10.0).astype(dtype)


@functools.lru_cache(maxsize=1)
def _pair_luts():
    """(p, log p) keyed by (q1, q2, match) — the same-haplotype probability
    algebra of EdgeCalculator.cpp:26-63 tabulated over all 256x256 phred
    pairs. Entries are computed with the identical elementwise float64
    expressions as the direct path, so gathered results are bit-identical;
    this removes the per-position pow/log transcendentals (the 10x-scale
    profile's top two hotspots)."""
    p1 = _phred_lut("float64")[:, None]
    p2 = _phred_lut("float64")[None, :]
    p_match = (1.0 - p1) * (1.0 - p2) + (p1 * p2) / 3.0
    p_mis = (p1 * (1.0 - p2) + p2 * (1.0 - p1)) / 3.0 + (2.0 / 9.0) * p1 * p2
    return (p_match.ravel(), p_mis.ravel(),
            np.log(p_match).ravel(), np.log(p_mis).ravel())


# --------------------------------------------------------------------------
# NumPy oracle (float64)
# --------------------------------------------------------------------------

def score_tasks_numpy(
    codes: np.ndarray,
    quals: np.ndarray,
    unit_lens_by_row: np.ndarray,
    row_a: np.ndarray,
    row_b: np.ndarray,
    pos: np.ndarray,
    mismatch_thresh: float = 0.0,
    min_read_len: int = 0,
) -> TaskScores:
    """Vectorized float64 scoring over B tasks on padded (rows, W) matrices."""
    B = len(row_a)
    W = codes.shape[1]
    if B == 0:
        z = np.zeros(0)
        zi = np.zeros(0, dtype=np.int64)
        return TaskScores(z, z, z, zi, zi, np.zeros(0, dtype=bool))
    pos = np.asarray(pos, dtype=np.int64)
    len_a = unit_lens_by_row[row_a].astype(np.int64)
    len_b = unit_lens_by_row[row_b].astype(np.int64)

    a = codes[row_a]
    b = codes[row_b]
    qa = quals[row_a]
    qb = quals[row_b]
    col = np.arange(W, dtype=np.int64)[None, :]
    idx = np.minimum(pos[:, None] + col, W - 1)
    a_shift = np.take_along_axis(a, idx, axis=1)
    qa_shift = np.take_along_axis(qa, idx, axis=1)

    L = np.minimum(len_a - pos, len_b)
    valid = col < L[:, None]
    either_n = (a_shift >= N_CODE) | (b >= N_CODE)  # N or PAD
    counted_mask = valid & ~either_n

    match = a_shift == b
    # (q1, q2) -> probability via the tabulated pair algebra (bit-identical
    # to computing pow/log per position; see _pair_luts)
    lut_match, lut_mis, lut_logm, lut_logx = _pair_luts()
    pair_idx = (qa_shift.astype(np.int32) << 8) | qb
    log_p = np.where(match, lut_logm[pair_idx], lut_logx[pair_idx])

    if mismatch_thresh > 0.0:
        p = np.where(match, lut_match[pair_idx], lut_mis[pair_idx])
        rejected = np.any(counted_mask & (p < mismatch_thresh), axis=1)
    else:
        rejected = np.zeros(B, dtype=bool)
    sum_log = np.sum(np.where(counted_mask, log_p, 0.0), axis=1)
    counted = np.sum(counted_mask, axis=1).astype(np.int64)
    mismatches = np.sum(counted_mask & ~match, axis=1).astype(np.int64)

    degenerate = (pos >= len_a) | (len_a < min_read_len) | (len_b < min_read_len) | (counted == 0)
    ok = ~degenerate & ~rejected
    with np.errstate(divide="ignore", invalid="ignore"):
        score = np.where(ok, np.exp(sum_log / np.maximum(counted, 1)), 0.0)
        mism_rate = np.where(ok, mismatches / np.maximum(counted, 1), 1.0)
    return TaskScores(score, mism_rate, sum_log, counted, mismatches, rejected)


# --------------------------------------------------------------------------
# Native host backend (C++ OpenMP, float64)
# --------------------------------------------------------------------------

def score_tasks_native(
    codes: np.ndarray,
    quals: np.ndarray,
    unit_lens_by_row: np.ndarray,
    row_a: np.ndarray,
    row_b: np.ndarray,
    pos: np.ndarray,
    mismatch_thresh: float = 0.0,
    min_read_len: int = 0,
) -> "TaskScores | None":
    """C++ OpenMP host engine (native/baseline_score.cpp:score_tasks_exact).

    One fused pass per task instead of numpy's ~10 full-matrix passes —
    ~20x the oracle's host throughput. Per-position probabilities come from
    the same _pair_luts() tables as the oracle, so only the serial (vs
    pairwise) summation order differs; callers run the RECHECK_MARGIN f64
    re-scoring (ops/verify.py) so edge decisions are bit-identical to the
    oracle. Returns None when the extension cannot be built.
    """
    from ..native import load_baseline_ext

    ext = load_baseline_ext()
    if ext is None or not hasattr(ext._m, "score_tasks_exact"):
        return None
    B = len(row_a)
    if B == 0:
        z = np.zeros(0)
        zi = np.zeros(0, dtype=np.int64)
        return TaskScores(z, z, z, zi, zi, np.zeros(0, dtype=bool))
    out = ext.score_tasks_exact(
        codes, quals, unit_lens_by_row, row_a, row_b, pos,
        mismatch_thresh, min_read_len, _pair_luts())
    return TaskScores(*out)


# --------------------------------------------------------------------------
# JAX device backend (float32)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _get_jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


@functools.lru_cache(maxsize=64)
def _jit_score_tasks(width: int, mismatch_thresh: float, min_read_len: int):
    """Build a jitted scorer for a fixed window width (bucketed)."""
    jax, jnp = _get_jax()

    LOG10_OVER_10 = float(np.log(10.0) / 10.0)

    def fn(codes, quals, lens_by_row, row_a, row_b, pos):
        a = codes[row_a]  # (B, W) int8
        b = codes[row_b]
        qa = quals[row_a]  # (B, W) uint8
        qb = quals[row_b]
        pos_i = pos.astype(jnp.int32)
        len_a = lens_by_row[row_a].astype(jnp.int32)
        len_b = lens_by_row[row_b].astype(jnp.int32)

        col = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
        idx = jnp.minimum(pos_i[:, None] + col, width - 1)
        a_shift = jnp.take_along_axis(a, idx, axis=1)
        qa_shift = jnp.take_along_axis(qa, idx, axis=1)

        L = jnp.minimum(len_a - pos_i, len_b)
        valid = col < L[:, None]
        either_n = (a_shift >= N_CODE) | (b >= N_CODE)
        counted_mask = valid & jnp.logical_not(either_n)

        p1 = jnp.exp(qa_shift.astype(jnp.float32) * (-LOG10_OVER_10))
        p2 = jnp.exp(qb.astype(jnp.float32) * (-LOG10_OVER_10))
        match = a_shift == b
        p_match = (1.0 - p1) * (1.0 - p2) + (p1 * p2) * (1.0 / 3.0)
        p_mis = (p1 * (1.0 - p2) + p2 * (1.0 - p1)) * (1.0 / 3.0) + (2.0 / 9.0) * (p1 * p2)
        p = jnp.where(match, p_match, p_mis)

        rejected = jnp.any(counted_mask & (p < mismatch_thresh), axis=1)
        sum_log = jnp.sum(jnp.where(counted_mask, jnp.log(p), 0.0), axis=1)
        counted = jnp.sum(counted_mask, axis=1).astype(jnp.int32)
        mismatches = jnp.sum(counted_mask & jnp.logical_not(match), axis=1).astype(jnp.int32)

        degenerate = (
            (pos_i >= len_a) | (len_a < min_read_len) | (len_b < min_read_len) | (counted == 0)
        )
        ok = jnp.logical_not(degenerate) & jnp.logical_not(rejected)
        denom = jnp.maximum(counted, 1).astype(jnp.float32)
        score = jnp.where(ok, jnp.exp(sum_log / denom), 0.0)
        mism_rate = jnp.where(ok, mismatches.astype(jnp.float32) / denom, 1.0)
        return score, mism_rate, sum_log, counted, mismatches, rejected

    return jax.jit(fn)


def score_tasks_jax(
    codes: np.ndarray,
    quals: np.ndarray,
    unit_lens_by_row: np.ndarray,
    row_a: np.ndarray,
    row_b: np.ndarray,
    pos: np.ndarray,
    mismatch_thresh: float = 0.0,
    min_read_len: int = 0,
    batch_size: int = 1 << 16,
) -> TaskScores:
    """Device scoring with host-side batching; returns numpy arrays."""
    _, jnp = _get_jax()
    B = len(row_a)
    if B == 0:
        return score_tasks_numpy(codes, quals, unit_lens_by_row, row_a, row_b, pos)
    fn = _jit_score_tasks(codes.shape[1], float(mismatch_thresh), int(min_read_len))
    codes_d = jnp.asarray(codes)
    quals_d = jnp.asarray(quals)
    lens_d = jnp.asarray(unit_lens_by_row.astype(np.int32))

    outs = []
    for start in range(0, B, batch_size):
        end = min(start + batch_size, B)
        n = end - start
        pad = (-n) % min(batch_size, max(B, 1))
        sl = slice(start, end)

        def prep(x, fill=0):
            arr = np.asarray(x[sl])
            if pad:
                arr = np.concatenate([arr, np.full(pad, fill, dtype=arr.dtype)])
            return jnp.asarray(arr)

        res = fn(codes_d, quals_d, lens_d, prep(row_a), prep(row_b), prep(pos))
        outs.append(tuple(np.asarray(r)[:n] for r in res))
    merged = tuple(np.concatenate([o[i] for o in outs]) for i in range(6))
    return TaskScores(
        merged[0].astype(np.float64),
        merged[1].astype(np.float64),
        merged[2].astype(np.float64),
        merged[3].astype(np.int64),
        merged[4].astype(np.int64),
        merged[5].astype(bool),
    )
