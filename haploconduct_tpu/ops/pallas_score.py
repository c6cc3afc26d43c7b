"""Pallas TPU kernel for batched overlap verification.

The XLA formulation of the scoring kernel (ops/score.py) is crippled on
TPU by the per-task shifted-window gather (take_along_axis lowers to a
scalar gather). This kernel keeps the packed read matrices resident in
VMEM (R x 2W int8) and aligns each task's window with aligned vector loads
plus a dynamic lane rotate, then scores 8 tasks per grid step with pure
VPU math:

  per position: p1,p2 = 10^(-q/10);  p = match ? (1-p1)(1-p2)+p1p2/3
                : (p1(1-p2)+p2(1-p1))/3 + 2/9 p1p2  (EdgeCalculator.cpp:26-56)
  score = exp(mean log p) over counted (non-N, in-window) positions.

Mosaic constraints discovered empirically on this toolchain (v5e):
- vector loads need dim-0 indices provably multiple of 8 and lane starts
  multiple of 128 -> load (8, W+128) tiles at aligned offsets and fix the
  residual shift d = pos % 128 with pltpu.roll;
- dynamic lane rotates are only correct on power-of-2 widths -> roll a
  (8, 2W) scratch (2W = 1024 for the W=512 bucket);
- rolling a dynamically-offset load directly mis-composes -> materialize
  the load into scratch first;
- uint8 -> f32 casts are unsupported -> qualities travel as int8;
- the kernel is GATHER-bound (a math-free variant runs within 5% of the
  full kernel), so base code and quality are pre-combined on HOST into one
  int16 word (code | qual<<3, 9 bits used) -> ONE vector load + roll +
  sublane select per task side instead of two.

Falls back to the XLA path off-TPU or when the packed matrices exceed the
VMEM budget (large-contig iterations, where batches are small anyway).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from ..core.reads import N_CODE, PAD_CODE

GROUP = 8  # tasks per gather sub-group (one aligned 8-row scratch write)
CHUNK = 65536  # tasks per pallas_call (SMEM scalar budget: 2 arrays x 256KB)
VMEM_BUDGET_BYTES = 14 * 1024 * 1024  # of the ~16MB scoped-vmem limit


def _tb_for_width(width: int) -> int:
    """Tasks per grid step. Scoped VMEM spent per step scales as TB*W:
    2 gather-scratch buffers PLUS ~3 live (TB, W) vector temporaries of
    the scoring math that Mosaic allocates on the vmem stack (measured:
    W=4096 TB=256 -> 25.7MB; W=4096 TB=96 -> fits; W=8192 TB=48 ->
    16.6MB, i.e. ~4.6 x TB*W*4 + input). Shrink TB as the width bucket
    grows; wide buckets have large per-row loads so small TB still
    amortizes the per-step DMA."""
    tb = min(32 * GROUP, (128 * 1024) // width)
    return max(GROUP, (tb // GROUP) * GROUP)


def _vmem_estimate(rows: int, width: int) -> int:
    """Scoped-VMEM bytes the kernel needs for an (rows, 2*width) packed
    matrix: input + 5x TB*W*4 (2 gather scratch + ~3 live math temps,
    measured multiplier ~4.6) + roll staging + ~1.5MB slack for outputs
    and alignment."""
    tb = _tb_for_width(width)
    inp = rows * 2 * width * 2             # int16 combined matrix
    step = 5 * tb * width * 4              # gather scratch + live temps
    stage = GROUP * 2 * width * 4          # sa_scr int32
    return inp + step + stage + (3 << 19)


@functools.lru_cache(maxsize=32)
def _build_kernel(width: int, mismatch_thresh: float):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = width          # power of two (>=256)
    LOADW = W + 128    # covers any 128-aligned window start
    ROLLW = 2 * W      # power-of-two roll width
    assert W & (W - 1) == 0 and W >= 256
    LOG10_OVER_10 = float(np.log(10.0) / 10.0)

    TB = _tb_for_width(W)  # tasks per grid step (amortizes per-step DMA)

    def kernel(rows_ref, posl_ref,                  # scalar prefetch (B,) SMEM
               comb_ref,                            # VMEM (R, 2W) int16, full
               sumlog_ref, counted_ref, mism_ref, rej_ref,  # (TB, 1)
               sa_scr, ga_scr, gb_scr, l_scr):
        # sa_scr: (GROUP, ROLLW) roll staging; ga/gb: (TB, W) gathered task
        # windows (combined code|qual<<3 words); l_scr: (TB, 1) bounds
        base = pl.program_id(0) * TB
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, W), 0)

        def gather_group(g, _):
            # statically-unrolled 8 tasks; their rows are concatenated and
            # flushed with one aligned scratch write (no loop-carried state)
            g8 = pl.multiple_of(g * GROUP, 8)
            a_rows = []
            b_rows = []
            l_vals = []
            for t in range(GROUP):
                packed_rows = rows_ref[base + g8 + t]
                packed_posl = posl_ref[base + g8 + t]
                row_a = packed_rows >> 16
                row_b = packed_rows & 0xFFFF
                p = packed_posl >> 16
                lt = packed_posl & 0xFFFF
                r8a = pl.multiple_of((row_a >> 3) << 3, 8)
                sub_a = row_a & 7
                r8b = pl.multiple_of((row_b >> 3) << 3, 8)
                sub_b = row_b & 7
                p128 = pl.multiple_of((p >> 7) << 7, 128)
                d = p & 127

                sa_scr[:, :LOADW] = comb_ref[pl.ds(r8a, 8),
                                             pl.ds(p128, LOADW)].astype(jnp.int32)
                # after a left-rotate by d (< 128), lanes [0, W) read from
                # [d, W+d) which stays inside the initialized LOADW region
                rolled = pltpu.roll(sa_scr[:, :], -d, 1)[:, :W]
                a_rows.append(jnp.sum(jnp.where(sub_iota == sub_a, rolled, 0),
                                      axis=0, keepdims=True))

                combined_b = comb_ref[pl.ds(r8b, 8), :W].astype(jnp.int32)
                b_rows.append(jnp.sum(jnp.where(sub_iota == sub_b, combined_b, 0),
                                      axis=0, keepdims=True))
                l_vals.append(jnp.full((1, 1), lt, jnp.int32))

            ga_scr[pl.ds(g8, GROUP), :] = jnp.concatenate(a_rows, axis=0)
            gb_scr[pl.ds(g8, GROUP), :] = jnp.concatenate(b_rows, axis=0)
            l_scr[pl.ds(g8, GROUP), :] = jnp.concatenate(l_vals, axis=0)
            return 0

        jax.lax.fori_loop(0, TB // GROUP, gather_group, 0)

        a_w = ga_scr[:, :]
        b_w = gb_scr[:, :]
        a = a_w & 7
        qa_v = a_w >> 3
        b = b_w & 7
        qb_v = b_w >> 3
        col = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
        valid = col < l_scr[:, :]
        either_n = (a >= N_CODE) | (b >= N_CODE)
        cm = valid & jnp.logical_not(either_n)

        p1 = jnp.exp(qa_v.astype(jnp.float32) * (-LOG10_OVER_10))
        p2 = jnp.exp(qb_v.astype(jnp.float32) * (-LOG10_OVER_10))
        match = a == b
        p_match = (1.0 - p1) * (1.0 - p2) + (p1 * p2) * (1.0 / 3.0)
        p_mis = (p1 * (1.0 - p2) + p2 * (1.0 - p1)) * (1.0 / 3.0) + (2.0 / 9.0) * (p1 * p2)
        p = jnp.where(match, p_match, p_mis)

        rejected = jnp.sum((cm & (p < mismatch_thresh)).astype(jnp.int32), axis=1)
        sum_log = jnp.sum(jnp.where(cm, jnp.log(p), 0.0), axis=1)
        counted = jnp.sum(cm.astype(jnp.int32), axis=1)
        mism = jnp.sum((cm & jnp.logical_not(match)).astype(jnp.int32), axis=1)

        sumlog_ref[:, 0] = sum_log
        counted_ref[:, 0] = counted
        mism_ref[:, 0] = mism
        rej_ref[:, 0] = rejected

    def run(combined2w, rows_packed, posl_packed):
        b = rows_packed.shape[0]
        assert b % TB == 0, f"batch {b} not a multiple of TB={TB}"
        nsteps = b // TB
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nsteps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((GROUP, ROLLW), jnp.int32),
                    pltpu.VMEM((TB, W), jnp.int32),
                    pltpu.VMEM((TB, W), jnp.int32),
                    pltpu.VMEM((TB, 1), jnp.int32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, 1), jnp.float32),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
            ],
        )(rows_packed, posl_packed, combined2w)
        return tuple(o.reshape(-1) for o in out)

    return jax.jit(run)


def pack_for_pallas(codes: np.ndarray, quals: np.ndarray) -> np.ndarray:
    """Combine (R, W) packed unit matrices into one (R, 2W) int16 matrix of
    code | qual<<3 words (9 bits used) for single-load in-kernel gathers;
    W is rounded up to a power of two >= 256."""
    r, w = codes.shape
    wp = 256
    while wp < w:
        wp *= 2
    comb = np.full((r, 2 * wp), PAD_CODE, dtype=np.int16)
    comb[:, :w] = (codes.astype(np.int16)
                   | (quals.astype(np.int16) << 3))
    return comb


def pallas_supported(codes: np.ndarray) -> bool:
    import jax

    try:
        if not any(d.platform in ("tpu", "axon") for d in jax.devices()):
            return False
    except Exception:
        return False
    r, w = codes.shape
    wp = 256
    while wp < w:
        wp *= 2
    return _vmem_estimate(r, wp) <= VMEM_BUDGET_BYTES


def score_tasks_pallas(
    codes: np.ndarray,
    quals: np.ndarray,
    unit_lens_by_row: np.ndarray,
    row_a: np.ndarray,
    row_b: np.ndarray,
    pos: np.ndarray,
    mismatch_thresh: float = 0.0,
    min_read_len: int = 0,
):
    """Device scoring via the Pallas kernel; same contract as
    score_tasks_jax (returns a TaskScores of numpy arrays)."""
    import jax.numpy as jnp

    from .score import TaskScores

    b = len(row_a)
    if b == 0:
        z = np.zeros(0)
        return TaskScores(z, z, z, z.astype(np.int64), z.astype(np.int64),
                          z.astype(bool))
    combined = pack_for_pallas(codes, quals)
    w = combined.shape[1] // 2
    lens = unit_lens_by_row.astype(np.int64)
    len_a = lens[row_a]
    len_b = lens[row_b]
    pos64 = pos.astype(np.int64)
    L = np.minimum(len_a - pos64, len_b)
    L = np.where(pos64 >= len_a, 0, L)

    assert codes.shape[0] < (1 << 16), "row ids must fit in 16 bits"
    rows_packed = ((row_a.astype(np.int64) << 16) | row_b.astype(np.int64)).astype(np.int32)
    posl_packed = ((pos64 << 16) | np.maximum(np.minimum(L, 0xFFFF), 0)).astype(np.int32)

    fn = _build_kernel(w, float(mismatch_thresh))
    tb = _tb_for_width(w)
    comb_d = jnp.asarray(combined)
    # dispatch ALL chunks before any host fetch: JAX dispatch is async, so
    # upload/kernel/download pipeline across chunks; a per-chunk
    # np.asarray would serialize one tunnel round-trip per chunk (~0.5s
    # each through the axon tunnel)
    dev_outs = []
    ns = []
    for start in range(0, b, CHUNK):
        end = min(start + CHUNK, b)
        n = end - start
        pad = (-n) % tb
        rp = rows_packed[start:end]
        pp = posl_packed[start:end]
        if pad:
            rp = np.concatenate([rp, np.zeros(pad, np.int32)])
            pp = np.concatenate([pp, np.zeros(pad, np.int32)])
        dev_outs.append(fn(comb_d, jnp.asarray(rp), jnp.asarray(pp)))
        ns.append(n)
    # concat per output column on device -> exactly 4 host transfers total
    cols = [jnp.concatenate([d[j][:n] for d, n in zip(dev_outs, ns)])
            if len(dev_outs) > 1 else dev_outs[0][j][:ns[0]]
            for j in range(4)]
    sum_log = np.asarray(cols[0]).astype(np.float64)
    counted = np.asarray(cols[1]).astype(np.int64)
    mism = np.asarray(cols[2]).astype(np.int64)
    rejected = np.asarray(cols[3]) > 0

    degenerate = (pos64 >= len_a) | (len_a < min_read_len) | (len_b < min_read_len) | (counted == 0)
    ok = ~degenerate & ~rejected
    with np.errstate(divide="ignore", invalid="ignore"):
        score = np.where(ok, np.exp(sum_log / np.maximum(counted, 1)), 0.0)
        mism_rate = np.where(ok, mism / np.maximum(counted, 1), 1.0)
    return TaskScores(score, mism_rate, sum_log, counted, mism, rejected)
