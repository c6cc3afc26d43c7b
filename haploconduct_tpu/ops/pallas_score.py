"""Pallas TPU kernel for batched overlap verification.

The XLA formulation of the scoring kernel (ops/score.py) is crippled on
TPU by the per-task shifted-window gather (take_along_axis lowers to a
scalar gather). This kernel keeps the packed read matrices resident in
VMEM (R x RW int16) and aligns each task's window with aligned vector
loads plus a dynamic lane rotate, then scores 8 tasks per grid step with
pure VPU math:

  per position: p1,p2 = 10^(-q/10);  p = match ? (1-p1)(1-p2)+p1p2/3
                : (p1(1-p2)+p2(1-p1))/3 + 2/9 p1p2  (EdgeCalculator.cpp:26-56)
  score = exp(mean log p) over counted (non-N, in-window) positions.

Length scaling (SURVEY hard-part #2): instead of per-width kernel
variants padded to power-of-two row widths, every task is decomposed on
host into fixed SEG=512-lane *segments* — subtask k compares
a[pos+k*SEG :] against b[k*SEG :] over min(SEG, L-k*SEG) lanes — and the
per-segment (sum_log, counted, mismatches, rejected) integers/floats are
summed back per task. One compiled kernel serves every stage (150bp reads
through kb-scale contigs), row widths need only be multiples of 128, and
per-step VMEM scales with SEG, not the longest contig.

Mosaic constraints discovered empirically on this toolchain (v5e):
- vector loads need dim-0 indices provably multiple of 8 and lane starts
  multiple of 128 -> load (8, SEG+128) tiles at aligned offsets and fix
  the residual shift d = pos % 128 with pltpu.roll;
- dynamic lane rotates are only correct on power-of-2 widths -> roll a
  (8, 1024) scratch;
- rolling a dynamically-offset load directly mis-composes -> materialize
  the load into scratch first;
- uint8 -> f32 casts are unsupported -> qualities travel as int8;
- the kernel is GATHER-bound (a math-free variant runs within 5% of the
  full kernel), so base code and quality are pre-combined on HOST into one
  int16 word (code | qual<<3, 9 bits used) -> ONE vector load + roll +
  sublane select per task side instead of two.

Falls back to the XLA path off-TPU or when the packed matrix exceeds the
VMEM budget (handled upstream by verify_overlaps via pallas_supported).
"""

from __future__ import annotations

import functools

import numpy as np

from ..core.reads import N_CODE, PAD_CODE

GROUP = 8        # tasks per gather sub-group (one aligned 8-row scratch write)
SEG = 512        # compare lanes per subtask (segment)
LOADW = SEG + 128  # A-side aligned load covers any 128-aligned window start
ROLLW = 1024     # power-of-two roll width >= LOADW
TB = 256         # subtasks per grid step
CHUNK = 32768    # subtasks per pallas_call (SMEM budget: 4 arrays x 128KB)
VMEM_BUDGET_BYTES = 14 * 1024 * 1024  # of the ~16MB scoped-vmem limit


def _row_width(w: int) -> int:
    """Packed row width for a longest-unit length w: multiple of 128 with
    LOADW slack so any in-bounds A-side aligned load stays in-bounds."""
    return ((w + 127) // 128) * 128 + LOADW


def _vmem_estimate(rows: int, width: int) -> int:
    """Scoped-VMEM bytes for an (rows, _row_width(width)) int16 matrix:
    input + ~5x TB*SEG*4 (2 gather scratch + ~3 live math temps, measured
    multiplier ~4.6) + roll staging + slack for outputs and alignment."""
    inp = rows * _row_width(width) * 2
    step = 5 * TB * SEG * 4
    stage = GROUP * ROLLW * 4
    return inp + step + stage + (3 << 19)


@functools.lru_cache(maxsize=8)
def _build_kernel(mismatch_thresh: float, resident: bool = True):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LOG10_OVER_10 = float(np.log(10.0) / 10.0)

    def kernel(rowa_ref, rowb_ref, posa_ref, bolen_ref,  # scalar prefetch (B,) SMEM
               comb_ref,                             # VMEM (R, RW) int16, full
               sumlog_ref, counted_ref, mism_ref, rej_ref,  # (TB, 1)
               sa_scr, ga_scr, gb_scr, l_scr):
        # sa_scr: (GROUP, ROLLW) roll staging; ga/gb: (TB, SEG) gathered
        # segment windows (combined code|qual<<3 words); l_scr: (TB, 1)
        # rowa/rowb are full int32 row ids (no 16-bit packing) so the kernel
        # serves ANY packed-matrix height — the reference streams unbounded
        # overlap chunks (src/EdgeCalculator.cpp:571-644) and its operating
        # envelope (500-1000x coverage/patch, savage/README.md:313-319) far
        # exceeds 32k reads per patch.
        base = pl.program_id(0) * TB
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, SEG), 0)

        def gather_group(g, _):
            # statically-unrolled 8 tasks; their rows are concatenated and
            # flushed with one aligned scratch write (no loop-carried state)
            g8 = pl.multiple_of(g * GROUP, 8)
            a_rows = []
            b_rows = []
            l_vals = []
            for t in range(GROUP):
                row_a = rowa_ref[base + g8 + t]
                row_b = rowb_ref[base + g8 + t]
                pa = posa_ref[base + g8 + t]          # pos + k*SEG (A side)
                bl = bolen_ref[base + g8 + t]         # (k*SEG << 10) | seg_len
                bo = pl.multiple_of((bl >> 10) << 9, 128)  # k*SEG, 128-aligned
                lt = bl & 1023
                r8a = pl.multiple_of((row_a >> 3) << 3, 8)
                sub_a = row_a & 7
                r8b = pl.multiple_of((row_b >> 3) << 3, 8)
                sub_b = row_b & 7
                p128 = pl.multiple_of((pa >> 7) << 7, 128)
                d = pa & 127

                sa_scr[:, :LOADW] = comb_ref[pl.ds(r8a, 8),
                                             pl.ds(p128, LOADW)].astype(jnp.int32)
                # after a left-rotate by d (< 128), lanes [0, SEG) read from
                # [d, SEG+d) which stays inside the initialized LOADW region
                rolled = pltpu.roll(sa_scr[:, :], -d, 1)[:, :SEG]
                a_rows.append(jnp.sum(jnp.where(sub_iota == sub_a, rolled, 0),
                                      axis=0, keepdims=True))

                combined_b = comb_ref[pl.ds(r8b, 8),
                                      pl.ds(bo, SEG)].astype(jnp.int32)
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
        col = jax.lax.broadcasted_iota(jnp.int32, (TB, SEG), 1)
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

    def kernel_hbm(rowa_ref, rowb_ref, posa_ref, bolen_ref,  # scalar prefetch (B,) SMEM
                   comb_ref,                        # ANY/HBM (R, RW) int16
                   sumlog_ref, counted_ref, mism_ref, rej_ref,  # (TB, 1)
                   a_buf, b_buf, ga_scr, gb_scr, l_scr, sems):
        # Matrix too large for VMEM: per-task (8, LOADW)/(8, SEG) row tiles
        # are DMA'd HBM->VMEM, double-buffered across GROUP-sized batches.
        # a_buf: (2, GROUP, 8, ROLLW) int16 (A tiles land in [:, :LOADW]);
        # b_buf: (2, GROUP, 8, SEG) int16; sems: (2, GROUP, 2) DMA sems.
        base = pl.program_id(0) * TB
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, SEG), 0)
        n_groups = TB // GROUP

        def start_group(g, slot):
            g8 = g * GROUP

            def start_one(t, _):
                row_a = rowa_ref[base + g8 + t]
                row_b = rowb_ref[base + g8 + t]
                pa = posa_ref[base + g8 + t]
                bl = bolen_ref[base + g8 + t]
                bo = pl.multiple_of((bl >> 10) << 9, 128)
                r8a = pl.multiple_of((row_a >> 3) << 3, 8)
                r8b = pl.multiple_of((row_b >> 3) << 3, 8)
                p128 = pl.multiple_of((pa >> 7) << 7, 128)
                pltpu.make_async_copy(
                    comb_ref.at[pl.ds(r8a, 8), pl.ds(p128, LOADW)],
                    a_buf.at[slot, t, :, :LOADW],
                    sems.at[slot, t, 0],
                ).start()
                pltpu.make_async_copy(
                    comb_ref.at[pl.ds(r8b, 8), pl.ds(bo, SEG)],
                    b_buf.at[slot, t],
                    sems.at[slot, t, 1],
                ).start()
                return 0

            jax.lax.fori_loop(0, GROUP, start_one, 0, unroll=True)

        def wait_group(slot):
            def wait_one(t, _):
                pltpu.make_async_copy(
                    comb_ref.at[pl.ds(0, 8), pl.ds(0, LOADW)],
                    a_buf.at[slot, t, :, :LOADW],
                    sems.at[slot, t, 0],
                ).wait()
                pltpu.make_async_copy(
                    comb_ref.at[pl.ds(0, 8), pl.ds(0, SEG)],
                    b_buf.at[slot, t],
                    sems.at[slot, t, 1],
                ).wait()
                return 0

            jax.lax.fori_loop(0, GROUP, wait_one, 0, unroll=True)

        start_group(0, 0)

        def process_group(g, _):
            slot = jax.lax.rem(g, 2)

            @pl.when(g + 1 < n_groups)
            def _():
                start_group(g + 1, jax.lax.rem(g + 1, 2))

            wait_group(slot)
            g8 = pl.multiple_of(g * GROUP, 8)
            a_rows = []
            b_rows = []
            l_vals = []
            for t in range(GROUP):
                row_a = rowa_ref[base + g8 + t]
                row_b = rowb_ref[base + g8 + t]
                pa = posa_ref[base + g8 + t]
                bl = bolen_ref[base + g8 + t]
                lt = bl & 1023
                sub_a = row_a & 7
                sub_b = row_b & 7
                d = pa & 127
                rolled = pltpu.roll(
                    a_buf[slot, t].astype(jnp.int32), -d, 1)[:, :SEG]
                a_rows.append(jnp.sum(jnp.where(sub_iota == sub_a, rolled, 0),
                                      axis=0, keepdims=True))
                combined_b = b_buf[slot, t].astype(jnp.int32)
                b_rows.append(jnp.sum(jnp.where(sub_iota == sub_b, combined_b, 0),
                                      axis=0, keepdims=True))
                l_vals.append(jnp.full((1, 1), lt, jnp.int32))
            ga_scr[pl.ds(g8, GROUP), :] = jnp.concatenate(a_rows, axis=0)
            gb_scr[pl.ds(g8, GROUP), :] = jnp.concatenate(b_rows, axis=0)
            l_scr[pl.ds(g8, GROUP), :] = jnp.concatenate(l_vals, axis=0)
            return 0

        jax.lax.fori_loop(0, n_groups, process_group, 0)

        a_w = ga_scr[:, :]
        b_w = gb_scr[:, :]
        a = a_w & 7
        qa_v = a_w >> 3
        b = b_w & 7
        qb_v = b_w >> 3
        col = jax.lax.broadcasted_iota(jnp.int32, (TB, SEG), 1)
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

    if resident:
        chosen_kernel = kernel
        in_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((GROUP, ROLLW), jnp.int32),
            pltpu.VMEM((TB, SEG), jnp.int32),
            pltpu.VMEM((TB, SEG), jnp.int32),
            pltpu.VMEM((TB, 1), jnp.int32),
        ]
    else:
        chosen_kernel = kernel_hbm
        in_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((2, GROUP, 8, ROLLW), jnp.int16),
            pltpu.VMEM((2, GROUP, 8, SEG), jnp.int16),
            pltpu.VMEM((TB, SEG), jnp.int32),
            pltpu.VMEM((TB, SEG), jnp.int32),
            pltpu.VMEM((TB, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2, GROUP, 2)),
        ]

    def run(comb, rowa, rowb, posa, bolen):
        b = rowa.shape[0]
        assert b % TB == 0, f"batch {b} not a multiple of TB={TB}"
        nsteps = b // TB
        out = pl.pallas_call(
            chosen_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(nsteps,),
                in_specs=[in_spec],
                out_specs=[
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                ],
                scratch_shapes=scratch,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, 1), jnp.float32),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
                jax.ShapeDtypeStruct((b, 1), jnp.int32),
            ],
        )(rowa, rowb, posa, bolen, comb)
        return tuple(o.reshape(-1) for o in out)

    return jax.jit(run)


def pack_for_pallas(codes: np.ndarray, quals: np.ndarray) -> np.ndarray:
    """Combine (R, W) packed unit matrices into one (R, RW) int16 matrix of
    code | qual<<3 words (9 bits used) for single-load in-kernel gathers;
    RW = W rounded up to a multiple of 128 plus LOADW slack so aligned
    in-bounds window loads never run off the row."""
    r, w = codes.shape
    rw = _row_width(w)
    r8 = ((r + 7) // 8) * 8  # 8-row tiles must be fully addressable (DMA)
    comb = np.full((r8, rw), PAD_CODE, dtype=np.int16)
    comb[:r, :w] = (codes.astype(np.int16)
                    | (quals.astype(np.int16) << 3))
    return comb


def pallas_supported(codes: np.ndarray) -> bool:
    """True on TPU for any matrix size: matrices within the VMEM budget run
    the resident kernel, larger ones the HBM-DMA kernel. No row-count cap:
    row ids travel as full int32 scalars."""
    import jax

    try:
        return any(d.platform in ("tpu", "axon") for d in jax.devices())
    except Exception:
        return False


def _fits_vmem(codes: np.ndarray) -> bool:
    r, w = codes.shape
    return _vmem_estimate(r, w) <= VMEM_BUDGET_BYTES


def segment_tasks(row_a, row_b, pos, L):
    """Decompose tasks into SEG-lane subtasks.

    Returns (s_rowa, s_rowb, s_posa, s_bolen, task_bounds) where
    task_bounds are np.add.reduceat boundaries mapping subtask outputs back
    to tasks. Row ids stay full int32 (no 16-bit packing), so the subtask
    stream addresses packed matrices of any height. Degenerate tasks
    (L <= 0) get one zero-length subtask so every task produces exactly one
    reduction slot.
    """
    L = np.maximum(L, 0)
    nseg = np.maximum((L + SEG - 1) // SEG, 1).astype(np.int64)
    total = int(nseg.sum())
    task_of = np.repeat(np.arange(len(L), dtype=np.int64), nseg)
    bounds = np.concatenate([[0], np.cumsum(nseg)[:-1]])
    k = np.arange(total, dtype=np.int64) - np.repeat(bounds, nseg)
    bo = k * SEG
    seg_len = np.minimum(L[task_of] - bo, SEG)
    s_rowa = row_a[task_of].astype(np.int32)
    s_rowb = row_b[task_of].astype(np.int32)
    s_posa = (pos[task_of].astype(np.int64) + bo).astype(np.int32)
    s_bolen = ((k << 10) | seg_len).astype(np.int32)
    return s_rowa, s_rowb, s_posa, s_bolen, bounds


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
    lens = unit_lens_by_row.astype(np.int64)
    len_a = lens[row_a]
    len_b = lens[row_b]
    pos64 = pos.astype(np.int64)
    L = np.minimum(len_a - pos64, len_b)
    L = np.where(pos64 >= len_a, 0, L)

    s_rowa, s_rowb, s_posa, s_bolen, bounds = segment_tasks(
        row_a.astype(np.int64), row_b.astype(np.int64), pos64, L)
    n_sub = len(s_rowa)

    fn = _build_kernel(float(mismatch_thresh), _fits_vmem(codes))
    # device-resident matrix across iterations: unchanged rows are reused
    # from the previous upload on device, only changed rows travel
    # (ops/device_cache.py; disable with HC_DEVICE_CACHE=0)
    from .device_cache import comb_for_device

    comb_d = comb_for_device(codes, quals, unit_lens_by_row.astype(np.int64),
                             combined)
    # dispatch ALL chunks before any host fetch: JAX dispatch is async, so
    # upload/kernel/download pipeline across chunks; a per-chunk
    # np.asarray would serialize one tunnel round-trip per chunk (~0.5s
    # each through the axon tunnel)
    dev_outs = []
    ns = []
    for start in range(0, n_sub, CHUNK):
        end = min(start + CHUNK, n_sub)
        n = end - start
        pad = (-n) % TB
        cols_in = [s_rowa[start:end], s_rowb[start:end],
                   s_posa[start:end], s_bolen[start:end]]
        if pad:
            cols_in = [np.concatenate([c, np.zeros(pad, np.int32)])
                       for c in cols_in]
        dev_outs.append(fn(comb_d, *(jnp.asarray(c) for c in cols_in)))
        ns.append(n)
    # concat per output column on device -> exactly 4 host transfers total
    cols = [jnp.concatenate([d[j][:n] for d, n in zip(dev_outs, ns)])
            if len(dev_outs) > 1 else dev_outs[0][j][:ns[0]]
            for j in range(4)]
    from .score import reduce_segments_to_tasks

    return reduce_segments_to_tasks(cols, bounds, pos64, len_a, len_b,
                                    int(min_read_len))
