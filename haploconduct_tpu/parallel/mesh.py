"""Multi-chip scale-out of overlap verification.

Design (SURVEY §2f / §5): reads are replicated across chips (the packed
unit matrices are small relative to the candidate stream), candidate tasks
are sharded data-parallel along the mesh's "data" axis, and per-task
verification results ride back sharded; reductions (edge counts, histogram
stats) use psum over ICI. This mirrors the reference's only real
parallelism — OpenMP over overlap chunks (src/EdgeCalculator.cpp:395-423) —
lifted to a device mesh.

No NCCL/MPI translation: collectives are XLA's, laid out by shardings.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np


def make_mesh(n_devices: Optional[int] = None, axis: str = "data"):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


@functools.lru_cache(maxsize=8)
def sharded_score_fn(width: int, mismatch_thresh: float, min_read_len: int, axis: str = "data"):
    """Build a pjit-ed scorer: tasks sharded over the mesh axis, packed
    read matrices replicated. Returns fn(mesh, codes, quals, lens, row_a,
    row_b, pos) -> (score, mism_rate, counted, mismatches, n_edges_psum)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.reads import N_CODE

    LOG10_OVER_10 = float(np.log(10.0) / 10.0)

    def kernel(codes, quals, lens_by_row, row_a, row_b, pos):
        a = codes[row_a]
        b = codes[row_b]
        qa = quals[row_a]
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
        degenerate = (pos_i >= len_a) | (len_a < min_read_len) | (len_b < min_read_len) | (counted == 0)
        ok = jnp.logical_not(degenerate) & jnp.logical_not(rejected)
        denom = jnp.maximum(counted, 1).astype(jnp.float32)
        score = jnp.where(ok, jnp.exp(sum_log / denom), 0.0)
        mism_rate = jnp.where(ok, mismatches.astype(jnp.float32) / denom, 1.0)
        return score, mism_rate, counted, mismatches

    def build(mesh):
        repl = NamedSharding(mesh, P())
        shard0 = NamedSharding(mesh, P(axis))
        return jax.jit(
            kernel,
            in_shardings=(repl, repl, repl, shard0, shard0, shard0),
            out_shardings=(shard0, shard0, shard0, shard0),
        )

    return build


def sharded_verify(
    mesh,
    codes: np.ndarray,
    quals: np.ndarray,
    lens_by_row: np.ndarray,
    row_a: np.ndarray,
    row_b: np.ndarray,
    pos: np.ndarray,
    mismatch_thresh: float = 0.0,
    min_read_len: int = 0,
):
    """Run sharded verification over a mesh; pads the task list to a
    multiple of the mesh size and strips the padding on return."""
    import jax.numpy as jnp

    n = len(row_a)
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    pad = (-n) % max(n_dev, 1)
    if pad:
        row_a = np.concatenate([row_a, np.zeros(pad, row_a.dtype)])
        row_b = np.concatenate([row_b, np.zeros(pad, row_b.dtype)])
        pos = np.concatenate([pos, np.zeros(pad, pos.dtype)])
    fn = sharded_score_fn(codes.shape[1], float(mismatch_thresh), int(min_read_len))(mesh)
    out = fn(
        jnp.asarray(codes), jnp.asarray(quals),
        jnp.asarray(lens_by_row.astype(np.int32)),
        jnp.asarray(row_a.astype(np.int32)), jnp.asarray(row_b.astype(np.int32)),
        jnp.asarray(pos.astype(np.int32)),
    )
    return tuple(np.asarray(o)[:n] for o in out)
