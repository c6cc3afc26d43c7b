"""Device-resident packed-matrix cache across assembly iterations.

The reference re-reads and re-writes every read each iteration
(fastq/overlaps round trip per ViralQuasispecies invocation); round 1-3
of this rebuild kept the driver resident but still re-uploaded the full
packed read matrix to the device every iteration. Most units survive an
iteration unchanged — trivial superreads forward the original arrays,
and merge iterations only rewrite merged contigs — so the upload is
mostly redundant (SURVEY §7 hard part 5; VERDICT r3 task 7).

This cache keeps the previous iteration's combined (code | qual<<3)
matrix ON DEVICE and assembles the next iteration's matrix there:
unchanged rows are gathered from the old device buffer, only changed
rows travel host->device. Rows are matched by unpadded CONTENT
(codes+quals bytes), which also catches orientation flips — a unit
stored reverse-complemented this iteration matches the old matrix's
reverse row and vice versa (pack() lays out rows [0,U) forward,
[U,2U) revcomp).

Correctness: the assembled matrix is bit-identical to a fresh
pack_for_pallas upload (tested by reconstructing in numpy and, under
RUN_TPU, comparing device buffers), so scores are unchanged by
construction. Disable with HC_DEVICE_CACHE=0.

TRANSFER_STATS counts the bytes a full upload would have moved vs the
bytes actually moved — the measurement VERDICT r3 task 7 asks for.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..core.reads import PAD_CODE

TRANSFER_STATS = {"full_bytes": 0, "uploaded_bytes": 0, "iterations": 0,
                  "reused_rows": 0, "changed_rows": 0}


def reset_stats() -> None:
    for k in TRANSFER_STATS:
        TRANSFER_STATS[k] = 0


def _row_keys(codes: np.ndarray, quals: np.ndarray,
              lens_by_row: np.ndarray) -> list:
    """Per packed row (fwd rows then rev rows), the unpadded content key."""
    keys = []
    for r in range(len(lens_by_row)):
        n = int(lens_by_row[r])
        keys.append(codes[r, :n].tobytes() + quals[r, :n].tobytes())
    return keys


class CombCache:
    """One device-resident combined matrix, replaced each iteration."""

    def __init__(self):
        self.comb_dev = None          # jax.Array (R, RW) int16
        self.keymap: Optional[Dict[bytes, int]] = None
        self.shape = None

    def enabled(self) -> bool:
        return os.environ.get("HC_DEVICE_CACHE") != "0"

    def get(self, codes: np.ndarray, quals: np.ndarray,
            lens_by_row: np.ndarray, combined: np.ndarray):
        """Device matrix for `combined` (= pack_for_pallas(codes, quals)),
        reusing unchanged rows of the previous iteration's matrix."""
        import jax
        import jax.numpy as jnp

        full_bytes = combined.nbytes
        TRANSFER_STATS["iterations"] += 1
        TRANSFER_STATS["full_bytes"] += full_bytes

        new_keys = _row_keys(codes, quals, lens_by_row)
        r_new, rw_new = combined.shape

        reuse_old = []
        reuse_new = []
        changed = []
        if self.enabled() and self.keymap is not None:
            for r, key in enumerate(new_keys):
                old = self.keymap.get(key)
                if old is not None:
                    reuse_old.append(old)
                    reuse_new.append(r)
                else:
                    changed.append(r)
        else:
            changed = list(range(len(new_keys)))

        # pure-pad tail rows (r8 rounding) are changed-free by construction
        if not reuse_old or len(reuse_old) < len(new_keys) // 2:
            # cold start or mostly-changed: one full upload is cheaper than
            # a gather over a minority of rows
            comb_dev = jnp.asarray(combined)
            TRANSFER_STATS["uploaded_bytes"] += full_bytes
            TRANSFER_STATS["changed_rows"] += len(new_keys)
        else:
            old_dev = self.comb_dev
            rw_old = self.shape[1]
            w = min(rw_old, rw_new)
            gather = jnp.asarray(np.asarray(reuse_old, np.int32))
            scatter = jnp.asarray(np.asarray(reuse_new, np.int32))
            base = jnp.full((r_new, rw_new), np.int16(PAD_CODE), jnp.int16)
            base = base.at[scatter, :w].set(old_dev[gather, :w])
            if changed:
                ch_idx = np.asarray(changed, np.int32)
                ch_rows = combined[ch_idx]
                base = base.at[jnp.asarray(ch_idx)].set(jnp.asarray(ch_rows))
                TRANSFER_STATS["uploaded_bytes"] += ch_rows.nbytes
            comb_dev = base
            TRANSFER_STATS["reused_rows"] += len(reuse_old)
            TRANSFER_STATS["changed_rows"] += len(changed)

        self.comb_dev = comb_dev
        self.keymap = {k: r for r, k in enumerate(new_keys)}
        self.shape = (r_new, rw_new)
        return comb_dev


_cache = CombCache()


def comb_for_device(codes: np.ndarray, quals: np.ndarray,
                    lens_by_row: np.ndarray, combined: np.ndarray):
    return _cache.get(codes, quals, lens_by_row, combined)


def assemble_reference_numpy(old_comb: np.ndarray, reuse_old, reuse_new,
                             changed, combined: np.ndarray) -> np.ndarray:
    """Numpy model of the device assembly (for tests): must equal
    `combined` exactly when the row mapping is correct."""
    r_new, rw_new = combined.shape
    w = min(old_comb.shape[1], rw_new)
    out = np.full((r_new, rw_new), np.int16(PAD_CODE), np.int16)
    out[np.asarray(reuse_new, np.int64), :w] = \
        old_comb[np.asarray(reuse_old, np.int64), :w]
    if len(changed):
        out[np.asarray(changed, np.int64)] = combined[np.asarray(changed, np.int64)]
    return out
