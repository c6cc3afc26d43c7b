"""Device-resident packed-matrix cache (ops/device_cache.py): the
assembled matrix must be bit-identical to a fresh pack_for_pallas upload
in every reuse scenario (forwarded units, orientation flips, width
growth, shrinkage), and the transfer accounting must show the reuse."""

import numpy as np
import pytest

from haploconduct_tpu.core.reads import ReadStore
from haploconduct_tpu.ops.device_cache import (CombCache, TRANSFER_STATS,
                                               reset_stats)
from haploconduct_tpu.ops.pallas_score import pack_for_pallas


def _store(units):
    st = ReadStore()
    for i, (codes, quals) in enumerate(units):
        st.add_single_codes(i, np.asarray(codes, np.int8),
                            np.asarray(quals, np.uint8))
    st.readcount_single = len(units)
    return st


def _args(st):
    packed = st.pack()
    combined = pack_for_pallas(packed.codes, packed.quals)
    lens_by_row = np.concatenate([packed.lens, packed.lens]).astype(np.int64)
    return packed, combined, lens_by_row


def _rng_unit(rng, n):
    return rng.integers(0, 4, n).astype(np.int8), \
        rng.integers(10, 40, n).astype(np.uint8)


def _get(cache, st):
    packed, combined, lens_by_row = _args(st)
    out = cache.get(packed.codes, packed.quals, lens_by_row, combined)
    return np.asarray(out), combined


def test_identical_second_iteration_reuses_all_rows():
    rng = np.random.default_rng(0)
    st = _store([_rng_unit(rng, 40) for _ in range(10)])
    cache = CombCache()
    reset_stats()
    got1, want1 = _get(cache, st)
    assert (got1 == want1).all()
    got2, want2 = _get(cache, st)
    assert (got2 == want2).all()
    assert TRANSFER_STATS["reused_rows"] == 20  # all fwd+rev rows
    # second iteration uploaded nothing
    assert TRANSFER_STATS["uploaded_bytes"] == want1.nbytes


def test_mixed_changes_width_growth_and_flip():
    rng = np.random.default_rng(1)
    units = [_rng_unit(rng, 30 + i) for i in range(12)]
    st1 = _store(units)
    cache = CombCache()
    reset_stats()
    got1, want1 = _get(cache, st1)
    assert (got1 == want1).all()

    # next iteration: unit 0..5 forwarded (same arrays), unit 6 stored
    # reverse-complemented (content = old rev row), units 7+ replaced by
    # longer consensus sequences (width grows)
    from haploconduct_tpu.core.reads import revcomp_codes

    next_units = [units[i] for i in range(6)]
    next_units.append((revcomp_codes(units[6][0]), units[6][1][::-1]))
    for i in range(4):
        next_units.append(_rng_unit(rng, 80 + i))
    st2 = _store(next_units)
    got2, want2 = _get(cache, st2)
    assert got2.shape == want2.shape
    assert (got2 == want2).all()
    assert TRANSFER_STATS["reused_rows"] >= 14  # 7 units x fwd+rev
    assert TRANSFER_STATS["uploaded_bytes"] < TRANSFER_STATS["full_bytes"]

    # a third iteration that shrinks back must also be exact
    st3 = _store(next_units[:4])
    got3, want3 = _get(cache, st3)
    assert (got3 == want3).all()


def test_disable_env(monkeypatch):
    monkeypatch.setenv("HC_DEVICE_CACHE", "0")
    rng = np.random.default_rng(2)
    st = _store([_rng_unit(rng, 25) for _ in range(6)])
    cache = CombCache()
    reset_stats()
    got1, want1 = _get(cache, st)
    got2, want2 = _get(cache, st)
    assert (got2 == want2).all()
    assert TRANSFER_STATS["reused_rows"] == 0
    assert TRANSFER_STATS["uploaded_bytes"] == 2 * want1.nbytes
