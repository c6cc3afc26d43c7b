"""Shared small fixtures for tests."""

import numpy as np

from haploconduct_tpu.core.reads import ReadStore
from haploconduct_tpu.io.overlaps import make_overlaps

TEMPLATE = ("ACGGTTACGATCGATTACGGCATTACGGATCGGATACGATCAGGCATTACGATCAGGCTA"
            "TTACGGATCAGGCATCGATTACGGCATTACCCGATCGATTACGGCATTACGGATCGGATT" * 3)


def chain_store_and_overlaps(n=6, length=80, step=40):
    store = ReadStore()
    for i in range(n):
        start = (i * step) % (len(TEMPLATE) - length)
        store.add_single(i, TEMPLATE[start:start + length], "I" * length)
    store.readcount_single = n
    ids1, ids2, pos = [], [], []
    for i in range(n - 1):
        ids1.append(i)
        ids2.append(i + 1)
        pos.append(step)
    ov_len = length - step
    ov = make_overlaps(
        id1=np.array(ids1), id2=np.array(ids2), pos1=np.array(pos),
        len1=np.full(len(ids1), ov_len),
        perc1=np.full(len(ids1), min(100 * ov_len // length, 100)))
    return store, ov
