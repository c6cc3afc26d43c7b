"""Experiment: does candidate-generation recall limit stage-a contig length?

Runs SAVAGE stage a on savage/example with the k-mer engine at different k
(k=12 with a high max_group is near-exhaustive for gapless overlaps) and
prints the converged contig length profile for each.
"""
import sys
import time

import numpy as np

from haploconduct_tpu.core.reads import ReadStore
from haploconduct_tpu.io.sfo import sfo_to_overlaps
from haploconduct_tpu.ops.kmer import find_overlap_candidates
from haploconduct_tpu.assemble.stages import StageParams, run_stage

EXAMPLE = "/root/reference/savage/example/input_fas"


def candidates(store, min_overlap_len, k, max_group):
    ns = store.readcount_single
    npair = len(store) - ns
    seqs = [store.unit_codes(store.unit1[i]) for i in range(ns)]
    seqs += [store.unit_codes(store.unit1[ns + i]) for i in range(npair)]
    seqs += [store.unit_codes(store.unit2[ns + i]) for i in range(npair)]
    sfo_len = int(round(min_overlap_len / 2)) if npair > 0 else min_overlap_len
    sfo = find_overlap_candidates(seqs, min_overlap_len=sfo_len, k=k,
                                  error_rate=0.02, max_group=max_group)
    return sfo_to_overlaps(sfo, num_singles=ns, num_pairs=npair)


def main():
    store = ReadStore.from_files(
        singles=f"{EXAMPLE}/singles.fastq",
        paired1=f"{EXAMPLE}/paired1.fastq", paired2=f"{EXAMPLE}/paired2.fastq")
    for k, mg in [(20, 2000), (12, 100000)]:
        t0 = time.time()
        ov = candidates(store, 200, k, mg)
        t1 = time.time()
        params = StageParams(
            stage="a", min_overlap_len=200, edge_threshold=0.97,
            clique_size_EC=4, remove_branches=True, max_tip_len=251,
            original_readcount=len(store), backend="jax")
        res = run_stage(params, store, ov)
        t2 = time.time()
        lens = sorted((res.store.read_len(i) for i in range(len(res.store))),
                      reverse=True)
        print(f"k={k} max_group={mg}: {len(ov)} candidates ({t1-t0:.1f}s), "
              f"{len(lens)} contigs, {sum(lens)} bp, "
              f">=1kb: {sum(1 for l in lens if l >= 1000)} "
              f"({sum(l for l in lens if l >= 1000)} bp), stage {t2-t1:.1f}s")
        print("  top:", lens[:12])
    return 0


if __name__ == "__main__":
    sys.exit(main())
