"""Time POLYTE's branch-reduction evidence scan at scale (VERDICT r3
task 6's before/after measurement).

Runs the synthetic diploid POLYTE workload of tools/profile_polyte.py
(GENOME bp x 2 haplotypes at 20x/hap) and reports total wall-clock plus
the time spent inside BranchReduction (phase timers), printing one JSON
line. Run in both trees for a before/after:

    python tools/br_scale_bench.py 50000            # this tree
    git worktree add /tmp/br_before <pre-batch-rev>
    (cd /tmp/br_before && python tools/br_scale_bench.py 50000)

Reference anchor: the serial per-subread evidence scan this replaces,
/root/reference/src/BranchReduction.cpp:716-743.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from haploconduct_tpu.core.reads import ReadStore
from haploconduct_tpu.utils.simulate import (mutate_sequence, random_genome,
                                             simulate_reads)
from haploconduct_tpu.workflows.polyte import PolyteConfig, run_polyte

GENOME = int(sys.argv[1]) if len(sys.argv) > 1 else 50000

rng = np.random.default_rng(0)
hap1 = random_genome(rng, GENOME)
hap2 = mutate_sequence(hap1, rng, sub_rate=0.01)
seqs, quals = simulate_reads([hap1, hap2], coverage=20, read_len=150,
                             rng=rng, error_rate=0.002)
store = ReadStore()
for i, (sq, q) in enumerate(zip(seqs, quals)):
    store.add_single(i, sq, q)
store.readcount_single = len(seqs)

import haploconduct_tpu.assemble.branch_reduction as BR

_orig = BR.BranchReduction.run
br_time = [0.0]


def timed_run(self, *a, **kw):
    t0 = time.perf_counter()
    r = _orig(self, *a, **kw)
    br_time[0] += time.perf_counter() - t0
    return r


BR.BranchReduction.run = timed_run

cfg = PolyteConfig(hap_cov=20, insert_size=150, stddev=15, backend="native",
                   min_overlap_len=60, min_overlap_len_EC=77, diploid=True,
                   candidates="host")
t0 = time.time()
res = run_polyte(store, cfg)
wall = time.time() - t0
print(json.dumps({
    "metric": f"polyte {GENOME//1000}kb diploid end-to-end",
    "n_reads": len(store),
    "wall_s": round(wall, 1),
    "branch_reduction_s": round(br_time[0], 1),
    "contigs": len(res.store) if res.store else 0,
    "iterations": res.iterations,
    "unit": "s",
}))
