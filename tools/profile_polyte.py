"""Profile a synthetic POLYTE diploid run at SCALE x the bundled example
(two haplotypes, hap_cov per haplotype as in the reference envelope),
printing top cumulative hotspots — drives branch-reduction/evidence and
per-iteration re-overlap decisions with measurements instead of guesses."""
import cProfile, pstats, sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from haploconduct_tpu.core.reads import ReadStore
from haploconduct_tpu.utils.simulate import random_genome, mutate_sequence, simulate_reads
from haploconduct_tpu.workflows.polyte import PolyteConfig, run_polyte

GENOME = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
BACKEND = sys.argv[2] if len(sys.argv) > 2 else "native"
TOP = int(sys.argv[3]) if len(sys.argv) > 3 else 25

rng = np.random.default_rng(0)
hap1 = random_genome(rng, GENOME)
hap2 = mutate_sequence(hap1, rng, sub_rate=0.01)
seqs, quals = simulate_reads([hap1, hap2], coverage=20, read_len=150, rng=rng,
                             error_rate=0.002)
store = ReadStore()
for i, (sq, q) in enumerate(zip(seqs, quals)):
    store.add_single(i, sq, q)
store.readcount_single = len(seqs)
print(f"{len(store)} reads over {GENOME}bp x2 haplotypes")

cfg = PolyteConfig(hap_cov=20, insert_size=150, stddev=15, backend=BACKEND,
                   min_overlap_len=60, min_overlap_len_EC=77, diploid=True,
                   candidates="host")
prof = cProfile.Profile()
t0 = time.time()
prof.enable()
res = run_polyte(store, cfg)
prof.disable()
n = len(res.store) if res.store else 0
print(f"polyte: {time.time()-t0:.1f}s, {n} contigs, {res.iterations} iterations")
pstats.Stats(prof).sort_stats("cumulative").print_stats(TOP)
