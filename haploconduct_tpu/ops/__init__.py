"""Device kernels and their host oracles.

- score: pairwise quality-aware overlap scoring (the hot loop; reference
  src/EdgeCalculator.cpp:26-139)
- verify: overlap -> edge-candidate planning/combination (the 4x4 type/
  orientation case algebra of src/EdgeCalculator.cpp:143-385)
- consensus: position-wise Bayesian base calling for superreads
- kmer: k-mer seeded overlap candidate generation (replaces rust-overlaps)
"""
