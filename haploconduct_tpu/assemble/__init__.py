"""Assembly pipeline: superread construction, overlap induction (FNO),
branch reduction, the per-iteration driver, and stage convergence loops."""
