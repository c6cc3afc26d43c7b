"""End-to-end workflows: SAVAGE (viral quasispecies), POLYTE (haplotigs),
polyte-split (large genomes), frequency estimation, strain counting."""
