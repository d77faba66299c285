"""Flagship jittable models: Matcher (k-mer containment) and Aligner (seed-chain-extend)."""
