"""Device kernels (Pallas + XLA): match popcount, top-k, minimizers, chain, align."""
