"""Device meshes and sharded match/filter/align (the multi-chip data plane)."""
