"""Match stage: COBS-compatible k-mer containment scoring + candidate filtering."""
