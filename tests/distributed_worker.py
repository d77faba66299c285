"""Worker for the 2-process jax.distributed parity test (test_distributed).

Each process: 4 virtual CPU devices; the mesh spans both processes with the
doc axis crossing the process boundary (DCN-analog). Runs the full Matcher
score_hits path — sharded scoring, threshold, distributed top-k collective —
and process 0 writes the result for the parent to compare against a
single-process reference.

Run: python distributed_worker.py <pid> <num> <port> <outdir>
"""

import json
import os
import sys


def build_index():
    """Deterministic tiny index + queries (identical on every process)."""
    import numpy as np

    from phylign_tpu.io import cobs as cobs_io

    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", np.uint8)
    docs = []
    seqs = []
    for d in range(40):
        s = bytes(rng.choice(bases, 400))
        docs.append((f"{d:04d}_ACC{d:05d}", [s]))
        if d % 5 == 0:
            seqs.append(s[37 : 37 + 150])  # planted query -> full-score hit
    seqs.append(bytes(rng.choice(bases, 150)))  # unplanted
    idx = cobs_io.build_classic_index(docs, term_size=31, fpr=0.05)
    return cobs_io.to_device_index(idx), seqs


def main():
    pid, num, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from phylign_tpu.parallel.launch import init_distributed

    init_distributed(
        coordinator="127.0.0.1", num_processes=num, process_id=pid, port=port
    )
    assert jax.process_count() == num

    from phylign_tpu.models.matcher import Matcher
    from phylign_tpu.parallel.mesh import make_mesh

    didx, seqs = build_index()
    mesh = make_mesh(2, 4)  # doc axis spans the two processes
    matcher = Matcher.from_device_index(didx, mesh=mesh)
    hits, n_keep = matcher.score_hits(seqs, threshold=0.7, topn=3)
    if pid == 0:
        with open(os.path.join(outdir, "result.json"), "w") as f:
            json.dump(
                {"hits": hits, "n_keep": n_keep.tolist()}, f
            )
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
