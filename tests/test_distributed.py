"""Multi-process (jax.distributed) parity: 2 processes x 4 CPU devices.

The reference's multi-node story is a cluster scheduler over a shared
filesystem (SURVEY.md section 2c.7); this build adds a real distributed
backend. Here two OS processes form one 8-device mesh whose doc axis crosses
the process boundary, and the full Matcher score_hits path (sharded scoring
-> threshold -> distributed top-k collective) must return exactly what a
single-process no-mesh run returns.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "distributed_worker.py"
REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_match_topk_parity(tmp_path):
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = str(REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    got = json.loads((tmp_path / "result.json").read_text())

    # single-process reference through the same API, no mesh
    sys.path.insert(0, str(WORKER.parent))
    from distributed_worker import build_index

    from phylign_tpu.models.matcher import Matcher

    didx, seqs = build_index()
    matcher = Matcher.from_device_index(didx)
    want_hits, want_keep = matcher.score_hits(seqs, threshold=0.7, topn=3)
    got_hits = [[tuple(h) for h in row] for row in got["hits"]]
    assert got_hits == [[tuple(h) for h in row] for row in want_hits]
    assert got["n_keep"] == want_keep.tolist()
    # sanity: the planted queries really hit their genomes
    assert sum(len(r) for r in want_hits) >= 8
