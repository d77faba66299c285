"""Scaled multi-device proofs (VERDICT r4 item 4).

1. The perf fixture pipeline on the 8-virtual-CPU-device mesh produces a
   byte-identical decompressed sam_summary vs the single-device run —
   banners included (workdir-relative, so they compare equal across the
   two runs' separate workdirs).
2. A tie set larger than the mesh top-k window (TIE_SLACK overflow)
   exercises the distributed overflow re-fetch path and still matches the
   single-device hit lists exactly.

Default scale keeps CI fast; set PHYLIGN_SCALED_MESH=full for the pinned
16x2048x10240 e2e geometry (minutes on CPU).
"""

import gzip
import os

import numpy as np
import pytest

from phylign_tpu import testing as fixture_mod
from phylign_tpu.config import Config
from phylign_tpu.pipeline.stages import Pipeline


def _summary_bytes(out_path):
    with gzip.open(out_path, "rb") as f:
        return f.read()


class TestScaledMeshPipeline:
    def test_perf_fixture_mesh_byte_identical(self, tmp_path):
        if os.environ.get("PHYLIGN_SCALED_MESH") == "full":
            nb, ndocs, nreads = 16, 2048, 10240
        else:
            nb, ndocs, nreads = 4, 256, 512
        outs = {}
        for mesh_shape in ("1x1", "4x2"):
            wd = tmp_path / mesh_shape.replace("x", "_")
            fixture_mod.make_perf_fixture(
                wd, n_batches=nb, genomes_per_batch=ndocs, n_reads=nreads,
                seed=31, read_seed=31, genome_len=(2000, 4000), fpr=0.3,
            )
            cfg = Config.from_yaml(wd / "config.yaml").with_overrides(
                mesh_shape=mesh_shape
            )
            pl = Pipeline(cfg, wd)
            out = pl.run_all([str(wd / "input" / "perf_reads.fq")])
            outs[mesh_shape] = _summary_bytes(out)
            stats = out.with_suffix("").with_suffix(".sam_summary.stats")
            assert stats.exists()
        assert outs["1x1"] == outs["4x2"]  # full byte identity, banners incl.

    def test_mesh_tie_overflow_matches_single_device(self):
        """> TIE_SLACK identical docs at the cutoff: the mesh top-k window
        overflows (n_keep > kk) and the distributed redo re-fetch must
        reproduce the single-device hit lists exactly."""
        from phylign_tpu.io import cobs as cobs_io
        from phylign_tpu.models.matcher import Matcher
        from phylign_tpu.parallel.dist import TIE_SLACK
        from phylign_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(5)
        base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 500).tobytes()
        n_docs = 96  # > topn + TIE_SLACK + window rounding
        assert n_docs > 1 + TIE_SLACK + 33
        docs = [(f"r{i}_SAMEA{i:07d}", [base]) for i in range(n_docs)]
        idx = cobs_io.build_classic_index(docs, term_size=31, fpr=0.05)
        didx = cobs_io.to_device_index(idx)

        from phylign_tpu.kmer import cobs_kmer_hashes_batch, encode_seq

        reads = [base[i * 40 : i * 40 + 150] for i in range(8)]
        raw = cobs_kmer_hashes_batch(
            [encode_seq(r) for r in reads], 31, idx.num_hashes
        )

        single = Matcher.from_device_index(didx)
        want = single.score_hits_raw(raw, 0.7, topn=1)
        # every read ties across ALL docs: counts prove the overflow regime
        assert all(int(nk) == n_docs for nk in want[1])

        meshed = Matcher.from_device_index(didx, mesh=make_mesh(4, 2))
        got = meshed.score_hits_raw(raw, 0.7, topn=1)
        assert [sorted(h) for h in got[0]] == [sorted(h) for h in want[0]]
        assert list(got[1]) == list(want[1])
