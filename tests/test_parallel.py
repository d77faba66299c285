import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phylign_tpu.ops.match import match_scores_xla
from phylign_tpu.parallel import dist, mesh as meshmod


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return meshmod.make_mesh(4, 2)


def make_inputs(rng, S=512, WP=8 * 4, Q=16, K=32):
    words = np.zeros((S + 1, WP), np.uint32)
    words[:S] = rng.integers(0, 2**32, (S, WP), dtype=np.uint32)
    rows = rng.integers(0, S, (Q, K, 1)).astype(np.int32)
    return jnp.asarray(words), jnp.asarray(rows)


class TestDistMatch:
    def test_matches_single_device(self, mesh8):
        rng = np.random.default_rng(0)
        words, rows = make_inputs(rng)
        got = dist.dist_match_scores(mesh8, words, rows)
        want = match_scores_xla(words, rows)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_topk_global(self, mesh8):
        rng = np.random.default_rng(1)
        words, rows = make_inputs(rng)
        scores = dist.dist_match_scores(mesh8, words, rows)
        topv, topi = dist.dist_topk(mesh8, scores, n_best=4)
        s = np.asarray(match_scores_xla(words, rows))
        k = 4 + dist.TIE_SLACK
        for q in range(s.shape[0]):
            order = np.argsort(-s[q], kind="stable")
            want_v = s[q][order][:k]
            np.testing.assert_array_equal(np.asarray(topv[q]), want_v)
            # returned global ids must realize the same score multiset
            np.testing.assert_array_equal(
                np.sort(s[q][np.asarray(topi[q])]), np.sort(want_v)
            )

    def test_full_step_runs(self, mesh8):
        rng = np.random.default_rng(2)
        words, rows = make_inputs(rng, Q=16)
        n_kmers = jnp.full(16, 32, jnp.int32)
        P, L = 16, 64
        from phylign_tpu.ops.extend import BAND

        q_codes = jnp.asarray(rng.integers(0, 4, (P, L)).astype(np.uint8))
        q_len = jnp.full(P, L, jnp.int32)
        rwin = jnp.asarray(rng.integers(0, 4, (P, L + BAND)).astype(np.uint8))
        rvalid = jnp.ones((P, L + BAND), bool)
        anchors_q = jnp.asarray(
            np.tile(np.arange(0, 64, 8, np.int32), (P, 1))
        )
        anchors_r = anchors_q + 100
        out = dist.full_step(
            mesh8, words, rows, n_kmers, q_codes, q_len, rwin, rvalid,
            anchors_r, anchors_q,
        )
        assert out["scores"].shape == (16, words.shape[1] * 32)
        assert out["top_values"].shape[0] == 16
        assert out["chain_count"].shape == (16,)
        assert out["align_score"].shape == (16,)
        assert int(out["chain_count"][0]) == 8  # colinear anchors all chain

    def test_extend_packed_matches_unpacked(self, mesh8):
        """The transfer-compact mesh extension (2-bit packed codes + [lo,hi)
        bounds) must score identically to the raw uint8 + bool-mask path."""
        from phylign_tpu.ops.extend import BAND, pack2bit

        rng = np.random.default_rng(5)
        P, L = 16, 64
        wlen = L + BAND
        q_codes = rng.integers(0, 4, (P, L)).astype(np.uint8)
        q_len = np.full(P, L, np.int32)
        rwin = rng.integers(0, 4, (P, wlen)).astype(np.uint8)
        # embed the queries so scores are non-trivial
        for i in range(P):
            rwin[i, 10 : 10 + L] = q_codes[i]
        lo = np.zeros(P, np.int32)
        hi = np.full(P, wlen, np.int32)
        lo[3], hi[7] = 12, wlen - 9  # a couple of clipped windows
        rvalid = (np.arange(wlen)[None, :] >= lo[:, None]) & (
            np.arange(wlen)[None, :] < hi[:, None]
        )
        sc_ref, end_ref = dist.dist_extend_scores(
            mesh8,
            jnp.asarray(q_codes),
            jnp.asarray(q_len),
            jnp.asarray(rwin),
            jnp.asarray(rvalid),
        )
        sc_p, end_p = dist.dist_extend_scores_packed(
            mesh8,
            jnp.asarray(pack2bit(q_codes)),
            jnp.asarray(q_len),
            jnp.asarray(pack2bit(rwin)),
            jnp.asarray(lo),
            jnp.asarray(hi),
            L,
            wlen,
        )
        np.testing.assert_array_equal(np.asarray(sc_ref), np.asarray(sc_p))
        np.testing.assert_array_equal(np.asarray(end_ref), np.asarray(end_p))
        ext_ref = dist.dist_extend(
            mesh8,
            jnp.asarray(q_codes),
            jnp.asarray(q_len),
            jnp.asarray(rwin),
            jnp.asarray(rvalid),
        )
        ext_p = dist.dist_extend_packed(
            mesh8,
            jnp.asarray(pack2bit(q_codes)),
            jnp.asarray(q_len),
            jnp.asarray(pack2bit(rwin)),
            jnp.asarray(lo),
            jnp.asarray(hi),
            L,
            wlen,
        )
        np.testing.assert_array_equal(
            np.asarray(ext_ref.score), np.asarray(ext_p.score)
        )
        np.testing.assert_array_equal(
            np.asarray(ext_ref.p_plane), np.asarray(ext_p.p_plane)
        )


class TestMeshPipeline:
    def test_pipeline_with_mesh_matches_single_device(self, tmp_path):
        """Full pipeline with mesh_shape=4x2 on the 8-CPU-device mesh must
        produce the identical sam_summary as the single-device run."""
        from phylign_tpu import testing as fixture_mod
        from phylign_tpu.config import Config
        from phylign_tpu.io.sam import summary_first3
        from phylign_tpu.pipeline.stages import Pipeline

        results = {}
        for mesh_shape in ("1x1", "4x2"):
            wd = tmp_path / mesh_shape.replace("x", "_")
            fixture_mod.make_fixture(wd, n_batches=2, seed=21)
            cfg = Config.from_yaml(wd / "config.yaml").with_overrides(
                mesh_shape=mesh_shape
            )
            pl = Pipeline(cfg, wd)
            inputs = sorted(str(p) for p in (wd / "input").iterdir())
            out = pl.run_all(inputs)
            results[mesh_shape] = summary_first3(out)
        # banners embed tmp paths; compare record rows + banner batch names
        assert results["1x1"] == results["4x2"]

    def test_mesh_too_big_rejected(self, tmp_path):
        from phylign_tpu import testing as fixture_mod
        from phylign_tpu.config import Config
        from phylign_tpu.pipeline.stages import Pipeline

        wd = tmp_path / "big"
        fixture_mod.make_fixture(wd, n_batches=1, seed=22)
        cfg = Config.from_yaml(wd / "config.yaml").with_overrides(mesh_shape="16x2")
        pl = Pipeline(cfg, wd)
        import pytest as _pt

        with _pt.raises(ValueError, match="devices"):
            pl.mesh()


class TestMeshScoreHits:
    def test_score_hits_matches_full_path(self, mesh8):
        """The mesh top-k collective path must reproduce the full-matrix
        hits exactly (set, scores, and qualifying counts)."""
        from phylign_tpu.io import cobs
        from phylign_tpu.models.matcher import Matcher

        rng = np.random.default_rng(21)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        read = rng.choice(alpha, 150).tobytes()
        docs = []
        for i in range(24):
            seq = rng.choice(alpha, 300).tobytes()
            if i % 3 == 0:
                seq = read + seq  # planted
            docs.append((f"d{i:02d}", [seq]))
        idx = cobs.build_classic_index(docs, term_size=31, fpr=0.01)
        didx = cobs.to_device_index(idx)
        mm = Matcher.from_device_index(didx, mesh=mesh8)
        ms = Matcher.from_device_index(didx)

        seqs = [read, rng.choice(alpha, 150).tobytes(), b"ACG"]
        got_hits, got_n = mm.score_hits(seqs, 0.7, topn=5)
        want_hits, want_n = ms.score_hits(seqs, 0.7, topn=5)
        for q in range(len(seqs)):
            assert sorted(got_hits[q]) == sorted(
                [(int(a), int(b)) for a, b in want_hits[q]]
            ), q
            assert int(got_n[q]) == int(want_n[q])
