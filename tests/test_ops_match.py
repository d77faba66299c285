import numpy as np
import pytest

import jax.numpy as jnp

from phylign_tpu.io import cobs
from phylign_tpu.kmer import encode_seq
from phylign_tpu.match import oracle
from phylign_tpu.models.matcher import Matcher, match_step
from phylign_tpu.ops import match as opm


def rand_seq(rng, n):
    return bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))


@pytest.fixture(scope="module")
def fixture_index():
    rng = np.random.default_rng(7)
    reads = [rand_seq(rng, 150) for _ in range(12)]
    docs = []
    for d in range(40):  # >32 docs: exercises multi-word rows
        planted = b"".join(reads[i] for i in range(len(reads)) if i % 5 == d % 5)
        docs.append((f"{d:02d}_SAMD{d:05d}", [rand_seq(rng, 400) + planted]))
    idx = cobs.build_classic_index(docs, term_size=31, fpr=0.05)
    return cobs.to_device_index(idx), reads


class TestMatchScoresXLA:
    def test_matches_oracle(self, fixture_index):
        didx, reads = fixture_index
        m = Matcher.from_device_index(didx, use_pallas=False)
        scores, keep, n_kmers = m.score([r for r in reads], threshold=0.7)
        assert n_kmers[0] == 120
        for i, r in enumerate(reads):
            want, nk = oracle.score_query_codes(didx, encode_seq(r))
            assert nk == n_kmers[i]
            np.testing.assert_array_equal(scores[i], want)
            np.testing.assert_array_equal(keep[i], want >= 0.7 * nk)

    def test_multi_hash(self):
        rng = np.random.default_rng(8)
        seq = rand_seq(rng, 120)
        docs = [("a_X1", [seq]), ("b_X2", [rand_seq(rng, 120)])]
        idx = cobs.build_classic_index(docs, term_size=31, num_hashes=3, fpr=0.01)
        didx = cobs.to_device_index(idx)
        m = Matcher.from_device_index(didx, use_pallas=False)
        scores, keep, nk = m.score([seq], threshold=0.7)
        want, _ = oracle.score_query_codes(didx, encode_seq(seq))
        np.testing.assert_array_equal(scores[0], want)
        assert scores[0, 0] == 90  # all kmers of the planted doc hit

    def test_short_and_empty_queries(self, fixture_index):
        didx, reads = fixture_index
        m = Matcher.from_device_index(didx, use_pallas=False)
        scores, keep, nk = m.score([b"ACG", reads[0]], threshold=0.7)
        assert nk[0] == 0
        assert scores[0].sum() == 0
        assert not keep[0].any()  # no kmers -> no hits, not all-hits


class TestMatchScoresPallas:
    def test_interpret_matches_xla(self, fixture_index):
        didx, reads = fixture_index
        words = jnp.asarray(opm.pad_device_words(np.asarray(didx.words), lane_words=opm.LANE_WORDS))
        m = Matcher.from_device_index(didx, use_pallas=False)
        row_idx, n_kmers = m.rows_for_queries([r for r in reads[:4]], k_max=128)
        want = opm.match_scores_xla(words, jnp.asarray(row_idx))
        got = opm.match_scores_pallas(words, jnp.asarray(row_idx), interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_interpret_multi_hash(self):
        rng = np.random.default_rng(9)
        seq = rand_seq(rng, 100)
        docs = [("a_Y1", [seq]), ("b_Y2", [rand_seq(rng, 150)])]
        idx = cobs.build_classic_index(docs, term_size=31, num_hashes=2, fpr=0.05)
        didx = cobs.to_device_index(idx)
        words = jnp.asarray(opm.pad_device_words(np.asarray(didx.words), lane_words=opm.LANE_WORDS))
        m = Matcher.from_device_index(didx, use_pallas=False)
        row_idx, _ = m.rows_for_queries([seq], k_max=70)
        want = opm.match_scores_xla(words, jnp.asarray(row_idx))
        got = opm.match_scores_pallas(words, jnp.asarray(row_idx), interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestPacking:
    def test_pad_device_words(self):
        w = np.arange(6, dtype=np.uint32).reshape(2, 3)
        p = opm.pad_device_words(w, lane_words=opm.LANE_WORDS)
        assert p.shape == (3, 128)
        assert (p[2] == 0).all()
        np.testing.assert_array_equal(p[:2, :3], w)

    def test_pack_row_indices_overflow(self):
        with pytest.raises(ValueError):
            opm.pack_row_indices([np.zeros((5, 1), np.int64)], 3, 99)


class TestMatchScoresPallasV2:
    """Wave-pipelined kernel vs the XLA reference, interpret mode."""

    def test_interpret_matches_xla(self):
        rng = np.random.default_rng(5)
        s, wp, q, k = 512, opm.LANE_WORDS, 11, 64
        words = np.zeros((s + 1, wp), np.uint32)
        words[:s] = rng.integers(0, 2**32, (s, wp), dtype=np.uint32)
        row_idx = rng.integers(0, s + 1, (q, k)).astype(np.int32)
        want = np.asarray(opm.match_scores_xla(jnp.asarray(words), jnp.asarray(row_idx)))
        got = opm.match_scores_pallas_v2(
            jnp.asarray(words), jnp.asarray(row_idx), interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_interpret_large_k_multi_wave(self):
        rng = np.random.default_rng(6)
        s, wp, q, k = 256, opm.LANE_WORDS, 8, 128  # 4 waves of 32 per query
        words = np.zeros((s + 1, wp), np.uint32)
        words[:s] = rng.integers(0, 2**32, (s, wp), dtype=np.uint32)
        row_idx = rng.integers(0, s + 1, (q, k)).astype(np.int32)
        want = np.asarray(opm.match_scores_xla(jnp.asarray(words), jnp.asarray(row_idx)))
        got = opm.match_scores_pallas_v2(
            jnp.asarray(words), jnp.asarray(row_idx), interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_padding_row_counts_zero(self):
        s, wp, q, k = 64, opm.LANE_WORDS, 3, 32
        words = np.zeros((s + 1, wp), np.uint32)
        words[:s] = 0xFFFFFFFF
        row_idx = np.full((q, k), s, np.int32)  # all padding row
        got = opm.match_scores_pallas_v2(
            jnp.asarray(words), jnp.asarray(row_idx), interpret=True
        )
        assert np.asarray(got).sum() == 0
