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
