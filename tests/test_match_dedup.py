"""Cross-query k-mer dedup (two-stage gather) — VERDICT r2 item 4.

The match kernel is gather-issue-bound on the big Bloom table; gathering
each distinct row once into a small fast-regime table and re-scoring from
it beats the roofline when reads share k-mers. These tests pin the
bit-identity of the dedup path against the direct kernel (including
padding slots and multi-hash indexes), the profitability gate, and the
native unique+inverse against numpy.
"""

import numpy as np
import pytest

from phylign_tpu.ops.match import (
    DEDUP_MAX_FRAC,
    dedup_rows,
    match_scores_xla,
    match_scores_xla_dedup,
    pad_device_words,
)

S, WP = 5000, 3


@pytest.fixture(scope="module")
def words():
    rng = np.random.default_rng(0)
    w = rng.integers(0, 2**32, (S, WP), dtype=np.uint32)
    return pad_device_words(w)  # [S+1, WP] + zero pad row


def make_idx(rng, q, k, h=1, shared_frac=0.6, pad_frac=0.1):
    shape = (q, k) if h == 1 else (q, k, h)
    n = int(np.prod(shape))
    pool = rng.integers(0, S, 64, dtype=np.int32)
    flat = rng.integers(0, S, n, dtype=np.int32)
    pos = rng.choice(n, int(shared_frac * n), replace=False)
    flat[pos] = pool[rng.integers(0, len(pool), len(pos))]
    padpos = rng.choice(n, int(pad_frac * n), replace=False)
    flat[padpos] = S  # padding slots -> zero row
    return flat.reshape(shape)


class TestDedupScores:
    @pytest.mark.parametrize("h", [1, 2])
    def test_bit_identical(self, words, h):
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        idx = make_idx(rng, q=32, k=24, h=h)
        dd = dedup_rows(idx, pad_row=S, wp=WP)
        assert dd is not None
        uniq_pad, inv = dd
        direct = np.asarray(match_scores_xla(jnp.asarray(words), jnp.asarray(idx)))
        deduped = np.asarray(
            match_scores_xla_dedup(
                jnp.asarray(words), jnp.asarray(uniq_pad), jnp.asarray(inv)
            )
        )
        np.testing.assert_array_equal(direct, deduped)

    def test_matcher_integration_identical_hits(self):
        from phylign_tpu.io import cobs as cobs_io
        from phylign_tpu.models.matcher import Matcher

        rng = np.random.default_rng(5)
        bases = np.frombuffer(b"ACGT", np.uint8)
        docs, seqs = [], []
        for d in range(12):
            s = bytes(rng.choice(bases, 500))
            docs.append((f"{d}_ACC{d:05d}", [s]))
            seqs.append(s[100:250])
        # duplicate-heavy read set: repeat each planted read 3x + noise
        reads = [r for r in seqs for _ in range(3)]
        reads += [bytes(rng.choice(bases, 150)) for _ in range(4)]
        didx = cobs_io.to_device_index(
            cobs_io.build_classic_index(docs, term_size=31, fpr=0.05)
        )
        m0 = Matcher.from_device_index(didx)
        m1 = Matcher.from_device_index(didx)
        m1.dedup = True
        h0, n0 = m0.score_hits(reads, threshold=0.7, topn=3)
        h1, n1 = m1.score_hits(reads, threshold=0.7, topn=3)
        assert h0 == h1
        np.testing.assert_array_equal(n0, n1)


class TestDedupGate:
    def test_low_duplication_returns_none(self):
        rng = np.random.default_rng(7)
        # all-distinct indices: U/N == 1 > DEDUP_MAX_FRAC
        idx = rng.permutation(S).astype(np.int32)[: 64 * 16].reshape(64, 16)
        assert dedup_rows(idx, pad_row=S, wp=WP) is None

    def test_oversized_unique_table_returns_none(self):
        rng = np.random.default_rng(8)
        idx = make_idx(rng, q=64, k=16, shared_frac=0.9)
        # a huge fake row width pushes the unique table past the fast regime
        assert dedup_rows(idx, pad_row=S, wp=1 << 24) is None

    def test_gate_frac_boundary(self):
        rng = np.random.default_rng(9)
        idx = make_idx(rng, q=64, k=16, shared_frac=0.9, pad_frac=0.0)
        dd = dedup_rows(idx, pad_row=S, wp=WP)
        assert dd is not None
        uniq_pad, inv = dd
        u = (uniq_pad != S).sum() + (S in np.unique(idx))
        assert u <= DEDUP_MAX_FRAC * idx.size + 1


class TestScoreHitsRaw:
    def test_raw_hash_path_identical(self):
        """score_hits_raw (hash once, mod per batch) must equal score_hits
        for both the resident Matcher and the row-chunked ChunkedMatcher,
        across two batches with different signature sizes."""
        from phylign_tpu.io import cobs as cobs_io
        from phylign_tpu.kmer import cobs_kmer_hashes, encode_seq
        from phylign_tpu.models.matcher import ChunkedMatcher, Matcher

        rng = np.random.default_rng(21)
        bases = np.frombuffer(b"ACGT", np.uint8)
        reads = []
        didxs = []
        for b in range(2):
            docs = []
            for d in range(8):
                s = bytes(rng.choice(bases, 400 + 37 * b))
                docs.append((f"{d}_B{b}A{d:04d}", [s]))
                if d % 2 == 0:
                    reads.append(s[50:200])
            didxs.append(
                cobs_io.to_device_index(
                    cobs_io.build_classic_index(docs, term_size=31, fpr=0.1)
                )
            )
        reads.append(bytes(rng.choice(bases, 150)))
        assert didxs[0].signature_size != didxs[1].signature_size
        raw = [cobs_kmer_hashes(encode_seq(r), 31, 1) for r in reads]
        from phylign_tpu.models.matcher import DeviceQueryHashes

        dq = DeviceQueryHashes.build(raw)
        for didx in didxs:
            m = Matcher.from_device_index(didx)
            h0, n0 = m.score_hits(reads, threshold=0.7, topn=3)
            h1, n1 = m.score_hits_raw(raw, threshold=0.7, topn=3)
            assert h0 == h1
            np.testing.assert_array_equal(n0, n1)
            # device-resident hashes: one upload serves BOTH signature sizes
            h3, n3 = m.score_hits_hashes(dq, threshold=0.7, topn=3)
            assert h0 == h3
            np.testing.assert_array_equal(n0, n3)
            cm = ChunkedMatcher.from_device_index(didx, hbm_budget_mb=1)
            h2, n2 = cm.score_hits_raw(raw, threshold=0.7, topn=3)
            assert h0 == h2
            np.testing.assert_array_equal(n0, n2)

    def test_device_mod_exact(self):
        """_rows_from_hashes_dev (u32-only 64-bit mod) must equal numpy
        uint64 remainder for adversarial hashes and signature sizes."""
        import jax

        from phylign_tpu.models.matcher import _rows_from_hashes_dev

        rng = np.random.default_rng(31)
        h = rng.integers(0, 2**64, (4096,), dtype=np.uint64)
        h[:8] = [0, 1, 2**32 - 1, 2**32, 2**63, 2**64 - 1, 76206791, 2**33 + 7]
        hi = (h >> np.uint64(32)).astype(np.uint32)
        lo = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        for s in (1, 2, 3, 101, 22329, 76206791, 2**31 - 1):
            got = np.asarray(
                jax.jit(_rows_from_hashes_dev, static_argnums=2)(hi, lo, s)
            )
            want = (h % np.uint64(s)).astype(np.uint32)
            np.testing.assert_array_equal(got, want, err_msg=f"s={s}")

    def test_cobs_kmer_hashes_mod_equals_rows(self):
        from phylign_tpu.kmer import (
            cobs_kmer_hashes,
            cobs_row_indices,
            encode_seq,
            rows_from_hashes,
        )

        rng = np.random.default_rng(23)
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 500))
        codes = encode_seq(seq)
        for h in (1, 3):
            raw = cobs_kmer_hashes(codes, 31, h)
            for s in (101, 76206, 2**31 + 11):
                np.testing.assert_array_equal(
                    rows_from_hashes(raw, s),
                    cobs_row_indices(codes, 31, s, h),
                )

    def test_numpy_native_hash_agreement(self):
        import os

        from phylign_tpu import native
        from phylign_tpu.kmer import cobs_kmer_hashes, encode_seq

        if native.get_lib() is None:
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(29)
        codes = encode_seq(bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 300)))
        got = cobs_kmer_hashes(codes, 31, 2)
        os.environ["PHYLIGN_TPU_NO_NATIVE"] = "1"
        native._lib = None
        try:
            want = cobs_kmer_hashes(codes, 31, 2)
        finally:
            del os.environ["PHYLIGN_TPU_NO_NATIVE"]
            native._lib = None
        np.testing.assert_array_equal(got, want)


class TestNativeUniqueInverse:
    def test_matches_numpy(self):
        from phylign_tpu import native

        if native.get_lib() is None:
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(11)
        for n in (0, 1, 7, 1000, 100_003):
            x = rng.integers(0, max(1, n // 2), n, dtype=np.int32)
            got = native.native_unique_inverse(x)
            u0, i0 = np.unique(x, return_inverse=True)
            np.testing.assert_array_equal(got[0], u0)
            np.testing.assert_array_equal(got[1], i0.ravel())

    def test_large_values(self):
        from phylign_tpu import native

        if native.get_lib() is None:
            pytest.skip("native lib unavailable")
        x = np.array([2**30, 5, 2**30, 0, 5], np.int32)
        u, inv = native.native_unique_inverse(x)
        np.testing.assert_array_equal(u, [0, 5, 2**30])
        np.testing.assert_array_equal(inv, [2, 1, 2, 0, 1])
