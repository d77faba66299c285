import numpy as np
import pytest

from phylign_tpu import kmer


class TestXXH64:
    def test_known_vectors(self):
        # Reference vectors from the xxHash project / python-xxhash docs.
        assert kmer.xxh64(b"") == 0xEF46DB3751D8E999
        assert kmer.xxh64(b"Nobody inspects the spammish repetition") == 0xFBCEA83C8A378BF1

    def test_seed_changes_hash(self):
        h0 = kmer.xxh64(b"ACGTACGTACGTACGTACGTACGTACGTACG", 0)
        h1 = kmer.xxh64(b"ACGTACGTACGTACGTACGTACGTACGTACG", 1)
        assert h0 != h1

    @pytest.mark.parametrize("length", [0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 63, 64, 100])
    def test_batch_matches_scalar(self, length):
        rng = np.random.default_rng(length)
        rows = rng.integers(0, 256, size=(5, length), dtype=np.uint8)
        batch = kmer.xxh64_batch(rows, seed=7)
        for i in range(5):
            # scalar path routes through the same code; cross-check against a
            # direct spec transliteration for one row
            assert batch[i] == kmer.xxh64_batch(rows[i : i + 1], seed=7)[0]

    def test_against_independent_spec_impl(self):
        # Independent minimal scalar implementation straight from the spec,
        # to guard the vectorized path against systematic errors.
        def rotl(x, r):
            return ((x << r) | (x >> (64 - r))) & 0xFFFFFFFFFFFFFFFF

        P1, P2, P3, P4, P5 = (
            0x9E3779B185EBCA87,
            0xC2B2AE3D27D4EB4F,
            0x165667B19E3779F9,
            0x85EBCA77C2B2AE63,
            0x27D4EB2F165667C5,
        )

        def ref_xxh64(data, seed=0):
            M = 0xFFFFFFFFFFFFFFFF
            n = len(data)
            p = 0
            if n >= 32:
                v = [
                    (seed + P1 + P2) & M,
                    (seed + P2) & M,
                    seed,
                    (seed - P1) & M,
                ]
                while n - p >= 32:
                    for i in range(4):
                        lane = int.from_bytes(data[p : p + 8], "little")
                        v[i] = (rotl((v[i] + lane * P2) & M, 31) * P1) & M
                        p += 8
                h = (rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12) + rotl(v[3], 18)) & M
                for i in range(4):
                    h = ((h ^ (rotl((v[i] * P2) & M, 31) * P1) & M) * P1 + P4) & M
            else:
                h = (seed + P5) & M
            h = (h + n) & M
            while n - p >= 8:
                lane = int.from_bytes(data[p : p + 8], "little")
                h = (rotl(h ^ ((rotl((lane * P2) & M, 31) * P1) & M), 27) * P1 + P4) & M
                p += 8
            if n - p >= 4:
                lane = int.from_bytes(data[p : p + 4], "little")
                h = (rotl(h ^ ((lane * P1) & M), 23) * P2 + P3) & M
                p += 4
            while p < n:
                h = (rotl(h ^ ((data[p] * P5) & M), 11) * P1) & M
                p += 1
            h ^= h >> 33
            h = (h * P2) & M
            h ^= h >> 29
            h = (h * P3) & M
            h ^= h >> 32
            return h

        rng = np.random.default_rng(0)
        for length in [0, 1, 4, 8, 12, 31, 32, 40, 64, 77]:
            for seed in [0, 1, 2**32, 2**63]:
                data = bytes(rng.integers(0, 256, length, dtype=np.uint8))
                assert kmer.xxh64(data, seed) == ref_xxh64(data, seed), (length, seed)


class TestEncoding:
    def test_normalize(self):
        assert kmer.normalize_seq(b"acgtACGTnNxX-") == b"ACGTACGTAAAAA"

    def test_revcomp(self):
        assert kmer.revcomp(b"ACGT") == b"ACGT"
        assert kmer.revcomp(b"AAACCC") == b"GGGTTT"

    def test_roundtrip(self):
        s = b"ACGTTGCA"
        assert kmer.decode_seq(kmer.encode_seq(s)) == s


class TestCanonicalKmers:
    def test_small(self):
        codes = kmer.encode_seq(b"ACGTT")
        km = kmer.canonical_kmers_ascii(codes, 3)
        # windows: ACG(rc CGT)->ACG, CGT(rc ACG)->ACG, GTT(rc AAC)->AAC
        assert [bytes(r) for r in km] == [b"ACG", b"ACG", b"AAC"]

    def test_canonical_is_min(self):
        rng = np.random.default_rng(1)
        codes = rng.integers(0, 4, 200, dtype=np.uint8)
        km = kmer.canonical_kmers_ascii(codes, 31)
        for i, row in enumerate(km):
            w = codes[i : i + 31]
            fwd = kmer.decode_seq(w)
            rc = kmer.revcomp(fwd)
            assert bytes(row) == min(fwd, rc)

    def test_too_short(self):
        assert kmer.canonical_kmers_ascii(kmer.encode_seq(b"ACG"), 31).shape[0] == 0

    def test_row_indices_in_range(self):
        codes = kmer.encode_seq(b"ACGT" * 20)
        rows = kmer.cobs_row_indices(codes, 31, signature_size=1000, num_hashes=3)
        assert rows.shape == (80 - 31 + 1, 3)
        assert rows.min() >= 0 and rows.max() < 1000
