"""Native C++ host library vs the numpy oracle implementations."""

import os

import numpy as np
import pytest

from phylign_tpu import kmer, native
from phylign_tpu.ops import minimizer as opm


pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


def numpy_row_indices(codes, k, sig, h):
    """Force the numpy fallback path."""
    kmers = kmer.canonical_kmers_ascii(codes, k)
    out = np.empty((kmers.shape[0], h), np.int64)
    for i in range(h):
        out[:, i] = (
            kmer.xxh64_batch(np.ascontiguousarray(kmers), i) % np.uint64(sig)
        ).astype(np.int64)
    return out


class TestNativeParity:
    def test_xxh64(self):
        rng = np.random.default_rng(0)
        for n in [0, 1, 5, 31, 32, 100]:
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            for seed in [0, 1, 7]:
                assert native.native_xxh64(data, seed) == kmer.xxh64(data, seed)

    def test_cobs_row_indices(self):
        rng = np.random.default_rng(1)
        codes = rng.integers(0, 4, 500, dtype=np.uint8)
        for h in (1, 3):
            got = native.native_cobs_row_indices(codes, 31, 999983, h)
            want = numpy_row_indices(codes, 31, 999983, h)
            np.testing.assert_array_equal(got, want)

    def test_minimizers(self):
        rng = np.random.default_rng(2)
        for n in [10, 25, 150, 5000]:
            codes = rng.integers(0, 4, n, dtype=np.uint8)
            gh, gp, gs = native.native_minimizers(codes, 21, 11)
            # numpy fallback path:
            fwd, rc = opm.packed_kmers(codes, 21)
            if fwd.shape[0] == 0:
                assert len(gp) == 0
                continue
            strand = (rc < fwd).astype(np.uint8)
            amb = fwd == rc
            canon = np.where(strand == 1, rc, fwd)
            h = opm._hash64(canon, np.uint64((1 << 42) - 1))
            h[amb] = np.iinfo(np.uint64).max
            nn = fwd.shape[0]
            w = min(11, nn)
            hw = np.lib.stride_tricks.sliding_window_view(h, w)
            swm = hw.min(axis=1)
            sel = np.zeros(nn, bool)
            for d in range(w):
                idx = np.arange(nn - w + 1) + d
                sel[idx] |= h[idx] == swm
            sel &= ~amb
            wp = np.nonzero(sel)[0]
            np.testing.assert_array_equal(gp, wp.astype(np.int32))
            np.testing.assert_array_equal(gh, h[wp])
            np.testing.assert_array_equal(gs, strand[wp])

    def test_env_disable(self, monkeypatch):
        monkeypatch.setenv("PHYLIGN_TPU_NO_NATIVE", "1")
        # get_lib caches; call the wrapper which checks env each time
        import phylign_tpu.native as nat

        old = nat._lib
        nat._lib = None
        try:
            assert nat.get_lib() is None
        finally:
            nat._lib = old


class TestNativeAnchors:
    def test_collect_anchors_matches_numpy(self):
        """Native anchors_count/anchors_fill vs the numpy path of
        collect_anchors_batch: identical flat anchors for every
        (query, strand) group, including max_occ drops and rc reads."""
        import phylign_tpu.native as nat

        if nat.get_lib() is None:
            import pytest

            pytest.skip("native lib unavailable")
        import os

        from phylign_tpu.align.engine import AlignParams, QuerySketch
        from phylign_tpu.kmer import decode_seq
        from phylign_tpu.ops import minimizer as opm

        rng = np.random.default_rng(31)
        params = AlignParams.from_preset("sr")
        g = rng.integers(0, 4, 200_000).astype(np.uint8)
        # plant a repeat so max_occ dropping triggers
        rep = g[1000:1400]
        g2 = np.concatenate([g] + [rep] * 60)
        ref = opm.build_ref_index(
            "r", [("c1", g2[:150_000]), ("c2", g2[150_000:])],
            params.k, params.w,
        )
        sks = []
        for i in range(80):
            s = rng.integers(0, len(g2) - 150)
            r = g2[s : s + 150].copy()
            if i % 2:
                r = (3 - r)[::-1].copy()
            sks.append(
                QuerySketch.make(f"q{i}", decode_seq(r).decode(), params)
            )
        args = (
            ref, [s.mh for s in sks], [s.mp for s in sks],
            # explicit low cap so the 60-copy planted repeat exercises the
            # high-occurrence drop + rep_len paths (sr's real cap is 1000)
            [s.ms for s in sks], [len(s.codes) for s in sks], 50,
        )
        got, got_rep = opm.collect_anchors_batch(*args)
        os.environ["PHYLIGN_TPU_NO_NATIVE"] = "1"
        nat._lib = None
        try:
            want, want_rep = opm.collect_anchors_batch(*args)
        finally:
            del os.environ["PHYLIGN_TPU_NO_NATIVE"]
            nat._lib = None
        np.testing.assert_array_equal(got_rep, want_rep)
        for (gp, gm), (wp, wm) in zip(got, want):
            np.testing.assert_array_equal(gp.rpos, wp.rpos)
            np.testing.assert_array_equal(gp.qpos, wp.qpos)
            np.testing.assert_array_equal(gm.rpos, wm.rpos)
            np.testing.assert_array_equal(gm.qpos, wm.qpos)
