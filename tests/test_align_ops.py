import numpy as np
import pytest

import jax.numpy as jnp

from phylign_tpu.kmer import encode_seq, revcomp_codes
from phylign_tpu.ops import chain as opc
from phylign_tpu.ops import extend as ope
from phylign_tpu.ops import minimizer as opm


def rand_codes(rng, n):
    return rng.integers(0, 4, n, dtype=np.uint8)


class TestMinimizers:
    def test_every_window_covered(self):
        rng = np.random.default_rng(0)
        codes = rand_codes(rng, 500)
        h, pos, strand = opm.minimizers(codes, k=21, w=11)
        assert len(pos) > 0
        # every w-window of kmer positions contains >= 1 minimizer
        n = 500 - 21 + 1
        sel = np.zeros(n, bool)
        sel[pos] = True
        for j in range(n - 11 + 1):
            assert sel[j : j + 11].any(), f"window {j} uncovered"

    def test_revcomp_symmetry(self):
        # minimizers of the reverse complement are the mirrored positions
        rng = np.random.default_rng(1)
        codes = rand_codes(rng, 300)
        rc = revcomp_codes(codes)
        h1, p1, s1 = opm.minimizers(codes, 21, 11)
        h2, p2, s2 = opm.minimizers(rc, 21, 11)
        mirrored = np.sort(300 - 21 - p2)
        np.testing.assert_array_equal(np.sort(p1), mirrored)
        assert set(h1.tolist()) == set(h2.tolist())

    def test_short_seq(self):
        h, p, s = opm.minimizers(rand_codes(np.random.default_rng(2), 25), 21, 11)
        assert len(p) >= 1  # one window over everything

    def test_too_short(self):
        h, p, s = opm.minimizers(rand_codes(np.random.default_rng(3), 10), 21, 11)
        assert len(p) == 0


class TestRefIndexAnchors:
    @pytest.fixture()
    def genome_and_read(self):
        rng = np.random.default_rng(4)
        contig1 = rand_codes(rng, 2000)
        contig2 = rand_codes(rng, 3000)
        read = contig2[1000:1150].copy()  # planted in contig2 at pos 1000
        ref = opm.build_ref_index("SAMX1", [("c1", contig1), ("c2", contig2)])
        return ref, read

    def test_plus_anchors_on_diagonal(self, genome_and_read):
        ref, read = genome_and_read
        qh, qp, qs = opm.minimizers(read, ref.k, ref.w)
        plus, minus, _rep = opm.collect_anchors(ref, qh, qp, qs, len(read))
        assert len(plus.rpos) >= 5
        # anchors on the planted diagonal: rpos - qpos == contig2_start + 1000
        diag = ref.contig_starts[1] + 1000
        on_diag = (plus.rpos - plus.qpos) == diag
        assert on_diag.sum() >= 5

    def test_minus_anchors_for_rc_read(self, genome_and_read):
        ref, read = genome_and_read
        rc = revcomp_codes(read)
        qh, qp, qs = opm.minimizers(rc, ref.k, ref.w)
        plus, minus, _rep = opm.collect_anchors(ref, qh, qp, qs, len(rc))
        diag = ref.contig_starts[1] + 1000
        on_diag = (minus.rpos - minus.qpos) == diag
        assert on_diag.sum() >= 5

    def test_contig_of(self, genome_and_read):
        ref, _ = genome_and_read
        c, off = ref.contig_of(int(ref.contig_starts[1]) + 7)
        assert (c, off) == (1, 7)
        assert ref.contig_of(0) == (0, 0)


class TestChain:
    def test_perfect_colinear(self):
        # anchors every 10 bp on one diagonal: chain includes all
        qp = np.arange(0, 120, 10, dtype=np.int32)
        rp = qp + 500
        res = opc.chain_anchors(
            jnp.asarray(rp[None, :]), jnp.asarray(qp[None, :])
        )
        assert int(res.count[0]) == len(qp)
        assert int(res.qs[0]) == 0 and int(res.qe[0]) == 110 + 21
        assert int(res.rs[0]) == 500 and int(res.re[0]) == 610 + 21

    def test_matches_oracle_random(self):
        rng = np.random.default_rng(5)
        P, A = 16, 32
        rp = np.sort(rng.integers(0, 300, (P, A)), axis=1).astype(np.int32)
        qp = rng.integers(0, 150, (P, A)).astype(np.int32)
        order = np.lexsort((qp, rp), axis=1) if False else None
        for i in range(P):
            o = np.lexsort((qp[i], rp[i]))
            rp[i], qp[i] = rp[i][o], qp[i][o]
        res = opc.chain_anchors(jnp.asarray(rp), jnp.asarray(qp))
        for i in range(P):
            score, cnt, qs, qe, rs, re = opc.chain_oracle(rp[i], qp[i])
            assert abs(float(res.score[i]) - score) < 1e-3, i
            assert int(res.count[i]) == cnt, i

    def test_padding_ignored(self):
        qp = np.array([0, 30, 60], np.int32)
        rp = qp + 100
        qp_pad = np.concatenate([qp, np.full(5, opc.PAD_POS, np.int32)])
        rp_pad = np.concatenate([rp, np.full(5, opc.PAD_POS, np.int32)])
        r1 = opc.chain_anchors(jnp.asarray(rp[None]), jnp.asarray(qp[None]))
        r2 = opc.chain_anchors(jnp.asarray(rp_pad[None]), jnp.asarray(qp_pad[None]))
        assert float(r1.score[0]) == float(r2.score[0])
        assert int(r2.count[0]) == 3

    def test_cross_contig_blocked(self):
        # two colinear runs separated by > max_gap never chain together
        qp = np.array([0, 10, 80, 90], np.int32)
        rp = np.array([100, 110, 5000, 5010], np.int32)
        res = opc.chain_anchors(jnp.asarray(rp[None]), jnp.asarray(qp[None]))
        assert int(res.count[0]) == 2


def run_extend(q, rwin, qlen=None):
    """Helper: run banded extension of one pair with the window as given."""
    P = 1
    L = len(q)
    qc = jnp.asarray(q[None, :])
    qlen = jnp.asarray([qlen or L], jnp.int32)
    want_len = L + ope.BAND
    rwin = rwin[:want_len]
    pad = np.zeros(want_len - len(rwin), np.uint8)
    rw = np.concatenate([rwin, pad])
    valid = np.concatenate(
        [np.ones(len(rwin), bool), np.zeros(len(pad), bool)]
    )
    res = ope.extend_banded(
        qc, qlen, jnp.asarray(rw[None, :]), jnp.asarray(valid[None, :])
    )
    return res


class TestExtend:
    def test_exact_match(self):
        rng = np.random.default_rng(6)
        ref = rand_codes(rng, 400)
        q = ref[64 : 64 + 150].copy()  # at band offset 64 of window start 0
        res = run_extend(q, ref)
        assert float(res.score[0]) == 2 * 150
        cig, start_d = ope.traceback_one(
            np.asarray(res.p_plane[0]), q, 150, ref, int(res.end_d[0])
        )
        assert cig == [(150, "=")]
        assert start_d == 64

    def test_one_mismatch(self):
        rng = np.random.default_rng(7)
        ref = rand_codes(rng, 400)
        q = ref[64 : 64 + 150].copy()
        q[55] = (q[55] + 1) % 4
        res = run_extend(q, ref)
        assert float(res.score[0]) == 2 * 149 - 8
        cig, _ = ope.traceback_one(
            np.asarray(res.p_plane[0]), q, 150, ref, int(res.end_d[0])
        )
        assert cig == [(55, "="), (1, "X"), (94, "=")]

    def test_deletion(self):
        rng = np.random.default_rng(8)
        ref = rand_codes(rng, 400)
        # query = ref segment with 3 bases deleted -> cigar has 3D
        seg = ref[64 : 64 + 153]
        q = np.concatenate([seg[:70], seg[73:]])
        res = run_extend(q, ref)
        cig, _ = ope.traceback_one(
            np.asarray(res.p_plane[0]), q, 150, ref, int(res.end_d[0])
        )
        ops = "".join(f"{n}{op}" for n, op in cig)
        assert ops == "70=3D80="
        # dual affine: 3-base deletion costs min(12+2*3, 32+3) = 18
        assert float(res.score[0]) == 2 * 150 - 18

    def test_insertion(self):
        rng = np.random.default_rng(9)
        ref = rand_codes(rng, 400)
        seg = ref[64 : 64 + 148]
        ins = rand_codes(np.random.default_rng(10), 2)
        # ensure inserted bases break identity
        ins = (seg[70:72] + 1) % 4
        q = np.concatenate([seg[:70], ins, seg[70:]])
        res = run_extend(q, ref)
        cig, _ = ope.traceback_one(
            np.asarray(res.p_plane[0]), q, 150, ref, int(res.end_d[0])
        )
        ops = "".join(f"{n}{op}" for n, op in cig)
        assert "2I" in ops
        # 2-base insertion: min(12+4, 32+2) = 16
        assert float(res.score[0]) == 2 * 148 - 16

    def test_score_matches_full_dp_oracle(self):
        rng = np.random.default_rng(11)
        for trial in range(5):
            ref = rand_codes(rng, 250)
            q = ref[40:140].copy()
            muts = rng.integers(0, 100, 6)
            q[muts] = (q[muts] + rng.integers(1, 4, 6)) % 4
            res = run_extend(q, ref)
            want = ope.align_oracle(q, ref)
            assert abs(float(res.score[0]) - want) < 1e-3, trial

    def test_traceback_roundtrip_consistency(self):
        # cigar lengths must sum to qlen (I + = + X) and score recomputes
        rng = np.random.default_rng(12)
        ref = rand_codes(rng, 300)
        q = ref[64 : 64 + 120].copy()
        q[30] = (q[30] + 2) % 4
        q = np.concatenate([q[:80], q[82:]])  # 2-base deletion
        res = run_extend(q, ref)
        cig, start_d = ope.traceback_one(
            np.asarray(res.p_plane[0]), q, len(q), ref, int(res.end_d[0])
        )
        qlen_from_cig = sum(n for n, op in cig if op in "=XI")
        assert qlen_from_cig == len(q)


class TestCollectAnchorsBatch:
    def test_matches_single(self):
        rng = np.random.default_rng(50)
        contig = rand_codes(rng, 5000)
        ref = opm.build_ref_index("X", [("c", contig)])
        sketches = []
        for i in range(6):
            if i % 2 == 0:
                read = contig[i * 500 : i * 500 + 150].copy()
            else:
                read = revcomp_codes(contig[i * 500 : i * 500 + 150])
            sketches.append(read)
        hs, ps, ss, ls = [], [], [], []
        for r in sketches:
            h, p, s = opm.minimizers(r, ref.k, ref.w)
            hs.append(h); ps.append(p); ss.append(s); ls.append(len(r))
        batch, _rep = opm.collect_anchors_batch(ref, hs, ps, ss, ls)
        for i in range(6):
            plus, minus, _ = opm.collect_anchors(ref, hs[i], ps[i], ss[i], ls[i])
            bp, bm = batch[i]
            np.testing.assert_array_equal(bp.rpos, plus.rpos)
            np.testing.assert_array_equal(bp.qpos, plus.qpos)
            np.testing.assert_array_equal(bm.rpos, minus.rpos)
            np.testing.assert_array_equal(bm.qpos, minus.qpos)

    def test_empty(self):
        rng = np.random.default_rng(51)
        ref = opm.build_ref_index("X", [("c", rand_codes(rng, 2000))])
        out, rep = opm.collect_anchors_batch(ref, [], [], [], [])
        assert out == [] and len(rep) == 0


class TestTracebackProperty:
    """Random gapped/mutated reads: the traceback path must re-realize the
    device's optimal score exactly (catches any reconstruction drift)."""

    def test_score_roundtrip_random(self):
        rng = np.random.default_rng(60)
        scoring = ope.SrScoring()
        for trial in range(12):
            ref = rand_codes(rng, 500)
            qlen = int(rng.integers(80, 160))
            q = ref[64 : 64 + qlen].copy()
            # random mutations
            for _ in range(int(rng.integers(0, 4))):
                p = int(rng.integers(0, len(q)))
                q[p] = (q[p] + int(rng.integers(1, 4))) % 4
            # random small indel
            if trial % 2 == 0 and len(q) > 40:
                p = int(rng.integers(10, len(q) - 10))
                glen = int(rng.integers(1, 4))
                if trial % 4 == 0:
                    q = np.delete(q, slice(p, p + glen))  # deletion from query = I? no: shorter query
                else:
                    ins = rand_codes(rng, glen)
                    q = np.insert(q, p, ins)
            res = run_extend(q, ref)
            cig, start_d = ope.traceback_one(
                np.asarray(res.p_plane[0]), q, len(q), ref[: len(q) + ope.BAND],
                int(res.end_d[0]),
            )
            # recompute score from the cigar path
            score = 0.0
            i, j = 0, start_d  # query pos, window pos
            for n, op in cig:
                if op in "=X":
                    for _ in range(n):
                        score += scoring.match if q[i] == ref[j] else -scoring.mismatch
                        i += 1
                        j += 1
                elif op == "I":
                    score -= min(
                        scoring.gap_open1 + n * scoring.gap_ext1,
                        scoring.gap_open2 + n * scoring.gap_ext2,
                    )
                    i += n
                elif op == "D":
                    score -= min(
                        scoring.gap_open1 + n * scoring.gap_ext1,
                        scoring.gap_open2 + n * scoring.gap_ext2,
                    )
                    j += n
            assert i == len(q), (trial, cig)
            assert abs(score - float(res.score[0])) < 1e-2, (trial, cig, score, float(res.score[0]))


class TestAlignerModel:
    def test_align_step_runs(self):
        import jax.numpy as jnp
        from phylign_tpu.models.aligner import align_step

        rng = np.random.default_rng(61)
        P, A, L = 8, 16, 64
        qp = np.tile(np.arange(0, A * 4, 4, np.int32), (P, 1))
        rp = qp + 100
        q = rng.integers(0, 4, (P, L)).astype(np.uint8)
        rw = rng.integers(0, 4, (P, L + ope.BAND)).astype(np.uint8)
        out = align_step(
            jnp.asarray(rp), jnp.asarray(qp), jnp.asarray(q),
            jnp.full(P, L, jnp.int32), jnp.asarray(rw),
            jnp.ones((P, L + ope.BAND), bool),
        )
        assert out.chain.count.shape == (P,)
        assert int(out.chain.count[0]) == A
        assert out.align_score.shape == (P,)


class TestPackedTransferPaths:
    """The 2-bit / bounds-packed device paths must match the unpacked ones."""

    def test_pack2bit_roundtrip(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(77)
        for n in (1, 3, 4, 150, 384):
            a = rng.integers(0, 4, (5, n)).astype(np.uint8)
            packed = ope.pack2bit(a)
            assert packed.shape == (5, (n + 3) // 4)
            out = np.asarray(ope._unpack2bit(jnp.asarray(packed), n))
            np.testing.assert_array_equal(out, a)

    def test_packed_scores_match_unpacked(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(78)
        P, L = 8, 64
        wlen = L + ope.BAND
        q = rng.integers(0, 4, (P, L)).astype(np.uint8)
        qlen = np.full(P, L, np.int32)
        rwin = rng.integers(0, 4, (P, wlen)).astype(np.uint8)
        # some reads perfect on a diagonal so scores are meaningful
        for i in range(P):
            d = int(rng.integers(0, ope.BAND))
            rwin[i, d : d + L] = q[i]
        lo = rng.integers(0, 4, P).astype(np.int32)
        hi = wlen - rng.integers(0, 4, P).astype(np.int32)
        j = np.arange(wlen)[None, :]
        rvalid = (j >= lo[:, None]) & (j < hi[:, None])
        rz = np.where(rvalid, rwin, 0).astype(np.uint8)

        s_ref, e_ref = ope.extend_banded_scores(
            jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(rz),
            jnp.asarray(rvalid),
        )
        s_pk, e_pk = ope.extend_banded_scores_packed(
            jnp.asarray(ope.pack2bit(q)), jnp.asarray(qlen),
            jnp.asarray(ope.pack2bit(rwin)), jnp.asarray(lo), jnp.asarray(hi),
            L, wlen,
        )
        np.testing.assert_allclose(np.asarray(s_pk), np.asarray(s_ref))
        np.testing.assert_array_equal(np.asarray(e_pk), np.asarray(e_ref))

    def test_chain_packed_matches_int32(self):
        import jax.numpy as jnp
        from phylign_tpu.ops import chain as opc

        rng = np.random.default_rng(79)
        P, A = 4, 16
        qp = np.sort(rng.integers(0, 120, (P, A)).astype(np.int32), axis=1)
        rp = qp + rng.integers(90, 110, (P, 1)).astype(np.int32)
        for i in range(P):
            o = np.lexsort((qp[i], rp[i]))
            qp[i], rp[i] = qp[i, o], rp[i, o]
        # pad the tail slots
        qp[:, -3:] = opc.PAD_POS
        rp[:, -3:] = opc.PAD_POS
        ref = opc.chain_anchors(jnp.asarray(rp), jnp.asarray(qp))
        q16 = np.zeros((P, A), np.uint16)
        np.copyto(q16, qp, casting="unsafe", where=qp < opc.PAD_POS)
        got = opc.chain_anchors_packed(jnp.asarray(rp), jnp.asarray(q16))
        for f in ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), f
            )
