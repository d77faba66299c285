"""Round-2 chain kernel: bounded-lookback scan DP at scale.

Covers the VERDICT round-2 item-1 "done" criteria: oracle parity on random
A=1024 anchor sets, a 10 kb read with 5% indels chained + aligned under
map-ont, bounded device memory (no dense [P, A, A] tensor), overflow logged
rather than silently clipped, and 3-way split reads emitting 3 records.
"""

import logging

import jax.numpy as jnp
import numpy as np
import pytest

from phylign_tpu.ops import chain as opc


def _sorted_anchor_set(rng, a, rmax=20_000, qmax=9_000):
    rp = rng.integers(0, rmax, a).astype(np.int32)
    qp = rng.integers(0, qmax, a).astype(np.int32)
    o = np.lexsort((qp, rp))
    return rp[o], qp[o]


def _chain_like_set(rng, a, indel=0.05):
    """Anchors mostly on one noisy diagonal (the realistic long-read shape)."""
    qp = np.sort(rng.integers(0, 10_000, a)).astype(np.int32)
    drift = np.cumsum(rng.choice([-1, 0, 0, 0, 1], a, p=[indel / 2, *(3 * [(1 - indel) / 3]), indel / 2]))
    rp = (qp + 5_000 + drift).astype(np.int32)
    noise = rng.random(a) < 0.1
    rp = np.where(noise, rng.integers(0, 20_000, a), rp).astype(np.int32)
    o = np.lexsort((qp, rp))
    return rp[o], qp[o]


class TestScanDp:
    def test_exact_vs_full_oracle_small(self):
        # A <= LOOKBACK: the windowed DP covers every predecessor -> exact
        rng = np.random.default_rng(11)
        P, A = 12, opc.LOOKBACK
        rp = np.zeros((P, A), np.int32)
        qp = np.zeros((P, A), np.int32)
        for i in range(P):
            rp[i], qp[i] = _sorted_anchor_set(rng, A, rmax=400, qmax=200)
        res = opc.chain_anchors(jnp.asarray(rp), jnp.asarray(qp))
        for i in range(P):
            score, cnt, *_ = opc.chain_oracle(rp[i], qp[i])
            assert abs(float(res.score[i]) - score) < 1e-3, i
            assert int(res.count[i]) == cnt, i

    def test_matches_windowed_oracle_a1024(self):
        # random A=1024 sets: kernel == the same-window scalar oracle
        rng = np.random.default_rng(12)
        P, A = 4, 1024
        rp = np.zeros((P, A), np.int32)
        qp = np.zeros((P, A), np.int32)
        for i in range(P):
            if i % 2:
                rp[i], qp[i] = _chain_like_set(rng, A)
            else:
                rp[i], qp[i] = _sorted_anchor_set(rng, A)
        res = opc.chain_anchors(
            jnp.asarray(rp), jnp.asarray(qp), max_gap=5000, bandwidth=500, k=15
        )
        for i in range(P):
            score, cnt, qs, qe, rs, re = opc.chain_oracle(
                rp[i], qp[i], k=15, max_gap=5000, bandwidth=500,
                lookback=opc.LOOKBACK,
            )
            # f32 scan accumulation vs float64 oracle: relative tolerance
            assert float(res.score[i]) == pytest.approx(score, rel=1e-5), i
            assert int(res.count[i]) == cnt, i
            assert (int(res.qs[i]), int(res.qe[i])) == (qs, qe), i
            assert (int(res.rs[i]), int(res.re[i])) == (rs, re), i

    def test_long_clean_diagonal_chains_fully(self):
        # 2048 colinear anchors -> one chain containing all of them (the
        # round-1 kernel silently clipped to 64)
        a = 2048
        qp = np.arange(0, a * 4, 4, dtype=np.int32)
        rp = qp + 777
        res = opc.chain_anchors(
            jnp.asarray(rp[None]), jnp.asarray(qp[None]), max_gap=5000,
            bandwidth=500, k=15,
        )
        assert int(res.count[0]) == a
        assert int(res.qs[0]) == 0 and int(res.re[0]) == int(rp[-1]) + 15

    def test_padding_and_packed_agree_large(self):
        rng = np.random.default_rng(13)
        A = 512
        rp, qp = _chain_like_set(rng, A - 37)
        rp_pad = np.concatenate([rp, np.full(37, opc.PAD_POS, np.int32)])
        qp_pad = np.concatenate([qp, np.full(37, opc.PAD_POS, np.int32)])
        ref = opc.chain_anchors(
            jnp.asarray(rp_pad[None]), jnp.asarray(qp_pad[None]),
            max_gap=5000, bandwidth=500, k=15,
        )
        q16 = np.zeros((1, A), np.uint16)
        np.copyto(q16[0], qp_pad, casting="unsafe", where=qp_pad < opc.PAD_POS)
        got = opc.chain_anchors_packed(
            jnp.asarray(rp_pad[None]), jnp.asarray(q16),
            max_gap=5000, bandwidth=500, k=15,
        )
        for f in ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), f
            )

    def test_supplementary_slots_disjoint(self):
        # three colinear runs on distant diagonals: primary + 2 sup chains,
        # mutually mostly-disjoint in query space
        runs = []
        for qoff, roff in ((0, 1000), (200, 50_000), (400, 90_000)):
            qp = np.arange(qoff, qoff + 100, 10, dtype=np.int32)
            runs.append((qp + roff, qp))
        rp = np.concatenate([r for r, _ in runs])
        qp = np.concatenate([q for _, q in runs])
        o = np.lexsort((qp, rp))
        res = opc.chain_anchors(
            jnp.asarray(rp[o][None]), jnp.asarray(qp[o][None]), n_sup=2
        )
        ivals = [(int(res.qs[0]), int(res.qe[0]))]
        for s in range(2):
            assert float(res.sup_score[0, s]) > 0
            ivals.append((int(res.sup_qs[0, s]), int(res.sup_qe[0, s])))
        starts = sorted(i[0] for i in ivals)
        assert starts == [0, 200, 400]

    def test_alt_score_for_overlapping_competitor(self):
        # two same-interval diagonals: alt_score reports the weaker one
        qp = np.arange(0, 100, 10, dtype=np.int32)
        rp1 = qp + 1000
        qp2 = qp[:6]
        rp2 = qp2 + 60_000
        rp = np.concatenate([rp1, rp2])
        qp_all = np.concatenate([qp, qp2])
        o = np.lexsort((qp_all, rp))
        res = opc.chain_anchors(
            jnp.asarray(rp[o][None]), jnp.asarray(qp_all[o][None]), n_sup=2
        )
        assert float(res.alt_score[0]) > 0
        assert float(res.alt_score[0]) < float(res.score[0])


class TestEngineLongReads:
    def test_10kb_read_5pct_indels_map_ont(self):
        """A 10 kb read with ~5% indel noise must chain (>> 64 anchors) and
        produce one primary alignment at the planted locus under map-ont."""
        from phylign_tpu.align.engine import AlignParams, QuerySketch, align_genome
        from phylign_tpu.kmer import decode_seq

        rng = np.random.default_rng(21)
        params = AlignParams.from_preset("map-ont")
        genome = rng.integers(0, 4, 60_000).astype(np.uint8)
        x = 25_000
        tpl = genome[x : x + 10_000]
        # 5% indels: drop ~2.5% of bases, insert ~2.5% random bases
        keep = rng.random(len(tpl)) >= 0.025
        read = tpl[keep]
        ins_at = np.flatnonzero(rng.random(len(read)) < 0.025)
        read = np.insert(read, ins_at, rng.integers(0, 4, len(ins_at)).astype(np.uint8))
        sk = QuerySketch.make("long1", decode_seq(read).decode(), params)
        assert len(sk.mh) > 500  # the anchor set really is way past 64
        recs = align_genome("g", [("c1", genome)], [sk], params)
        prim = [r for r in recs if not r.flag & 0x904]
        assert len(prim) == 1
        assert prim[0].rname == "c1"
        assert abs(prim[0].pos - (x + 1)) < 100

    def test_three_way_split_read(self):
        """VERDICT #8: a read split across 3 distant loci emits 3 records
        (primary + 2 flag-2048 supplementaries)."""
        from phylign_tpu.align import engine
        from phylign_tpu.io import asmtar
        from phylign_tpu.match.filter import FilteredQuery

        rng = np.random.default_rng(23)
        contig = bytes(
            rng.choice(np.frombuffer(b"ACGT", np.uint8), 40_000)
        )
        read = contig[1000:1090] + contig[15_000:15_080] + contig[30_000:30_070]
        import pathlib
        import tempfile

        d = pathlib.Path(tempfile.mkdtemp())
        tar = d / "split3__01.tar.xz"
        asmtar.write_batch_tar(tar, [("SAMT0001", [("SAMT0001.c1", contig)])])
        queries = [FilteredQuery("sp3", read.decode(), [("b", "SAMT0001", 100)])]
        recs = list(engine.align_batch(str(tar), queries, None))
        assert [r.qname for r in recs] == ["sp3"] * 3
        flags = sorted(r.flag & 2048 for r in recs)
        assert flags == [0, 2048, 2048]
        positions = sorted(r.pos for r in recs)
        assert positions == [1001, 15_001, 30_001]

    def test_anchor_overflow_logged_not_silent(self, caplog):
        from phylign_tpu.align.engine import AlignParams, _chain_pairs
        from phylign_tpu.ops.minimizer import Anchors

        rng = np.random.default_rng(29)
        n = opc.MAX_ANCHORS + 500
        rp, qp = _sorted_anchor_set(rng, n)
        an = Anchors(rpos=rp, qpos=qp)
        with caplog.at_level(logging.WARNING, logger="phylign_tpu.align"):
            _chain_pairs([an], AlignParams())
        assert "MAX_ANCHORS" in caplog.text
