"""Seed-occurrence parity: mid_occ derivation, rep_len (rl:i), cm:i.

The reference maps with `minimap2 -a -x sr --eqx`
(ref: /root/reference/scripts/batch_align.py:268-270). minimap2's sr preset
pins the high-frequency seed cap (mid_occ) at 1000; other presets derive it
from the index minimizer-frequency quantile (mm_idx_cal_max_occ with
mid_occ_frac=2e-4, clamped to [min_mid_occ, max_mid_occ]). Dropped seeds
accumulate the query's repeat length (rl:i), and cm:i is the primary chain's
anchor count. These tests pin those rules and the record-set stability
across cap choices (VERDICT r2 item 7).
"""

import numpy as np
import pytest

from phylign_tpu.align import engine as ae
from phylign_tpu.kmer import decode_seq, revcomp_codes
from phylign_tpu.ops import minimizer as opm


def rand_codes(rng, n):
    return rng.integers(0, 4, n).astype(np.uint8)


def rep_len_oracle(starts, k):
    """Scalar transliteration of minimap2's rep_len merge (mm_seed.c
    mm_collect_matches): spans [st, st+k) of filtered seeds, position-sorted,
    merged; returns total covered bases."""
    rep, st_cur, en_cur = 0, -1, -1
    for st in starts:
        en = st + k
        if st > en_cur:
            if st_cur >= 0:
                rep += en_cur - st_cur
            st_cur, en_cur = st, en
        elif en > en_cur:
            en_cur = en
    if st_cur >= 0:
        rep += en_cur - st_cur
    return rep


class TestRepLen:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_rep_lens_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        nq, k = 5, 21
        qid, qp, flt = [], [], []
        for q in range(nq):
            n = int(rng.integers(0, 40))
            pos = np.sort(rng.choice(2000, size=n, replace=False))
            qid += [q] * n
            qp += pos.tolist()
            flt += rng.random(n).tolist()
        qid = np.asarray(qid, np.int64)
        qp = np.asarray(qp, np.int64)
        flt = np.asarray(flt) < 0.35
        got = opm._rep_lens(qid, qp, flt, k, nq)
        for q in range(nq):
            sel = (qid == q) & flt
            assert got[q] == rep_len_oracle(qp[sel].tolist(), k)

    def test_collect_anchors_rep_len(self):
        """A read half-covered by a high-occurrence repeat reports rep_len
        over that half only, in both the batch and single-query paths."""
        rng = np.random.default_rng(7)
        unique = rand_codes(rng, 4000)
        rep_unit = rand_codes(rng, 300)
        genome = np.concatenate([unique] + [rep_unit] * 40)
        ref = opm.build_ref_index("g", [("c", genome)])
        # read: 75 bp unique + 75 bp from the repeat unit
        read = np.concatenate([unique[1000:1075], rep_unit[:75]])
        h, p, s = opm.minimizers(read, ref.k, ref.w)
        _, _, rep1 = opm.collect_anchors(ref, h, p, s, len(read), max_occ=10)
        (_,), rep_b = opm.collect_anchors_batch(
            ref, [h], [p], [s], [len(read)], max_occ=10
        )
        assert rep1 == rep_b[0]
        assert 30 <= rep1 <= 90  # repeat half covered, unique half not
        # with a cap above the repeat count nothing is filtered
        _, _, rep_hi = opm.collect_anchors(
            ref, h, p, s, len(read), max_occ=1000
        )
        assert rep_hi == 0


class TestMidOcc:
    def test_quantile_rule(self):
        """mid_occ = count of the (1-frac)-quantile distinct minimizer + 1,
        clamped (mm_idx_cal_max_occ + mm_mapopt_update)."""
        rng = np.random.default_rng(11)
        genome = rand_codes(rng, 50_000)
        ref = opm.build_ref_index("g", [("c", genome)])
        _, _, cnt = ref.uniq_table()
        # random genome: almost all minimizers unique -> derived cap is the
        # min clamp
        assert ref.mid_occ(frac=2e-4, min_mid=10, max_mid=1_000_000) == 10
        # a coarse quantile: frac=0.5 -> cap just above the median count
        got = ref.mid_occ(frac=0.5, min_mid=1, max_mid=1_000_000)
        kth = min(int(0.5 * len(cnt)), len(cnt) - 1)
        assert got == int(np.sort(cnt)[kth]) + 1

    def test_preset_caps(self):
        assert ae.AlignParams.from_preset("sr").mid_occ == 1000
        assert ae.AlignParams.from_preset("map-ont").mid_occ == 0  # derived
        rng = np.random.default_rng(3)
        ref = opm.build_ref_index("g", [("c", rand_codes(rng, 30_000))])
        sr = ae.AlignParams.from_preset("sr")
        assert sr.occ_cap(ref) == 1000
        ont = ae.AlignParams.from_preset("map-ont")
        assert ont.occ_cap(ref) == ont.min_mid_occ  # random genome -> clamp


class TestRecordStability:
    def _records(self, params, genome, reads):
        ref = opm.build_ref_index("g", [("c", genome)], params.k, params.w)
        sks = [
            ae.QuerySketch.make(f"q{i}", decode_seq(r).decode(), params)
            for i, r in enumerate(reads)
        ]
        pairs = ae.make_pairs_batch(ref, sks, params)
        return ae.flush_pairs(pairs, params), pairs

    def test_stable_across_cap_and_tags(self):
        """On a moderately repetitive genome the record set (cols 1-4 +
        CIGAR) is identical for cap 1000 (mm2 sr) and cap 5000 (mm2 sr
        max_occ); cm:i equals the primary chain's anchor count and rl:i the
        pair's rep_len."""
        rng = np.random.default_rng(23)
        unique = rand_codes(rng, 8000)
        rep_unit = rand_codes(rng, 400)
        genome = np.concatenate([unique] + [rep_unit] * 12)
        reads = []
        for i in range(6):
            s = int(rng.integers(0, 7500))
            r = unique[s : s + 150].copy()
            if i % 2:
                r = revcomp_codes(r)
            reads.append(r)
        reads.append(np.concatenate([unique[500:575], rep_unit[:75]]))

        base = ae.AlignParams.from_preset("sr")
        import dataclasses

        recs_a, pairs = self._records(base, genome, reads)
        recs_b, _ = self._records(
            dataclasses.replace(base, mid_occ=5000), genome, reads
        )
        key = lambda r: (r.qname, r.flag, r.rname, r.pos, r.cigar)
        assert [key(r) for r in recs_a] == [key(r) for r in recs_b]

        from phylign_tpu.ops.chain import chain_oracle

        for rec, pair in zip(recs_a, pairs):
            if rec.flag & 4:
                continue
            tags = dict(t.split(":", 2)[:: 2] for t in rec.tags)
            assert int(tags["rl"]) == pair.rep_len
            an = pair.minus if rec.flag & 16 else pair.plus
            if len(an.rpos) and len(pair.minus.rpos) == 0:
                # single-strand pairs: primary chain == oracle best chain
                _, cnt, *_ = chain_oracle(
                    an.rpos.astype(np.int64), an.qpos.astype(np.int64),
                    k=base.k, max_gap=base.max_gap,
                    bandwidth=base.bandwidth,
                )
                assert int(tags["cm"]) == cnt
