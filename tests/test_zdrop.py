"""Emission parity with minimap2's z-drop / end_bonus / gap-placement rules.

The golden file cannot reach these behaviors (all its records are full-span
'='/'X'), so adversarial fixtures pin them against hand-derived mm2 2.24
semantics (align.c mm_align1 + ksw_extz2, sr: zdrop=100, end_bonus=10):

* a query end whose alignment scores within end_bonus of the clipped max is
  KEPT (one trailing mismatch stays ``149=1X``, mm2's mqe+end_bonus rule);
* a worse end is clipped at the running max (two trailing mismatches ->
  ``148=2S``);
* a > zdrop fall inside the anchor span SPLITS the alignment in two records
  (mm2's r2 region), primary = higher-scoring part;
* a deletion inside a homopolymer is left-aligned (ksw2's convention).
"""

import numpy as np
import pytest

from phylign_tpu.align import engine as ae
from phylign_tpu.kmer import encode_seq
from phylign_tpu.ops import minimizer as opm

PARAMS = ae.AlignParams.from_preset("sr")
_MUT = str.maketrans("ACGT", "CGTA")


def _mk(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _align(contig, read, fused, name="q1"):
    ref = opm.build_ref_index(
        "g", [("c1", encode_seq(contig.encode()))], PARAMS.k, PARAMS.w
    )
    sk = ae.QuerySketch.make(name, read, PARAMS)
    return ae.flush_pairs([ae.make_pair(ref, sk, PARAMS)], PARAMS, fused=fused)


@pytest.mark.parametrize("fused", [True, False])
class TestEndBonus:
    def test_single_trailing_mismatch_kept(self, fused):
        # tail drop 8 < end_bonus 10: mm2 keeps the full query (mqe+10 > max)
        rng = np.random.default_rng(31)
        locus = _mk(rng, 150)
        read = locus[:149] + locus[149].translate(_MUT)
        contig = _mk(rng, 300) + locus + _mk(rng, 300)
        recs = _align(contig, read, fused)
        assert [r.cigar for r in recs] == ["149=1X"]
        assert recs[0].pos == 301

    def test_two_trailing_mismatches_clipped(self, fused):
        # tail drop 16 > end_bonus: clip at the running max
        rng = np.random.default_rng(32)
        locus = _mk(rng, 150)
        read = locus[:148] + locus[148:].translate(_MUT)
        contig = _mk(rng, 300) + locus + _mk(rng, 300)
        recs = _align(contig, read, fused)
        assert [r.cigar for r in recs] == ["148=2S"]

    def test_single_leading_mismatch_kept(self, fused):
        rng = np.random.default_rng(33)
        locus = _mk(rng, 150)
        read = locus[0].translate(_MUT) + locus[1:]
        contig = _mk(rng, 300) + locus + _mk(rng, 300)
        recs = _align(contig, read, fused)
        assert [r.cigar for r in recs] == ["1X149="]
        assert recs[0].pos == 301

    def test_interior_mismatch_never_clipped(self, fused):
        rng = np.random.default_rng(34)
        locus = _mk(rng, 150)
        read = locus[:70] + locus[70].translate(_MUT) + locus[71:]
        contig = _mk(rng, 300) + locus + _mk(rng, 300)
        recs = _align(contig, read, fused)
        assert [r.cigar for r in recs] == ["70=1X79="]


@pytest.mark.parametrize("fused", [True, False])
class TestZdropSplit:
    # The valley must resist the DP's gap-bypass AND the z-drop slope term
    # (ksw exempts clean indels via the +e*|gap| adjustment): a GT-vs-AC
    # region mismatches under EVERY shift, and at 20 bp its cheapest
    # traversal (dual gap bypass, ~104) still exceeds zdrop=100 at the
    # drift-neutral valley floor, while 10 bp (10X = 80) does not.

    def test_deep_middle_valley_splits(self, fused):
        rng = np.random.default_rng(35)
        a, b = _mk(rng, 50), _mk(rng, 80)
        locus = a + "AC" * 10 + b
        read = a + "GT" * 10 + b
        contig = _mk(rng, 300) + locus + _mk(rng, 300)
        recs = _align(contig, read, fused)
        assert len(recs) == 2, [r.cigar for r in recs]
        prim, sup = recs
        assert prim.flag == 0 and sup.flag == 2048
        assert prim.cigar == "70S80="  # higher-scoring right part wins
        assert prim.pos == 301 + 70
        assert sup.cigar == "50=100H"  # hard-clipped supplementary
        assert sup.pos == 301

    def test_shallow_valley_stays_single(self, fused):
        # 4X (drop 32) is below zdrop AND cheaper than any gap bypass
        # (2*min(12+2n, 32+n) = 40), so the region stays one record
        rng = np.random.default_rng(36)
        a, b = _mk(rng, 50), _mk(rng, 96)
        locus = a + "AC" * 2 + b
        read = a + "GT" * 2 + b
        contig = _mk(rng, 300) + locus + _mk(rng, 300)
        recs = _align(contig, read, fused)
        assert [r.cigar for r in recs] == ["50=4X96="]


@pytest.mark.parametrize("fused", [True, False])
class TestGapPlacement:
    def test_homopolymer_deletion_left_aligned(self, fused):
        # deleting one T of TTTTTT is ambiguous; ksw2 left-aligns the gap
        rng = np.random.default_rng(37)
        a, b = _mk(rng, 70), _mk(rng, 75)
        locus = a + "TTTTTT" + b
        read = a + "TTTTT" + b  # one T deleted
        contig = _mk(rng, 300) + locus + _mk(rng, 300)
        recs = _align(contig, read, fused)
        assert len(recs) == 1
        assert recs[0].cigar == "70=1D80=", recs[0].cigar
        assert recs[0].pos == 301

    def test_homopolymer_insertion_left_aligned(self, fused):
        rng = np.random.default_rng(38)
        a, b = _mk(rng, 70), _mk(rng, 75)
        locus = a + "TTTTT" + b
        read = a + "TTTTTT" + b  # one extra T
        contig = _mk(rng, 300) + locus + _mk(rng, 300)
        recs = _align(contig, read, fused)
        assert len(recs) == 1
        assert recs[0].cigar == "70=1I80=", recs[0].cigar
        assert recs[0].pos == 301


def test_unit_zdrop_parts():
    """_zdrop_parts against hand-computed outcomes on synthetic run lists."""
    p = PARAMS
    # full span, tiny tail penalty kept by end_bonus
    parts = ae._zdrop_parts([(149, "="), (1, "X")], 40, 120, p)
    assert [c for c, _, _ in parts] == [[(149, "="), (1, "X")]]
    assert parts[0][2] == 298  # dp = Kadane segment, not the full sum (290)
    # tail beyond the bonus clipped, with the clip as soft-clip runs
    parts = ae._zdrop_parts([(148, "="), (2, "X")], 40, 120, p)
    assert [c for c, _, _ in parts] == [[(148, "="), (2, "S")]]
    # middle collapse splits into two parts, best part first
    parts = ae._zdrop_parts(
        [(50, "="), (15, "X"), (85, "=")], 10, 140, p
    )
    assert len(parts) == 2
    (c0, lead0, dp0), (c1, lead1, dp1) = parts
    assert c0 == [(65, "S"), (85, "=")] and dp0 == 170 and lead0 == 65
    assert c1 == [(50, "="), (100, "S")] and dp1 == 100 and lead1 == 0
