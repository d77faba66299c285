"""MAPQ parity: mm2 2.24 mm_set_mapq reconstruction + the dp_max2 probe.

The reference emits minimap2's column 5 (ref invocation:
/root/reference/scripts/batch_align.py:268-270). mm_set_mapq's sr branch
needs the DP score of the best overlapping SECONDARY region (dp_max2), which
this engine obtains by extending the chain stage's alt competitor (the
"probe"). These tests pin the formula's branch values and the end-to-end
probe path on synthetic two-locus genomes, for both the fused and host
flush paths (A/B).
"""

import numpy as np
import pytest

from phylign_tpu.align import engine as ae
from phylign_tpu.kmer import encode_seq
from phylign_tpu.ops import minimizer as opm

PARAMS = ae.AlignParams.from_preset("sr")


def _mk_read(rng, n=150):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _align_one(contig: str, read: str, fused: bool):
    ref = opm.build_ref_index(
        "g", [("c1", encode_seq(contig.encode()))], PARAMS.k, PARAMS.w
    )
    sk = ae.QuerySketch.make("q1", read, PARAMS)
    tasks = [ae.make_pair(ref, sk, PARAMS)]
    recs = ae.flush_pairs(tasks, PARAMS, fused=fused)
    assert len(recs) == 1
    return recs[0]


class TestMm2MapqFormula:
    def test_sr_dp_branch_matches_golden_48(self):
        # golden family: s1=140 s2=125 cm=24 rl=0, AS 300 vs dp2 284
        assert ae.mm2_mapq(140, 125, 24, 300, 284, 0, 140, PARAMS) == 48

    def test_sr_dp_branch_tie_is_zero(self):
        assert ae.mm2_mapq(140, 140, 24, 300, 300, 0, 140, PARAMS) == 0

    def test_sr_dp_branch_saturates_at_60(self):
        assert ae.mm2_mapq(140, 25, 24, 300, 80, 0, 140, PARAMS) == 60

    def test_chain_branch_unique_hit_is_60(self):
        # no secondary DP: q_coef*(1-subsc/s1)*ln(s1), subsc clamps to 20
        assert ae.mm2_mapq(133, 0, 18, 300, 0, 0, 133, PARAMS) == 60

    def test_chain_branch_weak_chain(self):
        # pen = min(0.01*25 * 1, 0.1*3) = 0.25; 0.25*40*(1-20/25)*ln(25)
        got = ae.mm2_mapq(25, 0, 3, 50, 0, 0, 25, PARAMS)
        assert got == int(0.25 * 40 * (1 - 20 / 25) * np.log(25) + 0.499)

    def test_repeat_ratio_penalty(self):
        # heavy repeat content shrinks uniq_ratio -> sub-60 MAPQ
        full = ae.mm2_mapq(140, 0, 24, 300, 0, 0, 140, PARAMS)
        rep = ae.mm2_mapq(140, 0, 24, 300, 0, 1400, 140, PARAMS)
        assert full == 60 and rep < full
        uniq = 140 / 1540
        assert rep == int(uniq * 40 * (1 - 20 / 140) * np.log(140) + 0.499)

    def test_zero_score_is_zero(self):
        assert ae.mm2_mapq(0, 0, 0, 0, 0, 0, 0, PARAMS) == 0


@pytest.mark.parametrize("fused", [True, False])
class TestProbeEndToEnd:
    def test_unique_locus_is_60(self, fused):
        rng = np.random.default_rng(11)
        read = _mk_read(rng)
        contig = _mk_read(rng, 400) + read + _mk_read(rng, 400)
        rec = _align_one(contig, read, fused)
        assert rec.flag == 0 and rec.mapq == 60

    def test_exact_copy_is_0(self, fused):
        rng = np.random.default_rng(12)
        read = _mk_read(rng)
        contig = (
            _mk_read(rng, 400) + read + _mk_read(rng, 300)
            + read + _mk_read(rng, 300)
        )
        rec = _align_one(contig, read, fused)
        assert rec.flag == 0 and rec.pos == 401
        assert rec.mapq == 0

    def test_one_deletion_copy_is_48(self, fused):
        # second locus lacks one base: dp_max2 = 149*2 - 14 = 284
        rng = np.random.default_rng(13)
        read = _mk_read(rng)
        sec = read[:75] + read[76:]
        contig = (
            _mk_read(rng, 400) + read + _mk_read(rng, 300)
            + sec + _mk_read(rng, 300)
        )
        rec = _align_one(contig, read, fused)
        assert rec.flag == 0 and rec.pos == 401
        assert rec.mapq == 48, rec

    def test_mapq_meta_cleared(self, fused):
        rng = np.random.default_rng(14)
        read = _mk_read(rng)
        contig = _mk_read(rng, 400) + read + read + _mk_read(rng, 300)
        rec = _align_one(contig, read, fused)
        assert rec.mapq_meta is None


def test_host_fused_mapq_ab_identity():
    """Same two-locus genome through both flush paths -> identical bytes."""
    rng = np.random.default_rng(15)
    read = _mk_read(rng)
    sec = read[:40] + read[41:]
    contig = (
        _mk_read(rng, 350) + read + _mk_read(rng, 280)
        + sec + _mk_read(rng, 280)
    )
    a = _align_one(contig, read, fused=True)
    b = _align_one(contig, read, fused=False)
    assert a.to_line() == b.to_line()
