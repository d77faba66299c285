"""mm2's second-chance re-seed pass (map.c mm_map_frag rechain branch).

A read living entirely inside a high-copy repeat loses every seed to the
mid_occ filter and chains nothing; minimap2 then re-collects seeds at the
looser opt->max_occ cap (5000 for sr) and chains again, emitting a mapped
record where a single-pass seeder emits ``*``. The reference inherits this
via `minimap2 -x sr` (/root/reference/scripts/batch_align.py:268-270).
"""

import dataclasses

import numpy as np
import pytest

from phylign_tpu.align import engine as ae
from phylign_tpu.kmer import encode_seq
from phylign_tpu.ops import minimizer as opm


def _tandem_fixture(copies: int):
    """Genome: unique flank + ``copies`` tandem repeats of a 50 bp unit +
    unique flank; read = 3 consecutive units (150 bp)."""
    rng = np.random.default_rng(21)
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, 50))
    flank_l = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    flank_r = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    contig = flank_l + unit * copies + flank_r
    read = unit * 3
    return contig, read


def _run(contig, read, params, fused):
    ref = opm.build_ref_index(
        "g", [("c1", encode_seq(contig.encode()))], params.k, params.w
    )
    sk = ae.QuerySketch.make("q1", read, params)
    tasks = [ae.make_pair(ref, sk, params)]
    assert len(tasks[0].plus.rpos) + len(tasks[0].minus.rpos) == 0, (
        "fixture must drop every seed in the mid_occ pass"
    )
    assert tasks[0].rep_len > 0
    recs = ae.flush_pairs(tasks, params, fused=fused)
    assert len(recs) == 1
    return recs[0]


# small caps keep the fixture tiny; the cap RATIO mirrors sr's 1000 -> 5000
PARAMS = dataclasses.replace(
    ae.AlignParams.from_preset("sr"), mid_occ=8, max_occ=64
)


@pytest.mark.parametrize("fused", [True, False])
def test_repeat_read_maps_via_reseed(fused):
    contig, read = _tandem_fixture(copies=20)
    rec = _run(contig, read, PARAMS, fused)
    assert rec.flag != 4, "re-seed pass must recover the repeat-spanning hit"
    assert rec.cigar == "150="
    # rl:i comes from the SECOND pass (cap 64 keeps every seed -> 0),
    # mirroring mm2's rep_len recomputation in the rechain branch
    assert "rl:i:0" in rec.tags


def test_no_retry_when_max_occ_disabled():
    contig, read = _tandem_fixture(copies=20)
    params = dataclasses.replace(PARAMS, max_occ=0)
    rec = _run(contig, read, params, fused=True)
    assert rec.flag == 4


def test_no_retry_when_caps_equal():
    contig, read = _tandem_fixture(copies=20)
    params = dataclasses.replace(PARAMS, max_occ=8)
    rec = _run(contig, read, params, fused=True)
    assert rec.flag == 4


def test_still_unmapped_when_above_max_occ():
    # 80 copies exceed even the retry cap -> both passes drop the seeds
    contig, read = _tandem_fixture(copies=80)
    rec = _run(contig, read, PARAMS, fused=True)
    assert rec.flag == 4


def test_sr_preset_pins_caps():
    p = ae.AlignParams.from_preset("sr")
    assert (p.mid_occ, p.max_occ, p.is_sr) == (1000, 5000, True)
    p2 = ae.AlignParams.from_preset("map-ont")
    assert p2.max_occ == 0 and not p2.is_sr
