"""minimap_extra_params pass-through onto AlignParams.

The reference forwards arbitrary user tokens to the minimap2 CLI
(ref: /root/reference/config.yaml:36-38, scripts/batch_align.py:268-270);
the engine maps the common flags and rejects the rest loudly.
"""

import pytest

from phylign_tpu.align.engine import AlignParams


def test_default_eqx_accepted():
    p = AlignParams.from_preset("sr", "--eqx")
    assert p == AlignParams.from_preset("sr", "")


def test_scoring_overrides():
    p = AlignParams.from_preset("sr", "-A 4 -B6 -O 14,40 -E 3,2")
    assert p.scoring.match == 4
    assert p.scoring.mismatch == 6
    assert (p.scoring.gap_open1, p.scoring.gap_open2) == (14, 40)
    assert (p.scoring.gap_ext1, p.scoring.gap_ext2) == (3, 2)


def test_single_value_fills_dual_affine_pair():
    # minimap2's main.c: -O INT sets both gap-open penalties
    p = AlignParams.from_preset("sr", "-O 20 -E 4")
    assert (p.scoring.gap_open1, p.scoring.gap_open2) == (20, 20)
    assert (p.scoring.gap_ext1, p.scoring.gap_ext2) == (4, 4)


def test_seeding_and_chain_overrides():
    p = AlignParams.from_preset("sr", "-k 19 -w9 -n 3 -m 35 -g 200")
    assert (p.k, p.w) == (19, 9)
    assert p.min_chain_cnt == 3
    assert p.min_chain_score == 35.0
    assert p.max_gap == 200


def test_bandwidth_and_zdrop():
    p = AlignParams.from_preset("sr", "-r 300 -z 400,200")
    assert p.bandwidth == 300
    assert p.zdrop == 400
    # the extension band widens to cover the requested drift (128-lane
    # granularity)
    assert p.band == 384
    # second -r value (bw_long) is accepted and ignored
    p2 = AlignParams.from_preset("sr", "-r 50,500")
    assert p2.bandwidth == 50 and p2.band == 128


def test_secondary_no_and_N():
    p = AlignParams.from_preset("sr", "--secondary=no -N 10")
    assert p.n_secondary == 10
    with pytest.raises(ValueError, match="secondary=yes is unsupported"):
        AlignParams.from_preset("sr", "--secondary=yes")


def test_unknown_token_rejected_loudly():
    with pytest.raises(ValueError, match="unsupported minimap_extra_params"):
        AlignParams.from_preset("sr", "--splice")
    with pytest.raises(ValueError, match="needs a value"):
        AlignParams.from_preset("sr", "-k")
    with pytest.raises(ValueError, match="bad value"):
        AlignParams.from_preset("sr", "-k nope")
    with pytest.raises(ValueError, match="too many values"):
        AlignParams.from_preset("sr", "-A 2,3")


def test_overrides_apply_on_long_read_presets_too():
    p = AlignParams.from_preset("map-ont", "-k 17 -z 600")
    assert p.k == 17 and p.zdrop == 600 and not p.is_sr
