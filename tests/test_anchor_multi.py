"""Segmented cross-genome anchor collection parity
(ops.minimizer.collect_anchors_multi / engine.make_pairs_multi vs the
per-genome path — must be byte-identical in anchors, rep_len, and task
order)."""

import numpy as np

from phylign_tpu.align import engine as ae
from phylign_tpu.kmer import decode_seq
from phylign_tpu.ops import minimizer as opm


def _mk_groups(rng, n_genomes=17, reads_per=5):
    params = ae.AlignParams.from_preset("sr")
    groups = []
    for g in range(n_genomes):
        glen = int(rng.integers(900, 4000))
        genome = rng.integers(0, 4, glen).astype(np.uint8)
        # a repetitive genome exercises the max_occ/rep_len path
        if g % 5 == 0:
            unit = genome[:40]
            genome = np.tile(unit, glen // 40 + 1)[:glen].copy()
        ref = opm.build_ref_index(
            f"g{g}", [(f"c{g}", genome)], params.k, params.w
        )
        sks = []
        for r in range(int(rng.integers(0, reads_per + 1))):
            s = int(rng.integers(0, max(1, glen - 150)))
            rd = genome[s : s + 150].copy()
            nmut = rng.binomial(len(rd), 0.02)
            pos = rng.choice(len(rd), nmut, replace=False)
            rd[pos] = (rd[pos] + rng.integers(1, 4, nmut)) % 4
            if r % 2:
                rd = (3 - rd)[::-1].copy()
            sks.append(
                ae.QuerySketch.make(
                    f"g{g}r{r}", decode_seq(rd).decode(), params
                )
            )
        groups.append((ref, sks))
    return groups, params


def test_make_pairs_multi_matches_per_genome():
    rng = np.random.default_rng(17)
    groups, params = _mk_groups(rng)
    multi = ae.make_pairs_multi(groups, params)
    single = []
    for ref, sks in groups:
        single.extend(ae.make_pairs_batch(ref, sks, params))
    assert len(multi) == len(single) > 0
    for a, b in zip(multi, single):
        assert a.sketch is b.sketch and a.ref is b.ref
        assert a.rep_len == b.rep_len
        np.testing.assert_array_equal(a.plus.rpos, b.plus.rpos)
        np.testing.assert_array_equal(a.plus.qpos, b.plus.qpos)
        np.testing.assert_array_equal(a.minus.rpos, b.minus.rpos)
        np.testing.assert_array_equal(a.minus.qpos, b.minus.qpos)


def test_collect_anchors_multi_numpy_fallback_parity(monkeypatch):
    """The numpy fallback (no native lib) must match the native segmented
    path record-for-record."""
    rng = np.random.default_rng(18)
    groups, params = _mk_groups(rng, n_genomes=7)
    native_groups = [
        (
            ref,
            [sk.mh for sk in sks],
            [sk.mp for sk in sks],
            [sk.ms for sk in sks],
            [len(sk.codes) for sk in sks],
            params.occ_cap(ref),
        )
        for ref, sks in groups
    ]
    nat_out, nat_rep = opm.collect_anchors_multi(native_groups, params.k)

    from phylign_tpu import native

    monkeypatch.setattr(native, "get_lib", lambda: None)
    fb_out, fb_rep = opm.collect_anchors_multi(native_groups, params.k)
    assert len(nat_out) == len(fb_out)
    np.testing.assert_array_equal(nat_rep, fb_rep)
    for (ap, am), (bp, bm) in zip(nat_out, fb_out):
        np.testing.assert_array_equal(ap.rpos, bp.rpos)
        np.testing.assert_array_equal(ap.qpos, bp.qpos)
        np.testing.assert_array_equal(am.rpos, bm.rpos)
        np.testing.assert_array_equal(am.qpos, bm.qpos)


def test_empty_groups():
    params = ae.AlignParams.from_preset("sr")
    assert ae.make_pairs_multi([], params) == []
    rng = np.random.default_rng(2)
    genome = rng.integers(0, 4, 1000).astype(np.uint8)
    ref = opm.build_ref_index("g", [("c", genome)], params.k, params.w)
    # a group with zero queries contributes nothing but must not break
    out = ae.make_pairs_multi([(ref, [])], params)
    assert out == []


def test_build_ref_index_batch_field_identical():
    rng = np.random.default_rng(23)
    genomes = []
    for g in range(9):
        contigs = []
        for c in range(int(rng.integers(1, 4))):
            glen = int(rng.integers(200, 2500))
            contigs.append(
                (f"g{g}c{c}", rng.integers(0, 4, glen).astype(np.uint8))
            )
        genomes.append((f"g{g}", contigs))
    batch = opm.build_ref_index_batch(genomes, 21, 11)
    for (name, contigs), rb in zip(genomes, batch):
        ra = opm.build_ref_index(name, contigs, 21, 11)
        assert ra.contig_names == rb.contig_names
        np.testing.assert_array_equal(ra.contig_starts, rb.contig_starts)
        np.testing.assert_array_equal(ra.contig_lens, rb.contig_lens)
        np.testing.assert_array_equal(ra.codes, rb.codes)
        np.testing.assert_array_equal(ra.sort_hash, rb.sort_hash)
        np.testing.assert_array_equal(ra.sort_pos, rb.sort_pos)
        np.testing.assert_array_equal(ra.sort_strand, rb.sort_strand)
