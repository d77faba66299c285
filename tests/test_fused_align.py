"""A/B parity of the device-resident fused align flush vs the host path.

The fused path (align.fused + engine.flush_pairs_fused) must produce
byte-identical SAM records to the round-2 host selection path
(engine.flush_pairs_host) — including supplementaries, unmapped records,
soft/hard clips, ties, and the gapped traceback remainder. The host path is
itself validated against the reference's golden minimap2 output
(tests/test_golden_minimap2_parity.py), so equality here carries the golden
parity over to the fused path.
"""

import numpy as np
import pytest

from phylign_tpu.align import engine as ae
from phylign_tpu.kmer import decode_seq
from phylign_tpu.ops import minimizer as opm
from phylign_tpu.parallel import mesh as meshmod


@pytest.fixture(scope="module")
def cpu_mesh():
    return meshmod.make_mesh(2, 4)  # (d=2, q=4) over the 8 CPU devices


def _mutate(rng, r, mut):
    r = r.copy()
    nm = rng.binomial(len(r), mut)
    pos = rng.choice(len(r), nm, replace=False)
    r[pos] = (r[pos] + rng.integers(1, 4, nm)) % 4
    return r


def _mixed_pool(rng, params, n_reads=240):
    """Tasks covering: two genomes (multi-contig, repeats), both strands,
    mismatches, planted indels, chimeric split reads, long queries (separate
    length bucket), and an unmappable read."""
    G = 180_000
    base = rng.integers(0, 4, G).astype(np.uint8)
    contigs = [
        ("c1", base[:110_000]),
        # c2 shares two segments with c1 -> competing chains, s2/alt paths
        ("c2", np.concatenate([base[40_000:80_000], base[5_000:15_000]])),
    ]
    ref = opm.build_ref_index("gA", contigs, params.k, params.w)
    base2 = rng.integers(0, 4, 70_000).astype(np.uint8)
    ref2 = opm.build_ref_index("gB", [("x1", base2)], params.k, params.w)

    sks = []
    for i in range(n_reads):
        src = base if i % 3 else base2
        L = 150
        s = rng.integers(0, len(src) - L)
        r = _mutate(rng, src[s : s + L], 0.02)
        if i % 17 == 0:  # planted gap -> traceback-plane delegation
            r = np.concatenate([r[: L // 2], r[L // 2 + 4 :]])
        if i % 2:
            r = (3 - r)[::-1].copy()
        sks.append(ae.QuerySketch.make(f"r{i}", decode_seq(r).decode(), params))
    for i in range(16):  # chimeric -> split-read supplementaries
        a = base[rng.integers(0, 30_000) :][:80]
        b = base[rng.integers(60_000, 100_000) :][:80]
        sks.append(
            ae.QuerySketch.make(
                f"chi{i}", decode_seq(np.concatenate([a, b])).decode(), params
            )
        )
    for i in range(4):  # long queries: separate fused length bucket
        s = rng.integers(0, G - 2200)
        sks.append(
            ae.QuerySketch.make(
                f"long{i}", decode_seq(base[s : s + 2200]).decode(), params
            )
        )
    sks.append(ae.QuerySketch.make("junk", "ACGT" * 40, params))

    tasks = ae.make_pairs_batch(ref, sks, params)
    tasks += ae.make_pairs_batch(ref2, sks[:80], params)
    return tasks


def test_fused_matches_host_single_device():
    rng = np.random.default_rng(11)
    params = ae.AlignParams.from_preset("sr")
    tasks = _mixed_pool(rng, params)
    old = ae.flush_pairs(tasks, params, fused=False)
    new = ae.flush_pairs(tasks, params, fused=True)
    assert len(old) == len(new)
    for a, b in zip(old, new):
        assert a.to_line() == b.to_line()
    # the pool must actually exercise the interesting paths
    assert sum(1 for r in old if r.flag & 2048) >= 4, "no supplementaries"
    assert sum(1 for r in old if r.flag == 4) >= 1, "no unmapped"
    assert any("I" in r.cigar or "D" in r.cigar for r in old), "no indels"


def test_fused_matches_host_on_mesh(cpu_mesh):
    rng = np.random.default_rng(12)
    params = ae.AlignParams.from_preset("sr")
    tasks = _mixed_pool(rng, params, n_reads=90)  # odd count: pad coverage
    old = ae.flush_pairs(tasks, params, mesh=None, fused=False)
    new = ae.flush_pairs(tasks, params, mesh=cpu_mesh, fused=True)
    assert [r.to_line() for r in old] == [r.to_line() for r in new]


def test_fused_empty_and_anchorless():
    params = ae.AlignParams.from_preset("sr")
    assert ae.flush_pairs([], params, fused=True) == []
    rng = np.random.default_rng(13)
    ref = opm.build_ref_index(
        "g", [("c", rng.integers(0, 4, 50_000).astype(np.uint8))],
        params.k, params.w,
    )
    sks = [ae.QuerySketch.make("j", "ACGTACGT" * 30, params)]
    recs = ae.flush_pairs(ae.make_pairs_batch(ref, sks, params), params, fused=True)
    assert [r.flag for r in recs] == [4]


def test_fused_env_gate(monkeypatch):
    """PHYLIGN_TPU_ALIGN_FUSED=0 must route to the host path."""
    monkeypatch.setenv("PHYLIGN_TPU_ALIGN_FUSED", "0")
    calls = []
    orig = ae.flush_pairs_host

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(ae, "flush_pairs_host", spy)
    params = ae.AlignParams.from_preset("sr")
    rng = np.random.default_rng(14)
    ref = opm.build_ref_index(
        "g", [("c", rng.integers(0, 4, 30_000).astype(np.uint8))],
        params.k, params.w,
    )
    sks = [ae.QuerySketch.make("q", decode_seq(ref.codes[:150]).decode(), params)]
    ae.flush_pairs(ae.make_pairs_batch(ref, sks, params), params)
    assert calls


class TestPooledBatches:
    """align_batches_pooled must route records back to batches byte-exactly
    equal to per-batch align_batch, while pooling pairs across batches."""

    def _fixture(self, tmp_path, n_batches=3, genomes=6, reads=40):
        from phylign_tpu.io import asmtar
        from phylign_tpu.match.filter import FilteredQuery

        rng = np.random.default_rng(7)
        params = ae.AlignParams.from_preset("sr")
        specs = []
        flat = []  # (batch_idx, acc, genome codes)
        for b in range(n_batches):
            docs = []
            for g in range(genomes):
                acc = f"POOL{b}{g:03d}"
                seq = rng.integers(0, 4, 4000).astype(np.uint8)
                docs.append((acc, [(f"{acc}.c1", decode_seq(seq))]))
                flat.append((b, acc, seq))
            tar = tmp_path / f"pool_{b:02d}__01.tar.xz"
            asmtar.write_batch_tar(tar, docs)
            specs.append(
                (
                    f"pool_{b:02d}__01",
                    str(tar),
                    {a for fb, a, _g in flat if fb == b},
                )
            )
        queries = []
        for i in range(reads):
            bi, acc, gseq = flat[int(rng.integers(0, len(flat)))]
            pos = int(rng.integers(0, len(gseq) - 150))
            r = gseq[pos : pos + 150].copy()
            if i % 2:
                r = (3 - r)[::-1].copy()
            # candidates span 1-3 accessions across batches
            cands = [(0, acc, 150)]
            for _ in range(int(rng.integers(0, 3))):
                b2, a2, _ = flat[int(rng.integers(0, len(flat)))]
                cands.append((0, a2, 100))
            queries.append(
                FilteredQuery(f"pr{i:03d}", decode_seq(r).decode(), cands)
            )
        return specs, queries, params

    def test_pooled_equals_per_batch(self, tmp_path):
        specs, queries, params = self._fixture(tmp_path)
        per_batch = {}
        for name, tar, accs in specs:
            per_batch[name] = list(
                ae.align_batch(tar, queries, accs, params, pair_chunk=4096)
            )
        # tiny pair_chunk forces flushes SPANNING batch boundaries
        pooled = dict(
            ae.align_batches_pooled(
                specs, queries, params, pair_chunk=16, producers=2
            )
        )
        assert set(pooled) == set(per_batch)
        for name in per_batch:
            assert pooled[name] == per_batch[name], name

    def test_pooled_empty_and_single(self, tmp_path):
        specs, queries, params = self._fixture(tmp_path, n_batches=2)
        # a batch with no candidate queries yields an empty record list
        no_q = [q for q in queries if not q.candidates]
        pooled = dict(
            ae.align_batches_pooled(specs, no_q, params, pair_chunk=64)
        )
        assert pooled == {specs[0][0]: [], specs[1][0]: []}
        assert list(ae.align_batches_pooled([], queries, params)) == []

    def test_pooled_producer_error_propagates(self, tmp_path):
        specs, queries, params = self._fixture(tmp_path, n_batches=2)
        bad = [(specs[0][0], str(tmp_path / "missing.tar.xz"), None)] + specs[1:]
        with pytest.raises(Exception):
            list(ae.align_batches_pooled(bad, queries, params, pair_chunk=64))
