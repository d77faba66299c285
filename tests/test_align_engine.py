import gzip

import numpy as np
import pytest

from phylign_tpu.align import engine
from phylign_tpu.io import asmtar, sam
from phylign_tpu.kmer import decode_seq, revcomp
from phylign_tpu.match.filter import FilteredQuery


def rand_seq(rng, n):
    return bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))


@pytest.fixture(scope="module")
def batch(tmp_path_factory):
    """Two genomes; reads planted fwd/rc/mutated; one absent read."""
    rng = np.random.default_rng(20)
    g1c1 = rand_seq(rng, 4000)
    g1c2 = rand_seq(rng, 3000)
    g2c1 = rand_seq(rng, 5000)

    reads = {}
    reads["r_fwd"] = g1c1[1000:1150]  # exact, + strand, genome1 contig1
    reads["r_rev"] = revcomp(g1c2[500:650])  # exact, - strand, genome1 contig2
    mut = bytearray(g2c1[2000:2150])
    mut[70] = ord("A") if mut[70] != ord("A") else ord("C")
    reads["r_mut"] = bytes(mut)  # 1 mismatch, genome2
    reads["r_absent"] = rand_seq(rng, 150)  # matches nothing

    d = tmp_path_factory.mktemp("batch")
    tar = d / "synth__01.tar.xz"
    asmtar.write_batch_tar(
        tar,
        [
            ("SAMT0001", [("SAMT0001.contig1", g1c1), ("SAMT0001.contig2", g1c2)]),
            ("SAMT0002", [("SAMT0002.contig1", g2c1)]),
        ],
    )
    queries = [
        FilteredQuery("r_fwd", reads["r_fwd"].decode(), [("b", "SAMT0001", 120)]),
        FilteredQuery("r_rev", reads["r_rev"].decode(), [("b", "SAMT0001", 120)]),
        FilteredQuery(
            "r_mut",
            reads["r_mut"].decode(),
            [("b", "SAMT0002", 90), ("b", "SAMT0001", 5)],
        ),
        FilteredQuery("r_absent", reads["r_absent"].decode(), [("b", "SAMT0002", 1)]),
        FilteredQuery("r_nocand", "ACGT" * 40, []),
    ]
    return str(tar), queries, reads


class TestAsmTar:
    def test_roundtrip_and_selection(self, batch):
        tar, _, _ = batch
        all_g = list(asmtar.iter_batch_assemblies(tar))
        assert [g for g, _ in all_g] == ["SAMT0001", "SAMT0002"]
        assert all_g[0][1][0][0] == "SAMT0001.contig1"
        only2 = list(asmtar.iter_batch_assemblies(tar, {"SAMT0002"}))
        assert [g for g, _ in only2] == ["SAMT0002"]


class TestAlignBatch:
    @pytest.fixture(scope="class")
    def records(self, batch):
        tar, queries, _ = batch
        return list(engine.align_batch(tar, queries, None))

    def test_record_set(self, records):
        # genome1 gets r_fwd, r_rev AND r_mut (spurious candidate -> unmapped
        # there, exactly like feeding it to that genome's minimap2);
        # genome2 gets r_mut (mapped) and r_absent; r_nocand appears nowhere
        assert [(r.qname, r.flag) for r in records] == [
            ("r_fwd", 0),
            ("r_rev", 16),
            ("r_mut", 4),
            ("r_mut", 0),
            ("r_absent", 4),
        ]

    def test_fwd_alignment(self, records):
        r = records[0]
        assert r.rname == "SAMT0001.contig1"
        assert r.pos == 1001
        assert r.cigar == "150="
        assert "NM:i:0" in r.tags

    def test_rev_alignment(self, records):
        r = records[1]
        assert r.rname == "SAMT0001.contig2"
        assert r.pos == 501
        assert r.cigar == "150="
        # SEQ is the revcomp (i.e. the genome-forward sequence)
        assert r.flag == 16

    def test_mutated(self, records):
        r = records[3]
        assert r.rname == "SAMT0002.contig1"
        assert r.pos == 2001
        assert r.cigar == "70=1X79="
        assert "NM:i:1" in r.tags

    def test_unmapped(self, records):
        r = records[4]
        assert (r.rname, r.pos, r.cigar) == ("*", 0, "*")

    def test_accession_filter(self, batch):
        tar, queries, _ = batch
        recs = list(engine.align_batch(tar, queries, {"SAMT0002"}))
        assert {r.qname for r in recs} == {"r_mut", "r_absent"}


class TestSamIO:
    def test_record_line(self):
        r = sam.SamRecord("q1", 16, "ACC.c1", 42, 60, "150=", "ACGT", ["NM:i:0"])
        line = r.to_line()
        f = line.split("\t")
        assert f[:6] == ["q1", "16", "ACC.c1", "42", "60", "150="]
        assert f[9] == "ACGT" and f[11] == "NM:i:0"

    def test_aggregate_multimember_gzip(self, tmp_path):
        p1 = tmp_path / "b1.sam.gz"
        p2 = tmp_path / "b2.sam.gz"
        sam.write_batch_sam(p1, [sam.SamRecord("q", 0, "r", 1, 60, "4=", "ACGT")])
        sam.write_batch_sam(p2, [sam.unmapped_record("q2", "TTTT")])
        out = tmp_path / "sum.sam_summary.gz"
        sam.aggregate_sams(out, [p1, p2])
        text = gzip.decompress(out.read_bytes()).decode()
        lines = text.splitlines()
        assert lines[0] == f"==> {p1} <=="
        assert lines[1].startswith("q\t0\tr")
        assert lines[2] == ""
        assert lines[3] == f"==> {p2} <=="
        assert lines[4].startswith("q2\t4\t*")

    def test_summary_first3(self, tmp_path):
        p1 = tmp_path / "b1.sam.gz"
        sam.write_batch_sam(p1, [sam.SamRecord("q", 0, "r", 1, 60, "4=", "ACGT")])
        out = tmp_path / "s.gz"
        sam.aggregate_sams(out, [p1])
        assert sam.summary_first3(out) == [("b1.sam.gz",), ("q", "0", "r")]


class TestLongQueries:
    """ARGannot-style gene queries (multi-kb) through the bucketed extension."""

    def test_gene_alignment(self):
        rng = np.random.default_rng(33)
        contig = rand_seq(rng, 12000)
        gene = bytearray(contig[4000:6000])  # 2 kb gene
        gene[500] = ord("A") if gene[500] != ord("A") else ord("C")
        gene[1500] = ord("G") if gene[1500] != ord("G") else ord("T")
        queries = [
            FilteredQuery("geneX", bytes(gene).decode(), [("b", "SAMG0001", 100)]),
            FilteredQuery("readY", contig[100:250].decode(), [("b", "SAMG0001", 120)]),
        ]
        import tempfile, pathlib
        d = pathlib.Path(tempfile.mkdtemp())
        tar = d / "genes__01.tar.xz"
        asmtar.write_batch_tar(tar, [("SAMG0001", [("SAMG0001.c1", contig)])])
        recs = list(engine.align_batch(str(tar), queries, None))
        by = {r.qname: r for r in recs}
        g = by["geneX"]
        assert g.flag == 0 and g.rname == "SAMG0001.c1" and g.pos == 4001
        # cigar consumes the full 2 kb query with exactly 2 mismatches
        import re
        ops = re.findall(r"(\d+)([=XIDS])", g.cigar)
        assert sum(int(n) for n, op in ops if op in "=XIS") == 2000
        assert sum(int(n) for n, op in ops if op == "X") == 2
        assert by["readY"].pos == 101 and by["readY"].cigar == "150="


class TestPresets:
    def test_sr_default_matches(self):
        p = engine.AlignParams.from_preset("sr", "--eqx")
        assert (p.k, p.w) == (21, 11)
        assert p.scoring.mismatch == 8

    def test_long_read_preset(self):
        p = engine.AlignParams.from_preset("map-ont")
        assert (p.k, p.w, p.max_gap) == (15, 10, 5000)

    def test_unknown_preset_rejected(self):
        import pytest as _pt
        with _pt.raises(ValueError, match="unsupported minimap preset"):
            engine.AlignParams.from_preset("splice")
        with _pt.raises(ValueError, match="extra_params"):
            engine.AlignParams.from_preset("sr", "--secondary=yes")

    def test_ont_alignment_works(self):
        # a 1 kb "long read" with 5% errors via the map-ont preset
        rng = np.random.default_rng(44)
        contig = rand_seq(rng, 20000)
        read = bytearray(contig[5000:6000])
        for pos in rng.integers(0, 1000, 20):
            read[pos] = ord("ACGT"[(read[pos] + 1) % 4])
        import tempfile, pathlib
        d = pathlib.Path(tempfile.mkdtemp())
        tar = d / "ont__01.tar.xz"
        asmtar.write_batch_tar(tar, [("SAMO0001", [("SAMO0001.c1", contig)])])
        queries = [FilteredQuery("lr1", bytes(read).decode(), [("b", "SAMO0001", 500)])]
        params = engine.AlignParams.from_preset("map-ont")
        recs = list(engine.align_batch(str(tar), queries, None, params))
        assert recs[0].flag == 0
        assert recs[0].rname == "SAMO0001.c1"
        assert recs[0].pos == 5001


class TestLocalTrim:
    """minimap2-style end clipping: the glocal path is trimmed to its
    max-scoring sub-path, soft-clipping garbage query ends
    (mm2 zdrop/extension behavior, batch_align.py:268-270 invocation)."""

    def test_trim_helper_clean(self):
        sc = engine.ope.SrScoring()
        out = engine._local_trim([(150, "=")], sc)
        assert out == ([(150, "=")], 0, 300.0)

    def test_trim_helper_bad_tail(self):
        sc = engine.ope.SrScoring()
        cig = [(100, "="), (50, "X")]
        out = engine._local_trim(cig, sc)
        assert out == ([(100, "="), (50, "S")], 0, 200.0)

    def test_trim_helper_bad_head_ref_skip(self):
        sc = engine.ope.SrScoring()
        cig = [(30, "X"), (120, "=")]
        new, lead_r, score = engine._local_trim(cig, sc)
        assert new == [(30, "S"), (120, "=")]
        assert lead_r == 30  # X consumes ref: pos advances
        assert score == 240.0

    def test_trim_helper_all_garbage(self):
        sc = engine.ope.SrScoring()
        assert engine._local_trim([(150, "X")], sc) is None

    def test_trim_gap_cost_dual_affine(self):
        sc = engine.ope.SrScoring()
        # 60= 10I 60=: gap cost min(12+10*2, 32+10*1) = 32
        new, lead_r, score = engine._local_trim(
            [(60, "="), (10, "I"), (60, "=")], sc
        )
        assert new == [(60, "="), (10, "I"), (60, "=")]
        assert score == pytest.approx(240.0 - 32.0)

    def test_adapter_tail_soft_clipped(self):
        # 110 genome bases + 40 bases of adapter garbage: mm2 clips the tail
        rng = np.random.default_rng(77)
        contig = rand_seq(rng, 4000)
        read = contig[800:910] + rand_seq(rng, 40)
        import tempfile, pathlib

        d = pathlib.Path(tempfile.mkdtemp())
        tar = d / "clip__01.tar.xz"
        asmtar.write_batch_tar(tar, [("SAMC0001", [("SAMC0001.c1", contig)])])
        queries = [FilteredQuery("ad1", read.decode(), [("b", "SAMC0001", 80)])]
        recs = list(engine.align_batch(str(tar), queries, None))
        r = recs[0]
        assert r.flag == 0
        assert r.pos == 801
        # extension may absorb coincidentally-matching adapter bases (just
        # as minimap2's extension does) but must clip the garbage tail
        import re

        m = re.fullmatch(r"(\d+)=(\d+)S", r.cigar)
        assert m, r.cigar
        assert int(m.group(1)) >= 110
        assert "NM:i:0" in r.tags

    def test_contig_overhang_soft_clipped(self):
        # read starts 30 bp before the contig: leading bases must soft-clip
        rng = np.random.default_rng(78)
        contig = rand_seq(rng, 3000)
        read = rand_seq(rng, 30) + contig[:120]
        import tempfile, pathlib

        d = pathlib.Path(tempfile.mkdtemp())
        tar = d / "over__01.tar.xz"
        asmtar.write_batch_tar(tar, [("SAMV0001", [("SAMV0001.c1", contig)])])
        queries = [FilteredQuery("ov1", read.decode(), [("b", "SAMV0001", 80)])]
        recs = list(engine.align_batch(str(tar), queries, None))
        r = recs[0]
        assert r.flag == 0
        assert r.pos == 1
        assert r.cigar == "30S120="


class TestSupplementary:
    """Split reads: two mostly-disjoint query segments mapping to distant
    loci yield a primary plus a flag-2048 supplementary record (minimap2's
    split-read output; the reference's golden set has none, so this covers
    the adversarial-input contract)."""

    @pytest.fixture(scope="class")
    def split_records(self):
        rng = np.random.default_rng(91)
        contig = rand_seq(rng, 10000)
        # left 80 bp from locus 1000, right 70 bp from locus 7000
        read = contig[1000:1080] + contig[7000:7070]
        import tempfile, pathlib

        d = pathlib.Path(tempfile.mkdtemp())
        tar = d / "split__01.tar.xz"
        asmtar.write_batch_tar(tar, [("SAMS0001", [("SAMS0001.c1", contig)])])
        queries = [FilteredQuery("sp1", read.decode(), [("b", "SAMS0001", 100)])]
        return list(engine.align_batch(str(tar), queries, None))

    def test_two_records(self, split_records):
        assert [r.qname for r in split_records] == ["sp1", "sp1"]
        flags = sorted(r.flag for r in split_records)
        assert flags[0] in (0, 16)
        assert flags[1] & 2048

    def test_primary_is_longer_segment(self, split_records):
        prim = next(r for r in split_records if not r.flag & 2048)
        assert prim.pos == 1001
        assert prim.cigar.startswith("80=") or "80=" in prim.cigar

    def test_supplementary_segment(self, split_records):
        supp = next(r for r in split_records if r.flag & 2048)
        assert supp.pos == 7001
        # hard-clipped: SEQ is just the segment, clip op is H
        assert "H" in supp.cigar
        assert "S" not in supp.cigar
        assert len(supp.seq) < 150


class TestWideBandPresets:
    def test_long_read_large_deletion_map_ont(self):
        """A 200 bp deletion drifts the diagonal past the sr half-band (64);
        the map-ont preset's 512-wide band must still recover it."""
        import numpy as np

        from phylign_tpu.align.engine import (
            AlignParams,
            QuerySketch,
            align_genome,
        )
        from phylign_tpu.kmer import decode_seq

        rng = np.random.default_rng(41)
        params = AlignParams.from_preset("map-ont")
        assert params.band == 512
        genome = rng.integers(0, 4, 50_000).astype(np.uint8)
        x = 10_000
        read_codes = np.concatenate(
            [genome[x : x + 900], genome[x + 1100 : x + 2000]]
        )  # 200 bp deletion in the middle
        sk = QuerySketch.make("lr1", decode_seq(read_codes).decode(), params)
        recs = align_genome("g", [("c1", genome)], [sk], params)
        assert len(recs) == 1
        rec = recs[0]
        assert rec.flag == 0 and rec.rname == "c1"
        assert f"200D" in rec.cigar, rec.cigar
        assert rec.pos == x + 1


class TestHomopolymerCompression:
    def test_hpc_sketch_invariant_to_run_lengths(self):
        import numpy as np

        from phylign_tpu.kmer import encode_seq
        from phylign_tpu.ops import minimizer as opm

        a = encode_seq(b"ACGTACGGGGTACGTTTACGATCGGATCGATTTACGCAT" * 4)
        # expand some runs: duplicate a few bases in place
        b = np.repeat(a, np.where(np.arange(len(a)) % 17 == 0, 3, 1))
        ha, _, sa = opm.minimizers(a, k=9, w=5, hpc=True)
        hb, _, sb = opm.minimizers(b, k=9, w=5, hpc=True)
        assert set(map(int, ha)) == set(map(int, hb))

    def test_map_pb_aligns_run_length_errors(self):
        """A read whose homopolymer runs are lengthened (classic PacBio CLR
        error mode) must still seed and align under map-pb (hpc=True)."""
        import numpy as np

        from phylign_tpu.align.engine import (
            AlignParams,
            QuerySketch,
            align_genome,
        )
        from phylign_tpu.kmer import decode_seq

        rng = np.random.default_rng(47)
        params = AlignParams.from_preset("map-pb")
        assert params.hpc
        genome = rng.integers(0, 4, 40_000).astype(np.uint8)
        x = 9_000
        raw = genome[x : x + 1500]
        # lengthen ~4% of positions into homopolymer insertions
        dup = rng.random(1500) < 0.04
        read_codes = np.repeat(raw, np.where(dup, 2, 1))
        sk = QuerySketch.make("pb1", decode_seq(read_codes).decode(), params)
        recs = align_genome("g", [("c1", genome)], [sk], params)
        assert len(recs) >= 1
        rec = recs[0]
        assert rec.flag in (0, 16) and rec.rname == "c1", (rec.flag, rec.cigar)
        assert abs(rec.pos - (x + 1)) < 50, rec.pos
