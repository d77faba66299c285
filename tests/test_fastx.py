import gzip

from phylign_tpu.io import fastx


def parse(text):
    return list(fastx.read_fastx(text.splitlines(keepends=True)))


class TestReadFastx:
    def test_fasta_multiline(self):
        recs = parse(">a c1 c2\nACGT\nTTTT\n>b\nGG\n")
        assert recs[0].name == "a"
        assert recs[0].comment == "c1 c2"
        assert recs[0].seq == "ACGTTTTT"
        assert recs[0].qual is None
        assert recs[1].name == "b" and recs[1].seq == "GG"

    def test_fastq(self):
        recs = parse("@r1 com\nACGT\n+\nIIII\n@r2\nAC\nGT\n+\nII\nII\n")
        assert recs[0] == fastx.FastxRecord("r1", "com", "ACGT", "IIII")
        assert recs[1].seq == "ACGT" and recs[1].qual == "IIII"

    def test_reference_reads(self):
        recs = list(fastx.read_fastx_file("/root/reference/data/reads_1.fastq"))
        assert len(recs) == 10
        assert all(len(r.seq) == 150 for r in recs)
        assert recs[0].name == "1A"

    def test_gzip_roundtrip(self, tmp_path):
        p = tmp_path / "x.fa.gz"
        with gzip.open(p, "wt") as f:
            f.write(">q\nACGT\n")
        recs = list(fastx.read_fastx_file(p))
        assert recs[0].seq == "ACGT"


class TestNormalizeMerge:
    def test_stems(self):
        assert fastx.file_stem("input/reads_1.fastq") == "reads_1"
        assert fastx.file_stem("a/b/x.fa.gz") == "x"
        assert (
            fastx.merged_stem(
                [
                    "/root/reference/data/reads_2.fq",
                    "/root/reference/data/reads_1.fastq",
                    "/root/reference/data/reads_4.fa",
                    "/root/reference/data/reads_3.fasta",
                ]
            )
            == "reads_1___reads_2___reads_3___reads_4"
        )

    def test_normalize_and_merge_reference_inputs(self):
        paths = [
            f"/root/reference/data/reads_{i}.{s}"
            for i, s in [(1, "fastq"), (2, "fq"), (3, "fasta"), (4, "fa")]
        ]
        stem, records = fastx.normalize_and_merge(paths)
        assert stem == "reads_1___reads_2___reads_3___reads_4"
        assert len(records) == 40
        assert all(set(r.seq) <= set("ACGT") for r in records)
        # sorted-stem order: reads_1 first
        assert records[0].name == "1A"

    def test_duplicate_names_rejected(self, tmp_path):
        a = tmp_path / "a.fa"
        b = tmp_path / "b.fa"
        a.write_text(">q1\nAC\n")
        b.write_text(">q1\nGT\n")
        try:
            fastx.normalize_and_merge([a, b])
            assert False, "expected ValueError"
        except ValueError:
            pass
