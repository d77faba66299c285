"""Cross-validation against the reference's OWN scripts.

Runs /root/reference/scripts/{filter_queries.py,final_stats.py} as
subprocesses over THIS pipeline's intermediates and requires byte-identical
outputs — the strongest parity check available without the Zenodo data
(the scripts define the 04_filter and stats contracts; SURVEY.md §2a).
Skipped when the reference checkout isn't present.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "scripts" / "filter_queries.py").exists(),
    reason="reference checkout not available",
)

XOPEN_SHIM = '''
"""Minimal xopen shim for running reference scripts in-tree."""
import gzip, io, lzma

def xopen(path, mode="rt"):
    p = str(path)
    if p.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(p, "rb"))
    if p.endswith(".xz"):
        return io.TextIOWrapper(lzma.open(p, "rb"))
    return open(p, mode)
'''


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    from phylign_tpu.config import Config
    from phylign_tpu.pipeline.stages import Pipeline
    from phylign_tpu.testing import make_fixture

    wd = tmp_path_factory.mktemp("xval")
    make_fixture(wd, n_batches=3, seed=99)
    cfg = Config.from_yaml(wd / "config.yaml")
    pl = Pipeline(cfg, wd)
    inputs = sorted(str(p) for p in (wd / "input").iterdir())
    pl.run_all(inputs)

    shim_dir = tmp_path_factory.mktemp("shim") / "xopen"
    shim_dir.mkdir()
    (shim_dir / "__init__.py").write_text(XOPEN_SHIM)
    env = dict(
        os.environ,
        PYTHONPATH=str(shim_dir.parent) + ":" + os.environ.get("PYTHONPATH", ""),
    )
    return wd, env


STEM = "reads_1___reads_2___reads_3___reads_4"


class TestReferenceScriptParity:
    def test_filter_queries_byte_identical(self, pipeline_run):
        wd, env = pipeline_run
        match_files = sorted(
            str(p) for p in (wd / "intermediate" / "03_match").glob("*.gz")
        )
        ref = subprocess.run(
            [
                sys.executable,
                str(REF / "scripts" / "filter_queries.py"),
                "-q",
                str(wd / "intermediate" / "01_queries_merged" / f"{STEM}.fa"),
                "-n",
                "1",
                *match_files,
            ],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        ours = (wd / "intermediate" / "04_filter" / f"{STEM}.fa").read_text()
        assert ours == ref.stdout

    def test_final_stats_byte_identical(self, pipeline_run):
        wd, env = pipeline_run
        ref = subprocess.run(
            [
                sys.executable,
                str(REF / "scripts" / "final_stats.py"),
                str(wd / "intermediate" / "01_queries_merged" / f"{STEM}.fa"),
                str(wd / "output" / f"{STEM}.sam_summary.gz"),
            ],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        ours = (wd / "output" / f"{STEM}.sam_summary.stats").read_text()
        assert ours == ref.stdout

    def test_postprocess_cobs_roundtrip(self, pipeline_run):
        """Our match files re-postprocessed by the reference's
        postprocess_cobs.py (top-n + ties) must be a fixpoint: the files
        already encode exactly the reference's truncation."""
        wd, env = pipeline_run
        import gzip

        for mf in (wd / "intermediate" / "03_match").glob("*.gz"):
            text = gzip.decompress(mf.read_bytes()).decode()
            # reference script expects the PRE-postprocess doc names with a
            # random prefix; our files are post-stripped ('_ACC'), which its
            # remove_rnd_id maps to '_ACC' again (partition at first '_')
            ref = subprocess.run(
                [sys.executable, str(REF / "scripts" / "postprocess_cobs.py"), "-n", "1"],
                input=text,
                capture_output=True,
                text=True,
                env=env,
                check=True,
            )
            assert ref.stdout == text, mf.name


GOLDEN_XZ = REF / "data" / f"{STEM}.sam_summary.xz"


class TestAggregateSamsParity:
    def test_aggregate_byte_identical_decompressed(self, pipeline_run):
        """The reference's aggregate_sams.sh run over THIS pipeline's
        05_map files (same workdir-relative arguments the Snakefile passes,
        ref: Snakefile:566-579) must decompress byte-identically to our
        sam_summary.gz. Compressed bytes differ legitimately (gzip level /
        header metadata), the decompressed stream is the contract."""
        import gzip

        wd, env = pipeline_run
        batches = sorted(
            p.name[: -len(f"____{STEM}.sam.gz")]
            for p in (wd / "intermediate" / "05_map").glob("*.sam.gz")
        )
        rel = [
            f"intermediate/05_map/{b}____{STEM}.sam.gz" for b in batches
        ]
        ref = subprocess.run(
            ["bash", str(REF / "scripts" / "aggregate_sams.sh"), *rel],
            capture_output=True,
            cwd=wd,
            env=env,
            check=True,
        )
        theirs = gzip.decompress(ref.stdout)
        ours = gzip.decompress(
            (wd / "output" / f"{STEM}.sam_summary.gz").read_bytes()
        )
        assert ours == theirs


class TestRealGoldenStatsParity:
    def test_final_stats_on_real_golden_byte_identical(
        self, pipeline_run, tmp_path
    ):
        """Our stats stage vs the reference's final_stats.py on the REAL
        golden sam_summary (5,671 real minimap2 records) and the REAL
        bundled reads — real-data crossval, not synthetic."""
        from phylign_tpu.io.fastx import normalize_and_merge, write_fasta
        from phylign_tpu.io.stats import compute_stats

        _wd, env = pipeline_run
        reads = sorted(
            str(REF / "data" / f) for f in
            ("reads_1.fastq", "reads_2.fq", "reads_3.fasta", "reads_4.fa")
        )
        stem, records = normalize_and_merge(reads)
        assert stem == STEM
        merged = tmp_path / f"{stem}.fa"
        with open(merged, "w") as fp:
            write_fasta(fp, records)
        ref = subprocess.run(
            [
                sys.executable,
                str(REF / "scripts" / "final_stats.py"),
                str(merged),
                str(GOLDEN_XZ),
            ],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        ours = compute_stats(GOLDEN_XZ, merged).to_tsv()
        assert ours == ref.stdout
