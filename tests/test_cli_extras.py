import json

import numpy as np
import pytest

from phylign_tpu import testing as fixture_mod
from phylign_tpu.cli import main
from phylign_tpu.parallel.launch import detect_process_env, shard_batches


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    fixture_mod.make_fixture(d, n_batches=2, seed=11)
    return d


class TestProcessSharding:
    def test_shard_batches(self):
        b = [f"b{i}" for i in range(7)]
        parts = [shard_batches(b, 3, p) for p in range(3)]
        assert sorted(sum(parts, [])) == sorted(b)
        assert parts[0] == ["b0", "b3", "b6"]

    def test_slurm_env_detection(self, monkeypatch):
        monkeypatch.setenv("SLURM_NTASKS", "4")
        monkeypatch.setenv("SLURM_PROCID", "2")
        monkeypatch.setenv("SLURM_NODELIST", "node[01-04]")
        coord, num, pid = detect_process_env()
        assert (num, pid) == (4, 2)
        assert coord == "node"

    def test_sharded_match_then_map(self, workdir, capsys):
        """Sequential rank execution (cluster resume order): non-zero ranks
        defer finalization; rank 0, finding every peer output present,
        finalizes without waiting. The concurrent-ranks barrier (rank 0
        launched first, polling) is covered by test_multiprocess_cli.py."""
        inputs = sorted(str(p) for p in (workdir / "input").iterdir())
        base = ["--config", str(workdir / "config.yaml"), "--workdir", str(workdir)]
        main(["match", *base, "--num-processes", "2", "--process-id", "1", *inputs])
        assert "rank 0 runs the filter" in capsys.readouterr().out
        main(["match", *base, "--num-processes", "2", "--process-id", "0", *inputs])
        assert "match done" in capsys.readouterr().out
        main(["map", *base, "--num-processes", "2", "--process-id", "1", *inputs])
        assert "rank 0 aggregates" in capsys.readouterr().out
        main(["map", *base, "--num-processes", "2", "--process-id", "0", *inputs])
        assert "map done" in capsys.readouterr().out
        got = (workdir / "output").glob("*.sam_summary.gz")
        assert list(got)


class TestPreflight:
    def test_passes_on_fixture(self, workdir, capsys):
        main(
            [
                "preflight",
                "--config", str(workdir / "config.yaml"),
                "--workdir", str(workdir),
            ]
        )
        out = capsys.readouterr().out
        assert "preflight PASSED" in out
        assert "[FAIL]" not in out
        assert "rid_{accession} prefix" in out

    def test_fails_on_corrupt_index(self, tmp_path, capsys):
        import lzma

        fixture_mod.make_fixture(tmp_path, n_batches=1, seed=13)
        idx = next((tmp_path / "cobs").glob("*.xz"))
        raw = bytearray(lzma.decompress(idx.read_bytes()))
        raw[:8] = b"XXXXXXXX"  # clobber the magic
        idx.write_bytes(lzma.compress(bytes(raw)))
        with pytest.raises(SystemExit) as ei:
            main(
                [
                    "preflight",
                    "--config", str(tmp_path / "config.yaml"),
                    "--workdir", str(tmp_path),
                ]
            )
        assert "preflight FAILED" in str(ei.value)
        assert "[FAIL]" in capsys.readouterr().out


class TestBuildIndexCLI:
    def test_build_and_query(self, workdir, tmp_path, capsys):
        from phylign_tpu.io import cobs
        from phylign_tpu.kmer import encode_seq
        from phylign_tpu.match.oracle import query_index

        batch = (workdir / "data" / "batches_small.txt").read_text().split()[0]
        tar = workdir / "asms" / f"{batch}.tar.xz"
        out = tmp_path / "rebuilt.cobs_classic.xz"
        main(["build-index", str(tar), str(out)])
        assert "built" in capsys.readouterr().out
        idx = cobs.read_classic_index(out)
        assert idx.num_docs == 4
        # a read planted in this batch must hit its genome via the rebuilt index
        didx = cobs.to_device_index(idx)
        reads = (workdir / "input" / "reads_1.fastq").read_text().splitlines()
        seq = reads[1].encode()
        hits = query_index(didx, encode_seq(seq), threshold=0.7)
        assert hits, "planted read should hit the rebuilt index"


class TestReport:
    def test_report_html(self, workdir, capsys):
        main(["report", "--workdir", str(workdir)])
        out = capsys.readouterr().out
        html = (workdir / "report.html").read_text()
        assert "Output stats" in html or "Stage benchmarks" in html


class TestIndexSizes:
    def test_scan(self, workdir, tmp_path, capsys):
        out = tmp_path / "sizes.txt"
        main(["index-sizes", "--cobs-dir", str(workdir / "cobs"), "--out", str(out)])
        lines = out.read_text().splitlines()
        assert len(lines) == 2
        name, size, mem = lines[0].split()
        assert name.startswith("cobs/") and int(size) > 1000


class TestReferenceGoldenMode:
    def test_golden_diff_mode(self, tmp_path):
        import lzma, shutil
        from phylign_tpu.testing import make_fixture, run_reference_golden_test

        wd = tmp_path / "wd"
        make_fixture(wd, n_batches=2, seed=5)
        inputs = sorted(str(p) for p in (wd / "input").iterdir())
        # first run produces the output we snapshot as "the golden file"
        from phylign_tpu.config import Config
        from phylign_tpu.pipeline.stages import Pipeline

        cfg = Config.from_yaml(wd / "config.yaml")
        pl = Pipeline(cfg, wd)
        out = pl.run_all(inputs)
        golden = tmp_path / "golden.sam_summary.gz"
        shutil.copy(out, golden)
        # clean state, re-run through the reference-golden path
        shutil.rmtree(wd / "intermediate")
        shutil.rmtree(wd / "output")
        assert run_reference_golden_test(
            wd, golden, wd / "data" / "batches_small.txt", inputs
        )
        # corrupt the golden -> must FAIL
        with lzma.open(tmp_path / "bad.sam_summary.xz", "wt") as f:
            f.write("zz\t0\tnope\n")
        shutil.rmtree(wd / "intermediate")
        shutil.rmtree(wd / "output")
        assert not run_reference_golden_test(
            wd, tmp_path / "bad.sam_summary.xz",
            wd / "data" / "batches_small.txt", inputs,
        )


class TestConfigAndClean:
    def test_config_prints_resolved(self, tmp_path, capsys):
        wd = tmp_path / "cfg"
        fixture_mod.make_fixture(wd, n_batches=1, seed=3)
        main(["config", "--workdir", str(wd), "--nb-best-hits", "7"])
        out = capsys.readouterr().out
        assert "nb_best_hits: 7" in out
        assert "batches: data/batches_small.txt" in out

    def test_clean_all_removes_downloads(self, tmp_path, capsys):
        wd = tmp_path / "cl"
        fixture_mod.make_fixture(wd, n_batches=1, seed=4)
        (wd / "output").mkdir(exist_ok=True)
        main(["clean", "--workdir", str(wd)])
        assert (wd / "cobs").exists()  # plain clean keeps downloads
        main(["clean", "--workdir", str(wd), "--all"])
        assert not (wd / "cobs").exists()
        assert not (wd / "asms").exists()

    def test_download_only_flag_parses(self, tmp_path, capsys):
        # all artifacts already present -> no network touched
        wd = tmp_path / "dl"
        fixture_mod.make_fixture(wd, n_batches=1, seed=5)
        main(["download", "--workdir", str(wd), "--only", "cobs"])
        assert "already present" in capsys.readouterr().out
