import threading
import time

import pytest

from phylign_tpu.config import Config
from phylign_tpu.pipeline import download
from phylign_tpu.pipeline.manifest import Manifest, atomic_write_via
from phylign_tpu.pipeline.scheduler import Job, RamPool, Scheduler


class TestScheduler:
    def test_runs_all_and_returns_results(self):
        s = Scheduler(workers=4, max_ram_mb=1024, max_io_heavy=2)
        jobs = [Job(name=f"j{i}", fn=lambda i=i: i * 2) for i in range(10)]
        out = s.run(jobs)
        assert out == {f"j{i}": i * 2 for i in range(10)}

    def test_priority_order_single_worker(self):
        s = Scheduler(workers=1, max_ram_mb=1024, max_io_heavy=1)
        order = []
        jobs = [
            Job(name="low", fn=lambda: order.append("low"), priority=0),
            Job(name="high", fn=lambda: order.append("high"), priority=999),
        ]
        s.run(jobs)
        assert order == ["high", "low"]

    def test_oom_retry_escalates(self):
        s = Scheduler(workers=1, max_ram_mb=4096, max_io_heavy=1)
        attempts = []

        def flaky():
            attempts.append(1)
            if len(attempts) < 3:
                raise MemoryError("synthetic")
            return "ok"

        out = s.run([Job(name="x", fn=flaky, mem_mb=64, retries=3)])
        assert out["x"] == "ok" and len(attempts) == 3

    def test_oom_retry_covers_native_allocator_errors(self):
        """XLA/lzma OOMs surface as non-MemoryError exceptions whose message
        names the resource; the retry must cover them (the reference restarts
        OOM-killed jobs regardless of error type, Snakefile:507)."""
        s = Scheduler(workers=1, max_ram_mb=4096, max_io_heavy=1)
        attempts = []

        def flaky_xla():
            attempts.append(1)
            if len(attempts) < 2:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Out of memory while trying to "
                    "allocate 1073741824 bytes."
                )
            return "ok"

        out = s.run([Job(name="x", fn=flaky_xla, mem_mb=64, retries=2)])
        assert out["x"] == "ok" and len(attempts) == 2

    def test_non_oom_errors_do_not_retry(self):
        s = Scheduler(workers=1, max_ram_mb=1024, max_io_heavy=1)
        attempts = []

        def bad():
            attempts.append(1)
            raise ValueError("not an oom")

        import pytest

        with pytest.raises(ValueError):
            s.run([Job(name="x", fn=bad, retries=3)])
        assert len(attempts) == 1

    def test_error_propagates_after_others_finish(self):
        s = Scheduler(workers=2, max_ram_mb=1024, max_io_heavy=2)
        done = []

        def bad():
            raise RuntimeError("boom")

        jobs = [
            Job(name="bad", fn=bad),
            Job(name="good", fn=lambda: done.append(1)),
        ]
        with pytest.raises(RuntimeError, match="boom"):
            s.run(jobs)
        assert done == [1]  # keep-going: independent job still ran

    def test_ram_pool_blocks_until_release(self):
        pool = RamPool(100)
        pool.acquire(80)
        got = []

        def waiter():
            pool.acquire(50)
            got.append(time.monotonic())

        t = threading.Thread(target=waiter)
        t.start()
        time.sleep(0.1)
        assert not got  # still blocked
        t0 = time.monotonic()
        pool.release(80)
        t.join(timeout=2)
        assert got and got[0] >= t0

    def test_oversized_job_clamped(self):
        pool = RamPool(100)
        pool.acquire(10_000)  # clamps to total; must not deadlock
        pool.release(10_000)


class TestDownload:
    def test_url_routing(self):
        # split at 'eubacterium' (ref: Snakefile:195-207)
        assert "6845083" in download.cobs_url("bacillus_anthracis__01")
        assert "6849657" in download.cobs_url("eubacterium_sp__01")
        assert "6849657" in download.cobs_url("pseudomonas_aeruginosa__01")
        assert "4602622" in download.asms_url("bacillus_anthracis__01")

    def test_check_xz(self, tmp_path):
        import lzma

        import numpy as np

        good = tmp_path / "good.xz"
        # incompressible payload so the .xz itself exceeds the 100 kB floor
        payload = np.random.default_rng(0).integers(0, 256, 300_000, dtype=np.uint8)
        good.write_bytes(lzma.compress(payload.tobytes()))
        download.check_xz(good)

        small = tmp_path / "small.xz"
        small.write_bytes(lzma.compress(b"A"))
        with pytest.raises(ValueError, match="too small"):
            download.check_xz(small)

        bad = tmp_path / "bad.xz"
        bad.write_bytes(b"Z" * 200_000)
        with pytest.raises(ValueError, match="not a valid xz"):
            download.check_xz(bad)

    def test_download_failure_raises(self, tmp_path):
        with pytest.raises(RuntimeError, match="download failed"):
            download.download_file(
                "http://127.0.0.1:1/none.xz", tmp_path / "x.xz",
                retries=0, retry_wait=0,
            )


class TestManifest:
    def test_done_requires_outputs_exist(self, tmp_path):
        m = Manifest(tmp_path)
        out = tmp_path / "result.txt"
        out.write_text("x")
        m.mark("stage", "key", [str(out)])
        assert m.done("stage", "key")
        out.unlink()
        assert not m.done("stage", "key")

    def test_clear_by_stage(self, tmp_path):
        m = Manifest(tmp_path)
        a = tmp_path / "a"
        a.write_text("")
        m.mark("s1", "k", [str(a)])
        m.mark("s2", "k", [str(a)])
        m.clear("s1")
        assert not m.done("s1", "k") and m.done("s2", "k")

    def test_atomic_write(self, tmp_path):
        target = tmp_path / "out.gz"
        tmp, commit = atomic_write_via(target)
        assert tmp.name.endswith(".gz")  # suffix preserved for writers
        tmp.write_text("data")
        assert not target.exists()
        commit()
        assert target.read_text() == "data"


class TestConfig:
    def test_reference_config_loads(self):
        cfg = Config.from_yaml("/root/reference/config.yaml")
        assert cfg.cobs_kmer_thres == 0.7
        assert cfg.nb_best_hits == 100
        assert cfg.minimap_preset == "sr"
        assert cfg.index_load_mode == "mem-stream"
        assert cfg.threads == "all" and cfg.effective_threads() >= 1

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown config keys"):
            Config.from_dict({"cobs_kmer_thresh": 0.5})
