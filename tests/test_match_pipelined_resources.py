"""Resource-accounting regression tests for the pipelined match stage.

The pipelined path dispatches several batches before flushing; every
reservation it takes (prefetch RAM, transient index HBM) must be either
releasable by another thread or guarded by a flush-first check — a
blocking acquire while holding work only the same thread can release is
a self-deadlock (code-review round-5 findings)."""

import threading

import pytest

from phylign_tpu import testing as fixture_mod
from phylign_tpu.config import Config
from phylign_tpu.pipeline.stages import Pipeline


def _run_with_timeout(fn, timeout_s):
    out: dict = {}

    def run():
        try:
            out["result"] = fn()
        except BaseException as e:  # surfaced to the asserting caller
            out["error"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    assert not t.is_alive(), "pipelined match deadlocked (timeout)"
    if "error" in out:
        raise out["error"]
    return out["result"]


def test_tiny_hbm_pool_flushes_instead_of_deadlocking(tmp_path):
    """HBM pool smaller than one dispatch group's transient reservations:
    the flush-before-block guard must drain the group rather than block
    in hbm.acquire while holding it."""
    fixture_mod.make_fixture(tmp_path, n_batches=10, seed=33)
    cfg = Config.from_yaml(tmp_path / "config.yaml").with_overrides(
        device_hbm_gb=0.002,  # ~2 MB pool: one dispatch group of ~1 MB
        # transient indexes exceeds it mid-group
        device_index_cache_gb=0.0,  # every batch index is transient
    )
    pl = Pipeline(cfg, tmp_path)
    inputs = sorted(str(p) for p in (tmp_path / "input").iterdir())
    stem = _run_with_timeout(lambda: pl.preprocess(inputs), 120)
    outs = _run_with_timeout(lambda: pl.match(stem, pl.batches()), 300)
    assert len(outs) == 10 and all(p.exists() for p in outs)
    # pools fully restored after the run
    assert pl.sched.hbm.available() == pl.sched.hbm.total
    assert pl.sched.ram.available() == pl.sched.ram.total


def test_tiny_ram_pool_fifo_prefetch(tmp_path):
    """RAM pool near one index's reservation: FIFO-ordered prefetch
    acquisition + dispatch-time release must keep the in-order consumer
    progressing (out-of-order holders starved it before)."""
    fixture_mod.make_fixture(tmp_path, n_batches=6, seed=34)
    cfg = Config.from_yaml(tmp_path / "config.yaml").with_overrides(
        max_ram_gb=1,  # RamPool floor; reservations are per-index estimates
        max_io_heavy_threads=4,
    )
    pl = Pipeline(cfg, tmp_path)
    # shrink the pool far below 6 concurrent prefetch reservations
    pl.sched.ram.total = pl.sched.ram.free = 128
    inputs = sorted(str(p) for p in (tmp_path / "input").iterdir())
    stem = _run_with_timeout(lambda: pl.preprocess(inputs), 120)
    outs = _run_with_timeout(lambda: pl.match(stem, pl.batches()), 300)
    assert len(outs) == 6
    assert pl.sched.ram.available() == pl.sched.ram.total
