"""LRU disk budget for the persistent caches (utils.diskbudget).

The reference documents a ~120 GB disk contract for a full run
(ref: /root/reference/README.md:95-96) and makes its decompressed-index
cache opt-in (config.yaml:131-138); this build's asm/index caches must
stay under config.cache_max_disk_gb via LRU eviction.
"""

import json
import os
import time
from pathlib import Path

import numpy as np
import pytest

from phylign_tpu.utils.diskbudget import enforce_budget, scan_entries


def _asm_entry(d: Path, stem: str, nbytes: int, stamp_s: float):
    (d / f"{stem}.codes").write_bytes(b"\0" * nbytes)
    (d / f"{stem}.json").write_text(json.dumps({"tar_sig": [1, nbytes]}))
    os.utime(d / f"{stem}.json", (stamp_s, stamp_s))


def _index_entry(d: Path, batch: str, nbytes: int, stamp_s: float):
    e = d / batch
    e.mkdir()
    (e / "words.npy").write_bytes(b"\0" * nbytes)
    (e / "meta.json").write_text("{}")
    os.utime(e / "meta.json", (stamp_s, stamp_s))


def test_scan_groups_both_cache_shapes(tmp_path):
    asm_d = tmp_path / "asms"
    idx_d = tmp_path / "idx"
    asm_d.mkdir()
    idx_d.mkdir()
    now = time.time()
    _asm_entry(asm_d, "b1", 100, now - 10)
    _index_entry(idx_d, "b2", 200, now - 5)
    # half-built tmp files are invisible
    (asm_d / "b3.codes.tmp123").write_bytes(b"\0" * 999)
    entries = scan_entries([asm_d, idx_d])
    assert len(entries) == 2
    sizes = sorted(e.size for e in entries)
    assert sizes[0] > 100  # codes + json sidecar
    assert sizes[1] > 200


def test_eviction_is_lru_and_respects_budget(tmp_path):
    asm_d = tmp_path / "asms"
    idx_d = tmp_path / "idx"
    asm_d.mkdir()
    idx_d.mkdir()
    now = time.time()
    _asm_entry(asm_d, "old", 10_000, now - 100)  # least recently used
    _index_entry(idx_d, "mid", 10_000, now - 50)
    _asm_entry(asm_d, "new", 10_000, now - 1)
    evicted = enforce_budget([asm_d, idx_d], max_bytes=25_000)
    assert evicted > 0
    assert not (asm_d / "old.codes").exists()  # oldest went first
    assert (idx_d / "mid" / "words.npy").exists()
    assert (asm_d / "new.codes").exists()
    assert sum(e.size for e in scan_entries([asm_d, idx_d])) <= 25_000


def test_budget_smaller_than_one_entry_still_terminates(tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    _asm_entry(d, "only", 10_000, time.time())
    enforce_budget([d], max_bytes=100)
    assert scan_entries([d]) == []


def test_pipeline_run_stays_under_budget(tmp_path):
    """Many-batch synthetic run with a tiny budget: output unchanged,
    caches bounded (VERDICT r4 item 3)."""
    from phylign_tpu import testing as fixture_mod
    from phylign_tpu.config import Config
    from phylign_tpu.io.sam import summary_first3
    from phylign_tpu.pipeline.stages import Pipeline

    fixture_mod.make_fixture(tmp_path, n_batches=6, seed=11)
    cfg = Config.from_yaml(tmp_path / "config.yaml")
    inputs = sorted(str(p) for p in (tmp_path / "input").iterdir())

    # unbounded reference run
    cfg_ref = Config.from_dict(
        {**cfg.__dict__, "cache_max_disk_gb": 0.0, "output_dir": "out_ref",
         "intermediate_dir": "inter_ref"}
    )
    out_ref = Pipeline(cfg_ref, tmp_path).run_all(inputs)

    # ~60 kB budget: far below the 6 batches' combined cache size
    budget_gb = 60_000 / 1e9
    cfg_b = Config.from_dict(
        {**cfg.__dict__, "cache_max_disk_gb": budget_gb,
         "index_load_mode": "mem-disk", "keep_cobs_indexes": True}
    )
    pl = Pipeline(cfg_b, tmp_path)
    out = pl.run_all(inputs)
    assert summary_first3(out) == summary_first3(out_ref)
    dirs = [pl._decompression_dir()]
    ad = pl._asm_cache_dir()
    if ad:
        dirs.append(Path(ad))
    total = sum(e.size for e in scan_entries(dirs))
    # post-run total is within budget + the final in-flight entry's slack
    entries = scan_entries(dirs)
    slack = max((e.size for e in entries), default=0)
    assert total <= 60_000 + slack, (total, slack)
