"""Round-5 edge regressions: empty-blob asm-cache reopen (ADVICE r4) and
the pipelined match stage with multiple device query chunks per batch."""

import gzip

import numpy as np

from phylign_tpu import testing as fixture_mod
from phylign_tpu.config import Config
from phylign_tpu.io.asmtar import open_asm_cache, write_batch_tar
from phylign_tpu.pipeline.stages import Pipeline


def test_empty_asm_cache_reopens(tmp_path):
    """A tar whose decoded blob is empty (all members empty) leaves a
    0-byte .codes file; the cache-HIT path must not crash on re-open
    (np.memmap refuses empty files — ADVICE r4 low finding)."""
    tar = tmp_path / "b.tar.xz"
    write_batch_tar(tar, [("g1", [("c1", b"")])])
    c1 = open_asm_cache(tar, tmp_path / "cache")  # build
    c2 = open_asm_cache(tar, tmp_path / "cache")  # hit: crashed before fix
    for c in (c1, c2):
        items = list(c.iter_selected({"g1"}))
        assert items[0][0] == "g1"
        assert items[0][1][0][1].size == 0


def test_pipelined_match_multiple_query_chunks(tmp_path):
    """device_query_chunk smaller than the unique-read count: the
    pipelined path dispatches several chunks per batch and must produce
    match files identical to the single-chunk run."""
    fixture_mod.make_fixture(tmp_path, n_batches=3, seed=44)
    outs = {}
    for tag, chunk in (("one", 100000), ("many", 8)):
        cfg = Config.from_yaml(tmp_path / "config.yaml").with_overrides(
            device_query_chunk=chunk,
            intermediate_dir=f"inter_{tag}",
            output_dir=f"out_{tag}",
        )
        pl = Pipeline(cfg, tmp_path)
        inputs = sorted(str(p) for p in (tmp_path / "input").iterdir())
        stem = pl.preprocess(inputs)
        paths = pl.match(stem, pl.batches())
        outs[tag] = [gzip.open(p, "rb").read() for p in paths]
    assert outs["one"] == outs["many"]
