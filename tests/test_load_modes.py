import numpy as np
import pytest

from phylign_tpu import testing as fixture_mod
from phylign_tpu.config import Config
from phylign_tpu.pipeline.stages import Pipeline


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("modes")
    fixture_mod.make_fixture(d, n_batches=1, seed=3)
    return d


class TestIndexLoadModes:
    def test_modes_agree(self, workdir):
        cfg = Config.from_yaml(workdir / "config.yaml")
        batch = Pipeline(cfg, workdir).batches()[0]
        results = {}
        for mode in ("mem-stream", "mem-disk", "mmap-disk"):
            pl = Pipeline(cfg.with_overrides(index_load_mode=mode), workdir)
            didx = pl._load_index(batch)
            results[mode] = (didx.doc_names, np.asarray(didx.words).copy())
        base_names, base_words = results["mem-stream"]
        for mode in ("mem-disk", "mmap-disk"):
            names, words = results[mode]
            assert names == base_names, mode
            np.testing.assert_array_equal(words, base_words)
        # cache exists and drop removes it
        pl = Pipeline(cfg.with_overrides(index_load_mode="mem-disk"), workdir)
        assert (pl._decompression_dir() / batch / "meta.json").exists()
        pl.drop_index_cache(batch)
        assert not (pl._decompression_dir() / batch).exists()

    def test_unknown_mode_rejected(self, workdir):
        cfg = Config.from_yaml(workdir / "config.yaml").with_overrides(
            index_load_mode="bogus"
        )
        pl = Pipeline(cfg, workdir)
        with pytest.raises(ValueError, match="index_load_mode"):
            pl._load_index(pl.batches()[0])

    def test_index_sizes_table(self, workdir):
        cfg = Config.from_yaml(workdir / "config.yaml")
        pl = Pipeline(cfg, workdir)
        batch = pl.batches()[0]
        (workdir / "data" / "decompressed_indexes_sizes.txt").write_text(
            f"cobs/{batch}.cobs_classic.xz  500000000  1610678320\n"
        )
        if hasattr(pl, "_index_sizes_cache"):
            del pl._index_sizes_cache
        assert pl._index_mem_mb(batch) == 500
