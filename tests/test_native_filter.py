"""Native match-file parser + array filter: parity with the python paths."""

import io

import numpy as np
import pytest

from phylign_tpu.io.fastx import FastxRecord
from phylign_tpu.match import filter as flt
from phylign_tpu.match.postprocess import read_match_file
from phylign_tpu.native import (
    get_lib,
    native_filter_topk_rows,
    native_parse_match_text,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _random_corpus(rng, nq=24, nb=5, max_hits=6):
    records = [FastxRecord(f"q{i:02d}", "", "ACGT" * 5) for i in range(nq)]
    texts = {}
    for b in range(nb):
        batch = f"batch_{chr(ord('z') - b)}__0{b}"  # NOT in sorted order
        lines = []
        for i in range(nq):
            if rng.random() < 0.25:
                continue  # missing from this batch
            hits = [
                (f"SAMEA{int(rng.integers(0, 9)):03d}", int(rng.integers(1, 4)))
                for _ in range(int(rng.integers(0, max_hits)))
            ]
            hits.sort(key=lambda t: (-t[1], t[0]))
            lines.append(f"*q{i:02d}\t{len(hits)}")
            lines += [f"_{a}\t{s}" for a, s in hits]
        texts[batch] = "\n".join(lines) + "\n"
    return records, texts


class TestParseMatchText:
    def test_roundtrip_vs_python_reader(self):
        rng = np.random.default_rng(17)
        _, texts = _random_corpus(rng)
        for text in texts.values():
            pm = native_parse_match_text(text.encode())
            want = list(read_match_file(io.StringIO(text)))
            assert pm.qnames == [q for q, _ in want]
            start = 0
            for qi, (_, hits) in enumerate(want):
                end = int(pm.hit_end[qi])
                got = [
                    (pm.accs[pm.acc_id[j]], int(pm.score[j]))
                    for j in range(start, end)
                ]
                assert got == hits
                start = end

    def test_header_comment_dropped(self):
        pm = native_parse_match_text(b"*q1 some comment\t2\n_A\t1\n_B\t1\n")
        assert pm.qnames == ["q1"]
        assert int(pm.totals[0]) == 2

    def test_malformed_rejected(self):
        for bad in (b"no_tabs_here\n", b"*q\tx\n", b"_A\t5\n"):
            with pytest.raises(ValueError):
                native_parse_match_text(bad)

    def test_empty(self):
        pm = native_parse_match_text(b"")
        assert pm.qnames == [] and len(pm.acc_id) == 0


class TestFilterArrays:
    @pytest.mark.parametrize("keep", [1, 2, 5, 100])
    def test_parity_with_reference_semantics(self, keep):
        rng = np.random.default_rng(23)
        records, texts = _random_corpus(rng, nq=32, nb=6, max_hits=8)
        want = flt.filter_queries(
            records,
            {b: read_match_file(io.StringIO(t)) for b, t in texts.items()},
            keep,
        )
        parsed = {b: native_parse_match_text(t.encode()) for b, t in texts.items()}
        got = flt.filter_queries_arrays(records, parsed, keep)
        assert [g.qname for g in got] == [w.qname for w in want]
        for w, g in zip(want, got):
            assert g.candidates == w.candidates, w.qname

    def test_numpy_fallback_parity(self, monkeypatch):
        """Force the numpy path (native core unavailable) — same output."""
        rng = np.random.default_rng(29)
        records, texts = _random_corpus(rng, nq=16, nb=4)
        parsed = {b: native_parse_match_text(t.encode()) for b, t in texts.items()}
        want = flt.filter_queries_arrays(records, parsed, 3)
        monkeypatch.setattr(
            "phylign_tpu.native.native_filter_topk_rows",
            lambda *a, **k: None,
        )
        got = flt.filter_queries_arrays(records, parsed, 3)
        for w, g in zip(want, got):
            assert g.candidates == w.candidates

    def test_unknown_query_tolerated(self):
        # like filter_queries (and the reference): a match-file query absent
        # from the merged FASTA yields a synthetic empty-sequence entry
        # instead of aborting the filter stage (ADVICE round-1 fix)
        records = [FastxRecord("q00", "", "ACGT")]
        pm = native_parse_match_text(b"*mystery\t1\n_A\t2\n")
        out = flt.filter_queries_arrays(records, {"b__01": pm}, 5)
        by_name = {q.qname: q for q in out}
        assert by_name["q00"].candidates == []
        assert by_name["mystery"].seq == ""
        assert by_name["mystery"].candidates == [("b__01", "A", 2)]


class TestNativeTopkCore:
    def test_matches_python_semantics(self):
        rng = np.random.default_rng(31)
        n = 5000
        q = np.sort(rng.integers(0, 40, n)).astype(np.int64)
        sc = rng.integers(0, 9, n).astype(np.int32)
        br = rng.integers(0, 4, n).astype(np.int32)
        ar = rng.integers(0, 50, n).astype(np.int32)
        keep = 7
        kept = native_filter_topk_rows(q, sc, br, ar, int(sc.max()), keep)
        # python oracle on (q, -sc, br, ar, row) tuples
        rows = sorted(range(n), key=lambda i: (q[i], -sc[i], br[i], ar[i], i))
        want = []
        i = 0
        while i < len(rows):
            j = i
            while j < len(rows) and q[rows[j]] == q[rows[i]]:
                j += 1
            seg = rows[i:j]
            cutv = sc[seg[min(keep, len(seg)) - 1]] if seg else None
            for r, ri in enumerate(seg):
                if r < keep or sc[ri] == cutv and all(
                    sc[x] == cutv for x in seg[keep:r + 1]
                ):
                    want.append(ri)
            i = j
        assert kept.tolist() == want

    def test_range_violation_returns_none(self):
        q = np.zeros(2, np.int64)
        sc = np.array([1, 1 << 14], np.int32)  # smax too big
        br = np.zeros(2, np.int32)
        ar = np.zeros(2, np.int32)
        assert native_filter_topk_rows(q, sc, br, ar, int(sc.max()), 1) is None


class TestRobustness:
    def test_crlf_tolerated(self):
        pm = native_parse_match_text(b"*q1\t1\r\n_A\t5\r\n")
        assert pm.qnames == ["q1"] and int(pm.score[0]) == 5

    def test_pipeline_falls_back_on_strict_reject(self, tmp_path, monkeypatch):
        """A match file the C parser rejects (space-separated) must fall
        back to the python streaming filter, not fail the stage."""
        from phylign_tpu import testing
        from phylign_tpu.config import Config
        from phylign_tpu.pipeline.stages import Pipeline
        import gzip

        testing.make_fixture(tmp_path, n_batches=2, seed=7)
        cfg = Config.from_yaml(tmp_path / "config.yaml")
        pl = Pipeline(cfg, tmp_path)
        import glob

        inputs = sorted(glob.glob(str(tmp_path / "input" / "*")))
        stem = pl.preprocess(inputs)
        pl.match(stem)
        # corrupt one match file into space-separated form (python reader
        # accepts it via line.split(); the strict C parser rejects it)
        victim = pl.match_path(pl.batches()[0], stem)
        text = gzip.open(victim, "rt").read().replace("\t", " ")
        with gzip.open(victim, "wt") as f:
            f.write(text)
        pl.manifest.clear("filter")
        out = pl.filter(stem)
        assert out.exists()
        body = out.read_text()
        assert body.startswith(">")
