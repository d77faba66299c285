"""_write_match_unique byte parity with the per-record write_match_file
path (the 03_match text contract, ref: postprocess_cobs.py:21-39)."""

import io

import numpy as np

from phylign_tpu.io.cobs import strip_rid
from phylign_tpu.io.fastx import FastxRecord
from phylign_tpu.match.postprocess import (
    QueryMatches,
    top_n_with_ties,
    write_match_file,
)
from phylign_tpu.pipeline.stages import Pipeline, QuerySet


def _random_case(rng, n_records, n_unique, n_docs):
    names = [f"r{rng.integers(1e6)}_SAMEA{i:07d}" for i in range(n_docs)]
    rep_of = np.concatenate(
        [np.arange(n_unique), rng.integers(0, n_unique, n_records - n_unique)]
    )
    records = [
        FastxRecord(f"read_{i}", "", "A" * 50) for i in range(n_records)
    ]
    hits_u, nk_u = [], []
    for _ in range(n_unique):
        nh = int(rng.integers(0, 9))
        docs = rng.choice(n_docs, size=nh, replace=False)
        # duplicate scores to exercise tie ordering + the ties-at-rank cut
        scores = rng.integers(1, 4, size=nh)
        hits_u.append([(int(d), int(s)) for d, s in zip(docs, scores)])
        nk_u.append(nh + int(rng.integers(0, 3)))  # n_total >= emitted
    return names, records, rep_of, hits_u, nk_u


def test_byte_parity_with_per_record_path():
    rng = np.random.default_rng(42)
    for trial in range(5):
        names, records, rep_of, hits_u, nk_u = _random_case(
            rng, n_records=37, n_unique=23, n_docs=50
        )
        qs = QuerySet(records, rep_of, [np.zeros(1, np.uint64)] * 23)
        keep = int(rng.integers(1, 4))

        fast = io.StringIO()
        Pipeline._write_match_unique(fast, qs, hits_u, nk_u, names, keep)

        # reference path: per-record QueryMatches -> write_match_file
        named_u = []
        for hl in hits_u:
            hits = [(names[di], sc) for di, sc in hl]
            hits.sort(key=lambda x: (-x[1], x[0]))
            named_u.append(hits)
        ms = [
            QueryMatches(rec.name, int(nk_u[j]), named_u[j])
            for rec, j in zip(records, rep_of)
        ]
        slow = io.StringIO()
        write_match_file(slow, ms, keep=keep)
        assert fast.getvalue() == slow.getvalue(), f"trial {trial}"


def test_empty_and_no_hit_records():
    records = [FastxRecord("a", "", "A"), FastxRecord("b", "", "A")]
    qs = QuerySet(records, np.array([0, 0]), [np.zeros(1, np.uint64)])
    out = io.StringIO()
    Pipeline._write_match_unique(out, qs, [[]], [0], ["x_Y"], keep=5)
    assert out.getvalue() == "*a\t0\n*b\t0\n"
