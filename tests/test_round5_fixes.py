"""Round-5 edge fixes: nb_best_hits<=0 semantics, config validation,
adaptive match fetch cap."""

import numpy as np
import pytest

from phylign_tpu.config import Config
from phylign_tpu.match.filter import filter_candidates
from phylign_tpu.match.postprocess import top_n_with_ties


def test_filter_candidates_keep_nonpositive_keeps_nothing():
    ms = [("b1", "A1", 5), ("b1", "A2", 5), ("b2", "A3", 3)]
    assert filter_candidates(ms, 0) == []
    assert filter_candidates(ms, -3) == []
    # keep=1 keeps rank-1 plus its ties
    assert filter_candidates(ms, 1) == [("b1", "A1", 5), ("b1", "A2", 5)]


def test_top_n_with_ties_keep_nonpositive_empty():
    hits = [("x", 5), ("y", 5), ("z", 3)]
    assert top_n_with_ties(hits, 0) == []
    assert top_n_with_ties(hits, -1) == []


def test_config_rejects_bad_search_params():
    with pytest.raises(ValueError, match="nb_best_hits"):
        Config.from_dict({"nb_best_hits": 0})
    with pytest.raises(ValueError, match="cobs_kmer_thres"):
        Config.from_dict({"cobs_kmer_thres": 1.5})
    assert Config.from_dict({"nb_best_hits": 1}).nb_best_hits == 1


def test_adaptive_cap_overflow_falls_back_correctly():
    """A deliberately tiny fetch cap must overflow into the dense-window
    path and still produce identical hits (correctness never depends on
    the cap)."""
    from phylign_tpu.io import cobs as cobs_io
    from phylign_tpu.models.matcher import DeviceQueryHashes, Matcher

    rng = np.random.default_rng(3)
    docs = []
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 400).tobytes()
    for i in range(40):
        docs.append((f"r{i}_SAMEA{i:07d}", [base]))
    idx = cobs_io.build_classic_index(docs, term_size=31, fpr=0.4)
    m = Matcher.from_device_index(cobs_io.to_device_index(idx))
    from phylign_tpu.kmer import cobs_kmer_hashes_batch, encode_seq

    reads = [base[:150], base[100:280], base[200:380]]
    raw = cobs_kmer_hashes_batch(
        [encode_seq(r) for r in reads], 31, idx.num_hashes
    )
    dq = DeviceQueryHashes.build(raw)
    want = m.score_hits_hashes(dq, 0.5, 10)
    ctx = m.score_hits_hashes_begin(dq, 0.5, 10, cap=256)  # floor cap
    assert ctx is not None
    got = m.score_hits_hashes_end(ctx)
    assert got[0] == want[0]
    assert list(got[1]) == list(want[1])
    # every doc shares the same sequence: every query hits all 40 docs,
    # so the tiny cap genuinely overflowed
    assert sum(len(h) for h in got[0]) >= 40
