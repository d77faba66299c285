import io

import numpy as np

from phylign_tpu.io import cobs
from phylign_tpu.io.fastx import FastxRecord
from phylign_tpu.kmer import encode_seq
from phylign_tpu.match import filter as qfilter
from phylign_tpu.match import oracle, postprocess


class TestOracle:
    def test_planted_kmers(self):
        rng = np.random.default_rng(3)
        # doc 0 = the query itself; doc 1 = unrelated; doc 2 = half the query
        q = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 100))
        other = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 100))
        docs = [("a_D0", [q]), ("b_D1", [other]), ("c_D2", [q[:65]])]
        idx = cobs.build_classic_index(docs, term_size=31, fpr=0.01)
        didx = cobs.to_device_index(idx)
        scores, n_kmers = oracle.score_query_codes(didx, encode_seq(q))
        assert n_kmers == 70
        assert scores[0] == 70  # all kmers present
        assert scores[2] >= 35  # first 35 kmers present (positions 0..34)
        assert scores[2] < 70 or scores[1] > 0  # bloom fp possible but unlikely both

    def test_threshold_and_order(self):
        rng = np.random.default_rng(4)
        q = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 100))
        docs = [("z_D0", [q]), ("a_D1", [q])]  # tie broken by full doc name
        idx = cobs.build_classic_index(docs, term_size=31, fpr=0.01)
        didx = cobs.to_device_index(idx)
        hits = oracle.query_index(didx, encode_seq(q), threshold=0.7)
        assert [h[0] for h in hits] == ["a_D1", "z_D0"]  # name-asc on ties


class TestPostprocess:
    def test_top_n_with_ties(self):
        hits = [("a", 10), ("b", 9), ("c", 8), ("d", 8), ("e", 8), ("f", 7)]
        assert postprocess.top_n_with_ties(hits, 3) == hits[:5]
        assert postprocess.top_n_with_ties(hits, 6) == hits
        assert postprocess.top_n_with_ties(hits, 1) == [("a", 10)]

    def test_match_file_roundtrip(self):
        ms = [
            postprocess.QueryMatches("q1", 3, [("07_ACC1", 9), ("02_ACC2", 8), ("11_ACC3", 8)]),
            postprocess.QueryMatches("q2", 0, []),
        ]
        buf = io.StringIO()
        postprocess.write_match_file(buf, ms, keep=1)
        text = buf.getvalue()
        # keep=1 but rank-1 score 9 has no tie -> only ACC1
        assert text == "*q1\t3\n_ACC1\t9\n*q2\t0\n"
        parsed = list(postprocess.read_match_file(io.StringIO(text)))
        assert parsed == [("q1", [("ACC1", 9)]), ("q2", [])]

    def test_match_file_tie_at_cut(self):
        ms = [postprocess.QueryMatches("q", 3, [("1_A", 9), ("2_B", 9), ("3_C", 8)])]
        buf = io.StringIO()
        postprocess.write_match_file(buf, ms, keep=1)
        assert buf.getvalue() == "*q\t3\n_A\t9\n_B\t9\n"


class TestFilter:
    def test_tie_semantics(self):
        triples = [
            ("b2", "X", 5),
            ("b1", "Y", 9),
            ("b1", "Z", 5),
            ("b3", "W", 5),
            ("b1", "A", 7),
        ]
        kept = qfilter.filter_candidates(triples, keep=2)
        # sorted: (9,b1,Y) (7,b1,A) (5,b1,Z) (5,b2,X) (5,b3,W); cut at 2, no tie at 7
        assert kept == [("b1", "Y", 9), ("b1", "A", 7)]
        kept3 = qfilter.filter_candidates(triples, keep=3)
        # rank-3 score 5 -> all 5s included
        assert kept3 == [
            ("b1", "Y", 9),
            ("b1", "A", 7),
            ("b1", "Z", 5),
            ("b2", "X", 5),
            ("b3", "W", 5),
        ]

    def test_filter_queries_and_fasta(self):
        recs = [FastxRecord("q1", "", "ACGT"), FastxRecord("q2", "", "TTTT")]
        pb = {
            "batchA": [("q1", [("SAM1", 5), ("SAM2", 3)])],
            "batchB": [("q1", [("SAM3", 5)]), ("q2", [])],
        }
        out = qfilter.filter_queries(recs, pb, keep=1)
        byname = {f.qname: f for f in out}
        # rank-1 = 5; tie between (batchA,SAM1) and (batchB,SAM3) -> both kept
        assert [c[1] for c in byname["q1"].candidates] == ["SAM1", "SAM3"]
        assert byname["q2"].candidates == []
        buf = io.StringIO()
        qfilter.write_filtered_fasta(buf, out)
        assert buf.getvalue() == ">q1 SAM1,SAM3\nACGT\n>q2 \nTTTT\n"


class TestScoreHits:
    """Device-side top-k hit path must reproduce the full-matrix path."""

    def _mk(self, n_docs, seed=5, planted=None):
        from phylign_tpu.io import cobs
        from phylign_tpu.models.matcher import Matcher

        rng = np.random.default_rng(seed)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        docs = []
        for i in range(n_docs):
            seq = rng.choice(alpha, 400).tobytes()
            if planted is not None and i < planted[1]:
                seq = planted[0] + seq
            docs.append((f"d{i:03d}", [seq]))
        idx = cobs.build_classic_index(docs, term_size=31, fpr=0.01)
        return Matcher.from_device_index(cobs.to_device_index(idx))

    def _assert_same(self, m, seqs, thres, topn):
        hits, n_keep = m.score_hits(seqs, thres, topn)
        scores, keep, _ = m.score(seqs, thres)
        for q in range(len(seqs)):
            docs = np.nonzero(keep[q])[0]
            want = sorted(
                [(int(d), int(scores[q, d])) for d in docs],
                key=lambda t: (-t[1], t[0]),
            )
            got = sorted(hits[q], key=lambda t: (-t[1], t[0]))
            assert got == want, q
            assert int(n_keep[q]) == len(want)

    def test_matches_full_path(self):
        rng = np.random.default_rng(11)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        read = rng.choice(alpha, 150).tobytes()
        m = self._mk(40, planted=(read, 7))
        seqs = [read, rng.choice(alpha, 150).tobytes(), b"ACG"]
        self._assert_same(m, seqs, 0.7, topn=5)

    def test_duplicate_reads_dedup_exact(self):
        """Exact and reverse-complement duplicate reads must return identical
        hits/n_keep to the undeduped path (they are scored once, broadcast)."""
        from phylign_tpu.kmer import revcomp
        from phylign_tpu.models.matcher import _dedup_row_sets

        rng = np.random.default_rng(13)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        read = rng.choice(alpha, 150).tobytes()
        other = rng.choice(alpha, 150).tobytes()
        m = self._mk(40, planted=(read, 7))
        seqs = [read, other, read, revcomp(read), revcomp(other), b"ACG", b"ACG"]
        # dedup must collapse: read==read==rc(read), other==rc(other), ACG x2
        from phylign_tpu.kmer import cobs_row_indices, encode_seq

        rows = [
            cobs_row_indices(
                encode_seq(s), m.term_size, m.signature_size, m.num_hashes
            )
            for s in seqs
        ]
        rep_of, uniq = _dedup_row_sets(rows)
        assert len(uniq) == 3
        assert rep_of[0] == rep_of[2] == rep_of[3]
        assert rep_of[1] == rep_of[4]
        assert rep_of[5] == rep_of[6]
        # and the deduped fast path must equal the full-matrix path
        self._assert_same(m, seqs, 0.7, topn=5)

    def test_window_overflow_falls_back(self):
        # plant the read in MANY docs so qualifying count exceeds the top-k
        # window for topn=1 (kk = 64) -> per-query full-row fallback
        rng = np.random.default_rng(12)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        read = rng.choice(alpha, 150).tobytes()
        m = self._mk(96, planted=(read, 96))
        self._assert_same(m, [read], 0.7, topn=1)


class TestAsyncHashScoring:
    """score_hits_hashes_begin/end (dispatch under lock, fetch outside —
    pipeline.stages._score_batch's production path) must be bit-identical
    to the synchronous score_hits_hashes, including interleaved dispatches
    against different batch indexes."""

    def _mk(self, n_docs, seed, planted=None):
        from phylign_tpu.io import cobs
        from phylign_tpu.models.matcher import Matcher

        rng = np.random.default_rng(seed)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        docs = []
        for i in range(n_docs):
            seq = rng.choice(alpha, 400).tobytes()
            if planted is not None and i < planted[1]:
                seq = planted[0] + seq
            docs.append((f"d{i:03d}", [seq]))
        idx = cobs.build_classic_index(docs, term_size=31, fpr=0.01)
        return Matcher.from_device_index(cobs.to_device_index(idx))

    def test_begin_end_matches_sync_across_batches(self):
        from phylign_tpu.kmer import cobs_kmer_hashes_batch, encode_seq
        from phylign_tpu.models.matcher import DeviceQueryHashes

        rng = np.random.default_rng(21)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        read = rng.choice(alpha, 150).tobytes()
        m1 = self._mk(40, seed=3, planted=(read, 6))
        m2 = self._mk(56, seed=4, planted=(read, 2))
        seqs = [read] + [rng.choice(alpha, 150).tobytes() for _ in range(5)]
        raw = cobs_kmer_hashes_batch(
            [encode_seq(s) for s in seqs], m1.term_size, m1.num_hashes
        )
        dq = DeviceQueryHashes.build(raw)
        # interleave: dispatch both batches first, then fetch both
        c1 = m1.score_hits_hashes_begin(dq, 0.7, 3)
        c2 = m2.score_hits_hashes_begin(dq, 0.7, 3)
        assert c1 is not None and c2 is not None
        h1, n1 = m1.score_hits_hashes_end(c1)
        h2, n2 = m2.score_hits_hashes_end(c2)
        s1, sn1 = m1.score_hits_hashes(dq, 0.7, 3)
        s2, sn2 = m2.score_hits_hashes(dq, 0.7, 3)
        assert h1 == s1 and h2 == s2
        assert np.array_equal(n1, sn1) and np.array_equal(n2, sn2)
        assert any(h1[0]) and any(h2[0])  # the planted read actually hit
