"""Native SAM line assembly (hostio.cpp assemble_sam_lines) parity.

The fused align flush's fast path builds final record lines in C++
(engine._assemble_fast_native); the python per-record loop remains the
byte-parity oracle. These tests pin: byte-identical lines on a mixed pool
(mismatches, both strands, trimmable ends, unmapped), RawSamRecord's
duck-typed field surface, and the revcomp/CIGAR construction on edge
records. Ref contract: headerless SAM, /root/reference/Snakefile:556-560.
"""
import numpy as np
import pytest

from phylign_tpu.align import engine as ae
from phylign_tpu.io.sam import RawSamRecord, SamRecord
from phylign_tpu.kmer import decode_seq
from phylign_tpu.native import get_lib, native_assemble_sam_lines
from phylign_tpu.ops import minimizer as opm

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _pool(n=512, g=200_000, mut=0.02, seed=7):
    rng = np.random.default_rng(seed)
    params = ae.AlignParams.from_preset("sr")
    genome = rng.integers(0, 4, g).astype(np.uint8)
    ref = opm.build_ref_index("gN", [("ctg_1", genome)], params.k, params.w)
    sks = []
    for i in range(n):
        s = rng.integers(0, g - 150)
        r = genome[s : s + 150].copy()
        nmut = rng.binomial(150, mut)
        pos = rng.choice(150, nmut, replace=False)
        r[pos] = (r[pos] + rng.integers(1, 4, nmut)) % 4
        if i % 2:
            r = (3 - r)[::-1].copy()
        sks.append(
            ae.QuerySketch.make(f"q{i}", decode_seq(r).decode(), params)
        )
    return ref, sks, params


def test_native_lines_byte_identical(monkeypatch):
    ref, sks, params = _pool()
    pairs = ae.make_pairs_batch(ref, sks, params)
    monkeypatch.setenv("PHYLIGN_TPU_NATIVE_SAM", "0")
    a = ae.flush_pairs(pairs, params, fused=True)
    monkeypatch.setenv("PHYLIGN_TPU_NATIVE_SAM", "1")
    b = ae.flush_pairs(pairs, params, fused=True)
    assert len(a) == len(b) and len(a) >= 512
    n_raw = sum(isinstance(r, RawSamRecord) for r in b)
    assert n_raw > len(b) // 2, "native path not exercised"
    for x, y in zip(a, b):
        assert x.to_line() == y.to_line()


def test_rawsamrecord_surface():
    line = (
        "q1\t16\tctg_1\t1234\t60\t10=1X139=\t*\t0\t0\t"
        + "A" * 150
        + "\t*\tNM:i:1\tms:i:290\tAS:i:290\tnn:i:0\ttp:A:P\tcm:i:12"
        + "\ts1:i:100\ts2:i:0\tde:f:0.0067\trl:i:0"
    )
    text = "PAD" + line + "PAD"
    r = RawSamRecord(text, 3, 3 + len(line), "q1", 16)
    assert r.to_line() == line
    assert r.qname == "q1" and r.flag == 16
    assert r.rname == "ctg_1" and r.pos == 1234 and r.mapq == 60
    assert r.cigar == "10=1X139=" and r.seq == "A" * 150
    assert r.tags[0] == "NM:i:1" and r.tags[-1] == "rl:i:0"
    assert r.mapq_meta is None
    # equality vs an equivalent SamRecord is by emitted line
    s = SamRecord(
        "q1", 16, "ctg_1", 1234, 60, "10=1X139=", "A" * 150,
        line.split("\t")[11:],
    )
    assert r == s and s == r and hash(r) == hash(RawSamRecord(line, 0, len(line), "q1", 16))


def test_assembler_edge_records():
    # two records: fwd with adjacent mismatches (coalesced X run), rev
    # strand (C++ emits the revcomp), zero-mismatch perfect read
    qnames = "ra" "rb"
    qname_off = np.array([0, 2, 4], np.int64)
    rnames = "ctg"
    rname_off = np.array([0, 3], np.int64)
    codes_a = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)  # ACGTACGT
    codes_b = np.array([0, 0, 1, 1, 2, 2, 3, 3], np.uint8)  # AACCGGTT
    out = native_assemble_sam_lines(
        qnames.encode(), qname_off,
        np.array([0, 16], np.int32), rnames.encode(), rname_off,
        np.array([0, 0], np.int32), np.array([10, 20], np.int32),
        np.array([60, 7], np.int32),
        np.array([2, 3], np.int32),  # cols: rec a = [2,3] adjacent
        np.array([0, 2, 2], np.int64),  # rec b has no mismatches
        np.array([8, 8], np.int32),
        np.concatenate([codes_a, codes_b]), np.array([0, 8, 16], np.int64),
        np.array([6, 16], np.int32), np.array([3, 4], np.int32),
        np.array([55, 66], np.int64), np.array([0, 9], np.int64),
        np.array([0, 5], np.int32), b"0.250.0", np.array([0, 4, 7], np.int64),
    )
    assert out is not None
    blob, off = out
    lines = [blob[off[i]: off[i + 1]].decode() for i in range(2)]
    assert lines[0] == (
        "ra\t0\tctg\t10\t60\t2=2X4=\t*\t0\t0\tACGTACGT\t*\t"
        "NM:i:2\tms:i:6\tAS:i:6\tnn:i:0\ttp:A:P\tcm:i:3\ts1:i:55"
        "\ts2:i:0\tde:f:0.25\trl:i:0"
    )
    assert lines[1] == (
        "rb\t16\tctg\t20\t7\t8=\t*\t0\t0\tAACCGGTT\t*\t"
        "NM:i:0\tms:i:16\tAS:i:16\tnn:i:0\ttp:A:P\tcm:i:4\ts1:i:66"
        "\ts2:i:9\tde:f:0.0\trl:i:5"
    )
