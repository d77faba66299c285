"""Behavioral parity vs REAL minimap2 output on the REAL bundled reads.

The reference's golden file (data/reads_1___reads_2___reads_3___reads_4.
sam_summary.xz, produced by `minimap2 -a -x sr --eqx` inside `make test`,
ref: /root/reference/Makefile:40-55) contains 5,673 records whose CIGARs use
only '='/'X' ops. An --eqx CIGAR plus the record's SEQ pins the aligned
reference window exactly (every '=' base equals the query base; every 'X'
base is merely *different*), so the genome windows minimap2 aligned against
can be reconstructed from the golden output alone — no Zenodo download
needed. Each golden record then becomes a (real read, reconstructed contig)
pair for our engine, and flag / rname / pos / CIGAR / SEQ must reproduce
minimap2's record byte-for-byte — for ALL 5,671 mapped golden records
(~14 s on the CPU backend; the flush is one batched device pass).

This is the offline approximation of the reference's own acceptance oracle,
strengthened from cols 1-3 to cols 1-6 + 10 on real data.

MAPQ (col 5) is real mm2 2.24 mm_set_mapq output and is now compared too.
The golden set's sub-60 MAPQs imply a near-tie secondary region in the real
genome (mm2's sr branch: mapq = 6.02*(dp_max-dp_max2)/match): MAPQ 48 with
AS 300 pins dp_max2 = 284 — a second locus differing by one deleted base
(149*2 - (12+2) = 284) — and MAPQ 0 pins an exact second copy (dp_max2 =
300). The test plants exactly those secondary loci downstream of the primary
window, so the engine's chain-alt probe -> secondary DP extension -> MAPQ
pipeline must reproduce mm2's column 5 on every record.
"""

import lzma
from pathlib import Path

import numpy as np
import pytest

from phylign_tpu.align import engine as ae
from phylign_tpu.kmer import encode_seq
from phylign_tpu.ops import minimizer as opm

GOLDEN = Path(
    "/root/reference/data/reads_1___reads_2___reads_3___reads_4.sam_summary.xz"
)

_COMP = str.maketrans("ACGT", "TGCA")
# any base different from the query's reproduces the 'X' op with the same score
_MUT = str.maketrans("ACGT", "CGTA")


def _revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def _parse_cigar(cig: str) -> list[tuple[int, str]]:
    out, n = [], 0
    for ch in cig:
        if ch.isdigit():
            n = n * 10 + ord(ch) - 48
        else:
            out.append((n, ch))
            n = 0
    return out


def _golden_records():
    recs = []
    with lzma.open(GOLDEN, "rt") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("==>"):
                continue
            fields = line.split("\t")
            qname, flag, rname, pos, mapq, cigar = fields[:6]
            recs.append(
                (qname, int(flag), rname, int(pos), int(mapq), cigar, fields[9])
            )
    return recs


@pytest.mark.skipif(not GOLDEN.exists(), reason="reference golden file absent")
def test_golden_minimap2_record_parity():
    recs = _golden_records()
    assert len(recs) > 5600  # the full golden set (5,671 mapped records)
    params = ae.AlignParams.from_preset("sr")
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)

    sketches: dict[str, ae.QuerySketch] = {}
    tasks, expected = [], []
    n_sub60 = 0
    for i, (qname, flag, rname, pos, mapq, cigar, seq) in enumerate(recs):
        ops = _parse_cigar(cigar)
        assert {op for _, op in ops} <= {"=", "X"} and sum(
            n for n, _ in ops
        ) == len(seq)
        # reconstruct the aligned reference window from SEQ + eqx ops
        ref_seg, q_off = [], 0
        for n, op in ops:
            part = seq[q_off : q_off + n]
            ref_seg.append(part if op == "=" else part.translate(_MUT))
            q_off += n
        ref_seg = "".join(ref_seg)
        # plant at the golden POS when affordable so POS is compared exactly;
        # huge offsets get a varied synthetic one to keep contigs small
        p0 = pos - 1 if pos <= 3001 else 1500 + pos % 997
        flank_l = "".join(map(chr, rng.choice(bases, p0)))
        flank_r = "".join(map(chr, rng.choice(bases, 300)))
        # sub-60 golden MAPQ pins the secondary locus the real genome held
        # (see module docstring): plant it downstream of the primary
        if mapq < 60:
            n_sub60 += 1
            sec = ref_seg if mapq == 0 else ref_seg[:75] + ref_seg[76:]
            sec_tail = "".join(map(chr, rng.choice(bases, 300)))
            contig = flank_l + ref_seg + flank_r + sec + sec_tail
        else:
            contig = flank_l + ref_seg + flank_r
        ref = opm.build_ref_index(
            f"g{i}", [(rname, encode_seq(contig.encode()))], params.k, params.w
        )
        read = _revcomp(seq) if flag & 16 else seq
        sk = sketches.get(qname)
        if sk is None:
            sk = sketches[qname] = ae.QuerySketch.make(qname, read, params)
        else:
            # the same read reconstructed from different golden records must
            # agree — validates the strand bookkeeping of the reconstruction
            assert sk.seq == read
        tasks.append(ae.make_pair(ref, sk, params))
        expected.append((qname, flag, rname, p0 + 1, mapq, cigar, seq))
    assert n_sub60 >= 50  # the golden set's MAPQ 48 / 0 families

    out = ae.flush_pairs(tasks, params)
    assert len(out) == len(expected)
    mismatches = []
    for rec, (qname, flag, rname, pos, mapq, cigar, seq) in zip(out, expected):
        got = (rec.qname, rec.flag, rec.rname, rec.pos, rec.mapq, rec.cigar, rec.seq)
        if got != (qname, flag, rname, pos, mapq, cigar, seq):
            mismatches.append((got, (qname, flag, rname, pos, mapq, cigar, seq)))
    assert not mismatches, mismatches[:5]
