"""Long gene queries from the reference's bundled ARGannot_r3.fa.

The reference README documents searching the 661k collection with
antibiotic-resistance genes (ref: /root/reference/README.md, AMR demo;
data/ARGannot_r3.fa ships 1,856 genes, 237-3,153 bp). Multi-kb queries
exercise the paths 150 bp reads never touch: per-length extension
bucketing (MAX_EXT_CELLS splits long-query chunks), multi-anchor chains
far above the sr anchor bucket, and indel recovery inside one chain.

Genes are planted into synthetic genomes with SNPs and a deletion; the
engine must recover the planted locus, strand, and the exact eqx CIGAR.
"""

from pathlib import Path

import numpy as np
import pytest

from phylign_tpu.align import engine as ae
from phylign_tpu.kmer import decode_seq, encode_seq
from phylign_tpu.ops import minimizer as opm

ARG = Path("/root/reference/data/ARGannot_r3.fa")


def _genes(min_len: int, n: int) -> list[tuple[str, str]]:
    out, name, parts = [], None, []
    with open(ARG) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if name and len("".join(parts)) >= min_len:
                    out.append((name, "".join(parts)))
                    if len(out) == n:
                        return out
                name, parts = line[1:].split()[0].replace("(", "_").replace(
                    ")", "_"
                ), []
            else:
                parts.append(line.upper())
    if name and len("".join(parts)) >= min_len:
        out.append((name, "".join(parts)))
    return out[:n]


@pytest.mark.skipif(not ARG.exists(), reason="reference ARGannot file absent")
def test_argannot_genes_plant_and_recover():
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genes = _genes(min_len=1500, n=6)
    assert len(genes) == 6

    params = ae.AlignParams.from_preset("sr")
    tasks, expect = [], []
    for gi, (gname, gseq) in enumerate(genes):
        codes = encode_seq(gseq.encode())
        # 1% SNPs, avoiding runs that would break every seed
        nmut = max(3, len(codes) // 100)
        # keep SNPs away from the ends: a terminal mismatch is (correctly)
        # soft-clipped by local alignment, which would shift POS
        pos = rng.choice(np.arange(25, len(codes) - 25), nmut, replace=False)
        planted = codes.copy()
        planted[pos] = (planted[pos] + rng.integers(1, 4, nmut)) % 4
        # drop 30 bp from the planted copy for even genes: relative to the
        # reference the query then carries a 30 bp INSERTION (gapped path)
        has_ins = gi % 2 == 0
        if has_ins:
            d0 = len(planted) // 2
            planted = np.concatenate([planted[:d0], planted[d0 + 30 :]])
        contig = np.concatenate(
            [rng.choice(bases.size, 4000), planted, rng.choice(bases.size, 4000)]
        ).astype(np.uint8)
        ref = opm.build_ref_index(
            f"g{gi}", [(f"ctg{gi}", contig)], params.k, params.w
        )
        # half the genes query in reverse-complement orientation
        q = codes if gi % 3 else (3 - codes)[::-1].copy()
        sk = ae.QuerySketch.make(gname, decode_seq(q).decode(), params)
        tasks.append(ae.make_pair(ref, sk, params))
        expect.append((gname, 0 if gi % 3 else 16, f"ctg{gi}", 4001, has_ins))

    out = ae.flush_pairs(tasks, params)
    assert len(out) == len(expect)
    for rec, (gname, flag, rname, pos, has_ins) in zip(out, expect):
        assert rec.qname == gname and rec.flag == flag, (rec.qname, rec.flag)
        assert rec.rname == rname and rec.pos == pos, (rec.rname, rec.pos)
        if has_ins:
            assert "30I" in rec.cigar, rec.cigar
        else:
            assert "I" not in rec.cigar and "D" not in rec.cigar, rec.cigar
        # full-length alignment: query is entirely inside the contig
        assert "S" not in rec.cigar, rec.cigar
