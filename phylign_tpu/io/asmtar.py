"""Assembly batch tarballs: streaming reader (and writer for fixtures).

The reference downloads per-batch ``asms/{batch}.tar.xz`` archives of
per-genome FASTA files and streams candidate members out of the tar
(ref: /root/reference/scripts/batch_align.py:93-123 iterate_over_batch;
/root/reference/Snakefile:204-207). The genome name is the member filename
stem; SAM rnames come from the contig headers inside each FASTA (golden
output shows e.g. 'SAMEA1410911.contig00015').
"""

from __future__ import annotations

import io
import os
import tarfile
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np

from phylign_tpu.io.fastx import read_fastx
from phylign_tpu.kmer import encode_seq


def iter_batch_assemblies(
    tar_path: str | os.PathLike, selected: set[str] | None = None
) -> Iterator[tuple[str, list[tuple[str, np.ndarray]]]]:
    """Yield (genome_name, [(contig_name, codes uint8)]) for tar members.

    ``selected`` restricts extraction to those genome names (the candidate
    set), skipping tar members without hits — the reference's key IO
    optimization (batch_align.py:93-123).
    """
    with tarfile.open(str(tar_path), mode="r:xz") as tar:
        for member in tar:
            if not member.isfile():
                continue
            rname = Path(member.name).stem
            if selected is not None and rname not in selected:
                continue
            f = tar.extractfile(member)
            if f is None:
                continue
            text = io.TextIOWrapper(f)
            contigs = [
                (rec.name, encode_seq(rec.seq.encode()))
                for rec in read_fastx(text)
            ]
            yield rname, contigs


def write_batch_tar(
    tar_path: str | os.PathLike,
    genomes: Iterable[tuple[str, list[tuple[str, bytes]]]],
) -> None:
    """Write a synthetic ``{batch}.tar.xz``: one FASTA member per genome."""
    with tarfile.open(str(tar_path), mode="w:xz", preset=1) as tar:
        for rname, contigs in genomes:
            buf = io.BytesIO()
            for cname, seq in contigs:
                buf.write(b">" + cname.encode() + b"\n" + seq + b"\n")
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"{rname}.fa")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
