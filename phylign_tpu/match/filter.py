"""Global candidate filter: cross-batch top-n (+ties) per query.

Reproduces /root/reference/scripts/filter_queries.py semantics exactly:
  * every query accumulates (batch, accession, score) triples from all
    per-batch match files;
  * kept set = sort by key ``(-score, batch, accession)``, truncate to
    ``keep`` entries, then re-include every following entry whose score
    equals the rank-``keep`` score (filter_queries.py:133-150 housekeeping —
    its incremental min-score pre-filter is equivalent to this single global
    pass because the cutoff is non-decreasing);
  * output is a FASTA whose header comment is the comma-joined accession
    list in kept order; queries with no matches still emit a record with an
    empty comment and a trailing space after the name
    (filter_queries.py:152-156: f">{name} {com}").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Mapping, Sequence, TextIO

from phylign_tpu.io.fastx import FastxRecord


@dataclass
class FilteredQuery:
    qname: str
    seq: str
    candidates: list[tuple[str, str, int]] = field(default_factory=list)
    # (batch, accession, score) in kept order


def filter_candidates(
    matches: Sequence[tuple[str, str, int]], keep: int
) -> list[tuple[str, str, int]]:
    """(batch, accession, score) triples -> kept sorted subset with ties."""
    ordered = sorted(matches, key=lambda x: (-x[2], x[0], x[1]))
    if len(ordered) <= keep:
        return ordered
    min_score = ordered[keep - 1][2]
    out = ordered[:keep]
    for t in ordered[keep:]:
        if t[2] != min_score:
            break
        out.append(t)
    return out


def filter_queries(
    query_records: Sequence[FastxRecord],
    per_batch_matches: Mapping[str, Iterable[tuple[str, list[tuple[str, int]]]]],
    keep: int,
) -> list[FilteredQuery]:
    """Merge per-batch match streams into per-query global candidate lists.

    per_batch_matches: batch name -> iterable of (qname, [(accession, score)])
    Batches are processed in the given order; ordering does not affect the
    result (sort key is total).
    """
    by_name: dict[str, FilteredQuery] = {
        r.name: FilteredQuery(r.name, r.seq) for r in query_records
    }
    acc: dict[str, list[tuple[str, str, int]]] = {q: [] for q in by_name}
    for batch, stream in per_batch_matches.items():
        for qname, hits in stream:
            if qname not in acc:  # unknown query name: tolerate, like reference
                by_name[qname] = FilteredQuery(qname, "")
                acc[qname] = []
            acc[qname].extend((batch, a, s) for a, s in hits)
    for qname, triples in acc.items():
        by_name[qname].candidates = filter_candidates(triples, keep)
    return list(by_name.values())


def filter_queries_streaming(
    query_records: Iterable[FastxRecord],
    per_batch_matches: Mapping[str, Iterable[tuple[str, list[tuple[str, int]]]]],
    keep: int,
) -> Iterable[FilteredQuery]:
    """Constant-memory variant: stream all match files in query lockstep.

    Requires every match file to list queries in merged-query order — true
    for files this pipeline (and cobs) produce. This is the capability of
    the reference's streaming experiment
    (/root/reference/scripts/filter_queries_2.py:196-207), productionized:
    memory is O(batches + one query's candidates) instead of O(all
    candidates of all queries).
    """
    iters = {b: iter(s) for b, s in per_batch_matches.items()}
    heads: dict[str, tuple[str, list[tuple[str, int]]] | None] = {
        b: next(it, None) for b, it in iters.items()
    }
    for rec in query_records:
        triples: list[tuple[str, str, int]] = []
        for b, it in iters.items():
            head = heads[b]
            if head is not None and head[0] == rec.name:
                triples.extend((b, acc, score) for acc, score in head[1])
                heads[b] = next(it, None)
        yield FilteredQuery(rec.name, rec.seq, filter_candidates(triples, keep))
    leftovers = [b for b, h in heads.items() if h is not None]
    if leftovers:
        raise ValueError(
            f"match files out of sync with the merged query order: "
            f"unconsumed entries in batches {leftovers[:3]}"
        )


def write_filtered_fasta(fp: TextIO, queries: Iterable[FilteredQuery]) -> None:
    """04_filter FASTA contract: '>{name} {acc1,acc2,...}' (always a space)."""
    for q in queries:
        com = ",".join(a for _, a, _ in q.candidates)
        fp.write(f">{q.qname} {com}\n{q.seq}\n")


def read_filtered_fasta(
    records: Iterable[FastxRecord],
) -> list[FilteredQuery]:
    """Inverse of write_filtered_fasta (consumed by the align stage like
    batch_align.py:126-171 load_qdicts)."""
    out = []
    for r in records:
        cands = [("", a, 0) for a in r.comment.split(",")] if r.comment else []
        out.append(FilteredQuery(r.name, r.seq, cands))
    return out
