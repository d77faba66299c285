"""Decoded-genome asm cache (io.asmtar.AsmCache) parity + invalidation.

The cache replaces per-run tar.xz re-streaming with one decode pass and
mmap reads of candidate genomes (ref behavior it accelerates:
/root/reference/scripts/batch_align.py:93-123)."""
import numpy as np

from phylign_tpu.io.asmtar import (
    iter_assemblies_cached,
    iter_batch_assemblies,
    open_asm_cache,
    write_batch_tar,
)


def _mk_tar(path, n=6, seed=1):
    rng = np.random.default_rng(seed)
    genomes = []
    for g in range(n):
        contigs = []
        for c in range(1 + g % 3):
            seq = bytes(
                rng.choice(np.frombuffer(b"ACGT", np.uint8), 200 + 37 * c)
            )
            contigs.append((f"ACC{g}.contig{c:05d}", seq))
        genomes.append((f"ACC{g}", contigs))
    write_batch_tar(path, genomes)


def _as_lists(it):
    return [
        (rn, [(cn, codes.tolist()) for cn, codes in contigs])
        for rn, contigs in it
    ]


def test_cache_matches_tar_streaming(tmp_path):
    tar = tmp_path / "b1.tar.xz"
    _mk_tar(tar)
    cache = tmp_path / "cache"
    sel = {"ACC1", "ACC3", "ACC4"}
    direct = _as_lists(iter_batch_assemblies(tar, sel))
    cached = _as_lists(iter_assemblies_cached(tar, sel, str(cache)))
    assert cached == direct and len(cached) == 3
    # second open hits the on-disk cache (same bytes, tar untouched)
    again = _as_lists(iter_assemblies_cached(tar, sel, str(cache)))
    assert again == direct
    # full iteration (selected=None) preserves tar member order
    assert [r for r, _ in iter_assemblies_cached(tar, None, str(cache))] == [
        r for r, _ in iter_batch_assemblies(tar)
    ]


def test_cache_invalidates_on_tar_change(tmp_path):
    tar = tmp_path / "b2.tar.xz"
    _mk_tar(tar, seed=2)
    cache = tmp_path / "cache"
    open_asm_cache(tar, cache)
    _mk_tar(tar, seed=3)  # rewrite with different content
    fresh = _as_lists(iter_assemblies_cached(tar, None, str(cache)))
    assert fresh == _as_lists(iter_batch_assemblies(tar))


def test_align_batch_uses_cache(tmp_path):
    """align_batch over the cache emits byte-identical records."""
    from phylign_tpu.align import engine as ae
    from phylign_tpu.match.filter import FilteredQuery
    from phylign_tpu.kmer import decode_seq

    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, 4000).astype(np.uint8)
    seq = decode_seq(genome).decode()
    write_batch_tar(
        tmp_path / "b.tar.xz", [("ACCX", [("ACCX.contig00001", seq.encode())])]
    )
    reads = []
    for i in range(4):
        s = rng.integers(0, 4000 - 150)
        reads.append(
            FilteredQuery(
                f"r{i}",
                seq[s : s + 150],
                [(0, "ACCX", 100)],
            )
        )
    params = ae.AlignParams.from_preset("sr")
    a = list(
        ae.align_batch(str(tmp_path / "b.tar.xz"), reads, None, params)
    )
    b = list(
        ae.align_batch(
            str(tmp_path / "b.tar.xz"), reads, None, params,
            asm_cache_dir=str(tmp_path / "cache"),
        )
    )
    assert [r.to_line() for r in a] == [r.to_line() for r in b]
    assert (tmp_path / "cache" / "b.codes").exists()
