"""ctypes bindings for the native host library (libhostio.so).

Loads the C++ host kernels (XXH64 row hashing, minimizer sketch, encoding)
when the shared library is present — building it on first use if a compiler
is available — and exposes ``None`` handles otherwise so callers fall back
to the numpy implementations. Disable entirely with PHYLIGN_TPU_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger("phylign_tpu.native")

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libhostio.so"
_lib: ctypes.CDLL | None = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_HERE)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, OSError) as e:
        log.debug("native build failed: %s", e)
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("PHYLIGN_TPU_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    # a stale prebuilt .so (older revision still on disk) may miss newer
    # symbols; probe the newest one and rebuild once before giving up —
    # raising here would take down every native caller instead of falling
    # back to the numpy paths
    try:
        lib.anchors_count2
    except AttributeError:
        try:  # force a rebuild even if make thinks the .so is fresh
            _LIB_PATH.unlink()
        except OSError:
            pass
        if not _build():
            log.warning("stale libhostio.so and rebuild failed; using numpy")
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        try:
            lib.anchors_fill
        except AttributeError:
            log.warning("rebuilt libhostio.so still stale; using numpy")
            return None

    lib.xxh64.restype = ctypes.c_uint64
    lib.xxh64.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]

    lib.encode_seq.restype = None
    lib.encode_seq.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]

    lib.cobs_row_indices.restype = ctypes.c_int64
    lib.cobs_row_indices.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_uint64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
    ]

    lib.cobs_row_indices_batch.restype = None
    lib.cobs_row_indices_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_uint64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
    ]

    lib.minimizers_batch.restype = None
    lib.minimizers_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]

    lib.minimizers.restype = ctypes.c_int64
    lib.minimizers.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.match_text_stats.restype = ctypes.c_int32
    lib.match_text_stats.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]

    lib.parse_match_text.restype = ctypes.c_int64
    lib.parse_match_text.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]

    _i64p = ctypes.POINTER(ctypes.c_int64)
    _i32p = ctypes.POINTER(ctypes.c_int32)
    _u64p = ctypes.POINTER(ctypes.c_uint64)
    _u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.anchors_count2.restype = ctypes.c_int64
    lib.anchors_count2.argtypes = [
        _u64p, _i64p, _i64p, ctypes.c_int64,  # uh, us, ucnt, n_uniq
        _u8p,  # sort_strand
        _u64p, _i64p, _u8p, _i64p,  # qh, qpos, qstrand, qoff
        ctypes.c_int64,  # n_queries
        ctypes.c_int64, ctypes.c_int32,  # max_occ, k
        _i64p, _i32p, _i32p, _i64p,  # m_lo, m_np, m_nm, gcount
        _i64p,  # rep_len
    ]
    if hasattr(lib, "anchors_count2_seg"):
        lib.anchors_count2_seg.restype = ctypes.c_int64
        lib.anchors_count2_seg.argtypes = [
            _u64p, _i64p, _i64p,  # uh, us, ucnt (concatenated)
            _i64p, _i64p,  # useg_off, useg_n (per query)
            _u8p, _i64p,  # sort_strand (concat), sseg_off (per query)
            _u64p, _i64p, _u8p, _i64p,  # qh, qpos, qstrand, qoff
            ctypes.c_int64,  # n_queries
            _i64p, ctypes.c_int32,  # max_occ (per query), k
            _i64p, _i32p, _i32p, _i64p,  # m_lo, m_np, m_nm, gcount
            _i64p,  # rep_len
        ]
    lib.anchors_fill.restype = None
    lib.anchors_fill.argtypes = [
        _i32p, _u8p,  # sort_pos, sort_strand
        _i64p, _u8p, _i64p, _i64p, ctypes.c_int64,  # qpos, qstrand, qoff, qlen, n_queries
        ctypes.c_int32,  # k
        _i64p, _i32p, _i32p,  # m_lo, m_np, m_nm
        _i64p,  # bounds
        _i32p, _i32p,  # out_rpos, out_qpos
    ]

    lib.unique_inverse_i32.restype = ctypes.c_int64
    lib.unique_inverse_i32.argtypes = [_i32p, ctypes.c_int64, _i32p, _i32p]

    lib.filter_topk_rows.restype = ctypes.c_int64
    lib.filter_topk_rows.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]

    lib.assemble_sam_lines.restype = ctypes.c_int64
    lib.assemble_sam_lines.argtypes = [
        ctypes.c_int64,  # n
        _u8p, _i64p,  # qname buf/off
        _i32p,  # flag
        _u8p, _i64p, _i32p,  # rname table buf/off + cid
        _i32p, _i32p,  # pos, mapq
        _i32p, _i64p, _i32p,  # mis_cols, mis_off, qlen
        _u8p, _i64p,  # seq codes buf/off (forward strand)
        _i32p, _i32p, _i64p, _i64p, _i32p,  # dp, cm, s1, s2, rl
        _u8p, _i64p,  # de strings buf/off (preformatted)
        _u8p, ctypes.c_int64, _i64p,  # out, out_cap, line_off
    ]

    _lib = lib
    return lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def native_cobs_row_indices(
    codes: np.ndarray, k: int, signature_size: int, num_hashes: int
) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    n_pos = max(0, codes.shape[0] - k + 1)
    out = np.empty((n_pos, num_hashes), np.int64)
    if n_pos:
        lib.cobs_row_indices(
            _u8ptr(codes),
            codes.shape[0],
            k,
            signature_size,
            num_hashes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    return out


def native_cobs_row_indices_batch(
    codes_list: list[np.ndarray], k: int, signature_size: int, num_hashes: int
) -> list[np.ndarray] | None:
    """Batched native row hashing: ONE library call for a whole read set.
    Returns per-sequence int64 [n_pos_i, num_hashes] views into one shared
    buffer, or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(codes_list)
    lens = np.fromiter((c.shape[0] for c in codes_list), np.int64, count=n)
    off = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    npos = np.maximum(0, lens - k + 1)
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(npos, out=out_off[1:])
    cat = (
        np.ascontiguousarray(np.concatenate(codes_list), np.uint8)
        if n
        else np.zeros(1, np.uint8)
    )
    out = np.empty((int(out_off[-1]), num_hashes), np.int64)
    if n and out.size:
        lib.cobs_row_indices_batch(
            _u8ptr(cat),
            off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            k,
            signature_size,
            num_hashes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    oo = out_off.tolist()
    return [out[oo[i] : oo[i + 1]] for i in range(n)]


def native_minimizers(
    codes: np.ndarray, k: int, w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    n = max(0, codes.shape[0] - k + 1)
    hashes = np.empty(n, np.uint64)
    pos = np.empty(n, np.int32)
    strand = np.empty(n, np.uint8)
    cnt = 0
    if n:
        cnt = lib.minimizers(
            _u8ptr(codes),
            codes.shape[0],
            k,
            w,
            hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            _u8ptr(strand),
        )
    return hashes[:cnt], pos[:cnt], strand[:cnt]


def native_minimizers_batch(
    codes_list: list[np.ndarray], k: int, w: int
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]] | None:
    """Batched native minimizer sketching: ONE threaded library call for a
    whole read set. Returns per-sequence (hashes, positions, strands)
    views, or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(codes_list)
    lens = np.fromiter((c.shape[0] for c in codes_list), np.int64, count=n)
    off = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    npos = np.maximum(0, lens - k + 1)
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(npos, out=out_off[1:])
    tot = int(out_off[-1])
    cat = (
        np.ascontiguousarray(np.concatenate(codes_list), np.uint8)
        if n
        else np.zeros(1, np.uint8)
    )
    hashes = np.empty(max(1, tot), np.uint64)
    pos = np.empty(max(1, tot), np.int32)
    strand = np.empty(max(1, tot), np.uint8)
    counts = np.zeros(n, np.int64)
    if n and tot:
        lib.minimizers_batch(
            _u8ptr(cat),
            off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            k,
            w,
            hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            _u8ptr(strand),
            out_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    oo, cc = out_off.tolist(), counts.tolist()
    return [
        (
            hashes[oo[i] : oo[i] + cc[i]],
            pos[oo[i] : oo[i] + cc[i]],
            strand[oo[i] : oo[i] + cc[i]],
        )
        for i in range(n)
    ]


def native_xxh64(data: bytes, seed: int = 0) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.xxh64(data, len(data), seed))


def native_assemble_sam_lines(
    qname_buf: bytes,
    qname_off: np.ndarray,
    flag: np.ndarray,
    rname_buf: bytes,
    rname_off: np.ndarray,
    cid: np.ndarray,
    pos: np.ndarray,
    mapq: np.ndarray,
    mis_cols: np.ndarray,
    mis_off: np.ndarray,
    qlen: np.ndarray,
    seq_codes: np.ndarray,
    seq_off: np.ndarray,
    dp: np.ndarray,
    cm: np.ndarray,
    s1: np.ndarray,
    s2: np.ndarray,
    rl: np.ndarray,
    de_buf: bytes,
    de_off: np.ndarray,
) -> tuple[bytes, np.ndarray] | None:
    """Assemble full gapless-record SAM lines natively.

    Returns (line bytes, int64 offsets [n+1]) or None when the library is
    unavailable (callers fall back to the per-record python assembly).
    Inputs: concatenated-buffer + offset pairs for qnames / contig-name
    table / forward 2-bit seq codes / preformatted de:f strings; int arrays
    for everything else. CIGARs are derived from each record's sorted
    mismatch columns; flag bit 0x10 makes the C side emit the
    reverse-complement SEQ."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(flag)
    qname_off = np.ascontiguousarray(qname_off, np.int64)
    rname_off = np.ascontiguousarray(rname_off, np.int64)
    mis_off = np.ascontiguousarray(mis_off, np.int64)
    seq_off = np.ascontiguousarray(seq_off, np.int64)
    de_off = np.ascontiguousarray(de_off, np.int64)
    flag = np.ascontiguousarray(flag, np.int32)
    cid = np.ascontiguousarray(cid, np.int32)
    pos = np.ascontiguousarray(pos, np.int32)
    mapq = np.ascontiguousarray(mapq, np.int32)
    mis_cols = np.ascontiguousarray(mis_cols, np.int32)
    qlen = np.ascontiguousarray(qlen, np.int32)
    seq_codes = np.ascontiguousarray(seq_codes, np.uint8)
    dp = np.ascontiguousarray(dp, np.int32)
    cm = np.ascontiguousarray(cm, np.int32)
    s1 = np.ascontiguousarray(s1, np.int64)
    s2 = np.ascontiguousarray(s2, np.int64)
    rl = np.ascontiguousarray(rl, np.int32)
    max_rname = int(np.diff(rname_off).max()) if len(rname_off) > 1 else 0
    cap = int(
        230 * n
        + len(qname_buf)
        + len(de_buf)
        + int(seq_off[-1])
        + 12 * len(mis_cols)
        + n * max_rname
    )
    out = np.empty(cap, np.uint8)
    line_off = np.empty(n + 1, np.int64)
    qb = np.frombuffer(qname_buf, np.uint8) if qname_buf else np.zeros(1, np.uint8)
    rb = np.frombuffer(rname_buf, np.uint8) if rname_buf else np.zeros(1, np.uint8)
    db = np.frombuffer(de_buf, np.uint8) if de_buf else np.zeros(1, np.uint8)
    total = lib.assemble_sam_lines(
        n,
        _u8ptr(qb),
        qname_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flag.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _u8ptr(rb),
        rname_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mapq.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mis_cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mis_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        qlen.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _u8ptr(seq_codes if seq_codes.size else np.zeros(1, np.uint8)),
        seq_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        s1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        s2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _u8ptr(db),
        de_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _u8ptr(out),
        cap,
        line_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if total < 0:  # pragma: no cover - capacity bound is generous
        return None
    return out[:total].tobytes(), line_off


class ParsedMatchFile:
    """Array view of one 03_match file (native parse).

    qnames:   list[str]              query names, file order
    totals:   int64 [Q]              header n_total per query
    hit_end:  int64 [Q]              cumulative hit count (query i's hits are
                                     rows hit_end[i-1]:hit_end[i])
    acc_id:   uint32 [H]             interned accession id per hit
    score:    int32 [H]
    accs:     list[str]              id -> accession string
    """

    __slots__ = ("qnames", "totals", "hit_end", "acc_id", "score", "accs")

    def __init__(self, qnames, totals, hit_end, acc_id, score, accs):
        self.qnames = qnames
        self.totals = totals
        self.hit_end = hit_end
        self.acc_id = acc_id
        self.score = score
        self.accs = accs


def native_parse_match_text(data: bytes) -> "ParsedMatchFile | None":
    """Parse decompressed match text into arrays (None without the lib)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    nq = ctypes.c_int64()
    nh = ctypes.c_int64()
    rc = lib.match_text_stats(_u8ptr(buf), len(buf), ctypes.byref(nq), ctypes.byref(nh))
    if rc != 0:
        raise ValueError("malformed match file")
    nq, nh = nq.value, nh.value
    q_off = np.empty(nq, np.int64)
    q_len = np.empty(nq, np.int32)
    q_tot = np.empty(nq, np.int64)
    q_end = np.empty(nq, np.int64)
    acc_id = np.empty(nh, np.uint32)
    score = np.empty(nh, np.int32)
    a_off = np.empty(nh, np.int64)  # worst case: every hit a new accession
    a_len = np.empty(nh, np.int32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    nacc = lib.parse_match_text(
        _u8ptr(buf), len(buf),
        p(q_off, ctypes.c_int64), p(q_len, ctypes.c_int32),
        p(q_tot, ctypes.c_int64), p(q_end, ctypes.c_int64),
        p(acc_id, ctypes.c_uint32), p(score, ctypes.c_int32),
        p(a_off, ctypes.c_int64), p(a_len, ctypes.c_int32),
    )
    if nacc < 0:
        raise ValueError("malformed match file")
    qnames = [
        data[q_off[i] : q_off[i] + q_len[i]].decode() for i in range(nq)
    ]
    accs = [
        data[a_off[i] : a_off[i] + a_len[i]].decode() for i in range(nacc)
    ]
    return ParsedMatchFile(qnames, q_tot, q_end, acc_id, score, accs)


def _anchors_finish(
    lib, sort_pos, sort_strand, qpos, qstrand, qoff, qlen64, nq, k,
    m_lo, m_np, m_nm, gcount, total,
):
    """Shared tail of the anchor-collection wrappers: prefix the group
    counts into bounds, allocate the flat outputs, and run anchors_fill
    (whose contract is identical for the per-ref and segmented fronts —
    m_lo always carries offsets into the given sort arrays)."""
    bounds = np.zeros(2 * nq + 1, np.int64)
    np.cumsum(gcount, out=bounds[1:])
    out_rpos = np.empty(total, np.int32)
    out_qpos = np.empty(total, np.int32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    if total:
        lib.anchors_fill(
            p(sort_pos, ctypes.c_int32), _u8ptr(sort_strand),
            p(qpos, ctypes.c_int64), _u8ptr(qstrand),
            p(qoff, ctypes.c_int64), p(qlen64, ctypes.c_int64), nq,
            int(k),
            p(m_lo, ctypes.c_int64), p(m_np, ctypes.c_int32),
            p(m_nm, ctypes.c_int32), p(bounds, ctypes.c_int64),
            p(out_rpos, ctypes.c_int32), p(out_qpos, ctypes.c_int32),
        )
    return out_rpos, out_qpos, bounds


def native_collect_anchors(
    uh: np.ndarray,
    us: np.ndarray,
    ucnt: np.ndarray,
    sort_pos: np.ndarray,
    sort_strand: np.ndarray,
    qh: np.ndarray,
    qpos: np.ndarray,
    qstrand: np.ndarray,
    qoff: np.ndarray,
    qlen: np.ndarray,
    max_occ: int,
    k: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None:
    """Seed-anchor collection for a query batch against one ref table.

    Returns (rpos i32[T], qpos i32[T], bounds i64[2Q+1], rep_len i64[Q])
    with anchors of group g = 2*query + rel_strand in rows
    bounds[g]:bounds[g+1], sorted by (rpos, qpos) — byte-identical to the
    numpy path in ops.minimizer.collect_anchors_batch. rep_len[q] = query
    bases covered by over-max_occ seeds (minimap2's repeat length, rl:i).
    None without the lib."""
    lib = get_lib()
    if lib is None:
        return None
    nq = len(qlen)
    nm = qh.shape[0]
    uh = np.ascontiguousarray(uh, np.uint64)
    us = np.ascontiguousarray(us, np.int64)
    ucnt = np.ascontiguousarray(ucnt, np.int64)
    sort_pos = np.ascontiguousarray(sort_pos, np.int32)
    sort_strand = np.ascontiguousarray(sort_strand, np.uint8)
    qh = np.ascontiguousarray(qh, np.uint64)
    qpos = np.ascontiguousarray(qpos, np.int64)
    qstrand = np.ascontiguousarray(qstrand, np.uint8)
    qoff = np.ascontiguousarray(qoff, np.int64)
    qlen64 = np.ascontiguousarray(qlen, np.int64)

    m_lo = np.empty(nm, np.int64)
    m_np = np.empty(nm, np.int32)
    m_nm = np.empty(nm, np.int32)
    gcount = np.zeros(2 * nq, np.int64)
    rep_len = np.zeros(nq, np.int64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    total = lib.anchors_count2(
        p(uh, ctypes.c_uint64), p(us, ctypes.c_int64), p(ucnt, ctypes.c_int64),
        len(uh), _u8ptr(sort_strand),
        p(qh, ctypes.c_uint64), p(qpos, ctypes.c_int64), _u8ptr(qstrand),
        p(qoff, ctypes.c_int64), nq,
        int(max_occ), int(k),
        p(m_lo, ctypes.c_int64), p(m_np, ctypes.c_int32),
        p(m_nm, ctypes.c_int32), p(gcount, ctypes.c_int64),
        p(rep_len, ctypes.c_int64),
    )
    out_rpos, out_qpos, bounds = _anchors_finish(
        lib, sort_pos, sort_strand, qpos, qstrand, qoff, qlen64, nq, k,
        m_lo, m_np, m_nm, gcount, total,
    )
    return out_rpos, out_qpos, bounds, rep_len


def native_collect_anchors_seg(
    uh: np.ndarray,
    us: np.ndarray,
    ucnt: np.ndarray,
    useg_off: np.ndarray,
    useg_n: np.ndarray,
    sort_pos: np.ndarray,
    sort_strand: np.ndarray,
    sseg_off: np.ndarray,
    qh: np.ndarray,
    qpos: np.ndarray,
    qstrand: np.ndarray,
    qoff: np.ndarray,
    qlen: np.ndarray,
    max_occ: np.ndarray,
    k: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None:
    """Segmented anchor collection: MANY (ref table, query) groups in one
    native call. Table arrays are the refs' uniq/sort tables concatenated;
    per-query useg_off/useg_n/sseg_off/max_occ select the query's ref
    segment. Output contract identical to native_collect_anchors. None
    without the lib (or a lib predating the symbol)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "anchors_count2_seg"):
        return None
    nq = len(qlen)
    nm = qh.shape[0]
    uh = np.ascontiguousarray(uh, np.uint64)
    us = np.ascontiguousarray(us, np.int64)
    ucnt = np.ascontiguousarray(ucnt, np.int64)
    useg_off = np.ascontiguousarray(useg_off, np.int64)
    useg_n = np.ascontiguousarray(useg_n, np.int64)
    sort_pos = np.ascontiguousarray(sort_pos, np.int32)
    sort_strand = np.ascontiguousarray(sort_strand, np.uint8)
    sseg_off = np.ascontiguousarray(sseg_off, np.int64)
    qh = np.ascontiguousarray(qh, np.uint64)
    qpos = np.ascontiguousarray(qpos, np.int64)
    qstrand = np.ascontiguousarray(qstrand, np.uint8)
    qoff = np.ascontiguousarray(qoff, np.int64)
    qlen64 = np.ascontiguousarray(qlen, np.int64)
    max_occ = np.ascontiguousarray(max_occ, np.int64)

    m_lo = np.empty(nm, np.int64)
    m_np = np.empty(nm, np.int32)
    m_nm = np.empty(nm, np.int32)
    gcount = np.zeros(2 * nq, np.int64)
    rep_len = np.zeros(nq, np.int64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    total = lib.anchors_count2_seg(
        p(uh, ctypes.c_uint64), p(us, ctypes.c_int64), p(ucnt, ctypes.c_int64),
        p(useg_off, ctypes.c_int64), p(useg_n, ctypes.c_int64),
        _u8ptr(sort_strand), p(sseg_off, ctypes.c_int64),
        p(qh, ctypes.c_uint64), p(qpos, ctypes.c_int64), _u8ptr(qstrand),
        p(qoff, ctypes.c_int64), nq,
        p(max_occ, ctypes.c_int64), int(k),
        p(m_lo, ctypes.c_int64), p(m_np, ctypes.c_int32),
        p(m_nm, ctypes.c_int32), p(gcount, ctypes.c_int64),
        p(rep_len, ctypes.c_int64),
    )
    out_rpos, out_qpos, bounds = _anchors_finish(
        lib, sort_pos, sort_strand, qpos, qstrand, qoff, qlen64, nq, k,
        m_lo, m_np, m_nm, gcount, total,
    )
    return out_rpos, out_qpos, bounds, rep_len


def native_unique_inverse(x: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """Sorted unique values + inverse ranks of a non-negative int32 array
    (numpy-equivalent of np.unique(x, return_inverse=True), radix-sorted in
    C++). None without the lib."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.int32)
    n = x.size
    uniq = np.empty(n, np.int32)
    inv = np.empty(n, np.int32)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    nu = lib.unique_inverse_i32(p(x), n, p(uniq), p(inv))
    return uniq[:nu], inv


def native_filter_topk_rows(q, score, brank, arank, smax, keep):
    """Sort+cut core of the candidate filter (None without the lib, or if
    a packing range is violated — callers fall back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.int64)
    score = np.ascontiguousarray(score, np.int32)
    brank = np.ascontiguousarray(brank, np.int32)
    arank = np.ascontiguousarray(arank, np.int32)
    n = q.shape[0]
    kept = np.empty(n, np.int64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    cnt = lib.filter_topk_rows(
        p(q, ctypes.c_int64), p(score, ctypes.c_int32),
        p(brank, ctypes.c_int32), p(arank, ctypes.c_int32),
        n, int(smax), int(keep), p(kept, ctypes.c_int64),
    )
    if cnt < 0:
        return None
    return kept[:cnt]
