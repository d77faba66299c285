"""Device match engine: k-mer containment scoring over a packed Bloom bit-matrix.

This is the TPU-native replacement for ``cobs query``'s hot loop
(ref: /root/reference/Snakefile:419-427; SURVEY.md section 2b): for each query
k-mer, gather its Bloom row(s) from the packed bit-matrix and accumulate a
per-document hit count.

Data model
----------
  words     uint32 [S+1, Wp]   packed bit-matrix: doc d lives at word d//32,
                               bit d%32 (see phylign_tpu.io.cobs.DeviceIndex).
                               Row S (the last) is all-zero: the padding row.
                               Wp is padded to a multiple of 128 words
                               (512 B) so each row is lane-aligned.
  row_idx   int32  [Q, K]      per query, K k-mer slots; each slot is a Bloom
                               row index, or S (the zero row) for padding /
                               absent k-mers. For num_hashes > 1 the slot axis
                               is [Q, K, H] and a k-mer hits only if ALL H
                               rows have the doc bit (AND before counting).
  scores    int32  [Q, 32*Wp]  per (query, doc) hit counts; callers slice
                               [:, :num_docs].

Two implementations with identical semantics:
  * ``match_scores_xla``   — pure jnp (gather + bit-unpack + segment-sum),
                             runs on any backend; the correctness baseline.
  * ``match_scores_pallas``— TPU kernel: per-query DMA row gather from HBM
                             into VMEM with a deep async pipeline, then an
                             unrolled 32-shift vertical popcount on the VPU.

The padding-row trick keeps every shape static: invalid slots contribute 0
to every document, so no masks enter the inner loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Persistent compilation cache: kernels here compile once per shape bucket;
# without the cache a cold extension compile costs minutes through this
# environment's remote-compile relay (see phylign_tpu.utils.jaxcache).
from phylign_tpu.utils.jaxcache import enable as _enable_jax_cache

_enable_jax_cache()

LANE_WORDS = 128  # uint32 words per 512-byte aligned row chunk


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_device_words(words: np.ndarray, lane_words: int = 1) -> np.ndarray:
    """[S, W] uint32 -> [S+1, Wp] with Wp a multiple of ``lane_words`` and a
    final all-zero padding row.

    lane_words=1 (exact width) suits the XLA gather path: the gather is
    per-row-bound rather than per-byte-bound (measured FASTER at narrow
    widths), and the relay uploads at ~15-20 MB/s so padding bytes are pure
    loss (a 32-doc batch is 1 word, not 8). The Pallas kernel requires
    lane_words=LANE_WORDS (full 512 B lanes); mesh sharding requires a
    multiple of the doc-axis size."""
    s, w = words.shape
    wp = round_up(max(w, 1), lane_words)
    out = np.zeros((s + 1, wp), dtype=np.uint32)
    out[:s, :w] = words
    return out


def pack_row_indices(
    rows_per_query: list[np.ndarray], k_max: int, pad_row: int, num_hashes: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Stack per-query [n_kmers, H] row-index arrays into [Q, K, H] int32 plus
    the per-query valid k-mer counts [Q] int32. Queries with more than k_max
    k-mers are rejected (caller buckets by length)."""
    q = len(rows_per_query)
    out = np.full((q, k_max, num_hashes), pad_row, dtype=np.int32)
    counts = np.zeros(q, dtype=np.int32)
    for i, r in enumerate(rows_per_query):
        n = r.shape[0]
        if n > k_max:
            raise ValueError(f"query {i} has {n} k-mers > k_max={k_max}")
        out[i, :n] = r
        counts[i] = n
    return out, counts


# --- XLA reference implementation -------------------------------------------


@jax.jit
def match_scores_xla(words: jax.Array, row_idx: jax.Array) -> jax.Array:
    """Gather + vertical popcount in pure jnp.

    words: uint32 [S+1, Wp]; row_idx: int32 [Q, K] or [Q, K, H].
    Returns int32 [Q, 32*Wp] (doc d at index (d//32)*32 + d%32 == d).

    Written as unchunked expressions on purpose: XLA fuses the shift/mask
    unpack and the K-reduction into the gather consumer, so the [Q,K,Wp,32]
    intermediate never materializes. (A lax.scan over K-chunks measured ~50%
    slower — the scan boundary blocks that fusion.) The gather is SPLIT into
    4 interleaved K-slices: the kernel is gather-ISSUE-bound (~45M rows/s on
    a v5e regardless of row width or locality — see docs/performance.md),
    and 4 independent gather streams overlap their issue latency (measured
    239k -> 342k q/s at S=2M, Wp=68, Q=2048, K=128). Callers bound Q via
    config.device_query_chunk.
    """
    if row_idx.ndim == 2:
        row_idx = row_idx[..., None]
    q, k, h = row_idx.shape
    wp = words.shape[1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    n_split = 4 if k >= 8 else 1
    acc = jnp.zeros((q, wp, 32), jnp.int32)
    for i in range(n_split):
        g = words[row_idx[:, i::n_split]]  # [Q, K/n, H, Wp] uint32
        if h > 1:
            a = g[:, :, 0, :]
            for j in range(1, h):
                a = a & g[:, :, j, :]
            g = a
        else:
            g = g[:, :, 0, :]
        bits = (g[..., None] >> shifts) & jnp.uint32(1)  # [Q, K/n, Wp, 32]
        acc = acc + bits.astype(jnp.int32).sum(axis=1)  # [Q, Wp, 32]
    # doc d lives at (w=d//32)*32 + (b=d%32)
    return acc.reshape(q, wp * 32)


# --- cross-query k-mer dedup (two-stage gather) ------------------------------

#: bytes below which a gather SOURCE table sits in the measured fast regime
#: (v5e: ~138M rows/s vs ~65M from HBM-resident tables; the cliff sits
#: between 36 MB and 71 MB — VMEM residency; docs/performance.md)
DEDUP_FAST_BYTES = 40 << 20

#: dedup pays only when stage-1 (U big-gathers) + stage-2 (N fast-gathers)
#: undercuts N big-gathers; with the measured 2.1x fast-regime speedup the
#: breakeven is U/N ~ 0.55
DEDUP_MAX_FRAC = 0.55


def dedup_rows(
    row_idx: np.ndarray, pad_row: int, wp: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Host half of the two-stage dedup gather: unique row indices (padded
    to a power-of-two bucket with ``pad_row``) + inverse indices, or None
    when the dedup would not be profitable (low cross-query duplication, or
    a unique table too large for the fast-gather regime).

    Real read sets share k-mers across overlapping reads; gathering each
    distinct Bloom row ONCE into a small device table and re-gathering from
    it beats the big-table gather rate once ~45% of the chunk's row indices
    are duplicates (measured; see docs/performance.md "match dedup").
    """
    flat = row_idx.reshape(-1)
    from phylign_tpu import native

    nat = native.native_unique_inverse(flat)
    if nat is not None:
        uniq, inv = nat
    else:
        uniq, inv = np.unique(flat, return_inverse=True)
        inv = inv.astype(np.int32)
    u, n = uniq.size, flat.size
    up = 1 << max(10, int(np.ceil(np.log2(u + 1))))
    if up * wp * 4 > DEDUP_FAST_BYTES or u > DEDUP_MAX_FRAC * n:
        return None
    uniq_pad = np.full(up, pad_row, np.int32)
    uniq_pad[:u] = uniq
    return uniq_pad, inv.reshape(row_idx.shape)


@jax.jit
def match_scores_xla_dedup(
    words: jax.Array, uniq_pad: jax.Array, inv: jax.Array
) -> jax.Array:
    """Two-stage scoring: gather the chunk's unique Bloom rows into a small
    table (fast-gather regime), then run the standard kernel against it.
    Bit-identical to match_scores_xla(words, row_idx) for the (uniq, inv)
    pair produced by dedup_rows: padding slots index ``pad_row`` whose row
    is all-zero in both tables."""
    return match_scores_xla(words[uniq_pad], inv)


# --- Pallas TPU kernel -------------------------------------------------------

_N_BUF = 16  # DMA pipeline depth for the row gather
_QT = 8  # queries per grid step (SMEM sublane granularity)


def _match_kernel_body(
    idx_ref,  # SMEM block: int32 [QT, K * H] — this tile's row indices
    words_hbm,  # ANY/HBM: uint32 [S+1, Wp]
    out_ref,  # VMEM out block: int32 [QT, 32, Wp]
    rows_vmem,  # scratch: uint32 [QT * K * H, Wp]
    sems,  # DMA semaphores [_N_BUF]
    *,
    k: int,
    h: int,
):
    n = k * h
    total = _QT * n

    def get_dma(slot, i):
        row = idx_ref[i // n, i % n]
        return pltpu.make_async_copy(
            words_hbm.at[row], rows_vmem.at[i], sems.at[slot]
        )

    # warm-up: fill the pipeline
    for i in range(min(_N_BUF, total)):
        get_dma(i % _N_BUF, i).start()

    def loop(i, _):
        get_dma(i % _N_BUF, i).wait()

        @pl.when(i + _N_BUF < total)
        def _():
            get_dma(i % _N_BUF, i + _N_BUF).start()

        return 0

    jax.lax.fori_loop(0, total, loop, 0)

    wp = rows_vmem.shape[-1]
    for qi in range(_QT):
        g = rows_vmem[qi * n : (qi + 1) * n, :]
        if h > 1:
            kk = g.reshape(k, h, wp)
            g = kk[:, 0, :]
            for j in range(1, h):
                g = g & kk[:, j, :]
        # vertical popcount: 32 unrolled shift-mask passes, K-sum on sublanes
        for b in range(32):
            bits = (g >> jnp.uint32(b)) & jnp.uint32(1)
            out_ref[qi, b, :] = bits.astype(jnp.int32).sum(axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_scores_pallas(
    words: jax.Array, row_idx: jax.Array, interpret: bool = False
) -> jax.Array:
    """TPU Pallas path; same contract as match_scores_xla."""
    if row_idx.ndim == 2:
        row_idx = row_idx[..., None]
    q, k, h = row_idx.shape
    wp = words.shape[1]
    assert wp % LANE_WORDS == 0, "pad words with pad_device_words first"
    qp = round_up(q, _QT)
    if qp != q:  # pad with all-padding-row queries, slice after
        fill = jnp.full((qp - q, k, h), words.shape[0] - 1, row_idx.dtype)
        row_idx = jnp.concatenate([row_idx, fill], axis=0)

    grid_spec = pl.GridSpec(
        grid=(qp // _QT,),
        in_specs=[
            pl.BlockSpec(
                (_QT, k * h), lambda i: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (_QT, 32, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_QT * k * h, wp), jnp.uint32),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_match_kernel_body, k=k, h=h),
        out_shape=jax.ShapeDtypeStruct((qp, 32, wp), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(row_idx.reshape(qp, k * h), words)
    # [Q, 32, Wp] -> [Q, Wp*32] with doc d at w*32+b
    return out[:q].transpose(0, 2, 1).reshape(q, wp * 32)


# --- Pallas TPU kernel v2: wave-issued DMAs + bit-sliced vertical popcount ---

_V2_WAVE = 32  # rows per DMA wave (outstanding DMAs stays ~2 waves)
_V2_QT = 8  # queries per grid step


def _v2_kernel_body(
    idx_ref,  # SMEM [QT, K]
    words_hbm,  # ANY [S+1, Wp]
    out_ref,  # VMEM [QT, 32, Wp] int32
    banks,  # VMEM scratch [2, W, Wp] uint32
    sems,  # DMA sems [2]
    *,
    k: int,
    wave: int,
    planes: int,
):
    """One query tile: gather K rows/query in interleaved waves (start wave
    g+1 row-by-row while draining wave g), accumulating a bit-sliced vertical
    popcount (carry-save ripple over ``planes`` bit planes per sublane).

    Compute per row is ~2*planes VPU ops on [8, Wp] instead of the 32-pass
    shift-unpack of v1, and the DMA pipeline keeps ~2*wave copies in flight.
    """
    wp = banks.shape[-1]
    wpq = k // wave  # waves per query
    nw = _V2_QT * wpq  # waves per grid step

    def row_of(flat):
        return idx_ref[flat // k, flat % k]

    def copy(bank, slot, flat):
        return pltpu.make_async_copy(
            words_hbm.at[row_of(flat)], banks.at[bank, slot], sems.at[bank]
        )

    def start_wave(g, _=None):
        def body(i, _):
            copy(g % 2, i, g * wave + i).start()
            return 0

        jax.lax.fori_loop(0, wave, body, 0)

    start_wave(0)

    groups = wave // 8
    shifts32 = None
    for qi in range(_V2_QT):
        c = [jnp.zeros((8, wp), jnp.uint32) for _ in range(planes)]
        for wv in range(wpq):
            g = qi * wpq + wv
            b = g % 2

            # drain wave g while issuing wave g+1 (bounded outstanding DMAs)
            def pipe(i, _, g=g, b=b):
                @pl.when(g + 1 < nw)
                def _():
                    copy(1 - b, i, (g + 1) * wave + i).start()

                copy(b, i, g * wave + i).wait()
                return 0

            jax.lax.fori_loop(0, wave, pipe, 0)

            # ripple-add each [8, Wp] row group into the bit planes
            for gr in range(groups):
                carry = banks[b, gr * 8 : (gr + 1) * 8, :]
                for j in range(planes):
                    t = c[j] & carry
                    c[j] = c[j] ^ carry
                    carry = t

        # unpack: count(w*32+b) = sum_s sum_j 2^j * bit_b(c[j][s, w])
        for bit in range(32):
            val = jnp.zeros((8, wp), jnp.uint32)
            for j in range(planes):
                val = val + (((c[j] >> jnp.uint32(bit)) & jnp.uint32(1)) << j)
            out_ref[qi, bit, :] = val.astype(jnp.int32).sum(axis=0)


@functools.partial(jax.jit, static_argnames=("interpret", "wave"))
def match_scores_pallas_v2(
    words: jax.Array,
    row_idx: jax.Array,
    interpret: bool = False,
    wave: int = _V2_WAVE,
) -> jax.Array:
    """Wave-pipelined Pallas path; same contract as match_scores_xla.
    Requires H == 1 and K a multiple of ``wave`` (callers bucket K to 64)."""
    if row_idx.ndim == 3:
        assert row_idx.shape[2] == 1, "v2 kernel is single-hash only"
        row_idx = row_idx[..., 0]
    q, k = row_idx.shape
    assert k % wave == 0 and wave % 8 == 0, (k, wave)
    wp = words.shape[1]
    assert wp % LANE_WORDS == 0, "pad words with pad_device_words first"
    qp = round_up(q, _V2_QT)
    if qp != q:
        fill = jnp.full((qp - q, k), words.shape[0] - 1, row_idx.dtype)
        row_idx = jnp.concatenate([row_idx, fill], axis=0)
    # per-sublane counts reach k//8: need enough planes to hold that value
    planes = max(1, int(np.ceil(np.log2(k // 8 + 1))))

    grid_spec = pl.GridSpec(
        grid=(qp // _V2_QT,),
        in_specs=[
            pl.BlockSpec((_V2_QT, k), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (_V2_QT, 32, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wave, wp), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_v2_kernel_body, k=k, wave=wave, planes=planes),
        out_shape=jax.ShapeDtypeStruct((qp, 32, wp), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(row_idx, words)
    return out[:q].transpose(0, 2, 1).reshape(q, wp * 32)


def match_scores(
    words: jax.Array, row_idx: jax.Array, use_pallas: bool | None = None
) -> jax.Array:
    """Dispatch between the two equivalent paths.

    Default is the XLA path on every backend: measured on v5e it matches or
    beats the current Pallas kernel at runtime (fused gather+unpack, ~345k
    q/s vs ~140k) AND compiles in <1 s where the Mosaic kernel takes minutes
    through this environment's remote-compile relay (and misses the
    persistent cache). The Pallas kernel stays available for explicit
    benchmarking and future tuning (use_pallas=True).
    """
    if use_pallas:
        return match_scores_pallas(words, row_idx)
    return match_scores_xla(words, row_idx)
