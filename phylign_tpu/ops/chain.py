"""Batched anchor chaining DP (minimap2-style) on device.

Replaces minimap2's mm_chain_dp for the sr preset (the reference invokes
minimap2 once per (batch, candidate genome):
/root/reference/scripts/batch_align.py:264-313). All (query, genome) pairs of
a batch are chained together as one [P, A] tensor program: P pairs, A padded
anchor slots.

Scoring (minimap2 chaining model):
    f[i] = seed_weight + max(0, max_{j<i} f[j] + gain(j, i) - gap_cost(j, i))
    gain = min(dq, dr, k);   gap_cost = 0.01 * k * dd + 0.5 * log2(dd + 1)
    with dd = |dr - dq|; transition allowed iff 0 < dr <= max_gap,
    0 < dq <= max_gap, dd <= bandwidth. Anchors are sorted by (rpos, qpos).

Padding: invalid slots carry rpos = qpos = PAD_POS; every transition to or
from them violates the distance bounds, and their standalone score is ignored
by masking at the argmax.

Output per pair: best chain (score, count, qstart, qend, rstart, rend) where
end coordinates are exclusive of the k-mer span (qend/rend point at the last
anchor's k-mer end).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: kernels here compile once per shape bucket;
# without the cache a cold extension compile costs minutes through this
# environment's remote-compile relay (see phylign_tpu.utils.jaxcache).
from phylign_tpu.utils.jaxcache import enable as _enable_jax_cache

_enable_jax_cache()

PAD_POS = np.int32(2**30)


class ChainResult(NamedTuple):
    score: jax.Array  # f32 [P]
    count: jax.Array  # int32 [P] anchors on the best chain
    qs: jax.Array  # int32 [P] query start (anchor kmer start)
    qe: jax.Array  # int32 [P] query end (last anchor kmer start + k)
    rs: jax.Array  # int32 [P] ref start
    re: jax.Array  # int32 [P] ref end
    # second-best chain whose query interval is mostly disjoint from the
    # primary's (mask_level 0.5, minimap2's supplementary/split-read source);
    # score2 < 0 when no such chain exists
    score2: jax.Array  # f32 [P]
    count2: jax.Array  # int32 [P]
    qs2: jax.Array  # int32 [P]
    qe2: jax.Array  # int32 [P]
    rs2: jax.Array  # int32 [P]
    re2: jax.Array  # int32 [P]


@functools.partial(
    jax.jit, static_argnames=("k", "max_gap", "bandwidth")
)
def chain_anchors_packed(
    rpos: jax.Array,  # int32 [P, A]
    qpos_u16: jax.Array,  # uint16 [P, A] — transfer-compact query positions
    k: int = 21,
    max_gap: int = 100,
    bandwidth: int = 100,
) -> "ChainResult":
    """chain_anchors with qpos shipped as uint16 (halves the second H2D
    array; slot validity comes from rpos alone, so padded qpos values are
    free). Callers must ensure real qpos < 2**16 (true for any query the
    align engine buckets; it falls back to the int32 path otherwise)."""
    return chain_anchors(
        rpos, qpos_u16.astype(jnp.int32), k=k, max_gap=max_gap,
        bandwidth=bandwidth,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "max_gap", "bandwidth")
)
def chain_anchors(
    rpos: jax.Array,  # int32 [P, A], PAD_POS for padding; sorted (rpos, qpos)
    qpos: jax.Array,  # int32 [P, A]
    k: int = 21,
    max_gap: int = 100,
    bandwidth: int = 100,
) -> ChainResult:
    p, a = rpos.shape
    rf = rpos.astype(jnp.float32)
    valid = rpos < PAD_POS

    # pairwise transition scores sc[p, j, i]: gain - cost for j -> i
    dr = rpos[:, None, :] - rpos[:, :, None]  # [P, j, i]
    dq = qpos[:, None, :] - qpos[:, :, None]
    dd = jnp.abs(dr - dq)
    ok = (
        (dr > 0)
        & (dq > 0)
        & (dr <= max_gap)
        & (dq <= max_gap)
        & (dd <= bandwidth)
        & valid[:, :, None]
        & valid[:, None, :]
    )
    gain = jnp.minimum(jnp.minimum(dq, dr), k).astype(jnp.float32)
    ddf = dd.astype(jnp.float32)
    cost = 0.01 * k * ddf + 0.5 * jnp.log2(ddf + 1.0)
    sc = jnp.where(ok, gain - cost, -jnp.inf)  # [P, A(j), A(i)]

    neg = jnp.float32(-1e30)
    seed_w = jnp.float32(k)

    def step(i, carry):
        f, parent = carry  # f: [P, A] chain scores; parent int32 [P, A]
        cand = f + sc[:, :, i]  # [P, A] over predecessors j
        best_j = jnp.argmax(cand, axis=1)  # [P]
        best_v = jnp.take_along_axis(cand, best_j[:, None], axis=1)[:, 0]
        use = best_v > 0.0
        fi = seed_w + jnp.maximum(best_v, 0.0)
        pi = jnp.where(use, best_j.astype(jnp.int32), jnp.int32(-1))
        onehot = jax.lax.broadcasted_iota(jnp.int32, (p, a), 1) == i
        f = jnp.where(onehot, fi[:, None], f)
        parent = jnp.where(onehot, pi[:, None], parent)
        return f, parent

    f0 = jnp.full((p, a), seed_w, jnp.float32)
    parent0 = jnp.full((p, a), -1, jnp.int32)
    f, parent = jax.lax.fori_loop(1, a, step, (f0, parent0))
    f = jnp.where(valid, f, neg)

    # backtrack ALL chain ends at once: start anchor + count for every slot
    def back_all(_, carry):
        cur, cnt = carry  # [P, A]
        nxt = jnp.take_along_axis(parent, cur, axis=1)
        has = nxt >= 0
        cur = jnp.where(has, nxt, cur)
        cnt = cnt + has.astype(jnp.int32)
        return cur, cnt

    ends_all = jnp.broadcast_to(
        jnp.arange(a, dtype=jnp.int32)[None, :], (p, a)
    )
    start_all, cnt_all = jax.lax.fori_loop(
        0, a, back_all, (ends_all, jnp.ones((p, a), jnp.int32))
    )
    qs_all = jnp.take_along_axis(qpos, start_all, axis=1)  # [P, A]
    qe_all = qpos + k  # end anchor of slot i is i itself
    rs_all = jnp.take_along_axis(rpos, start_all, axis=1)

    end = jnp.argmax(f, axis=1).astype(jnp.int32)  # [P]
    take = lambda arr, idx: jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]
    score = take(f, end)
    qs1, qe1 = take(qs_all, end), take(qe_all, end)

    # best chain whose query interval overlaps the primary's by < 50% of the
    # shorter interval (minimap2 mask_level): the split-read second segment
    ov = jnp.maximum(
        0,
        jnp.minimum(qe_all, qe1[:, None]) - jnp.maximum(qs_all, qs1[:, None]),
    ).astype(jnp.float32)
    span = jnp.minimum(qe_all - qs_all, (qe1 - qs1)[:, None]).astype(jnp.float32)
    disjoint = ov < 0.5 * span
    f2 = jnp.where(disjoint & valid, f, neg)
    end2 = jnp.argmax(f2, axis=1).astype(jnp.int32)
    return ChainResult(
        score=score,
        count=take(cnt_all, end),
        qs=qs1,
        qe=qe1,
        rs=take(rs_all, end),
        re=take(rpos, end) + k,
        score2=take(f2, end2),
        count2=take(cnt_all, end2),
        qs2=take(qs_all, end2),
        qe2=take(qe_all, end2),
        rs2=take(rs_all, end2),
        re2=take(rpos, end2) + k,
    )


def chain_oracle(
    rpos: np.ndarray, qpos: np.ndarray, k=21, max_gap=100, bandwidth=100
):
    """Scalar numpy transliteration of the same DP, for tests."""
    a = len(rpos)
    f = np.full(a, float(k))
    parent = np.full(a, -1)
    for i in range(1, a):
        best, bj = 0.0, -1
        for j in range(i):
            dr, dq = rpos[i] - rpos[j], qpos[i] - qpos[j]
            dd = abs(dr - dq)
            if dr <= 0 or dq <= 0 or dr > max_gap or dq > max_gap or dd > bandwidth:
                continue
            sc = min(dq, dr, k) - (0.01 * k * dd + 0.5 * np.log2(dd + 1))
            if f[j] + sc > best:
                best, bj = f[j] + sc, j
        f[i] = k + best
        parent[i] = bj
    end = int(np.argmax(f))
    cnt, cur = 1, end
    while parent[cur] >= 0:
        cur = parent[cur]
        cnt += 1
    return f[end], cnt, qpos[cur], qpos[end] + k, rpos[cur], rpos[end] + k
