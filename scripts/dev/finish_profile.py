"""Sub-phase breakdown of _extend_finish + make_pairs_batch (dev tool)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from phylign_tpu.align import engine as ae
from phylign_tpu.kmer import decode_seq
from phylign_tpu.ops import minimizer as opm
from phylign_tpu.utils.jaxcache import enable

enable()

rng = np.random.default_rng(0)
G = 3_000_000
N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
RL = 150
params = ae.AlignParams.from_preset("sr")

genome = rng.integers(0, 4, G).astype(np.uint8)
ref = opm.build_ref_index("g1", [("c1", genome)], params.k, params.w)
sks = []
for i in range(N):
    s = rng.integers(0, G - RL)
    r = genome[s : s + RL].copy()
    nmut = rng.binomial(RL, 0.01)
    pos = rng.choice(RL, nmut, replace=False)
    r[pos] = (r[pos] + rng.integers(1, 4, nmut)) % 4
    if i % 2:
        r = (3 - r)[::-1].copy()
    sks.append(ae.QuerySketch.make(f"r{i}", decode_seq(r).decode(), params))

import jax
import jax.numpy as jnp

float(jnp.zeros((8,)).sum())

# instrument _extend_finish sub-phases by wrapping key numpy/jax entry points
T = {}


def timeit(name):
    class _C:
        def __enter__(self):
            self.t = time.perf_counter()

        def __exit__(self, *a):
            T[name] = T.get(name, 0.0) + time.perf_counter() - self.t

    return _C()


orig_fin = ae._extend_finish


def fin(ctx):
    with timeit("fetch"):
        sc_end = jax.device_get(ctx.sc_dev)

    # re-inject: replace ctx.sc_dev with the already-fetched numpy
    class _Done:
        pass

    d = _Done()
    ctx.sc_dev = sc_end  # device_get on numpy is a no-op copy
    with timeit("post"):
        return orig_fin(ctx)


ae._extend_finish = fin

# also time the record-assembly loop: monkeypatch SamRecord creation count
import phylign_tpu.io.sam as iosam

for rep in range(4):
    T.clear()
    t0 = time.perf_counter()
    with timeit("anchors.collect"):
        per_q, rep = opm.collect_anchors_batch(
            ref, [sk.mh for sk in sks], [sk.mp for sk in sks],
            [sk.ms for sk in sks], [len(sk.codes) for sk in sks],
            params.occ_cap(ref),
        )
    with timeit("anchors.tasks"):
        pairs = [
            ae.PairTask(sk, ref, p, m, int(r))
            for sk, (p, m), r in zip(sks, per_q, rep)
        ]
    t1 = time.perf_counter()
    recs = ae.flush_pairs(pairs, params)
    t2 = time.perf_counter()
    print(
        f"rep{rep}: " + "  ".join(f"{k} {v:.3f}" for k, v in sorted(T.items()))
        + f"  total {t2-t0:.3f} -> {N/(t2-t0):.0f} pairs/s"
    )
