"""Phase breakdown of one align flush at a given pool size (dev tool)."""
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

# monkeypatch timers around the flush phases
orig_chain = ae._chain_pairs
orig_disp = ae._extend_dispatch
orig_fin = ae._extend_finish
T = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        T[name] = T.get(name, 0.0) + time.perf_counter() - t0
        return out

    return wrap


ae._chain_pairs = timed("chain", orig_chain)
ae._extend_dispatch = timed("ext_dispatch", orig_disp)
ae._extend_finish = timed("ext_finish", orig_fin)

for rep in range(4):
    T.clear()
    t0 = time.perf_counter()
    pairs = ae.make_pairs_batch(ref, sks, params)
    t1 = time.perf_counter()
    recs = ae.flush_pairs(pairs, params)
    t2 = time.perf_counter()
    other = (t2 - t1) - sum(T.values())
    print(
        f"rep{rep}: anchors {t1-t0:.3f}  chain {T.get('chain',0):.3f}  "
        f"ext_dispatch {T.get('ext_dispatch',0):.3f}  "
        f"ext_finish {T.get('ext_finish',0):.3f}  select/other {other:.3f}  "
        f"total {t2-t0:.3f}  -> {N/(t2-t0):.0f} pairs/s"
    )
