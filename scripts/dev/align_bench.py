"""Align-stage microbenchmark on the real chip: pairs/s + phase breakdown.

Usage: align_bench.py [N_READS] [host|fused] [pipe]

  * default mode runs the fused device-resident flush (the production
    default, align.fused); 'host' runs the round-2 host selection path.
  * 'pipe' adds a steady-state measurement: M pools flow through the same
    one-deep flush pipeline align_batch uses in production (pool i+1's
    anchor collection overlaps pool i's device flush), which is the number
    that maps to batch-align throughput.
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

from phylign_tpu.align import engine as ae
from phylign_tpu.kmer import decode_seq
from phylign_tpu.ops import minimizer as opm
from phylign_tpu.utils.jaxcache import enable

enable()

rng = np.random.default_rng(0)
G = 3_000_000
N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
MODE = sys.argv[2] if len(sys.argv) > 2 else "fused"
PIPE = "pipe" in sys.argv[3:] or MODE == "pipe"
if MODE == "pipe":
    MODE = "fused"
FUSED = MODE != "host"
RL = 150
params = ae.AlignParams.from_preset("sr")

genome = rng.integers(0, 4, G).astype(np.uint8)
t0 = time.perf_counter()
ref = opm.build_ref_index("g1", [("c1", genome)], params.k, params.w)
print(f"ref index build ({G/1e6:.0f} Mb): {time.perf_counter()-t0:.2f}s")

# reads sampled from the genome with 1% mismatches, half reverse-complemented
sks = []
t0 = time.perf_counter()
for i in range(N_READS):
    s = rng.integers(0, G - RL)
    r = genome[s : s + RL].copy()
    nmut = rng.binomial(RL, 0.01)
    pos = rng.choice(RL, nmut, replace=False)
    r[pos] = (r[pos] + rng.integers(1, 4, nmut)) % 4
    if i % 2:
        r = (3 - r)[::-1].copy()
    sks.append(ae.QuerySketch.make(f"r{i}", decode_seq(r).decode(), params))
print(f"sketch {N_READS} reads: {time.perf_counter()-t0:.2f}s")

import jax.numpy as jnp

float(jnp.zeros((8,)).sum())  # claim device

best = None
for rep in range(6):
    t0 = time.perf_counter()
    pairs = ae.make_pairs_batch(ref, sks, params)
    t1 = time.perf_counter()
    recs = ae.flush_pairs(pairs, params, fused=FUSED)
    t2 = time.perf_counter()
    mapped = sum(1 for r in recs if r.flag != 4)
    print(
        f"rep{rep}: anchors {t1-t0:.2f}s  flush {t2-t1:.2f}s  "
        f"-> {N_READS/(t2-t0):.0f} pairs/s  mapped {mapped}/{len(recs)}"
    )
    if rep > 0:  # rep0 pays compiles
        best = min(best or 1e9, t2 - t0)
print(f"[{MODE}] best warm: {N_READS/best:.0f} pairs/s ({best:.2f}s)")

if PIPE:
    # steady state: M pools through the production one-deep flush pipeline
    # (single-threaded dispatch-ahead: pool i+1's anchor collection runs
    # while pool i's device program computes — align_batch's structure)
    M = 6
    t0 = time.perf_counter()
    done = 0
    pending = None
    for _ in range(M):
        pairs = ae.make_pairs_batch(ref, sks, params)
        nxt = ae.flush_pairs_begin(pairs, params, fused=FUSED)
        if pending is not None:
            done += len(ae.flush_pairs_end(pending))
        pending = nxt
    done += len(ae.flush_pairs_end(pending))
    dt = time.perf_counter() - t0
    print(
        f"[{MODE}] pipelined steady state: {M*N_READS/dt:.0f} pairs/s "
        f"({M} pools x {N_READS}, {dt:.2f}s, {done} records)"
    )
