"""Phase-level profile of one fused flush: dispatch build / device wait /
finish / delegated-extend / grouping.  Dev tool; mirrors align_bench's
workload.  Usage: flush_profile.py [N_READS]"""
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
N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
RL = 150
params = ae.AlignParams.from_preset("sr")
genome = rng.integers(0, 4, G).astype(np.uint8)
ref = opm.build_ref_index("g1", [("c1", genome)], params.k, params.w)
sks = []
for i in range(N_READS):
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

for rep in range(4):
    t0 = time.perf_counter()
    pairs = ae.make_pairs_batch(ref, sks, params)
    t1 = time.perf_counter()
    ff = ae.flush_pairs_begin(pairs, params, fused=True)
    # drain manually with phase timing
    records = {}
    delegated = []
    had_chain = set()
    t_disp = t1 - t0  # anchor collection counted separately below
    t_fin = t_get = t_dispatch2 = 0.0
    td0 = time.perf_counter()
    t_dispatch_initial = td0 - t1
    while ff.inflight:
        ctx = ff.inflight.pop(0)
        g0 = time.perf_counter()
        jax.block_until_ready(ctx.out_dev)
        g1 = time.perf_counter()
        rec, dele, had = ae._fused_finish(ctx)
        g2 = time.perf_counter()
        t_get += g1 - g0
        t_fin += g2 - g1
        records.update(rec)
        delegated.extend(dele)
        had_chain.update(had)
        if ff.queued:
            d0 = time.perf_counter()
            ff.inflight.append(
                ae._fused_dispatch(ff.tasks, ff.queued.pop(0), params, None)
            )
            t_dispatch2 += time.perf_counter() - d0
    t2 = time.perf_counter()
    probes = {}
    if delegated:
        rec2, probes = ae._extend_items(ff.tasks, delegated, params, None)
        records.update(rec2)
    t3 = time.perf_counter()
    groups = ae._group_task_records(ff.tasks, records, params, probes)
    ae._reseed_retry(ff.tasks, groups, had_chain, params, None)
    t4 = time.perf_counter()
    tot = t4 - t0
    print(
        f"rep{rep}: anchors {t1-t0:.3f} disp0 {t_dispatch_initial:.3f} "
        f"dispN {t_dispatch2:.3f} devwait {t_get:.3f} finish {t_fin:.3f} "
        f"extend[{len(delegated)}] {t3-t2:.3f} group {t4-t3:.3f} "
        f"total {tot:.3f}  -> {N_READS/tot:.0f} pairs/s"
    )
