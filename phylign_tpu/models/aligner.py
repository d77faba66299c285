"""Aligner: the flagship align-stage model.

Bundles the two device kernels of the seed-chain-extend path (ops.chain DP +
ops.extend banded DP) as one jittable step over fixed-shape pair batches —
the counterpart of models.matcher.Matcher for the alignment stage, and the
unit the multi-chip path data-parallelizes over the 'q' axis
(parallel.dist.dist_chain / dist_extend).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from phylign_tpu.ops.chain import ChainResult, chain_anchors
from phylign_tpu.ops.extend import SrScoring, extend_banded_scores


class AlignStep(NamedTuple):
    chain: ChainResult
    align_score: jax.Array  # f32 [P]
    align_end_d: jax.Array  # int32 [P]


@functools.partial(
    jax.jit, static_argnames=("k", "max_gap", "bandwidth", "scoring")
)
def align_step(
    rpos: jax.Array,  # int32 [P, A] padded anchors
    qpos: jax.Array,  # int32 [P, A]
    q_codes: jax.Array,  # uint8 [P, L]
    q_len: jax.Array,  # int32 [P]
    rwin: jax.Array,  # uint8 [P, L + BAND]
    rwin_valid: jax.Array,  # bool [P, L + BAND]
    k: int = 21,
    max_gap: int = 100,
    bandwidth: int = 100,
    scoring: SrScoring = SrScoring(),
) -> AlignStep:
    """One fused device step: chain all pairs, then banded-extend all pairs.

    The production engine (align.engine) runs the two kernels separately so
    the chain result can prune the extension batch on host; this fused form
    is the model-level forward used for compile checks and mesh dry runs.
    """
    chain = chain_anchors(rpos, qpos, k=k, max_gap=max_gap, bandwidth=bandwidth)
    score, end_d = extend_banded_scores(
        q_codes, q_len, rwin, rwin_valid, scoring=scoring
    )
    return AlignStep(chain=chain, align_score=score, align_end_d=end_d)
