"""Matcher: the flagship match-stage model.

Wraps one batch's packed Bloom bit-matrix as device state and exposes a
jittable scoring step: (row_idx, n_kmers) -> (scores, keep mask). This is
the TPU-native equivalent of one ``cobs query`` invocation against one batch
index (ref: /root/reference/Snakefile:419-427), minus the text postprocessing
which stays on host (phylign_tpu.match.postprocess).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from phylign_tpu.io.cobs import DeviceIndex
from phylign_tpu.kmer import cobs_row_indices, encode_seq
from phylign_tpu.ops.match import (
    match_scores,
    pack_row_indices,
    pad_device_words,
    round_up,
)


@functools.partial(jax.jit, static_argnames=("d_pad", "dtype"))
def _compact_scores(scores: jax.Array, d_pad: int, dtype) -> jax.Array:
    """Device-side transfer compaction: drop padding doc columns and downcast
    before D2H. Through this environment's ~40 MB/s relay the raw
    [Q, 32*Wp] int32 matrix costs ~0.5 s per 2048-query chunk; slicing to the
    real doc count and casting to the smallest dtype that can hold the max
    possible score (the per-segment k-mer count) cuts the bytes 4-5x.
    d_pad is rounded up by the caller to bound distinct compile shapes."""
    return scores[:, :d_pad].astype(dtype)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def match_step(
    words: jax.Array,
    row_idx: jax.Array,
    n_kmers: jax.Array,
    threshold: float,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One scoring step: scores [Q, 32*Wp] int32 and keep mask [Q, 32*Wp].

    keep[q, d] = score >= threshold * n_kmers[q]  (cobs -t semantics,
    ref: /root/reference/config.yaml:20). Callers slice [:, :num_docs].
    """
    scores = match_scores(words, row_idx, use_pallas=use_pallas)
    cut = threshold * n_kmers.astype(jnp.float32)
    keep = scores.astype(jnp.float32) >= cut[:, None]
    keep = jnp.logical_and(keep, n_kmers[:, None] > 0)
    return scores, keep


def device_index_bytes(
    didx: DeviceIndex, use_pallas: bool | None = None, mesh=None
) -> int:
    """Exact device footprint of the padded word matrix an index will occupy
    once uploaded (mirrors from_device_index's padding choice). Used by the
    pipeline's HBM accountant to admit overlapping index uploads."""
    from phylign_tpu.ops.match import LANE_WORDS

    lane = LANE_WORDS if use_pallas else 8
    if mesh is not None:
        lane = max(lane, 8) * mesh.shape["d"]
    wp = round_up(max(didx.num_words, 1), lane)
    return (didx.signature_size + 1) * wp * 4


@dataclass
class Matcher:
    """Device-resident match model for one batch index.

    With a mesh (multi-chip), the word-column axis is sharded over the mesh's
    doc axis and scoring runs via parallel.dist with zero communication;
    row-index inputs are sharded over the query axis.
    """

    term_size: int
    num_hashes: int
    signature_size: int
    doc_names: list[str]
    words: jax.Array  # uint32 [S+1, Wp] on device
    use_pallas: bool | None = None
    mesh: object | None = None  # jax.sharding.Mesh or None

    @classmethod
    def from_device_index(
        cls,
        didx: DeviceIndex,
        use_pallas: bool | None = None,
        mesh=None,
    ) -> "Matcher":
        from phylign_tpu.ops.match import LANE_WORDS

        lane = LANE_WORDS if use_pallas else 8
        if mesh is not None:
            # every doc shard needs equal lane-aligned word columns
            lane = max(lane, 8) * mesh.shape["d"]
        padded = pad_device_words(np.asarray(didx.words), lane_words=lane)
        if mesh is None:
            words = jnp.asarray(padded)
        else:
            from phylign_tpu.parallel.mesh import words_sharding

            words = jax.device_put(padded, words_sharding(mesh))
        return cls(
            term_size=didx.term_size,
            num_hashes=didx.num_hashes,
            signature_size=didx.signature_size,
            doc_names=didx.doc_names,
            words=words,
            use_pallas=use_pallas,
            mesh=mesh,
        )

    @property
    def pad_row(self) -> int:
        return self.words.shape[0] - 1

    def rows_for_queries(
        self, seqs: list[bytes], k_max: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Host-side k-mer extraction + hashing for a query batch."""
        per_query = [
            cobs_row_indices(
                encode_seq(s), self.term_size, self.signature_size, self.num_hashes
            )
            for s in seqs
        ]
        return pack_row_indices(per_query, k_max, self.pad_row, self.num_hashes)

    def score(
        self, seqs: list[bytes], threshold: float, k_max: int = 512
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Convenience host API: returns (scores[Q, D], keep[Q, D], n_kmers[Q]).

        Queries longer than k_max+term_size-1 are split into k_max-k-mer
        segments scored as separate device rows and summed — exact for any
        query length with fixed device shapes.
        """
        per_query = [
            cobs_row_indices(
                encode_seq(s), self.term_size, self.signature_size, self.num_hashes
            )
            for s in seqs
        ]
        n_kmers = np.array([r.shape[0] for r in per_query], np.int32)
        seg_rows: list[np.ndarray] = []
        owner: list[int] = []
        for qi, r in enumerate(per_query):
            if r.shape[0] == 0:
                continue
            for off in range(0, r.shape[0], k_max):
                seg_rows.append(r[off : off + k_max])
                owner.append(qi)
        d = len(self.doc_names)
        scores = np.zeros((len(seqs), d), np.int32)
        if seg_rows:
            n_real = len(seg_rows)
            if self.mesh is not None:
                # segment count must divide the query mesh axis; pad with
                # empty (all-padding-row) segments
                nq = self.mesh.shape["q"]
                for _ in range((-n_real) % nq):
                    seg_rows.append(np.empty((0, self.num_hashes), np.int64))
            # bucket the packed k-mer axis to multiples of 64 to bound the
            # number of distinct jit shapes
            k_pack = min(k_max, round_up(max(r.shape[0] for r in seg_rows), 64))
            packed, _ = pack_row_indices(
                seg_rows, k_pack, self.pad_row, self.num_hashes
            )
            if self.mesh is not None:
                from phylign_tpu.parallel.dist import dist_match_scores

                dev_scores = dist_match_scores(
                    self.mesh, self.words, jnp.asarray(packed)
                )
            else:
                dev_scores = match_scores(
                    self.words, jnp.asarray(packed), use_pallas=self.use_pallas
                )
            max_score = k_pack  # per-segment count <= valid k-mer slots
            dtype = (
                jnp.uint8
                if max_score <= 255
                else jnp.uint16 if max_score <= 65535 else jnp.int32
            )
            d_pad = min(dev_scores.shape[1], round_up(d, 256))
            dev_scores = _compact_scores(dev_scores, d_pad, dtype)
            seg_scores = np.asarray(dev_scores)[:n_real, :d].astype(np.int32)
            np.add.at(scores, np.asarray(owner), seg_scores)
        keep = (scores >= threshold * np.maximum(n_kmers, 1)[:, None]) & (
            n_kmers[:, None] > 0
        )
        return scores, keep, n_kmers
