"""Distributed loop-closure detection: KF-bank-sharded BoW scoring.

The reference scans all keyframes serially on one CPU thread
(GlobalMapper::DetectLoopClose, src/GlobalMapper.cpp:201-254). Here the
per-KF BoW bank lives sharded along the keyframe axis of a device mesh;
scoring a query against the whole bank is a per-shard product plus an
XLA-inserted all-gather/argmax — the pattern that scales loop detection
to maps larger than one chip's memory.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frontend.matcher import hamming_matrix
from ..vocab import bow_score

__all__ = ["shard_bank", "sharded_bow_detect", "sharded_hamming_detect"]


def shard_bank(bank, mesh: Mesh, axis: str = "d"):
    """Place a (K, W) BoW bank (or (K, 256) descriptor bank) with the KF
    axis sharded. K must be a multiple of the mesh size (pad with invalid
    rows upstream)."""
    return jax.device_put(bank, NamedSharding(mesh, P(axis)))


@jax.jit
def sharded_bow_detect(bank, query, eligible):
    """(best_idx, best_score) of the DBoW2 L1 score over the whole bank.

    ``bank`` may be sharded along axis 0 — the reduction and argmax are
    partitioned by XLA; the scalars come back replicated. Scoring
    delegates to ``vocab.bow_score`` so the metric cannot drift from the
    host loop-detection path.
    """
    s = jnp.where(eligible, bow_score(bank, query), -jnp.inf)
    return jnp.argmax(s), jnp.max(s)


@jax.jit
def sharded_hamming_detect(desc_bank, query_desc, valid=None):
    """Nearest row of a ±1 descriptor bank (sharded or not): one matmul +
    argmin, the building block for brute-force relocalization. Distance
    comes from ``matcher.hamming_matrix`` (single convention).

    ``valid`` masks padded/pruned bank rows: a zeroed ±1 row scores a
    flat distance of 128 against ANY query, so on a miss (every real
    distance > 128) an unmasked padding row would win the argmin."""
    dist = hamming_matrix(desc_bank, query_desc)[:, 0]
    if valid is not None:
        dist = jnp.where(valid, dist, jnp.inf)
    return jnp.argmin(dist), jnp.min(dist)
