"""ORB descriptor matching on the MXU.

TPU-native re-derivation of the reference matcher (src/ORBmatcher.cpp).
The key transform: 256-bit Hamming distance becomes a ±1 matmul —
``dist = (256 − a·bᵀ)/2`` for descriptors stored as ±1 vectors — so the
full N×M distance matrix is one bf16 systolic-array pass instead of the
reference's per-keypoint popcount loops (src/ORBmatcher.cpp:110-126).
Window gating, best/second-best ratio tests, mutual exclusion, and the
30-bin rotation-consistency histogram are all masked batched ops.

Constants TH_LOW=75, TH_HIGH=100, HISTO_LENGTH=30 follow
src/ORBmatcher.cpp:45-47.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .orb import OrbFeatures

__all__ = [
    "TH_LOW",
    "TH_HIGH",
    "hamming_matrix",
    "match_by_window",
    "match_by_projection",
    "mutual_match",
]

TH_LOW = 75.0
TH_HIGH = 100.0
HISTO_LENGTH = 30
_BIG = 1e9  # plain float: a module-level jnp constant would
#   initialize the JAX backend at import time, breaking
#   jax.distributed.initialize (parallel/runtime.py)


def hamming_matrix(pm1_a, pm1_b):
    """(Na, 256) ±1 int8 × (Nb, 256) ±1 int8 → (Na, Nb) f32 Hamming.

    bf16 products of ±1 are exact; f32 accumulation of ≤256 terms is exact.
    """
    dot = jax.lax.dot_general(
        pm1_a.astype(jnp.bfloat16),
        pm1_b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (256.0 - dot) * 0.5


def _top2_min(D):
    """Row-wise (best, second, argbest) of a masked distance matrix.

    Two masked min/argmin reductions instead of ``top_k`` — top_k lowers
    to a full row sort on TPU (~10% of the tracking step), while min
    reductions are single VPU passes."""
    best = jnp.min(D, axis=1)
    idx = jnp.argmin(D, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    D2 = jnp.where(col == idx[:, None], jnp.inf, D)
    second = jnp.min(D2, axis=1)
    return best, second, idx


def _mutual_filter(accept, best_idx, best_dist, n_cols):
    """Keep only the lowest-distance claimant of each column.

    Replaces the reference's sequential overwrite bookkeeping
    (vnMatches21/vMatchesDistance, src/ORBmatcher.cpp:289-335) with a
    deterministic scatter-min: strictly at most one row per column wins.
    """
    n_rows = accept.shape[0]
    row_ids = jnp.arange(n_rows, dtype=jnp.int32)
    # two-stage scatter-min, NOT a packed dist*stride+row float key: a
    # packed f32 key loses the row tie-break to the 2^24 mantissa once
    # dist_max·stride ≥ 2^24 (n_rows ≥ 16k at Hamming scale), letting
    # two equal-distance rows both claim one column. Stage 1: each
    # column's min distance; stage 2: lowest row id among its achievers.
    d = jnp.where(accept, best_dist, jnp.inf)
    col_min = jnp.full((n_cols,), jnp.inf).at[best_idx].min(d)
    is_best = accept & (d <= col_min[best_idx])
    r = jnp.where(is_best, row_ids, n_rows)
    col_row = jnp.full((n_cols,), n_rows, jnp.int32).at[best_idx].min(r)
    return is_best & (row_ids == col_row[best_idx])


def _rotation_consistency(accept, angle1, angle2_at_best):
    """30-bin rotation histogram; keep matches in the 3 dominant bins
    (src/ORBmatcher.cpp:350-372 + ComputeThreeMaxima semantics: 2nd/3rd
    bins dropped when below 10% of the best bin)."""
    rot = (angle1 - angle2_at_best) * (180.0 / jnp.pi)
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    bins = jnp.round(rot * (HISTO_LENGTH / 360.0)).astype(jnp.int32) % HISTO_LENGTH
    hist = jnp.zeros(HISTO_LENGTH, jnp.int32).at[bins].add(
        accept.astype(jnp.int32)
    )
    top_counts, top_bins = jax.lax.top_k(hist, 3)
    keep_bin = (top_counts.astype(jnp.float32) >= 0.1 * top_counts[0]) & (
        top_counts > 0
    )
    in_top = (bins[:, None] == top_bins[None, :]) & keep_bin[None, :]
    return accept & jnp.any(in_top, axis=1)


class WindowMatches(NamedTuple):
    idx2: jnp.ndarray   # (N1,) int32 — match into frame 2, -1 if none
    dist: jnp.ndarray   # (N1,) f32
    n: jnp.ndarray      # scalar int32


def match_by_window(
    f1: OrbFeatures,
    f2: OrbFeatures,
    prev_xy,
    win_size: float = 20.0,
    nn_ratio: float = 0.9,
    level_offset: int = 1,
) -> WindowMatches:
    """Frame-to-frame search in a square pixel window around the previous
    positions (reference MatchByWindow, src/ORBmatcher.cpp:278-381).

    prev_xy: (N1, 2) predicted positions in frame 2 (level-0 px).

    At per-frame scale (N≈1000) the dense formulation below is fastest:
    one MXU matmul + fused masks. For matching against banks too large to
    materialize N1×N2 in HBM, use the streaming Pallas kernel
    (frontend.pallas_match.windowed_top2 — same gate semantics).
    """
    D = hamming_matrix(f1.desc_pm1, f2.desc_pm1)
    dx = jnp.abs(f2.xy[None, :, 0] - prev_xy[:, None, 0])
    dy = jnp.abs(f2.xy[None, :, 1] - prev_xy[:, None, 1])
    in_win = (dx <= win_size) & (dy <= win_size)
    lvl_ok = (
        f2.octave[None, :] >= jnp.maximum(f1.octave[:, None] - level_offset, 0)
    ) & (f2.octave[None, :] <= f1.octave[:, None] + level_offset)
    gate = in_win & lvl_ok & f1.valid[:, None] & f2.valid[None, :]

    Dm = jnp.where(gate, D, _BIG)
    best, second, best_idx = _top2_min(Dm)
    accept = (best <= TH_LOW) & (best < nn_ratio * second) & f1.valid
    accept = _mutual_filter(accept, best_idx, best, f2.xy.shape[0])
    accept = _rotation_consistency(accept, f1.angle, f2.angle[best_idx])

    idx2 = jnp.where(accept, best_idx, -1)
    return WindowMatches(
        idx2=idx2.astype(jnp.int32),
        dist=jnp.where(accept, best, jnp.inf),
        n=jnp.sum(accept.astype(jnp.int32)),
    )


def match_by_projection(
    feats: OrbFeatures,
    mp_uv,
    mp_octave,
    mp_desc_pm1,
    mp_valid,
    feat_free,
    win_size: float = 15.0,
    nn_ratio: float = 0.9,
    level_offset: int = 1,
    img_wh=None,
):
    """Match projected map points against a keyframe's free features
    (reference MatchByProjection, src/ORBmatcher.cpp:383-454).

    mp_uv:      (M, 2) predicted pixel positions (already projected).
    mp_octave:  (M,) predicted octave (main-descriptor octave).
    mp_valid:   (M,) bool — in front of camera, in bounds, not yet observed.
    feat_free:  (N,) bool — keyframe features without an observation.
    Returns (N,) int32: matched map-point index per feature, -1 if none.

    Window parity: the reference searches ``levelWinSize = predictLevel ·
    winSize`` with predictLevel = the point's main octave
    (src/ORBmatcher.cpp:399-404) — the same linear octave scaling as the
    ``max(octave, 1) · win_size`` here, EXCEPT at octave 0 where the
    reference's window degenerates to zero pixels and the point can never
    match (a quirk, not a feature); the max(·, 1) keeps level-0 points
    matchable. Level gating [octave−offset, octave+offset] matches
    :403-404.
    """
    D = hamming_matrix(mp_desc_pm1, feats.desc_pm1)  # (M, N)
    win = jnp.maximum(mp_octave.astype(jnp.float32), 1.0) * win_size
    dx = jnp.abs(feats.xy[None, :, 0] - mp_uv[:, None, 0])
    dy = jnp.abs(feats.xy[None, :, 1] - mp_uv[:, None, 1])
    in_win = (dx <= win[:, None]) & (dy <= win[:, None])
    lvl_ok = (
        feats.octave[None, :]
        >= jnp.maximum(mp_octave[:, None] - level_offset, 0)
    ) & (feats.octave[None, :] <= mp_octave[:, None] + level_offset)
    gate = (
        in_win
        & lvl_ok
        & mp_valid[:, None]
        & feats.valid[None, :]
        & feat_free[None, :]
    )
    Dm = jnp.where(gate, D, _BIG)
    best, second, best_idx = _top2_min(Dm)
    best_lvl = feats.octave[best_idx]
    # second-best level: recompute with best masked out
    Dm2 = Dm.at[jnp.arange(Dm.shape[0]), best_idx].set(_BIG)
    _, _, second_idx = _top2_min(Dm2)
    second_lvl = feats.octave[second_idx]
    ratio_fail = (best_lvl == second_lvl) & (best > nn_ratio * second)
    accept = (best <= TH_HIGH) & (~ratio_fail) & mp_valid
    accept = _mutual_filter(accept, best_idx, best, feats.xy.shape[0])

    # invert: per feature, which MP matched it
    n_feats = feats.xy.shape[0]
    m_ids = jnp.arange(mp_uv.shape[0], dtype=jnp.int32)
    feat_match = jnp.full((n_feats,), -1, jnp.int32).at[
        jnp.where(accept, best_idx, n_feats)  # invalid rows scatter off-end
    ].set(jnp.where(accept, m_ids, -1), mode="drop")
    return feat_match, jnp.sum(accept.astype(jnp.int32))


def mutual_match(
    f1: OrbFeatures,
    f2: OrbFeatures,
    nn_ratio: float = 1.0,
    max_dist: float = TH_LOW,
    check_rotation: bool = True,
):
    """Unconstrained mutual best match over full descriptor sets — the
    batched stand-in for SearchByBoW (src/ORBmatcher.cpp:128-276): with the
    full distance matrix on the MXU there is no need for the reference's
    FeatureVector-node pruning, which exists only to cut CPU popcounts.
    """
    D = hamming_matrix(f1.desc_pm1, f2.desc_pm1)
    gate = f1.valid[:, None] & f2.valid[None, :]
    Dm = jnp.where(gate, D, _BIG)
    best, second, best_idx = _top2_min(Dm)
    accept = (best <= max_dist) & (best < nn_ratio * second) & f1.valid
    accept = _mutual_filter(accept, best_idx, best, f2.xy.shape[0])
    if check_rotation:
        accept = _rotation_consistency(accept, f1.angle, f2.angle[best_idx])
    idx2 = jnp.where(accept, best_idx, -1)
    return WindowMatches(
        idx2=idx2.astype(jnp.int32),
        dist=jnp.where(accept, best, jnp.inf),
        n=jnp.sum(accept.astype(jnp.int32)),
    )
