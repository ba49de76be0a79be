"""Dense FAST-9/16 corner detection as vectorized array ops.

TPU-native equivalent of the per-cell cv::FAST calls in the reference
extractor (src/ORBextractor.cpp:616-622). Instead of per-pixel branchy
control flow, the segment test is evaluated for EVERY pixel at once with
16 shifted copies of the image — a shape XLA fuses into a handful of
vector ops; there is no data-dependent control flow at all.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fast_score", "nms3x3"]

# Bresenham circle of radius 3, in circular order: (dx, dy)
_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
_ARC = 9  # FAST-9: at least 9 contiguous circle pixels brighter/darker


def fast_score(img, threshold: float):
    """Per-pixel FAST-9/16 corner response. img: (H, W) float32.

    Returns (H, W) float32: 0 where not a corner, else the summed
    |intensity − center| − t margin over the full circle on the dominant
    side (monotone in cornerness; used only for relative ranking, like the
    reference's FAST response feeding KeyPointsFilter::retainBest).
    Border pixels (3 px) are rolled wrap-around garbage — callers mask a
    ≥16 px border anyway (EDGE_THRESHOLD, src/ORBextractor.cpp:83).
    """
    shifted = jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dx, dy in _CIRCLE]
    )  # (16, H, W); shifted[i][y,x] = img[y+dy, x+dx]
    diff = shifted - img[None]
    bright = diff > threshold
    dark = diff < -threshold

    def has_arc(flags):
        # contiguous run of >= _ARC among 16 circular positions
        wrapped = jnp.concatenate([flags, flags[: _ARC - 1]], axis=0)
        runs = jnp.stack(
            [
                jnp.all(
                    jax.lax.dynamic_slice_in_dim(wrapped, s, _ARC, axis=0),
                    axis=0,
                )
                for s in range(16)
            ]
        )
        return jnp.any(runs, axis=0)

    is_corner = has_arc(bright) | has_arc(dark)
    margin_b = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    margin_d = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    score = jnp.maximum(margin_b, margin_d)
    return jnp.where(is_corner, score, 0.0)


def nms3x3(score):
    """3x3 non-maximum suppression (cv::FAST(..., true) semantics)."""
    m = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3),
        window_strides=(1, 1),
        padding="SAME",
    )
    return jnp.where((score >= m) & (score > 0.0), score, 0.0)
