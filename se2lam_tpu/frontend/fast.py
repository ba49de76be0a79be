"""Dense FAST-9/16 corner detection as vectorized array ops.

TPU-native equivalent of the per-cell cv::FAST calls in the reference
extractor (src/ORBextractor.cpp:616-622). Instead of per-pixel branchy
control flow, the segment test is evaluated for EVERY pixel at once with
16 shifted copies of the image — a shape XLA fuses into a handful of
vector ops; there is no data-dependent control flow at all.

The contiguous-arc test uses log-doubling over the circular axis:
``a_k[i] = AND of flags[i..i+k-1]`` built as a2 = f&rot1(f),
a4 = a2&rot2(a2), a8 = a4&rot4(a4), a9 = a8&rot8(f) — 4 ANDs + 4 rolls
instead of the naive 16 windows x 9-way AND (measured 0.51 → ~0.2
ms/frame across the pyramid together with the shared-diff pairing
below).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fast_score", "fast_score_pair", "nms3x3"]

# Bresenham circle of radius 3, in circular order: (dx, dy)
_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
_ARC = 9  # FAST-9: at least 9 contiguous circle pixels brighter/darker


def _circle_diffs(img):
    """(16, H, W) intensity differences along the Bresenham circle."""
    shifted = jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dx, dy in _CIRCLE]
    )  # shifted[i][y,x] = img[y+dy, x+dx]
    return shifted - img[None]


def _arc_test(signed_diff, threshold):
    """(H, W) bool: some run of ≥9 contiguous circle pixels clears the
    threshold on this polarity — via log-doubling on the circular axis."""
    flags = signed_diff > threshold
    a2 = flags & jnp.roll(flags, -1, axis=0)
    a4 = a2 & jnp.roll(a2, -2, axis=0)
    a8 = a4 & jnp.roll(a4, -4, axis=0)
    a9 = a8 & jnp.roll(flags, -8, axis=0)
    return jnp.any(a9, axis=0)


def _side_score(signed_diff, threshold):
    """(corner?, margin) for one polarity at one threshold."""
    is_corner = _arc_test(signed_diff, threshold)
    margin = jnp.sum(jnp.maximum(signed_diff - threshold, 0.0), axis=0)
    return is_corner, margin


def _score_from_diff(diff, threshold):
    bright_c, bright_m = _side_score(diff, threshold)
    dark_c, dark_m = _side_score(-diff, threshold)
    score = jnp.maximum(bright_m, dark_m)
    return jnp.where(bright_c | dark_c, score, 0.0)


def fast_score(img, threshold: float):
    """Per-pixel FAST-9/16 corner response. img: (H, W) float32.

    Returns (H, W) float32: 0 where not a corner, else the summed
    |intensity − center| − t margin over the full circle on the dominant
    side (monotone in cornerness; used only for relative ranking, like the
    reference's FAST response feeding KeyPointsFilter::retainBest).
    Border pixels (3 px) are rolled wrap-around garbage — callers mask a
    ≥16 px border anyway (EDGE_THRESHOLD, src/ORBextractor.cpp:83).
    """
    return _score_from_diff(_circle_diffs(img), threshold)


def fast_score_pair(img, t_high: float, t_low: float):
    """(score_high, score_low) sharing one circle-difference stack and
    ONE ranking margin.

    The extractor evaluates FAST at the high threshold and the fallback
    low threshold on every level (src/ORBextractor.cpp:618-622); sharing
    the 16 shifted copies + diffs halves that part of the work. Both
    maps carry the LOW-threshold margin as the score: the threshold
    gates candidacy (the arc test), and the score only ranks corners
    within a cell. This is an APPROXIMATION, not an order-preserving
    rebaseline — two corners with different contrast profiles (one
    sharp pixel vs. many moderate ones) can swap rank between the two
    margins — adopted because it drops the high-threshold margin pass
    (a third of the FAST cost) and a 4-seed ATE A/B measured it
    accuracy-neutral (mean 0.100 vs 0.105 over seeds with per-seed
    spread 0.03–0.17 in both).
    """
    diff = _circle_diffs(img)
    bright_low, bright_m = _side_score(diff, t_low)
    dark_low, dark_m = _side_score(-diff, t_low)
    score_low = jnp.where(
        bright_low | dark_low, jnp.maximum(bright_m, dark_m), 0.0
    )
    high_c = _arc_test(diff, t_high) | _arc_test(-diff, t_high)
    score_high = jnp.where(high_c, jnp.maximum(bright_m, dark_m), 0.0)
    return score_high, score_low


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
