"""Fused windowed Hamming matcher as a Pallas TPU kernel.

The jnp matcher materializes the full (N1, N2) distance matrix plus
several (N1, N2) gate masks in HBM (reference semantics:
ORBmatcher::MatchByWindow/MatchByProjection, src/ORBmatcher.cpp:278-454).
This kernel streams column tiles through VMEM: one MXU pass per
(128, 128) tile computes ±1-dot Hamming distances, the window/level/
validity gate is applied in registers, and a running (best, second,
argbest, argsecond) is carried — no N×N intermediate ever touches HBM.

One kernel serves all three matchers via per-row parameters:
  - window match:    win = const, center = predicted positions
  - projection match: win = octave-scaled per row, center = projections
  - mutual/BoW match: win = ∞ (gate collapses to validity ∩ level)

``match_by_projection_streamed`` is the production wrapper wired into
the Localizer's full-bank projection matching (same accept semantics as
``matcher.match_by_projection``, including the level-aware ratio test
via the second-best index). Falls back to interpreter mode off-TPU so
CPU tests exercise the same code path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["windowed_top2", "match_by_projection_streamed"]

_TILE = 128
_BIG = 1e9


def _kernel(a1_ref, d1_ref, a2_ref, d2_ref,
            best_ref, second_ref, arg_ref, arg2_ref):
    """(row-tile, col-tile) grid program. The output blocks are indexed by
    the row tile only, so they persist across the inner column sweep and
    act as the running (best, second, argbest, argsecond) accumulators —
    the standard revisited-output reduction pattern. Column tiles stream
    through VMEM one (128, 256) block at a time (~70 KB live), instead of
    holding the whole bank (which blows the 16 MB VMEM budget on v5e).

    2D slices only: integer/None indexing lowers to unsupported gathers
    in Mosaic."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full_like(best_ref, _BIG)
        second_ref[:] = jnp.full_like(second_ref, _BIG)
        arg_ref[:] = jnp.zeros_like(arg_ref)
        arg2_ref[:] = jnp.zeros_like(arg2_ref)

    px = a1_ref[:, 0:1]        # (T, 1) predicted center x
    py = a1_ref[:, 1:2]
    win = a1_ref[:, 2:3]       # per-row window half-size
    lvl_lo = a1_ref[:, 3:4]    # octave gate bounds for the column
    lvl_hi = a1_ref[:, 4:5]
    v1 = a1_ref[:, 5:6] > 0.5

    dot = jax.lax.dot_general(
        d1_ref[:], d2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (T, TILE)
    dist = (256.0 - dot) * 0.5

    # a2 attributes arrive pre-transposed (8, TILE): row slices are
    # already lane-aligned (1, TILE) — no in-kernel transposes
    a2x = a2_ref[0:1, :]
    a2y = a2_ref[1:2, :]
    oct2 = a2_ref[2:3, :]
    v2 = a2_ref[3:4, :] > 0.5
    gate = (
        (jnp.abs(a2x - px) <= win)
        & (jnp.abs(a2y - py) <= win)
        & (oct2 >= lvl_lo)
        & (oct2 <= lvl_hi)
        & v2
        & v1
    )
    dist = jnp.where(gate, dist, _BIG)

    # tile-local (best, second) with their column indices
    t1 = jnp.min(dist, axis=1, keepdims=True)    # (T, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    i1 = jnp.min(
        jnp.where(dist == t1, col, jnp.int32(2**30)), axis=1, keepdims=True
    )
    dist2 = jnp.where(col == i1, _BIG, dist)
    t2 = jnp.min(dist2, axis=1, keepdims=True)
    i2 = jnp.min(
        jnp.where(dist2 == t2, col, jnp.int32(2**30)), axis=1,
        keepdims=True,
    )

    best = best_ref[:]
    second = second_ref[:]
    arg = arg_ref[:]
    arg2 = arg2_ref[:]
    c0 = j * _TILE
    g1 = c0 + i1
    g2 = c0 + i2

    # merge, preserving the invariant best ≤ second:
    # tile best beats running best → old best drops to second candidate
    take1 = t1 < best
    new_best = jnp.where(take1, t1, best)
    new_arg = jnp.where(take1, g1, arg)
    new_second = jnp.where(
        take1, jnp.minimum(best, t2), jnp.minimum(second, t1)
    )
    new_arg2 = jnp.where(
        take1,
        jnp.where(best <= t2, arg, g2),
        jnp.where(second <= t1, arg2, g1),
    )
    best_ref[:] = new_best
    second_ref[:] = new_second
    arg_ref[:] = new_arg
    arg2_ref[:] = new_arg2


def _pad_rows(x, mult, fill=0):
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("interpret",))
def windowed_top2(
    d1_pm1, xy_pred, win, lvl_lo, lvl_hi, valid1,
    d2_pm1, xy2, oct2, valid2,
    interpret: bool = False,
):
    """Gated best/second Hamming match of every row-1 descriptor against
    all row-2 descriptors. Returns (best, second, best_idx, second_idx),
    each (N1,).

    d*_pm1: (N, 256) ±1 int8. xy_pred/win/lvl_*: per-row gate params.
    """
    N1 = d1_pm1.shape[0]
    N2 = d2_pm1.shape[0]

    a1 = jnp.zeros((N1, 8), jnp.float32)
    a1 = a1.at[:, 0].set(xy_pred[:, 0]).at[:, 1].set(xy_pred[:, 1])
    a1 = a1.at[:, 2].set(win).at[:, 3].set(lvl_lo).at[:, 4].set(lvl_hi)
    a1 = a1.at[:, 5].set(valid1.astype(jnp.float32))
    a2 = jnp.zeros((N2, 8), jnp.float32)
    a2 = a2.at[:, 0].set(xy2[:, 0]).at[:, 1].set(xy2[:, 1])
    a2 = a2.at[:, 2].set(oct2.astype(jnp.float32))
    a2 = a2.at[:, 3].set(valid2.astype(jnp.float32))

    a1p = _pad_rows(a1, _TILE)
    d1p = _pad_rows(d1_pm1.astype(jnp.bfloat16), _TILE)
    a2p = _pad_rows(a2, _TILE)          # padded cols: valid flag 0 → gated out
    d2p = _pad_rows(d2_pm1.astype(jnp.bfloat16), _TILE)
    N1p = a1p.shape[0]
    N2p = a2p.shape[0]
    a2t = a2p.T                          # (8, N2p): lane-aligned col attrs

    grid = (N1p // _TILE, N2p // _TILE)
    best, second, arg, arg2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 256), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((N1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((N1p, 1), jnp.int32),
            jax.ShapeDtypeStruct((N1p, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a1p, d1p, a2t, d2p)
    return best[:N1, 0], second[:N1, 0], arg[:N1, 0], arg2[:N1, 0]


@functools.partial(
    jax.jit, static_argnames=("win_size", "nn_ratio", "level_offset",
                              "interpret")
)
def match_by_projection_streamed(
    feats,
    mp_uv,
    mp_octave,
    mp_desc_pm1,
    mp_valid,
    feat_free,
    win_size: float = 15.0,
    nn_ratio: float = 0.9,
    level_offset: int = 1,
    interpret: bool = False,
):
    """MatchByProjection with the distance/gate pass streamed through the
    Pallas kernel — identical accept semantics to
    ``matcher.match_by_projection`` (TH_HIGH gate, same-level ratio test,
    mutual filter, per-feature inversion) but no (M, N) intermediates:
    built for full map-point banks (the Localizer path), where the dense
    matrix would be M·N·(1 distance + 4 gate masks) in HBM.

    Returns (feat_match (N,) int32, n_accept) like the dense version.
    """
    from .matcher import TH_HIGH, _mutual_filter

    M = mp_uv.shape[0]
    n_feats = feats.xy.shape[0]
    win = jnp.maximum(mp_octave.astype(jnp.float32), 1.0) * win_size
    lo = jnp.maximum(mp_octave - level_offset, 0).astype(jnp.float32)
    hi = (mp_octave + level_offset).astype(jnp.float32)
    col_valid = feats.valid & feat_free

    best, second, best_idx, second_idx = windowed_top2(
        mp_desc_pm1, mp_uv, win, lo, hi, mp_valid,
        feats.desc_pm1, feats.xy, feats.octave, col_valid,
        interpret=interpret,
    )
    best_lvl = feats.octave[best_idx]
    second_lvl = feats.octave[second_idx]
    has_second = second < _BIG
    ratio_fail = (
        has_second & (best_lvl == second_lvl) & (best > nn_ratio * second)
    )
    accept = (best <= TH_HIGH) & (~ratio_fail) & mp_valid
    accept = _mutual_filter(accept, best_idx, best, n_feats)

    m_ids = jnp.arange(M, dtype=jnp.int32)
    feat_match = jnp.full((n_feats,), -1, jnp.int32).at[
        jnp.where(accept, best_idx, n_feats)
    ].set(jnp.where(accept, m_ids, -1), mode="drop")
    return feat_match, jnp.sum(accept.astype(jnp.int32))
