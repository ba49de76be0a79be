"""Fused FAST-9/16 + NMS as one Pallas TPU kernel.

The XLA spelling (frontend/fast.py: 16 shifted (H, W) copies → arc
tests → margins, then two reduce_window NMS passes) re-materializes
(16, H, W)-scale intermediates in HBM several times — the round-5 stage
profile put fast+nms at 0.48 ms/frame, ~2–3× its memory roofline
(DESIGN §9b). This kernel computes everything band-by-band in VMEM:
each grid step reads one (BAND, W) image band plus a 4-row halo from
its neighbors (the same array passed three times with shifted block
index maps — Pallas blocks cannot overlap, so the halo is assembled
in-kernel), builds the 16-offset difference stack for the band only
(~2.3 MB, comfortably inside VMEM), and writes the three maps the
keypoint-selection stage consumes: NMS'd high- and low-threshold scores
and the raw low map (subpixel refinement reads its 3×3 neighborhoods).

Semantics match fast.py's ``nms3x3(fast_score_pair(...))`` composition
exactly EXCEPT at two masked-anyway borders: horizontal wrap-around
(both implementations roll across the x edges) and the image-boundary
halo rows, where the clamped neighbor-band duplicates ≤4 garbage rows —
keypoint selection masks a 16-px border (EDGE_THRESHOLD), so neither
is observable. Interior band seams are exact: every output row sees its
true ±4-row context. Parity is pinned by tests/test_pallas_fast.py in
interpreter mode and was verified on-chip (identical selected
keypoints on the bench world).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import _CIRCLE

__all__ = ["fast_nms_pallas"]

BAND = 48      # rows per grid step (f32 sublane multiple)
HALO = 4       # circle radius 3 + 1 NMS row


def _kernel(prev_ref, cur_ref, nxt_ref, hi_ref, lo_ref, raw_ref,
            *, t_high: float, t_low: float):
    band_h, W = cur_ref.shape
    # extended band: rows [-HALO, band_h + HALO)
    ext = jnp.concatenate(
        [prev_ref[band_h - HALO:, :], cur_ref[:, :], nxt_ref[:HALO, :]],
        axis=0,
    )
    # scores on rows [-1, band_h + 1) — the NMS halo
    Hs = band_h + 2
    center = ext[HALO - 1: HALO - 1 + Hs, :]
    diffs = []
    for dx, dy in _CIRCLE:
        # dx is static: skip the roll entirely at 0 — Mosaic rejects
        # the zero-width slice a roll-by-0 lowers to
        rolled = ext if dx == 0 else jnp.roll(ext, -dx, axis=1)
        sh = rolled[HALO - 1 + dy: HALO - 1 + dy + Hs, :]
        diffs.append(sh - center)
    d = jnp.stack(diffs)                          # (16, Hs, W)

    def arc(flags):
        # log-doubling over the CIRCULAR offset axis (wrap is correct
        # there — fast.py:_arc_test)
        a2 = flags & jnp.roll(flags, -1, axis=0)
        a4 = a2 & jnp.roll(a2, -2, axis=0)
        a8 = a4 & jnp.roll(a4, -4, axis=0)
        a9 = a8 & jnp.roll(flags, -8, axis=0)
        return jnp.any(a9, axis=0)

    low_c = arc(d > t_low) | arc((-d) > t_low)
    m_b = jnp.sum(jnp.maximum(d - t_low, 0.0), axis=0)
    m_d = jnp.sum(jnp.maximum(-d - t_low, 0.0), axis=0)
    margin = jnp.maximum(m_b, m_d)
    s_low = jnp.where(low_c, margin, 0.0)
    high_c = arc(d > t_high) | arc((-d) > t_high)
    s_high = jnp.where(high_c, margin, 0.0)

    def nms(s):
        # row neighbors via slices (the row axis must NOT wrap);
        # column neighbors via roll (parity with the XLA path's
        # wrap-around, masked by the 16-px border either way)
        rows = [s[dy: dy + band_h, :] for dy in (0, 1, 2)]
        m = None
        for r in rows:
            for dx in (-1, 0, 1):
                c = r if dx == 0 else jnp.roll(r, -dx, axis=1)
                m = c if m is None else jnp.maximum(m, c)
        self_ = s[1: 1 + band_h, :]
        return jnp.where((self_ >= m) & (self_ > 0.0), self_, 0.0)

    hi_ref[:, :] = nms(s_high)
    lo_ref[:, :] = nms(s_low)
    raw_ref[:, :] = s_low[1: 1 + band_h, :]


@functools.partial(
    jax.jit, static_argnames=("t_high", "t_low", "interpret")
)
def fast_nms_pallas(img, t_high: float, t_low: float,
                    interpret: bool = False):
    """(H, W) image → (nms_high, nms_low, raw_low), each (H, W)."""
    H, W = img.shape
    nb = pl.cdiv(H, BAND)
    Hp = nb * BAND
    if Hp != H:
        img = jnp.pad(img, ((0, Hp - H), (0, 0)))

    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (BAND, W),
        lambda i: (jnp.clip(i + off, 0, nb - 1), 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (BAND, W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    hi, lo, raw = pl.pallas_call(
        functools.partial(
            _kernel, t_high=float(t_high), t_low=float(t_low)
        ),
        grid=(nb,),
        in_specs=[spec(-1), spec(0), spec(1)],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, W), jnp.float32) for _ in range(3)
        ],
        interpret=interpret,
    )(img, img, img)
    if Hp != H:
        hi, lo, raw = hi[:H], lo[:H], raw[:H]
    return hi, lo, raw
