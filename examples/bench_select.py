"""Micro-bench of the keypoint-selection stage inside the extractor.

Round-5 stage profile: select_kps is the extractor's top kernel
(0.95 ms/frame isolated, vs 0.48 fast+nms and 0.27 moments+brief).
This benches the WHOLE extractor under variant implementations of
``_select_level_keypoints`` (monkeypatched before tracing), with the
DESIGN §9 discipline: scan over distinct inputs inside one jit, full
consumption, >=3 warm executions, completion forced by a scalar fetch,
RTT subtracted.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_select.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def variant_maxred(orbmod):
    """Replace the per-iteration take_along_axis (a TPU-serial gather)
    with a second max-reduction — same value, VPU-native."""
    import jax
    import jax.numpy as jnp
    base = orbmod._select_level_keypoints

    def sel(cfg, s_high, s_low, s_low_raw, quota):
        return base(cfg, s_high, s_low, s_low_raw, quota)

    # patch by source-level reimplementation of the candidate loop
    import math

    def _select(cfg, s_high, s_low, s_low_raw, quota):
        H, W = s_high.shape
        border = jnp.zeros((H, W), bool).at[
            cfg.edge: H - cfg.edge, cfg.edge: W - cfg.edge
        ].set(True)
        s_high = jnp.where(border, s_high, 0.0)
        s_low = jnp.where(border, s_low, 0.0)
        ncy, ncx, ch, cw = orbmod._level_grid(cfg, H, W, quota)

        def to_cells(s):
            pad_h = ncy * ch - (H - 2 * cfg.edge)
            pad_w = ncx * cw - (W - 2 * cfg.edge)
            v = s[cfg.edge: H - cfg.edge, cfg.edge: W - cfg.edge]
            v = jnp.pad(v, ((0, pad_h), (0, pad_w)))
            return v.reshape(ncy, ch, ncx, cw).transpose(0, 2, 1, 3).reshape(
                ncy * ncx, ch * cw)

        cells_high = to_cells(s_high)
        cells_low = to_cells(s_low)
        n_high = jnp.sum(cells_high > 0, axis=1)
        use_high = (n_high > cfg.min_high_corners)[:, None]
        cells = jnp.where(use_high, cells_high, cells_low)
        n_cells = ncy * ncx
        k_cell = max(2, min(6, -(-2 * quota // n_cells)))
        cands_s, cands_i = [], []
        cur = cells
        col_iota = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 1)
        for r in range(k_cell):
            sc = jnp.max(cur, axis=1)
            idx = jnp.argmax(cur, axis=1)
            cands_s.append(sc)
            cands_i.append(idx)
            if r + 1 < k_cell:
                cur = jnp.where(col_iota == idx[:, None], -jnp.inf, cur)
        top_scores = jnp.stack(cands_s, axis=1)
        top_idx = jnp.stack(cands_i, axis=1)
        rank = jax.lax.broadcasted_iota(jnp.int32, top_scores.shape, 1)
        nonzero = top_scores > 0.0
        tier = (k_cell - rank).astype(top_scores.dtype) * 8192.0
        priority = jnp.where(
            nonzero, tier + jnp.minimum(top_scores, 8191.0), -jnp.inf)
        flat_priority = priority.reshape(-1)
        flat_scores = top_scores.reshape(-1)
        cell_ids = jax.lax.broadcasted_iota(
            jnp.int32, top_scores.shape, 0).reshape(-1)
        flat_idx = top_idx.reshape(-1)
        sel_p, sel = jax.lax.top_k(flat_priority, quota)
        valid = sel_p > 0.0
        resp = flat_scores[sel]
        cid = cell_ids[sel]
        within = flat_idx[sel]
        cy, cx = cid // ncx, cid % ncx
        wy, wx = within // cw, within % cw
        ys = cfg.edge + cy * ch + wy
        xs = cfg.edge + cx * cw + wx
        nb = orbmod._gather3x3(s_low_raw, ys, xs)
        s_c = nb[:, 1, 1]
        s_l, s_r = nb[:, 1, 0], nb[:, 1, 2]
        s_u, s_d = nb[:, 0, 1], nb[:, 2, 1]
        denom_x = s_l - 2.0 * s_c + s_r
        denom_y = s_u - 2.0 * s_c + s_d
        dx_sub = jnp.where(
            jnp.abs(denom_x) > 1e-6, 0.5 * (s_l - s_r) / denom_x, 0.0)
        dy_sub = jnp.where(
            jnp.abs(denom_y) > 1e-6, 0.5 * (s_u - s_d) / denom_y, 0.0)
        xs_f = xs.astype(jnp.float32) + jnp.clip(dx_sub, -0.5, 0.5)
        ys_f = ys.astype(jnp.float32) + jnp.clip(dy_sub, -0.5, 0.5)
        return ys, xs, ys_f, xs_f, resp, valid

    return _select


def variant_topk(orbmod):
    """Per-cell lax.top_k instead of the argmax loop."""
    import jax
    import jax.numpy as jnp

    def _select(cfg, s_high, s_low, s_low_raw, quota):
        H, W = s_high.shape
        border = jnp.zeros((H, W), bool).at[
            cfg.edge: H - cfg.edge, cfg.edge: W - cfg.edge
        ].set(True)
        s_high = jnp.where(border, s_high, 0.0)
        s_low = jnp.where(border, s_low, 0.0)
        ncy, ncx, ch, cw = orbmod._level_grid(cfg, H, W, quota)

        def to_cells(s):
            pad_h = ncy * ch - (H - 2 * cfg.edge)
            pad_w = ncx * cw - (W - 2 * cfg.edge)
            v = s[cfg.edge: H - cfg.edge, cfg.edge: W - cfg.edge]
            v = jnp.pad(v, ((0, pad_h), (0, pad_w)))
            return v.reshape(ncy, ch, ncx, cw).transpose(0, 2, 1, 3).reshape(
                ncy * ncx, ch * cw)

        cells_high = to_cells(s_high)
        cells_low = to_cells(s_low)
        n_high = jnp.sum(cells_high > 0, axis=1)
        use_high = (n_high > cfg.min_high_corners)[:, None]
        cells = jnp.where(use_high, cells_high, cells_low)
        n_cells = ncy * ncx
        k_cell = max(2, min(6, -(-2 * quota // n_cells)))
        top_scores, top_idx = jax.lax.top_k(cells, k_cell)
        rank = jax.lax.broadcasted_iota(jnp.int32, top_scores.shape, 1)
        nonzero = top_scores > 0.0
        tier = (k_cell - rank).astype(top_scores.dtype) * 8192.0
        priority = jnp.where(
            nonzero, tier + jnp.minimum(top_scores, 8191.0), -jnp.inf)
        flat_priority = priority.reshape(-1)
        flat_scores = top_scores.reshape(-1)
        cell_ids = jax.lax.broadcasted_iota(
            jnp.int32, top_scores.shape, 0).reshape(-1)
        flat_idx = top_idx.reshape(-1)
        sel_p, sel = jax.lax.top_k(flat_priority, quota)
        valid = sel_p > 0.0
        resp = flat_scores[sel]
        cid = cell_ids[sel]
        within = flat_idx[sel]
        cy, cx = cid // ncx, cid % ncx
        wy, wx = within // cw, within % cw
        ys = cfg.edge + cy * ch + wy
        xs = cfg.edge + cx * cw + wx
        nb = orbmod._gather3x3(s_low_raw, ys, xs)
        s_c = nb[:, 1, 1]
        s_l, s_r = nb[:, 1, 0], nb[:, 1, 2]
        s_u, s_d = nb[:, 0, 1], nb[:, 2, 1]
        denom_x = s_l - 2.0 * s_c + s_r
        denom_y = s_u - 2.0 * s_c + s_d
        dx_sub = jnp.where(
            jnp.abs(denom_x) > 1e-6, 0.5 * (s_l - s_r) / denom_x, 0.0)
        dy_sub = jnp.where(
            jnp.abs(denom_y) > 1e-6, 0.5 * (s_u - s_d) / denom_y, 0.0)
        xs_f = xs.astype(jnp.float32) + jnp.clip(dx_sub, -0.5, 0.5)
        ys_f = ys.astype(jnp.float32) + jnp.clip(dy_sub, -0.5, 0.5)
        return ys, xs, ys_f, xs_f, resp, valid

    return _select


def variant_arith(orbmod):
    """Replace the three post-top_k value gathers (resp, cell id,
    within-idx) with arithmetic unpacking of the priority key: the
    flat layout is idx = cell*k + rank, and priority = (k-rank)*8192 +
    score with FAST scores bounded by 16*255 = 4080 < 8192, so score
    and rank recover EXACTLY from the selected priority. One gather
    (the within-cell pixel index) remains."""
    import jax
    import jax.numpy as jnp

    def _select(cfg, s_high, s_low, s_low_raw, quota):
        H, W = s_high.shape
        border = jnp.zeros((H, W), bool).at[
            cfg.edge: H - cfg.edge, cfg.edge: W - cfg.edge
        ].set(True)
        s_high = jnp.where(border, s_high, 0.0)
        s_low = jnp.where(border, s_low, 0.0)
        ncy, ncx, ch, cw = orbmod._level_grid(cfg, H, W, quota)

        def to_cells(s):
            pad_h = ncy * ch - (H - 2 * cfg.edge)
            pad_w = ncx * cw - (W - 2 * cfg.edge)
            v = s[cfg.edge: H - cfg.edge, cfg.edge: W - cfg.edge]
            v = jnp.pad(v, ((0, pad_h), (0, pad_w)))
            return v.reshape(ncy, ch, ncx, cw).transpose(0, 2, 1, 3).reshape(
                ncy * ncx, ch * cw)

        cells_high = to_cells(s_high)
        cells_low = to_cells(s_low)
        n_high = jnp.sum(cells_high > 0, axis=1)
        use_high = (n_high > cfg.min_high_corners)[:, None]
        cells = jnp.where(use_high, cells_high, cells_low)
        n_cells = ncy * ncx
        k_cell = max(2, min(6, -(-2 * quota // n_cells)))
        top_scores, top_idx = jax.lax.top_k(cells, k_cell)
        rank = jax.lax.broadcasted_iota(jnp.int32, top_scores.shape, 1)
        nonzero = top_scores > 0.0
        tier = (k_cell - rank).astype(top_scores.dtype) * 8192.0
        priority = jnp.where(
            nonzero, tier + jnp.minimum(top_scores, 8191.0), -jnp.inf)
        sel_p, sel = jax.lax.top_k(priority.reshape(-1), quota)
        valid = sel_p > 0.0
        r_sel = sel % k_cell
        cid = sel // k_cell
        resp = sel_p - (k_cell - r_sel).astype(sel_p.dtype) * 8192.0
        resp = jnp.where(valid, resp, 0.0)
        within = top_idx.reshape(-1)[sel]          # the one gather left
        cy, cx = cid // ncx, cid % ncx
        wy, wx = within // cw, within % cw
        ys = cfg.edge + cy * ch + wy
        xs = cfg.edge + cx * cw + wx
        nb = orbmod._gather3x3(s_low_raw, ys, xs)
        s_c = nb[:, 1, 1]
        s_l, s_r = nb[:, 1, 0], nb[:, 1, 2]
        s_u, s_d = nb[:, 0, 1], nb[:, 2, 1]
        denom_x = s_l - 2.0 * s_c + s_r
        denom_y = s_u - 2.0 * s_c + s_d
        dx_sub = jnp.where(
            jnp.abs(denom_x) > 1e-6, 0.5 * (s_l - s_r) / denom_x, 0.0)
        dy_sub = jnp.where(
            jnp.abs(denom_y) > 1e-6, 0.5 * (s_u - s_d) / denom_y, 0.0)
        xs_f = xs.astype(jnp.float32) + jnp.clip(dx_sub, -0.5, 0.5)
        ys_f = ys.astype(jnp.float32) + jnp.clip(dy_sub, -0.5, 0.5)
        return ys, xs, ys_f, xs_f, resp, valid

    return _select


def variant_arith_maxred(orbmod):
    """arith unpacking + max/argmax candidate loop instead of
    lax.top_k (at the production config k_cell=2, two max-reductions
    may beat one sort)."""
    import jax
    import jax.numpy as jnp

    base = variant_arith(orbmod)

    def _select(cfg, s_high, s_low, s_low_raw, quota):
        H, W = s_high.shape
        border = jnp.zeros((H, W), bool).at[
            cfg.edge: H - cfg.edge, cfg.edge: W - cfg.edge
        ].set(True)
        s_high = jnp.where(border, s_high, 0.0)
        s_low = jnp.where(border, s_low, 0.0)
        ncy, ncx, ch, cw = orbmod._level_grid(cfg, H, W, quota)

        def to_cells(s):
            pad_h = ncy * ch - (H - 2 * cfg.edge)
            pad_w = ncx * cw - (W - 2 * cfg.edge)
            v = s[cfg.edge: H - cfg.edge, cfg.edge: W - cfg.edge]
            v = jnp.pad(v, ((0, pad_h), (0, pad_w)))
            return v.reshape(ncy, ch, ncx, cw).transpose(0, 2, 1, 3).reshape(
                ncy * ncx, ch * cw)

        cells_high = to_cells(s_high)
        cells_low = to_cells(s_low)
        n_high = jnp.sum(cells_high > 0, axis=1)
        use_high = (n_high > cfg.min_high_corners)[:, None]
        cells = jnp.where(use_high, cells_high, cells_low)
        n_cells = ncy * ncx
        k_cell = max(2, min(6, -(-2 * quota // n_cells)))
        col_iota = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 1)
        cands_s, cands_i = [], []
        cur = cells
        for r in range(k_cell):
            sc = jnp.max(cur, axis=1)
            idx = jnp.argmax(cur, axis=1)
            cands_s.append(sc)
            cands_i.append(idx)
            if r + 1 < k_cell:
                cur = jnp.where(col_iota == idx[:, None], -jnp.inf, cur)
        top_scores = jnp.stack(cands_s, axis=1)
        top_idx = jnp.stack(cands_i, axis=1)
        rank = jax.lax.broadcasted_iota(jnp.int32, top_scores.shape, 1)
        nonzero = top_scores > 0.0
        tier = (k_cell - rank).astype(top_scores.dtype) * 8192.0
        priority = jnp.where(
            nonzero, tier + jnp.minimum(top_scores, 8191.0), -jnp.inf)
        sel_p, sel = jax.lax.top_k(priority.reshape(-1), quota)
        valid = sel_p > 0.0
        r_sel = sel % k_cell
        cid = sel // k_cell
        resp = jnp.where(
            valid,
            sel_p - (k_cell - r_sel).astype(sel_p.dtype) * 8192.0, 0.0)
        within = top_idx.reshape(-1)[sel]
        cy, cx = cid // ncx, cid % ncx
        wy, wx = within // cw, within % cw
        ys = cfg.edge + cy * ch + wy
        xs = cfg.edge + cx * cw + wx
        nb = orbmod._gather3x3(s_low_raw, ys, xs)
        s_c = nb[:, 1, 1]
        s_l, s_r = nb[:, 1, 0], nb[:, 1, 2]
        s_u, s_d = nb[:, 0, 1], nb[:, 2, 1]
        denom_x = s_l - 2.0 * s_c + s_r
        denom_y = s_u - 2.0 * s_c + s_d
        dx_sub = jnp.where(
            jnp.abs(denom_x) > 1e-6, 0.5 * (s_l - s_r) / denom_x, 0.0)
        dy_sub = jnp.where(
            jnp.abs(denom_y) > 1e-6, 0.5 * (s_u - s_d) / denom_y, 0.0)
        xs_f = xs.astype(jnp.float32) + jnp.clip(dx_sub, -0.5, 0.5)
        ys_f = ys.astype(jnp.float32) + jnp.clip(dy_sub, -0.5, 0.5)
        return ys, xs, ys_f, xs_f, resp, valid

    del base
    return _select


def variant_ablate(orbmod, no_subpixel=False, no_priority=False,
                   no_cells=False):
    """Timing-only ablations of selection sub-stages (outputs WRONG for
    no_priority/no_cells — the deltas locate the cost, nothing else)."""
    import jax
    import jax.numpy as jnp

    def _select(cfg, s_high, s_low, s_low_raw, quota):
        H, W = s_high.shape
        border = jnp.zeros((H, W), bool).at[
            cfg.edge: H - cfg.edge, cfg.edge: W - cfg.edge
        ].set(True)
        s_high = jnp.where(border, s_high, 0.0)
        s_low = jnp.where(border, s_low, 0.0)
        ncy, ncx, ch, cw = orbmod._level_grid(cfg, H, W, quota)

        if no_cells:
            # skip the reshape/transpose cell layout AND per-cell topk:
            # flat global top-(quota) on the raw map (wrong semantics)
            sel_p, sel = jax.lax.top_k(s_low.reshape(-1), quota)
            valid = sel_p > 0.0
            ys = jnp.clip(sel // W, cfg.edge, H - cfg.edge - 1)
            xs = jnp.clip(sel % W, cfg.edge, W - cfg.edge - 1)
            resp = sel_p
        else:
            def to_cells(s):
                pad_h = ncy * ch - (H - 2 * cfg.edge)
                pad_w = ncx * cw - (W - 2 * cfg.edge)
                v = s[cfg.edge: H - cfg.edge, cfg.edge: W - cfg.edge]
                v = jnp.pad(v, ((0, pad_h), (0, pad_w)))
                return v.reshape(ncy, ch, ncx, cw).transpose(
                    0, 2, 1, 3).reshape(ncy * ncx, ch * cw)

            cells_high = to_cells(s_high)
            cells_low = to_cells(s_low)
            n_high = jnp.sum(cells_high > 0, axis=1)
            use_high = (n_high > cfg.min_high_corners)[:, None]
            cells = jnp.where(use_high, cells_high, cells_low)
            n_cells = ncy * ncx
            k_cell = max(2, min(6, -(-2 * quota // n_cells)))
            top_scores, top_idx = jax.lax.top_k(cells, k_cell)
            if no_priority:
                flat_scores = top_scores.reshape(-1)
                sel = jnp.arange(quota, dtype=jnp.int32)
                sel_p = flat_scores[sel]
            else:
                rank = jax.lax.broadcasted_iota(
                    jnp.int32, top_scores.shape, 1)
                nonzero = top_scores > 0.0
                tier = (k_cell - rank).astype(top_scores.dtype) * 8192.0
                priority = jnp.where(
                    nonzero, tier + jnp.minimum(top_scores, 8191.0),
                    -jnp.inf)
                flat_priority = priority.reshape(-1)
                flat_scores = top_scores.reshape(-1)
                sel_p, sel = jax.lax.top_k(flat_priority, quota)
            cell_ids = jax.lax.broadcasted_iota(
                jnp.int32, top_scores.shape, 0).reshape(-1)
            flat_idx = top_idx.reshape(-1)
            valid = sel_p > 0.0
            resp = flat_scores[sel]
            cid = cell_ids[sel]
            within = flat_idx[sel]
            cy, cx = cid // ncx, cid % ncx
            wy, wx = within // cw, within % cw
            ys = cfg.edge + cy * ch + wy
            xs = cfg.edge + cx * cw + wx
        if no_subpixel:
            return (ys, xs, ys.astype(jnp.float32),
                    xs.astype(jnp.float32), resp, valid)
        nb = orbmod._gather3x3(s_low_raw, ys, xs)
        s_c = nb[:, 1, 1]
        s_l, s_r = nb[:, 1, 0], nb[:, 1, 2]
        s_u, s_d = nb[:, 0, 1], nb[:, 2, 1]
        denom_x = s_l - 2.0 * s_c + s_r
        denom_y = s_u - 2.0 * s_c + s_d
        dx_sub = jnp.where(
            jnp.abs(denom_x) > 1e-6, 0.5 * (s_l - s_r) / denom_x, 0.0)
        dy_sub = jnp.where(
            jnp.abs(denom_y) > 1e-6, 0.5 * (s_u - s_d) / denom_y, 0.0)
        xs_f = xs.astype(jnp.float32) + jnp.clip(dx_sub, -0.5, 0.5)
        ys_f = ys.astype(jnp.float32) + jnp.clip(dy_sub, -0.5, 0.5)
        return ys, xs, ys_f, xs_f, resp, valid

    return _select


def main():
    import jax
    import jax.numpy as jnp

    jax.devices()
    if jax.default_backend() != "cpu":
        from se2lam_tpu import enable_compilation_cache
        enable_compilation_cache(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))

    from __graft_entry__ import _default_cfg
    from se2lam_tpu.frontend import orb as orbmod
    from se2lam_tpu.io import SyntheticWorld
    from se2lam_tpu.utils.timing import measure_rtt

    cfg, oc = _default_cfg()
    world = SyntheticWorld(cfg, n_landmarks=500, seed=0)
    n_iter = 16
    gt = world.circle_trajectory(200, radius=2.5)[:n_iter]
    imgs = jnp.stack([jnp.asarray(world.render(gt[i]))
                      for i in range(n_iter)])
    rtt = measure_rtt()

    orig = orbmod._select_level_keypoints
    variants = {
        "current": (orig, None),
        "maxred": (variant_maxred(orbmod), None),
        "topk": (variant_topk(orbmod), None),
        # FAST+NMS lowering A/B on the current selection code
        "xla_fast": (orig, False),
        "pallas_fast": (orig, True),
        # timing-only ablations (outputs wrong where noted in
        # variant_ablate) — deltas locate the selection cost
        "arith": (variant_arith(orbmod), None),
        "arith_maxred": (variant_arith_maxred(orbmod), None),
        "no_subpix": (variant_ablate(orbmod, no_subpixel=True), None),
        "no_prio": (variant_ablate(orbmod, no_priority=True), None),
        "no_cells": (variant_ablate(orbmod, no_cells=True), None),
    }
    ref_out = None
    for name, (fn, pallas_fast) in variants.items():
        orbmod._select_level_keypoints = fn
        oc_v = (oc if pallas_fast is None
                else oc._replace(use_pallas_fast=pallas_fast))
        extract = orbmod.make_extractor(oc_v)

        @jax.jit
        def scan_extract(ims):
            def body(c, im):
                f = extract(im)
                s = (jnp.sum(f.xy) + jnp.sum(f.desc_pm1) + jnp.sum(f.angle)
                     + jnp.sum(f.valid))
                return c + s, None
            tot, _ = jax.lax.scan(body, jnp.float32(0), ims)
            return tot

        for w in range(3):
            float(scan_extract(imgs + np.float32(w + 1) * 1e-3))
        times = []
        for r in range(3):
            t0 = time.perf_counter()
            float(scan_extract(imgs + np.float32(10 + r) * 1e-3))
            times.append(time.perf_counter() - t0 - rtt)
        ms = min(times) / n_iter * 1e3
        # value check vs current implementation
        f = jax.jit(extract)(imgs[0])
        chk = np.asarray(jax.device_get(
            (jnp.sum(f.xy), jnp.sum(f.valid))))
        if ref_out is None:
            ref_out = chk
        same = np.allclose(chk, ref_out, rtol=1e-5)
        print(f"{name:<8} extract {ms:.3f} ms/frame   "
              f"outputs_match={same}")
    orbmod._select_level_keypoints = orig


if __name__ == "__main__":
    main()
