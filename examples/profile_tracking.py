"""Stage-level device profile of the per-frame tracking hot path.

Times each component of the jitted tracking step (extractor sub-stages,
matcher, RANSAC, the rest) with the DESIGN §9 discipline: every
component is wrapped in a `lax.scan` over ≥16 distinct inputs inside ONE
jit with full output consumption, warmed ≥3 times, and completion is
forced by fetching a scalar (block_until_ready does not reliably block
through the axon tunnel). Prints a ms/frame table; components overlap
(extract = resize+fast+select+orient+blur+brief plus glue), so the sum
of parts is a consistency check, not a partition.

Usage:  python examples/profile_tracking.py          # real chip
        JAX_PLATFORMS=cpu python examples/...        # CPU sanity
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.devices()

    import os
    if jax.default_backend() != "cpu":
        from se2lam_tpu import enable_compilation_cache
        enable_compilation_cache(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache"))

    from __graft_entry__ import _default_cfg
    from se2lam_tpu import localmap, tracking
    from se2lam_tpu.frontend import orb as orbmod
    from se2lam_tpu.frontend.orb import make_extractor
    from se2lam_tpu.frontend.matcher import match_by_window
    from se2lam_tpu.frontend.ransac import ransac_fundamental
    from se2lam_tpu.io import SyntheticWorld
    from se2lam_tpu.mapstate import empty_map
    from se2lam_tpu.utils.timing import measure_rtt

    cfg, oc = _default_cfg()
    extract = make_extractor(oc)
    world = SyntheticWorld(cfg, n_landmarks=500, seed=0)

    n_iter = 16
    gt = world.circle_trajectory(200, radius=2.5)[: n_iter + 12]
    imgs = jnp.stack([jnp.asarray(world.render(gt[i]))
                      for i in range(n_iter)])
    odos = jnp.stack([jnp.asarray(gt[i], jnp.float32)
                      for i in range(n_iter)])
    keys = jax.random.split(jax.random.PRNGKey(7), n_iter)

    # steady tracking state (same recipe as bench.py, abbreviated)
    feats0 = jax.jit(extract)(imgs[0])
    ms = localmap.insert_first_kf(
        empty_map(cfg.cap), feats0, jnp.zeros(3, jnp.float32), odos[0])
    view_mp, obs_mask = localmap.kf_track_seed(ms, 0)
    ts = tracking.init_track_state(
        feats0, jnp.zeros(3, jnp.float32), odos[0], 0, view_mp, obs_mask)

    # precomputed per-frame features for the non-extract components
    feats_stack = jax.jit(lambda s: jax.lax.map(extract, s))(imgs)

    rtt = measure_rtt()
    print(f"rtt: {rtt*1e3:.1f} ms   backend: {jax.default_backend()}")

    def timed_scan(name, build):
        """build() -> (scan_fn, args). scan_fn must consume everything
        and return one scalar."""
        fn, args = build()
        fn = jax.jit(fn)
        for w in range(3):  # steady state needs ~2 executions
            pert = jax.tree.map(
                lambda x: x + np.float32(w + 1) * 1e-3
                if isinstance(x, jax.Array)
                and jnp.issubdtype(x.dtype, jnp.floating) else x,
                args)
            float(fn(*pert))
        times = []
        for r in range(3):
            pert = jax.tree.map(
                lambda x: x + np.float32(r + 1) * 1e-4
                if isinstance(x, jax.Array)
                and jnp.issubdtype(x.dtype, jnp.floating) else x,
                args)
            t0 = time.perf_counter()
            float(fn(*pert))
            times.append(time.perf_counter() - t0 - rtt)
        ms_per = max(min(times), 0.0) / n_iter * 1e3
        print(f"{name:28s} {ms_per:8.3f} ms/frame")
        return ms_per

    def consume(x):
        return sum(jnp.sum(jnp.asarray(v, jnp.float32))
                   for v in jax.tree.leaves(x))

    # ---- full step ----
    def build_full():
        def fn(ts0, imgs, odos, ks):
            def body(c, xs):
                im, od, kk = xs
                f = extract(im)
                ts2, r = tracking.track_frame(c, f, od, kk, cfg)
                return ts2, (r.pose, r.n_matched)
            tsf, (p, nm) = jax.lax.scan(body, ts0, (imgs, odos, ks))
            return consume(tsf) + jnp.sum(p) + jnp.sum(nm)
        return fn, (ts, imgs, odos, keys)

    # ---- extract only ----
    def build_extract():
        def fn(imgs):
            def body(c, im):
                f = extract(im)
                return c + consume(f), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), imgs)
            return tot
        return fn, (imgs,)

    # ---- track_frame only (precomputed feats) ----
    def build_track():
        def fn(ts0, fs, odos, ks):
            def body(c, xs):
                f, od, kk = xs
                ts2, r = tracking.track_frame(c, f, od, kk, cfg)
                return ts2, (r.pose, r.n_matched)
            tsf, (p, nm) = jax.lax.scan(body, ts0, (fs, odos, ks))
            return consume(tsf) + jnp.sum(p) + jnp.sum(nm)
        return fn, (ts, feats_stack, odos, keys)

    # ---- matcher only ----
    def build_match():
        def fn(ts0, fs):
            def body(c, f):
                wm = match_by_window(ts0.ref_feats, f, ts0.prev_matched,
                                     win_size=20.0, nn_ratio=0.9)
                return c + jnp.sum(wm.idx2) + jnp.sum(wm.dist), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), fs)
            return tot
        return fn, (ts, feats_stack)

    # ---- RANSAC only ----
    def build_ransac():
        p1 = ts.ref_feats.xy
        def fn(fs, ks):
            def body(c, xs):
                f, kk = xs
                fr = ransac_fundamental(
                    kk, p1, f.xy, f.valid,
                    n_trials=cfg.cap.ransac_trials, thresh_px=3.0,
                    min_inliers=10)
                return c + jnp.sum(fr.inliers) + fr.n_inliers, None
            tot, _ = jax.lax.scan(body, jnp.float32(0), (fs, ks))
            return tot
        return fn, (feats_stack, keys)

    # ---- extractor sub-stages (per level, summed) ----
    import math
    level_shapes = [(int(round(oc.height / s)), int(round(oc.width / s)))
                    for s in oc.scales]

    def per_level(fn_one):
        """Apply fn_one(level_img) at every pyramid level, consume."""
        def fn(imgs):
            def body(c, im):
                acc = jnp.float32(0)
                for l, (H, W) in enumerate(level_shapes):
                    li = im if l == 0 else jax.image.resize(
                        im, (H, W), "linear")
                    acc = acc + consume(fn_one(li, l))
                return c + acc, None
            tot, _ = jax.lax.scan(body, jnp.float32(0), imgs)
            return tot
        return fn

    from se2lam_tpu.frontend.fast import fast_score_pair, nms3x3

    def build_resize():
        return per_level(lambda li, l: jnp.sum(li * li)), (imgs,)

    def build_fast():
        def one(li, l):
            sh, sl = fast_score_pair(li, oc.fast_high, oc.fast_low)
            return nms3x3(sh) * nms3x3(sh) + nms3x3(sl) + sl
        return per_level(one), (imgs,)

    def build_select():
        def one(li, l):
            q = oc.level_quotas[l]
            if q <= 0:
                return jnp.float32(0)
            sh, sl = fast_score_pair(li, oc.fast_high, oc.fast_low)
            ys, xs, ys_f, xs_f, resp, valid = \
                orbmod._select_level_keypoints(
                    oc, nms3x3(sh), nms3x3(sl), sl, q)
            return (jnp.sum(ys_f) + jnp.sum(xs_f) + jnp.sum(resp)
                    + jnp.sum(valid))
        return per_level(one), (imgs,)

    def build_brief():
        # fixed keypoint positions per level (quota many), varying image
        rng = np.random.default_rng(0)
        kps = []
        for l, (H, W) in enumerate(level_shapes):
            q = oc.level_quotas[l]
            ys = jnp.asarray(rng.integers(oc.edge, H - oc.edge, q))
            xs = jnp.asarray(rng.integers(oc.edge, W - oc.edge, q))
            kps.append((ys, xs))
        def one(li, l):
            q = oc.level_quotas[l]
            if q <= 0:
                return jnp.float32(0)
            ys, xs = kps[l]
            angle, bits = orbmod._moments_and_bits(li, ys, xs)
            return jnp.sum(bits) + jnp.sum(angle)
        return per_level(one), (imgs,)

    full = timed_scan("full step", build_full)
    ex = timed_scan("extract", build_extract)
    tr = timed_scan("track_frame (no extract)", build_track)
    timed_scan("  match_by_window", build_match)
    timed_scan("  ransac_fundamental", build_ransac)
    timed_scan("  [extract] resize only", build_resize)
    timed_scan("  [extract] fast+nms x2", build_fast)
    timed_scan("  [extract] select_kps", build_select)
    timed_scan("  [extract] moments+brief", build_brief)
    print(f"check: extract+track = {ex + tr:.3f} vs full {full:.3f}")


if __name__ == "__main__":
    main()
