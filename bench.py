"""Headline benchmark: full tracking-loop throughput on one chip.

Measures frames/s of the per-frame hot path — ORB pyramid extraction,
MXU Hamming window matching, fundamental RANSAC, odometry-fused pose +
SE2 preintegration, DLT triangulation, KF decision — on 640x480 frames
with 1000 features (the reference's demo configuration).

Baseline: the reference consumes its demo feed at Config::FPS = 30
frames/s (test/test_vn.cpp:38; the repo publishes no other numbers —
BASELINE.md). vs_baseline = measured_fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _default_cfg
    from se2lam_tpu import tracking
    from se2lam_tpu.frontend.orb import make_extractor
    from se2lam_tpu.io import SyntheticWorld

    cfg, oc = _default_cfg()
    extract = make_extractor(oc)
    world = SyntheticWorld(cfg, n_landmarks=500, seed=0)

    n_warm, n_iter, n_imgs = 3, 30, 8
    gt = world.circle_trajectory(n_imgs * 8, radius=2.5)
    imgs = [
        jnp.asarray(world.render(gt[i])) for i in range(n_imgs)
    ]
    odos = [jnp.asarray(gt[i], jnp.float32) for i in range(n_imgs)]

    @jax.jit
    def step(img, ts, odo, key):
        feats = extract(img)
        return tracking.track_frame(ts, feats, odo, key, cfg)

    feats0 = jax.jit(extract)(imgs[0])
    ts = tracking.init_track_state(
        feats0, odos[0], odos[0], 0,
        view_mp=jnp.zeros((oc.n_slots, 3), jnp.float32),
        obs_mask=jnp.zeros(oc.n_slots, bool),
    )
    key = jax.random.PRNGKey(0)

    for i in range(n_warm):
        ts2, res = step(imgs[i % n_imgs], ts, odos[i % n_imgs], key)
        jax.block_until_ready(res.pose)

    t0 = time.perf_counter()
    for i in range(n_iter):
        ts2, res = step(imgs[i % n_imgs], ts, odos[i % n_imgs], key)
    jax.block_until_ready(res.pose)
    dt = time.perf_counter() - t0

    fps = n_iter / dt
    baseline_fps = 30.0  # reference demo feed rate (test/test_vn.cpp:38)
    print(
        json.dumps(
            {
                "metric": "tracking_fps_640x480_1000feat",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
