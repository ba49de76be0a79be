"""Controlled triangulation-accuracy probe.

Renders two frames at EXACT ground-truth poses, matches ORB features,
triangulates with the EXACT relative pose, and measures 3D error vs the
nearest ground-truth landmark. Isolates the vision stack (keypoints,
matching, DLT) from odometry noise: if errors here are large, the
frontend geometry has a bug; if small, the field errors come from the
odometry-relative triangulation poses.

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python examples/study_tri_accuracy.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from study_drift import build_cfg  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from se2lam_tpu.frontend.matcher import match_by_window
    from se2lam_tpu.frontend.orb import OrbConfig, make_extractor
    from se2lam_tpu.io import SyntheticWorld
    from se2lam_tpu.ops import se2, se3
    from se2lam_tpu.ops.triangulate import triangulate

    cfg = build_cfg()
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    lap = world.circle_trajectory(90)

    oc = OrbConfig(height=cfg.height, width=cfg.width,
                   n_features=256, scale_factor=cfg.scale_factor,
                   n_levels=cfg.max_level)
    extract = jax.jit(make_extractor(oc))

    Tcb = jnp.asarray(cfg.Tcb_mat, jnp.float32)
    Tbc = jnp.asarray(cfg.Tbc_mat, jnp.float32)
    Kmat = jnp.asarray([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy],
                        [0, 0, 1]], jnp.float32)

    for gap in (2, 4, 8):
        errs, depths = [], []
        for i0 in range(0, 80, 10):
            p_ref, p_cur = lap[i0], lap[i0 + gap]
            f_ref = extract(jnp.asarray(world.render(p_ref)))
            f_cur = extract(jnp.asarray(world.render(p_cur)))
            wm = match_by_window(f_ref, f_cur, f_ref.xy,
                                 win_size=40.0, nn_ratio=0.9)
            midx = np.asarray(wm.idx2)
            # exact relative pose ref->cur
            d_ref = se2.minus(jnp.asarray(p_ref), jnp.asarray(p_cur))
            Tcr = Tcb @ se2.to_se3(d_ref) @ Tbc
            P_ref = jnp.concatenate(
                [Kmat, jnp.zeros((3, 1), jnp.float32)], axis=1)
            P_cur = Kmat @ Tcr[:3, :]
            ok = midx >= 0
            pos_c = np.asarray(triangulate(
                f_ref.xy, f_cur.xy[np.maximum(midx, 0)],
                P_ref[None], P_cur[None]))
            # ref-camera frame -> world
            Twb = np.eye(4, dtype=np.float32)
            c, s = np.cos(p_ref[2]), np.sin(p_ref[2])
            Twb[:2, :2] = [[c, -s], [s, c]]
            Twb[0, 3], Twb[1, 3] = p_ref[0], p_ref[1]
            Twc = Twb @ np.asarray(cfg.Tbc_mat, np.float32)
            pos_w = (Twc[:3, :3] @ pos_c.T).T + Twc[:3, 3]
            valid = ok & np.asarray(f_ref.valid) & (pos_c[:, 2] > 0.2)
            pw = pos_w[valid]
            d = np.linalg.norm(
                pw[:, None, :] - world.landmarks[None], axis=-1).min(1)
            errs.append(d)
            depths.append(pos_c[valid, 2])
        errs = np.concatenate(errs)
        depths = np.concatenate(depths)
        print(f"gap={gap}: n={len(errs)} err med={np.median(errs):.3f} "
              f"p90={np.quantile(errs, 0.9):.3f} "
              f"frac>0.5m={np.mean(errs > 0.5):.2f} "
              f"depth med={np.median(depths):.2f}")


if __name__ == "__main__":
    main()
