#!/usr/bin/env python
"""Fleet rendezvous demo: robots map different parts of one environment
independently, the maps merge, and a robot fleet localizes against the
union.

The reference is strictly single-session/single-map; this composes the
three capabilities the TPU build adds on top of it:

1. mapping runs per robot (`SlamSystem`, own gauge each);
2. `mapmerge.merge_maps` aligns + fuses the maps (BoW place recognition
   across maps, SE(2) alignment, duplicate-landmark fusion, global BA);
3. `parallel.make_fleet_localizer` serves B robots x k frames per
   dispatch against the ONE merged map.

Usage: python examples/fleet_demo.py [--frames 80] [--out ./fleet_out]
Prints a JSON summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80,
                    help="circuit length in frames")
    ap.add_argument("--out", default="./fleet_out")
    args = ap.parse_args()

    import jax.numpy as jnp

    from run_dataset import synthetic_cfg
    from se2lam_tpu.io import SyntheticWorld, save_map
    from se2lam_tpu.mapmerge import merge_maps
    from se2lam_tpu.ops import se2
    from se2lam_tpu.parallel import make_fleet_localizer
    from se2lam_tpu.system import SlamSystem

    cfg = synthetic_cfg()
    world = SyntheticWorld(cfg, n_landmarks=800, room=12.0, seed=1)
    n = args.frames
    gt = np.asarray(world.circle_trajectory(n))

    # --- 1. two robots map overlapping halves, each in its own gauge ---
    # B starts well before the overlap so its landmarks have matured
    # (parallax + observations) by the time it traverses A's territory —
    # young border keyframes carry few map points and fail the seam
    # verification gates (correctly: the gates protect against fusing
    # unproven landmarks)
    halves = [list(range(0, int(n * 0.6))),
              list(range(int(n * 0.3), n))]
    maps = []
    for r, frames in enumerate(halves):
        slam = SlamSystem(cfg, enable_loops=False)
        for i in frames:
            slam.process(world.render(gt[i]), np.asarray(gt[i], np.float32))
        print(f"robot {r}: mapped {len(frames)} frames -> "
              f"{slam.n_keyframes()} KFs", flush=True)
        maps.append(slam.ms)

    # --- 2. rendezvous: merge B into A's frame ---
    merged, info = merge_maps(maps[0], maps[1], cfg)
    print(f"merged at pair {info['pair']}, {info['mps_fused']} duplicate "
          f"landmarks fused, seam inliers {info['seam_edge_inliers']}",
          flush=True)
    os.makedirs(args.out, exist_ok=True)
    save_map(os.path.join(args.out, "merged_map"), merged, info["vocab"])

    # --- 3. a fleet of B robots serves against the union ---
    B, k = 2, 8
    extract_l, step_l = make_fleet_localizer(cfg, merged)
    anchor = jnp.asarray(gt[halves[0][0]], jnp.float32)   # A's gauge
    starts = [int(n * 0.15), int(n * 0.8)]   # one robot per half
    imgs, odos, seeds, last = [], [], [], []
    for b in range(B):
        idx = [(starts[b] + i) % n for i in range(k + 1)]
        imgs.append(np.stack([world.render(gt[j]) for j in idx[1:]]))
        odos.append(np.stack([gt[j] for j in idx[1:]]))
        seeds.append(np.asarray(
            se2.minus(jnp.asarray(gt[idx[0]], jnp.float32), anchor)))
        last.append(gt[idx[0]])
    poses, tracked = step_l(
        jnp.asarray(np.stack(seeds), jnp.float32),
        jnp.asarray(np.stack(last), jnp.float32),
        extract_l(jnp.asarray(np.stack(imgs))),
        jnp.asarray(np.stack(odos), jnp.float32),
    )
    n_tracked = int(jnp.sum(tracked))
    # accuracy of the served poses vs ground truth (A's gauge)
    errs = []
    for b in range(B):
        for i in range(k):
            exp = np.asarray(se2.minus(
                jnp.asarray(gt[(starts[b] + 1 + i) % n], jnp.float32),
                anchor,
            ))
            if bool(tracked[b, i]):
                errs.append(np.linalg.norm(
                    np.asarray(poses[b, i])[:2] - exp[:2]
                ))
    print(json.dumps({
        "metric": "fleet_rendezvous",
        "robots_mapping": len(halves),
        "merged_kfs": int(merged.n_kf),
        "mps_fused": info["mps_fused"],
        "fleet_B": B, "chunk_k": k,
        "tracked": n_tracked, "total": B * k,
        "max_pose_err_m": round(float(np.max(errs)), 4) if errs else None,
    }))


if __name__ == "__main__":
    main()
