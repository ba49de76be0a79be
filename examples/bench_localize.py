"""Localization-serving throughput: per-frame vs chunked vs pipelined.

Builds a small synthetic map, then times the localization-only serving
path (the reference's LOCALIZATION_ONLY mode, src/OdoSLAM.cpp:120-132)
through the host↔device dispatch path in three feed modes:

- per-frame `process` (2-3 blocking syncs per frame),
- speculative chunked `process_chunk` (one sync per tracked run,
  DESIGN §12),
- depth-d pipelined `process_async` (async host-copies + speculative
  dispatch, DESIGN §18) — lower latency than chunking AND faster: it
  pays neither the chunk scan's fixed overhead nor its lost-restart
  replays.

Protocol per DESIGN §9 discipline: a full warm lap before each timed
lap, distinct inputs per frame, loops over fresh trajectory segments.

Usage: python examples/bench_localize.py [--frames 96] [--depth 2 4 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--depth", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LOC_BENCH.json"))
    args = ap.parse_args()

    import jax

    jax.devices()
    if jax.default_backend() != "cpu":
        from se2lam_tpu import enable_compilation_cache
        enable_compilation_cache(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))

    from run_dataset import synthetic_cfg

    from se2lam_tpu.io import SyntheticWorld
    from se2lam_tpu.localizer import Localizer
    from se2lam_tpu.system import SlamSystem

    cfg = synthetic_cfg()
    world = SyntheticWorld(cfg, n_landmarks=800, room=12.0, seed=1)

    print("building map...")
    slam = SlamSystem(cfg, enable_loops=False)
    lap = world.circle_trajectory(args.frames, radius=2.5)
    odo_map = world.odometry(lap, noise=(0.001, 0.001, 0.0005), seed=2)
    for g, o in zip(lap, odo_map):
        slam.process(np.asarray(world.render(g), np.uint8), o)
    ms = slam.ms
    print(f"map: {slam.n_keyframes()} KFs")

    n = len(lap)
    gt = np.concatenate([lap, lap])          # warm lap + timed lap
    odo = world.odometry(gt, noise=(0.002, 0.001, 0.001), seed=9)
    frames = [np.asarray(world.render(g), np.uint8) for g in gt]
    seed_pose = np.zeros(3, np.float32)      # map gauge = first body pose

    results = {"frames": n, "backend": jax.default_backend(),
               "n_kf": int(slam.n_keyframes())}

    def bench(label, mode, depth=4):
        loc = Localizer(cfg, ms, None, reloc_min_inliers=30)
        loc.set_pose(seed_pose, odo[0])

        def feed(lo, hi):
            if mode == "per-frame":
                for i in range(lo, hi):
                    loc.process(frames[i], odo[i])
            elif mode == "chunked":
                for i in range(lo, hi, args.chunk):
                    loc.process_chunk(
                        frames[i:i + args.chunk], list(odo[i:i + args.chunk])
                    )
            else:
                loc.pipeline_depth = depth
                for i in range(lo, hi):
                    loc.process_async(frames[i], odo[i])
                loc.flush_async()

        feed(0, n)                      # warm lap (every program ≥3 runs)
        n_warm_ok = sum(t for _, _, t in loc.trajectory)
        t0 = time.perf_counter()
        feed(n, 2 * n)
        dt = time.perf_counter() - t0
        ok = sum(t for _, _, t in loc.trajectory) - n_warm_ok
        fps = n / dt
        results[label] = round(fps, 1)
        print(f"{label:>16}: {fps:6.1f} fps wall  (tracked {ok}/{n})")

    bench("per_frame_fps", "per-frame")
    bench(f"chunked_k{args.chunk}_fps", "chunked")
    for d in args.depth:
        bench(f"pipelined_d{d}_fps", "pipelined", depth=d)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
