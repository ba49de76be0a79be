"""Calibrate the pose-graph-only loop-closure regime (r3 VERDICT weak #1).

The r3 drift study showed pose-graph-only closures (slam_pg: GlobalBA +
rigid MP re-anchor, no joint polish) making per-lap endpoint drift WORSE
than raw odometry. The two free parameters implicated are the Huber
kink of the pose-graph edges (was hard-coded 3.0) and the eigenvalue
ceiling of the sparsified loop-edge information (the Sparsifier clamp,
src/sparsifier.cpp:239-263; was 1e4, which dwarfs the preintegration
chain's ~2e3 per edge). This sweep runs the same multi-lap sequence as
examples/study_drift.py through slam_pg for a (huber, ceiling) grid and
reports per-lap drift + corrected ATE, against the odometry floor.

Run on CPU:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python examples/study_pg_calib.py --out artifacts/pg_calib_r4
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from study_drift import build_cfg, lap_drift, run_slam  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=float, default=3.0)
    ap.add_argument("--frames-per-lap", type=int, default=90)
    ap.add_argument("--noise", type=float, nargs=3,
                    default=(0.012, 0.006, 0.006))
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--odo-seed", type=int, default=3,
                    help="odometry noise realization (the world seed "
                         "only varies the landmarks/descriptors)")
    ap.add_argument("--hubers", type=float, nargs="*",
                    default=[1e9, 3.0, 1.0])
    ap.add_argument("--ceils", type=float, nargs="*",
                    default=[1e4, 1e3, 3e2, 1e2])
    ap.add_argument("--out", default="artifacts/pg_calib_r4")
    args = ap.parse_args()

    from se2lam_tpu.io import SyntheticWorld, ate_se2

    cfg0 = build_cfg()
    world = SyntheticWorld(cfg0, n_landmarks=600, room=10.0, seed=args.seed)
    lap = world.circle_trajectory(args.frames_per_lap)
    n = int(args.laps * args.frames_per_lap)
    reps = int(np.ceil(n / args.frames_per_lap))
    gt = np.concatenate([lap] * reps)[:n]
    odo = world.odometry(gt, noise=tuple(args.noise), seed=args.odo_seed)

    ate_odo, _ = ate_se2(odo[:, :2], gt[:, :2])
    results = {
        "config": {"laps": args.laps, "frames": n,
                   "noise": list(args.noise), "seed": args.seed},
        "odo": {"ate": round(float(ate_odo), 4),
                "lap_drift": lap_drift(odo, gt, args.frames_per_lap)},
        "grid": [],
    }
    print(f"odo  ATE {ate_odo:.4f} "
          f"lap drift {results['odo']['lap_drift']}")

    import jax

    for huber in args.hubers:
        for ceil in args.ceils:
            cfg = build_cfg(joint_iters=0).replace(
                gm_pg_huber=float(huber), gm_loop_info_ceil=float(ceil)
            )
            r, _ = run_slam(cfg, world, gt, odo, True,
                            args.frames_per_lap)
            row = {"huber": huber, "ceil": ceil, **r}
            results["grid"].append(row)
            print(f"huber {huber:>6g} ceil {ceil:>6g}: "
                  f"ATE corr {r['ate_corrected']:.4f} "
                  f"loops {r['n_loops']} lap drift {r['lap_drift']}")
            jax.clear_caches()   # distinct cfgs pile up compiled programs

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["odo"]))


if __name__ == "__main__":
    main()
