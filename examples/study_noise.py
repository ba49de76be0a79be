"""Odometry-noise robustness sweep: how accuracy degrades as the wheel
odometry degrades, and what vision + loop closing buy back.

Runs the same multi-lap circuit at increasing odometry noise scales and
reports, per scale: raw-odometry ATE (the drift floor), full-SLAM
(loops + joint GBA) live and retro-corrected ATE, and closures fired.
The interesting regime is HIGH noise — with near-perfect odometry the
reference design trusts odometry by construction (the pose is always
odometry-predicted) and vision only maintains the map.

Reuses the drift-study configuration and runner (`study_drift.py`).

Run on CPU:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python examples/study_noise.py --out artifacts/noise_study
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from study_drift import build_cfg, run_slam  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=float, default=2.0)
    ap.add_argument("--frames-per-lap", type=int, default=90)
    ap.add_argument("--scales", type=float, nargs="+",
                    default=[0.5, 1.0, 2.0, 4.0],
                    help="multipliers on the base noise "
                         "(0.012, 0.006, 0.006)")
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--odo-seeds", type=int, nargs="*", default=None,
                    help="odometry draws per cell (default: the single "
                         "r4-protocol draw); with several, the summary "
                         "reports per-cell mean/std across draws — the "
                         "r4 'matched non-monotone at 1x' anomaly was a "
                         "single-draw artifact to confirm or dissolve")
    ap.add_argument("--out", default="artifacts/noise_study")
    args = ap.parse_args()

    from se2lam_tpu.io import SyntheticWorld, ate_se2

    os.makedirs(args.out, exist_ok=True)
    n = int(args.laps * args.frames_per_lap)
    base = np.asarray([0.012, 0.006, 0.006])

    # estimator odometry-noise calibration sweep (r3 VERDICT weak #2):
    # "default" re-creates the r3 studies' miscalibration (cfg left at
    # the 0.001 defaults while the simulation draws base*scale);
    # "matched" tells the estimator the truth; half/double probe
    # sensitivity around it
    import jax

    rows = []
    for scale in args.scales:
        sim_noise = tuple(base * scale)
        world = SyntheticWorld(build_cfg(), n_landmarks=900, room=12.0,
                               seed=args.seed)
        gt = np.asarray(world.circle_trajectory(args.frames_per_lap))
        gt = np.concatenate([gt] * int(np.ceil(args.laps)))[:n]
        odo_seeds = (args.odo_seeds if args.odo_seeds
                     else [args.seed + int(scale * 100)])
        for oseed in odo_seeds:
            odo = world.odometry(gt, noise=sim_noise, seed=oseed)
            ate_odo, _ = ate_se2(odo[:, :2], gt[:, :2])
            for mode, cfg_noise in (
                ("default_0.001", (0.001, 0.001, 0.001)),
                ("half", tuple(0.5 * base * scale)),
                ("matched", sim_noise),
                ("double", tuple(2.0 * base * scale)),
            ):
                cfg = build_cfg(odo_noise=cfg_noise)
                res, _ = run_slam(cfg, world, gt, odo, True,
                                  args.frames_per_lap)
                row = {
                    "noise_scale": scale,
                    "odo_cfg": mode,
                    "odo_seed": oseed,
                    "ate_odo": round(float(ate_odo), 4),
                    "ate_slam_live": res["ate_live"],
                    "ate_slam_corrected": res["ate_corrected"],
                    "n_loops": res["n_loops"],
                    "n_kfs": res["n_kfs"],
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
                jax.clear_caches()   # one compile family per cfg

    summary = {}
    if args.odo_seeds and len(args.odo_seeds) > 1:
        for scale in args.scales:
            for mode in ("default_0.001", "half", "matched", "double"):
                cell = [r for r in rows
                        if r["noise_scale"] == scale
                        and r["odo_cfg"] == mode]
                if not cell:
                    continue
                corr = np.asarray([r["ate_slam_corrected"] for r in cell])
                odo_a = np.asarray([r["ate_odo"] for r in cell])
                summary[f"{scale}x/{mode}"] = {
                    "corrected_mean": round(float(corr.mean()), 4),
                    "corrected_std": round(float(corr.std()), 4),
                    "odo_mean": round(float(odo_a.mean()), 4),
                    "beats_odo": f"{int((corr <= odo_a).sum())}/{len(cell)}",
                }
                print(f"{scale}x/{mode}: corrected "
                      f"{corr.mean():.4f}±{corr.std():.4f} "
                      f"(odo {odo_a.mean():.4f}, beats "
                      f"{int((corr <= odo_a).sum())}/{len(cell)})",
                      flush=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump({"laps": args.laps, "base_noise": base.tolist(),
                   "rows": rows, "summary": summary}, f, indent=1)
    print("wrote", os.path.join(args.out, "results.json"))


if __name__ == "__main__":
    main()
