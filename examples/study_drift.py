"""Long-horizon drift study: what loop closing + joint global BA buy.

Runs the same multi-lap synthetic sequence (elevated odometry noise so
dead-reckoning drift accumulates) through four estimators:

  odo          raw odometry integration (the drift floor SLAM must beat)
  slam_noloop  tracking + local mapping only (enable_loops=False)
  slam_pg      + loop closing with pose-graph GlobalBA + rigid MP
               re-anchor (the reference's correction,
               src/GlobalMapper.cpp:328-535)
  slam_joint   + joint full-map pose+point BA after each closure
               (run_global_ba_joint — beyond the reference)

and reports SE(2)-aligned ATE of the live and the retro-corrected
trajectories against ground truth. Writes artifacts to --out
(results.json + trajectories.png).

Run on CPU:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python examples/study_drift.py --laps 3 --out artifacts/drift_study
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(n_feats=256, joint_iters=5, odo_noise=(0.012, 0.006, 0.006)):
    """``odo_noise``: the estimator's per-step odometry noise model
    (cfg.odo_*_noise) — MUST match the simulated noise. Round-3 studies
    left it at the 0.001 defaults while simulating 0.012/0.006/0.006,
    telling the solver odometry was ~144x more informative than it was
    and suppressing vision's correction (the 'thin vision margin', r3
    VERDICT weak #2; quantified in artifacts/noise_study_r4). The
    reference reads these from Settings.yml per platform
    (src/Config.cpp:141-153) — calibration is the user's job there too.
    """
    from se2lam_tpu.config import Capacity, SystemConfig
    from se2lam_tpu.frontend.orb import OrbConfig

    TCB = np.array(
        [[0.0, -1.0, 0.0, 0.0],
         [0.0, 0.0, -1.0, 0.6],
         [1.0, 0.0, 0.0, 0.0],
         [0.0, 0.0, 0.0, 1.0]], dtype=np.float64)
    cfg0 = SystemConfig(
        width=320, height=240,
        fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=n_feats, max_level=2, scale_factor=1.2,
        min_frames_between_kf=2, max_frames_between_kf=8,
        local_iter=6,
        odo_x_noise=float(odo_noise[0]),
        odo_y_noise=float(odo_noise[1]),
        odo_t_noise=float(odo_noise[2]),
        gm_joint_ba_iters=joint_iters,
        # gates scaled to the 256-feature scene (reference defaults
        # assume ~1000 features; see tests/test_loop_reference_gates.py
        # for the untouched-defaults run)
        gm_dcl_min_kfid_offset=8,
        gm_vcl_num_min_match_mp=6,
        gm_vcl_num_min_match_kp=15,
    )
    oc = OrbConfig(
        height=cfg0.height, width=cfg0.width, n_features=n_feats,
        scale_factor=cfg0.scale_factor, n_levels=cfg0.max_level,
    )
    return cfg0.replace(
        cap=Capacity(
            n_features=oc.n_slots, max_kfs=128, max_mps=8192,
            local_kfs=8, local_ref_kfs=8, local_mps=512, ransac_trials=64,
        )
    )


def _rel_to_start(traj):
    """Express an (N,3) SE2 trajectory relative to its own first pose —
    removes the gauge difference between the map frame (anchored at the
    first SLAM frame) and the world frame, WITHOUT the whole-path
    alignment that hides tail drift."""
    x0, y0, t0 = traj[0]
    c, s = np.cos(-t0), np.sin(-t0)
    dx, dy = traj[:, 0] - x0, traj[:, 1] - y0
    out = np.stack([c * dx - s * dy, s * dx + c * dy,
                    traj[:, 2] - t0], -1)
    out[:, 2] = np.arctan2(np.sin(out[:, 2]), np.cos(out[:, 2]))
    return out


def lap_drift(est, gt, frames_per_lap):
    """Position error at each lap boundary, both trajectories expressed
    relative to their own start. Odometry grows ~sqrt(laps); a
    loop-closing SLAM should stay bounded — THE long-horizon signature
    whole-path aligned ATE averages away."""
    n = min(len(est), len(gt))
    er, gr = _rel_to_start(est[:n]), _rel_to_start(gt[:n])
    errs = []
    j = frames_per_lap - 1
    while j < n:
        errs.append(round(float(
            np.linalg.norm(er[j, :2] - gr[j, :2])), 4))
        j += frames_per_lap
    if (n - 1) % frames_per_lap != frames_per_lap - 1:
        errs.append(round(float(
            np.linalg.norm(er[n - 1, :2] - gr[n - 1, :2])), 4))
    return errs


def run_slam(cfg, world, gt, odo, enable_loops, frames_per_lap):
    from se2lam_tpu.io import ate_se2
    from se2lam_tpu.system import SlamSystem

    # "no loops" = the reference's faithful ablation: BoW loop
    # detection off, but the GlobalMapper machinery (feature-edge
    # maintenance + feat-graph-renewal GlobalBA,
    # src/GlobalMapper.cpp:87-147) stays on — the reference has no
    # switch that turns that off
    slam = SlamSystem(cfg, enable_loops=True, detect_loops=enable_loops)
    for i in range(len(gt)):
        slam.process(world.render(gt[i]), odo[i])
    live = np.asarray([p for _, p in slam.trajectory])
    corr = slam.corrected_trajectory()[:, 1:]
    ate_live, _ = ate_se2(live[:, :2], gt[: len(live), :2])
    ate_corr, _ = ate_se2(corr[:, :2], gt[: len(corr), :2])
    n_loops = (slam._loop_closer.n_loops_closed
               if slam._loop_closer else 0)
    return {
        "ate_live": round(float(ate_live), 4),
        "ate_corrected": round(float(ate_corr), 4),
        "lap_drift": lap_drift(corr, gt, frames_per_lap),
        "n_loops": int(n_loops),
        "n_renewal_gbas": int(
            slam._loop_closer.n_renewal_gbas if slam._loop_closer else 0
        ),
        "n_kfs": int(slam.n_keyframes()),
        "n_mps": int(slam.n_map_points()),
    }, corr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=float, default=3.0)
    ap.add_argument("--frames-per-lap", type=int, default=90)
    ap.add_argument("--noise", type=float, nargs=3,
                    default=(0.012, 0.006, 0.006),
                    metavar=("X", "Y", "TH"))
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--odo-seeds", type=int, nargs="*", default=None,
                    help="run every estimator under each of these "
                         "odometry-noise draws (default: the single "
                         "draw seed 3, the r4 protocol)")
    ap.add_argument("--out", default="artifacts/drift_study")
    args = ap.parse_args()

    from se2lam_tpu.io import SyntheticWorld, ate_se2

    cfg = build_cfg()
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=args.seed)
    lap = world.circle_trajectory(args.frames_per_lap)
    n = int(args.laps * args.frames_per_lap)
    reps = int(np.ceil(n / args.frames_per_lap))
    gt = np.concatenate([lap] * reps)[:n]
    odo_seeds = args.odo_seeds if args.odo_seeds else [3]

    results = {"config": {
        "laps": args.laps, "frames": n, "noise": list(args.noise),
        "seed": args.seed, "odo_seeds": odo_seeds,
        "joint_iters": cfg.gm_joint_ba_iters,
    }}
    trajs = {"gt": gt[:, :2]}

    per_seed = {}
    for oseed in odo_seeds:
        odo = world.odometry(gt, noise=tuple(args.noise), seed=oseed)
        sres = {}
        ate_odo, _ = ate_se2(odo[:, :2], gt[:, :2])
        sres["odo"] = {"ate_live": round(float(ate_odo), 4),
                       "lap_drift": lap_drift(odo, gt,
                                              args.frames_per_lap)}
        if oseed == odo_seeds[0]:
            trajs["odo"] = odo[:, :2]
        print(f"[odo seed {oseed}] odo            ATE {ate_odo:.4f}",
              flush=True)

        for name, (loops, joint) in {
            "slam_noloop": (False, 0),
            "slam_pg": (True, 0),
            "slam_joint": (True, cfg.gm_joint_ba_iters),
        }.items():
            r, corr = run_slam(
                build_cfg(joint_iters=joint), world, gt, odo, loops,
                args.frames_per_lap,
            )
            sres[name] = r
            if oseed == odo_seeds[0]:
                trajs[name] = corr[:, :2]
            print(f"[odo seed {oseed}] {name:<14} "
                  f"ATE live {r['ate_live']:.4f} "
                  f"corrected {r['ate_corrected']:.4f} "
                  f"loops {r['n_loops']} kfs {r['n_kfs']} "
                  f"lap drift {r['lap_drift']}", flush=True)
        per_seed[str(oseed)] = sres

    if len(odo_seeds) == 1:
        results.update(per_seed[str(odo_seeds[0])])
    else:
        results["per_seed"] = per_seed
        # seed-wise summary: does SLAM beat raw odometry on every draw?
        for est in ("slam_noloop", "slam_pg", "slam_joint"):
            wins_live = sum(
                per_seed[s][est]["ate_live"] <= per_seed[s]["odo"]["ate_live"]
                for s in per_seed)
            wins_corr = sum(
                per_seed[s][est]["ate_corrected"]
                <= per_seed[s]["odo"]["ate_live"] for s in per_seed)
            results[f"{est}_beats_odo"] = {
                "live": f"{wins_live}/{len(per_seed)}",
                "corrected": f"{wins_corr}/{len(per_seed)}",
            }
            print(f"{est}: beats odometry live {wins_live}/{len(per_seed)}"
                  f" corrected {wins_corr}/{len(per_seed)}", flush=True)
        results.update(per_seed[str(odo_seeds[0])])

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=1)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 7))
        styles = {
            "gt": dict(color="0.3", lw=2.5, alpha=0.6, label="ground truth"),
            "odo": dict(color="#d62728", lw=1, label=(
                f"odometry (ATE {results['odo']['ate_live']:.3f})")),
            "slam_noloop": dict(color="#ff7f0e", lw=1, label=(
                f"SLAM no loops ({results['slam_noloop']['ate_corrected']:.3f})")),
            "slam_pg": dict(color="#1f77b4", lw=1, label=(
                f"+ pose-graph GBA ({results['slam_pg']['ate_corrected']:.3f})")),
            "slam_joint": dict(color="#2ca02c", lw=1.4, label=(
                f"+ joint GBA ({results['slam_joint']['ate_corrected']:.3f})")),
        }
        for k, st in styles.items():
            ax.plot(trajs[k][:, 0], trajs[k][:, 1], **st)
        ax.set_aspect("equal")
        ax.legend(loc="upper right", fontsize=8)
        ax.set_title(f"{args.laps:g} laps, odo noise {tuple(args.noise)}")
        fig.savefig(os.path.join(args.out, "trajectories.png"), dpi=120)
        print(f"wrote {args.out}/trajectories.png")
    except Exception as e:                      # matplotlib optional
        print(f"plot skipped: {e}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
