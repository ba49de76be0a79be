"""Instrumented no-loop mapping run: find WHERE the map goes bad.

Round-4 drift study showed slam_noloop ATE 0.49 vs raw odometry 0.12
at matched calibration — with lap-1 drift already 0.80, i.e. the
corruption predates any revisit. This script runs the same world with
per-keyframe instrumentation against ground truth:

  - per-KF pose error right after insert+BA (and its history: does an
    early KF get dragged, or does error accumulate at the frontier?)
  - map-point error vs the nearest ground-truth landmark (median /
    p90 / phantom count), duplicate landmark count
  - BA chi2 / iteration info per insertion

Variants isolate the mechanism:
  --local-iter 0     no BA at all -> KF chain is pure odometry; if ATE
                     then matches raw odometry, BA (not association or
                     bookkeeping) is the corrupter
  --laps 1           pre-revisit behavior only

Run on CPU:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python examples/study_noloop_debug.py --laps 1
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from study_drift import build_cfg  # noqa: E402


def se2_mat(p):
    c, s = np.cos(p[2]), np.sin(p[2])
    T = np.eye(3)
    T[:2, :2] = [[c, -s], [s, c]]
    T[0, 2], T[1, 2] = p[0], p[1]
    return T


def mp_error_stats(mp_pos, mp_valid, landmarks):
    """Median / p90 distance of valid MPs to their nearest GT landmark,
    plus phantom (no landmark within 0.5m) and duplicate counts."""
    pos = mp_pos[mp_valid]
    if len(pos) == 0:
        return dict(n=0)
    d = np.linalg.norm(pos[:, None, :] - landmarks[None, :, :], axis=-1)
    nearest = d.argmin(1)
    dmin = d.min(1)
    # duplicates: a GT landmark claimed by >=2 MPs within 0.5m
    claimed = nearest[dmin < 0.5]
    _, counts = np.unique(claimed, return_counts=True)
    return dict(
        n=int(len(pos)),
        med=float(np.median(dmin)),
        p90=float(np.quantile(dmin, 0.9)),
        phantom=int((dmin > 0.5).sum()),
        dup=int((counts > 1).sum()),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=float, default=1.0)
    ap.add_argument("--frames-per-lap", type=int, default=90)
    ap.add_argument("--noise", type=float, nargs=3,
                    default=(0.012, 0.006, 0.006))
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--odo-seed", type=int, default=3)
    ap.add_argument("--local-iter", type=int, default=6)
    ap.add_argument("--obs-sigma", type=float, default=1.0,
                    help="keypoint sigma calibration (cfg.obs_sigma_px)")
    ap.add_argument("--no-proj", action="store_true",
                    help="disable stage (c) projection re-association")
    ap.add_argument("--proj-win", type=float, default=0.0,
                    help="override stage (c) projection search window "
                         "(px at octave 1; default = matcher's 15)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.no_proj:
        import se2lam_tpu.localmap as lm

        def _no_proj(feats, uv, octv, desc, cand, feat_free, level_offset=2):
            N = feats.xy.shape[0]
            return (jnp.full((N,), -1, jnp.int32),
                    jnp.asarray(0, jnp.int32))

        lm.match_by_projection = _no_proj
    elif args.proj_win > 0:
        import se2lam_tpu.localmap as lm
        from se2lam_tpu.frontend.matcher import (
            match_by_projection as _mbp,
        )

        def _wide(feats, uv, octv, desc, cand, feat_free, level_offset=2):
            return _mbp(feats, uv, octv, desc, cand, feat_free,
                        win_size=args.proj_win, level_offset=level_offset)

        lm.match_by_projection = _wide

    from se2lam_tpu.io import SyntheticWorld, ate_se2
    from se2lam_tpu.system import SlamSystem

    cfg = build_cfg()
    if args.local_iter != cfg.local_iter:
        cfg = cfg.replace(local_iter=args.local_iter)
    if args.obs_sigma != 1.0:
        cfg = cfg.replace(obs_sigma_px=args.obs_sigma)
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=args.seed)
    lap = world.circle_trajectory(args.frames_per_lap)
    n = int(args.laps * args.frames_per_lap)
    reps = int(np.ceil(n / args.frames_per_lap))
    gt = np.concatenate([lap] * reps)[:n]
    odo = world.odometry(gt, noise=tuple(args.noise), seed=args.odo_seed)

    ate_odo, _ = ate_se2(odo[:, :2], gt[:, :2])
    print(f"odometry ATE {ate_odo:.4f}")

    slam = SlamSystem(cfg, enable_loops=False)
    slam.log_ba = True
    kf_err_hist = []      # (frame, [per-KF pos error across all valid KFs])
    last_nkf = 0
    for i in range(n):
        slam.process(world.render(gt[i]), odo[i])
        nkf = slam.n_keyframes()
        if nkf != last_nkf:
            last_nkf = nkf
            ms = slam.ms
            kf_pose = np.asarray(jax.device_get(ms.kf_pose))
            kf_valid = np.asarray(jax.device_get(ms.kf_valid))
            # gauge: the map frame is anchored at the first frame's pose
            # (origin); world GT starts at gt[0]. T maps map -> world.
            T = se2_mat(gt[0])
            kf_xy = (T[:2, :2] @ kf_pose[:, :2].T).T + T[:2, 2]
            kf_pose = np.concatenate(
                [kf_xy, (kf_pose[:, 2:] + gt[0, 2])], axis=1)
            mp_pos = np.asarray(jax.device_get(ms.mp_pos))
            mp_xy = (T[:2, :2] @ mp_pos[:, :2].T).T + T[:2, 2]
            mp_pos = np.concatenate([mp_xy, mp_pos[:, 2:]], axis=1)
            mp_valid = np.asarray(jax.device_get(ms.mp_valid))
            good_prl = np.asarray(jax.device_get(ms.mp_good_prl))
            # per-KF position error vs gt at that KF's frame
            fids = slam.kf_frame_ids
            errs = []
            for slot, fid in enumerate(fids):
                if slot < len(kf_valid) and kf_valid[slot]:
                    errs.append(float(np.linalg.norm(
                        kf_pose[slot, :2] - gt[fid, :2])))
            mstats = mp_error_stats(mp_pos, mp_valid, world.landmarks)
            # MPs observed by the NEW keyframe — the set whose positions
            # constrain the live pose in this insertion's BA
            obs_row = np.asarray(jax.device_get(
                ms.kf_obs_mp[slam.n_keyframes() - 1]))
            cur_mask = np.zeros(len(mp_valid), bool)
            cur_mask[obs_row[obs_row >= 0]] = True
            gstats = mp_error_stats(
                mp_pos, mp_valid & good_prl & cur_mask, world.landmarks)
            ba = slam.ba_log[-1] if slam.ba_log else {}
            kf_err_hist.append((i, errs))
            # association correctness: project GT landmarks with the GT
            # pose; a feature's generating landmark is the nearest
            # projection within 3 px; the association is WRONG when the
            # observed MP sits >0.5 m from that landmark
            kf_slot = slam.n_keyframes() - 1
            feat_xy = np.asarray(jax.device_get(ms.kf_xy[kf_slot]))
            Twb4 = np.eye(4)
            c4, s4 = np.cos(gt[i, 2]), np.sin(gt[i, 2])
            Twb4[:2, :2] = [[c4, -s4], [s4, c4]]
            Twb4[0, 3], Twb4[1, 3] = gt[i, 0], gt[i, 1]
            Tcw4 = np.asarray(cfg.Tcb_mat) @ np.linalg.inv(Twb4)
            pc4 = (Tcw4[:3, :3] @ world.landmarks.T).T + Tcw4[:3, 3]
            zv = pc4[:, 2] > 0.3
            uu = cfg.fx * pc4[:, 0] / np.where(zv, pc4[:, 2], 1) + cfg.cx
            vv = cfg.fy * pc4[:, 1] / np.where(zv, pc4[:, 2], 1) + cfg.cy
            lm_uv = np.stack([uu, vv], -1)
            lm_uv[~zv] = 1e9
            n_ok = n_wrong = 0
            for fi in np.nonzero(obs_row >= 0)[0]:
                d2 = np.linalg.norm(lm_uv - feat_xy[fi], axis=-1)
                li = d2.argmin()
                if d2[li] > 3.0:
                    continue
                mp_w = mp_pos[obs_row[fi]]
                if np.linalg.norm(
                        mp_w - world.landmarks[li]) > 0.5:
                    n_wrong += 1
                else:
                    n_ok += 1
            odo_err = float(np.linalg.norm(odo[i, :2] - gt[i, :2]))
            print(
                f"f{i:3d} KF{nkf - 1:2d} odo={odo_err:.3f} "
                f"kf_err last={errs[-1]:.3f} "
                f"max={max(errs):.3f} mean={np.mean(errs):.3f} | "
                f"mp n={mstats.get('n', 0)} med={mstats.get('med', 0):.3f} "
                f"p90={mstats.get('p90', 0):.3f} "
                f"ph={mstats.get('phantom', 0)} dup={mstats.get('dup', 0)} "
                f"| cur n={gstats.get('n', 0)} "
                f"med={gstats.get('med', 0):.3f} "
                f"p90={gstats.get('p90', 0):.3f} "
                f"| assoc ok={n_ok} wrong={n_wrong} | ba={ba}"
            )

    live = np.asarray([p for _, p in slam.trajectory])
    corr = slam.corrected_trajectory()[:, 1:]
    ate_live, _ = ate_se2(live[:, :2], gt[: len(live), :2])
    ate_corr, _ = ate_se2(corr[:, :2], gt[: len(corr), :2])
    print(f"slam_noloop local_iter={args.local_iter} "
          f"ATE live {ate_live:.4f} corrected {ate_corr:.4f} "
          f"(odo {ate_odo:.4f}) kfs={slam.n_keyframes()} "
          f"mps={slam.n_map_points()}")
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "debug.json"), "w") as f:
            json.dump({
                "local_iter": args.local_iter,
                "ate_live": float(ate_live),
                "ate_corrected": float(ate_corr),
                "ate_odo": float(ate_odo),
                "kf_err_hist": [(i, e) for i, e in kf_err_hist],
            }, f)


if __name__ == "__main__":
    main()
