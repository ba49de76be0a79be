#!/usr/bin/env python
"""Offline SLAM demo driver — the test_vn equivalent (test/test_vn.cpp).

Runs full SLAM over a DatasetRoom-format directory (image/<i>.bmp +
odo_raw.txt) or, with --synthetic, over the built-in synthetic rover
world. Writes the keyframe trajectory in the reference txt format, a map
checkpoint, and visualization dumps.

Usage:
    python examples/run_dataset.py <dataset_dir> [--cam CamConfig.yml]
        [--settings Settings.yml] [--out outdir] [--frames N]
    python examples/run_dataset.py --synthetic [--frames N] [--out outdir]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthetic_cfg(n_features=500, n_levels=3):
    from se2lam_tpu.config import Capacity, SystemConfig
    from se2lam_tpu.frontend.orb import OrbConfig

    Tcb = np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], float
    )
    oc = OrbConfig(height=480, width=640, n_features=n_features,
                   scale_factor=1.2, n_levels=n_levels)
    return SystemConfig(
        width=640, height=480, fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        Tbc=tuple(np.linalg.inv(Tcb).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=n_features, max_level=n_levels,
        # the synthetic circle rotates fast per frame; a denser keyframe
        # cadence keeps the map well-associated
        min_frames_between_kf=2, max_frames_between_kf=6,
        cap=Capacity(n_features=oc.n_slots),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", nargs="?", help="DatasetRoom-format directory")
    ap.add_argument("--cam", default=None, help="CamConfig.yml path")
    ap.add_argument("--settings", default=None, help="Settings.yml path")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--out", default="./slam_out")
    ap.add_argument("--no-loops", action="store_true")
    ap.add_argument("--viz-every", type=int, default=0, metavar="N",
                    help="emit frame-debug + map images every N keyframes "
                         "and record per-BA chi2 logs (in-run observability)")
    ap.add_argument("--resume", metavar="MAP_DIR", default=None,
                    help="continue SLAM on a saved map (relocalizes the "
                         "first frame; the reference's USE_PREV_MAP)")
    ap.add_argument("--chunk", type=int, default=0, metavar="K",
                    help="speculative chunked tracking: feed K frames per "
                         "keyframe-decision sync (SlamSystem.process_chunk)"
                         " — amortizes the per-frame host round-trip, the "
                         "wall-clock bottleneck on remote-attached chips")
    args = ap.parse_args()

    from se2lam_tpu.io import SyntheticWorld, ate_se2, save_map
    from se2lam_tpu.system import SlamSystem
    from se2lam_tpu import viz

    os.makedirs(args.out, exist_ok=True)

    if args.synthetic:
        cfg = synthetic_cfg()
        world = SyntheticWorld(cfg, n_landmarks=800, room=12.0, seed=1)
        feed = world.sequence(args.frames, noise=(0.003, 0.002, 0.001))
    else:
        if not args.dataset:
            ap.error("dataset directory or --synthetic required")
        from se2lam_tpu.config import SystemConfig
        from se2lam_tpu.io import DatasetRoom

        cam = args.cam or os.path.join(args.dataset, "..", "CamConfig.yml")
        st = args.settings or os.path.join(args.dataset, "..", "Settings.yml")
        if os.path.exists(cam) and os.path.exists(st):
            cfg = SystemConfig.from_yaml(cam, st)
        else:
            print("warning: config YAMLs not found, using defaults")
            cfg = synthetic_cfg()
        feed = iter(DatasetRoom(args.dataset, count=args.frames))

    if args.resume:
        slam = SlamSystem.resume(
            cfg, args.resume, enable_loops=not args.no_loops
        )
        print(f"resumed map with {slam.n_keyframes()} keyframes")
    else:
        slam = SlamSystem(cfg, enable_loops=not args.no_loops)
    if args.viz_every > 0:
        slam.enable_viz(os.path.join(args.out, "viz"), args.viz_every)
    t0 = time.perf_counter()
    n = 0
    if args.chunk > 1:
        # chunk-pipelined feed (process_chunk_async, DESIGN §18): chunk
        # i+1's upload + extraction + speculative scan overlap chunk i's
        # decision resolve — this subsumes the old manual next_imgs
        # lookahead AND hides the per-chunk decision pull (+~32%
        # measured, E2E_BENCH.json), with bitwise-identical results
        pending_img, pending_odo = [], []
        n_in = 0
        for img, odo in feed:
            pending_img.append(img)
            pending_odo.append(odo)
            if len(pending_img) == args.chunk:
                r = slam.process_chunk_async(pending_img, pending_odo)
                n_in += len(pending_img)
                pending_img, pending_odo = [], []
                if r is not None:
                    n += len(r)
                    if n % (args.chunk * 8) == 0:
                        # host-side KF counter: n_keyframes() would
                        # drain the pipeline just for a progress print
                        print(f"frame {n}: kfs={len(slam.kf_frame_ids)}")
        if pending_img:
            r = slam.process_chunk_async(pending_img, pending_odo)
            n_in += len(pending_img)
            if r is not None:
                n += len(r)
        n += len(slam.flush_chunk_async())
        assert n == n_in
    else:
        for img, odo in feed:
            slam.process(img, odo)
            n += 1
            if n % 50 == 0:
                print(f"frame {n}: pose={slam.current_pose()} "
                      f"kfs={slam.n_keyframes()} mps={slam.n_map_points()}")
    dt = time.perf_counter() - t0
    print(f"\n{n} frames in {dt:.1f}s ({n / dt:.1f} fps)")
    print(f"keyframes={slam.n_keyframes()} map_points={slam.n_map_points()}")
    if slam._loop_closer is not None:
        print(f"loops_closed={slam._loop_closer.n_loops_closed}")
    if slam.ba_log:
        import json

        log_path = os.path.join(args.out, "ba_log.jsonl")
        with open(log_path, "w") as f:
            for rec in slam.ba_log:
                f.write(json.dumps(rec) + "\n")
        print(f"wrote {log_path} ({len(slam.ba_log)} BA records)")

    traj_path = os.path.join(args.out, "se2lam_kf_trajectory.txt")
    slam.save_kf_trajectory(traj_path)
    print(f"wrote {traj_path}")

    vocab = slam._loop_closer.vocab if slam._loop_closer else None
    if vocab is None and slam.n_keyframes() >= 2:
        # train one now so the saved map supports relocalization
        from se2lam_tpu.vocab import train_vocab

        import jax.numpy as jnp

        K, N = slam.ms.K, slam.ms.N
        desc = slam.ms.kf_desc.reshape(-1, 256)
        valid = (slam.ms.kf_feat_valid & slam.ms.kf_valid[:, None]).reshape(-1)
        vocab = train_vocab(
            desc, valid, n_words=512, iters=5,
            doc_ids=jnp.repeat(jnp.arange(K, dtype=jnp.int32), N),
            n_docs_cap=K,
        )
    save_map(os.path.join(args.out, "map"), slam.ms, vocab)
    print(f"wrote {os.path.join(args.out, 'map')}")

    est = np.asarray([p for _, p in slam.trajectory])
    named = {"slam": est[:, :2]}
    if not args.synthetic and args.dataset:
        gt_path = os.path.join(args.dataset, "gt.txt")
        if os.path.exists(gt_path):
            gt = np.atleast_2d(np.loadtxt(gt_path))
            # a hand-made gt.txt may be shorter than the image sequence;
            # truncate BOTH sides to the common prefix (ate_se2 requires
            # equal shapes)
            n_common = min(len(est), len(gt))
            gt = gt[:n_common]
            named["ground truth"] = gt[:, :2]
            rmse, _ = ate_se2(est[:n_common, :2], gt[:, :2])
            corr = slam.corrected_trajectory()
            n_corr = min(len(corr), len(gt))
            rmse_c, _ = ate_se2(corr[:n_corr, 1:3], gt[:n_corr, :2])
            print(f"ATE (SE2-aligned RMSE): {rmse:.4f} m live, "
                  f"{rmse_c:.4f} m retro-corrected")
            import json as _json

            with open(os.path.join(args.out, "ate.json"), "w") as f:
                _json.dump({"ate_live_m": round(float(rmse), 4),
                            "ate_corrected_m": round(float(rmse_c), 4),
                            "frames": int(len(est)),
                            "keyframes": slam.n_keyframes()}, f)
    if args.synthetic:
        gt = world.gt[: len(est)]
        named["ground truth"] = gt[:, :2]
        if args.resume:
            # resumed runs are in the SAVED map's gauge; frames before
            # relocalization have no anchor record — exclude them and let
            # the SE(2) alignment absorb the gauge difference
            localized = {fid for fid, _, _ in slam._frame_anchors}
            ok = np.asarray(
                [fid in localized for fid, _ in slam.trajectory]
            )
            if ok.sum() >= 2:
                rmse, _ = ate_se2(est[ok, :2], gt[ok, :2])
                print(f"ATE (SE2-aligned, localized frames only): {rmse:.4f} m")
        else:
            rmse, _ = ate_se2(est[:, :2], gt[:, :2])
            print(f"ATE (SE2-aligned RMSE): {rmse:.4f} m")
    viz.plot_trajectories(os.path.join(args.out, "trajectory.png"), named)
    viz.plot_map(os.path.join(args.out, "map.png"), slam.ms)
    print(f"wrote {args.out}/trajectory.png, {args.out}/map.png")


if __name__ == "__main__":
    main()
