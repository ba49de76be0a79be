"""Fleet benchmarks: multi-robot tracking and shared-map localization.

Measures the two fleet serving shapes on the attached chip:

1. Fleet tracking (`parallel.make_fleet_tracker`): B independent robots'
   full frontends per dispatch. Reported as device ms per robot-frame at
   B = 1, 2, 4, 8 — near-constant means the batch axis is free (the chip
   was not saturated by one stream), rising means streams contend.
2. Fleet localization (`parallel.make_fleet_localizer`): B robots x k
   speculative frames against ONE shared frozen map per dispatch,
   including extraction. Reported as wall robot-frames/s through the
   dispatch path (the serving number).

Discipline (docs/DESIGN.md §9): inputs perturbed per repetition, state
carried through in-jit scans, every output consumed into the fetched
scalar, ≥3 warm-ups per program before timing (the axon tunnel needs ~2
executions to reach steady state), completion forced by FETCHING a
scalar (block_until_ready does not reliably block over the tunnel) with
the measured ~30 ms RTT subtracted once per timed region.

Writes FLEET_BENCH.json next to the repo root.

Usage: python examples/bench_fleet.py [--frames 16] [--reps 3]
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
    ap.add_argument("--frames", type=int, default=16,
                    help="frames per robot per timed scan")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--max-b", type=int, default=8,
                    help="largest fleet size for the tracking sweep")
    ap.add_argument("--skip-loc", action="store_true",
                    help="skip the fleet-localization benchmark")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FLEET_BENCH.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _default_cfg
    from se2lam_tpu import system as system_mod
    from se2lam_tpu.io import SyntheticWorld
    from se2lam_tpu.parallel import make_fleet_localizer, make_fleet_tracker

    cfg, oc = _default_cfg()
    # the synthetic circle rotates fast per frame; reference-default KF
    # cadence leaves the map too sparse to localize against (same
    # override as examples/run_dataset.py synthetic_cfg)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, min_frames_between_kf=2, max_frames_between_kf=6)
    world = SyntheticWorld(cfg, n_landmarks=800, room=12.0, seed=1)
    T = args.frames
    from se2lam_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()
    results = {"rtt_ms": round(rtt * 1e3, 2)}

    # ---- fleet tracking: device ms per robot-frame vs B ----
    init_fn, step_fn, extract_fn = make_fleet_tracker(cfg, oc)
    Bs = tuple(b for b in (1, 2, 4, 8) if b <= args.max_b)
    B_max = max(Bs)
    # each robot runs consecutive frames of the same dense circle with a
    # phase offset so no two robots ever see the same (image, odo) pair
    L = max((T + 2) * B_max, 288)
    gt = world.circle_trajectory(L, radius=2.5)
    frames = {}
    for b in range(B_max):
        idx = [(b * (L // B_max) + i) % L for i in range(T + 1)]
        frames[b] = (
            np.stack([world.render(gt[j]) for j in idx]),
            np.stack([gt[j] for j in idx]).astype(np.float32),
        )

    track_rows = []
    for B in Bs:
        imgs = jnp.asarray(np.stack([frames[b][0] for b in range(B)], 1))
        odos = jnp.asarray(np.stack([frames[b][1] for b in range(B)], 1))
        feats0 = extract_fn(imgs[0])
        ts_b = init_fn(feats0, odos[0], odos[0])
        keys = jax.random.split(jax.random.PRNGKey(3), T * B)
        keys = keys.reshape(T, B, 2)

        @jax.jit
        def scan_fleet(ts0, im_seq, odo_seq, key_seq):
            def body(carry, xs):
                im, od, kk = xs
                ts2, res = step_fn(carry, im, od, kk)
                return ts2, (res.pose, res.n_matched)

            ts_f, (poses, nm) = jax.lax.scan(
                body, ts0, (im_seq, odo_seq, key_seq))
            tot = sum(jnp.sum(jnp.asarray(x, jnp.float32))
                      for x in jax.tree.leaves(ts_f))
            return tot + jnp.sum(poses) + jnp.sum(nm)

        # ≥3 warm executions before timing (axon steady-state trap)
        for w in range(3):
            float(scan_fleet(ts_b, imgs[1:] + np.uint8(w), odos[1:], keys))
        times = []
        for r in range(args.reps):
            pert = imgs[1:] + np.uint8(3 + r)
            t0 = time.perf_counter()
            float(scan_fleet(ts_b, pert, odos[1:], keys))
            times.append(time.perf_counter() - t0 - rtt)
        dt = min(times)
        ms_rf = dt / (T * B) * 1e3
        track_rows.append({"B": B, "ms_per_robot_frame": round(ms_rf, 3),
                           "robot_fps": round(T * B / dt, 1)})
        print(f"tracking B={B}: {ms_rf:.3f} ms/robot-frame "
              f"({T * B / dt:.1f} robot-frames/s)", flush=True)
    results["fleet_tracking"] = track_rows

    # ---- fleet localization: B robots x k frames vs one shared map ----
    if args.skip_loc:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args.out)
        return
    # build a real map covering the FULL circle (a partial arc's points
    # triangulate at low parallax and localization honestly rejects them)
    slam = system_mod.SlamSystem(cfg)
    gt_map = world.circle_trajectory(120)
    for i in range(120):
        slam.process(world.render(gt_map[i]), np.asarray(gt_map[i]))
    ms_map = slam.ms
    print(f"map: {slam.n_keyframes()} KFs", flush=True)

    B, k = 4, 8
    extract_l, step_l = make_fleet_localizer(cfg, ms_map)
    Lq = (k + 1) * B * 4
    gt_all = world.circle_trajectory(Lq)
    from se2lam_tpu.ops import se2
    anchor = jnp.asarray(gt_map[0], jnp.float32)  # map gauge = first frame
    stacks, odoss, poses0 = [], [], []
    for b in range(B):
        # robots spread around the circle, each running consecutive frames
        idx = [(b * (Lq // B) + i) % Lq for i in range(k + 1)]
        stacks.append(np.stack([world.render(gt_all[j]) for j in idx[1:]]))
        odoss.append(np.stack([gt_all[j] for j in idx[1:]]))
        # seed poses live in the MAP frame (anchored at the first SLAM
        # frame), odometry readings in the odo frame (only increments
        # matter to the localizer)
        poses0.append(np.asarray(
            se2.minus(jnp.asarray(gt_all[idx[0]], jnp.float32), anchor)))
    img_bk = jnp.asarray(np.stack(stacks))            # (B, k, H, W)
    odo_bk = jnp.asarray(np.stack(odoss), jnp.float32)
    pose_b = jnp.asarray(np.stack(poses0), jnp.float32)

    # pre-chunk odometry reading, in the odo (world) frame
    last_odom_b = jnp.asarray(
        np.stack([gt_all[(b * (Lq // B)) % Lq] for b in range(B)]),
        jnp.float32)

    def serve(img_stack, pose_b, odo_bk):
        feats_bk = extract_l(img_stack)
        poses, tracked = step_l(pose_b, last_odom_b, feats_bk, odo_bk)
        return poses, tracked

    for w in range(3):
        p, t = serve(img_bk + np.uint8(w), pose_b, odo_bk)
        # the warm-ups must COMPLETE before timing starts: without the
        # fetch they only enqueue (async dispatch), and rep 1 would block
        # on all three warm executions plus its own
        float(jnp.sum(p * p) + jnp.sum(t))
    times = []
    # perturbed inputs prepared OUTSIDE the timed region (the tracking
    # sweep above hoists its `pert` the same way)
    perts = [img_bk + np.uint8(3 + r) for r in range(args.reps)]
    for p_ in perts:                 # fetch forces completion (not
        float(p_[0, 0, 0, 0])        # block_until_ready — tunnel trap)
    for r in range(args.reps):
        t0 = time.perf_counter()
        p, t = serve(perts[r], pose_b, odo_bk)
        # one scalar fetch forces extraction + localization chain
        tot = float(jnp.sum(p * p) + jnp.sum(t))
        times.append(time.perf_counter() - t0 - rtt)
    n_tracked = int(jnp.sum(t))   # from the last TIMED inputs
    dt = min(times)
    rfs = B * k / dt
    results["fleet_localization"] = {
        "B": B, "k": k, "robot_frames_per_s": round(rfs, 1),
        "ms_per_robot_frame": round(dt / (B * k) * 1e3, 3),
        "tracked": n_tracked, "total": B * k,
    }
    print(f"localization B={B} k={k}: {rfs:.1f} robot-frames/s "
          f"({n_tracked}/{B*k} tracked)", flush=True)

    # ---- steady-state pipelined serving loop ----
    # Real fleet serving chains blocks: block r+1's seed poses are block
    # r's final poses, which can stay ON DEVICE (no host round-trip in
    # the carry); the host only reads the tracked flags — and those can
    # resolve one block late (async-copied at dispatch, consumed behind
    # the next block's dispatch — the process_async pattern, DESIGN §18).
    # This measures the serving rate an embedder actually gets over R
    # consecutive blocks, vs the one-shot dispatch+fetch above.
    # Measured: they MATCH (352 vs 358 rfs) — at B=4 x k=8 the block is
    # device-bound, so the pull hides behind the next block's compute
    # either way; the one-shot number IS the steady-state serving rate.
    from se2lam_tpu.utils.prefetch import host_prefetch as _host_prefetch

    R = 6
    block_imgs, block_odos = [], []
    for r in range(R):
        st, od = [], []
        for b in range(B):
            idx = [(b * (Lq // B) + r * k + i) % Lq for i in range(1, k + 1)]
            st.append(np.stack([world.render(gt_all[j]) for j in idx]))
            od.append(np.stack([gt_all[j] for j in idx]))
        block_imgs.append(jnp.asarray(np.stack(st)))
        block_odos.append(jnp.asarray(np.stack(od), jnp.float32))

    def pipelined_lap(blocks_i, blocks_o):
        pose_c, odo_c = pose_b, last_odom_b
        pending = None
        n_tr = 0
        for r in range(len(blocks_i)):
            feats_bk = extract_l(blocks_i[r])
            poses, tracked = step_l(pose_c, odo_c, feats_bk, blocks_o[r])
            _host_prefetch(poses, tracked)
            pose_c = poses[:, -1]          # device-resident carry
            odo_c = blocks_o[r][:, -1]
            if pending is not None:
                _, tr_h = jax.device_get(pending)
                n_tr += int(tr_h.sum())
            pending = (poses, tracked)
        _, tr_h = jax.device_get(pending)
        return n_tr + int(tr_h.sum())

    for w in range(3):
        pipelined_lap([x + np.uint8(w) for x in block_imgs], block_odos)
    pert_laps = [[x + np.uint8(3 + r) for x in block_imgs]
                 for r in range(args.reps)]
    for lap_ in pert_laps:
        float(lap_[0][0, 0, 0, 0])
    times_p = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        n_tr = pipelined_lap(pert_laps[r], block_odos)
        times_p.append(time.perf_counter() - t0 - rtt)
    dtp = min(times_p)
    rfs_p = R * B * k / dtp
    results["fleet_localization_pipelined"] = {
        "B": B, "k": k, "blocks": R,
        "robot_frames_per_s": round(rfs_p, 1),
        "ms_per_robot_frame": round(dtp / (R * B * k) * 1e3, 3),
        "tracked": n_tr, "total": R * B * k,
    }
    print(f"pipelined serving B={B} k={k} x{R} blocks: "
          f"{rfs_p:.1f} robot-frames/s ({n_tr}/{R*B*k} tracked)",
          flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
