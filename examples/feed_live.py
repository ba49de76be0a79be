"""Replay a dataset into a live SLAM server — the `datapub` analog.

The reference's datapub replays DatasetRoom onto ROS topics
(test/datapub.cpp); this replays the same data (or the synthetic world)
into examples/serve_live.py over TCP, printing the returned poses.

Usage:
  python examples/feed_live.py --synthetic --frames 200 \
      [--host 127.0.0.1 --port 7207] [--fps 30]
  python examples/feed_live.py --data /path/DatasetRoom [--fps 30]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7207)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--data", default=None, help="DatasetRoom directory")
    ap.add_argument("--fps", type=float, default=0.0,
                    help="feed pacing (0 = as fast as replies allow)")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()

    from se2lam_tpu.io.liveserver import LiveClient

    if args.data:
        from se2lam_tpu.io import DatasetRoom

        ds_iter = iter(DatasetRoom(args.data))
        img0, odo0 = next(ds_iter)
        H, W = img0.shape
        def feed():
            yield np.asarray(img0, np.uint8), np.asarray(odo0)
            for img, odo in ds_iter:
                yield np.asarray(img, np.uint8), np.asarray(odo)
    else:
        from __graft_entry__ import _default_cfg
        from se2lam_tpu.io import SyntheticWorld

        cfg, _ = _default_cfg(width=args.width, height=args.height)
        world = SyntheticWorld(cfg, n_landmarks=500, seed=0)
        gt = world.circle_trajectory(args.frames, radius=2.5)
        def feed():
            for i in range(args.frames):
                yield (np.asarray(world.render(gt[i]), np.uint8),
                       np.asarray(gt[i], np.float32))
        H, W = cfg.height, cfg.width

    client = LiveClient((args.host, args.port), H, W)
    period = 1.0 / args.fps if args.fps > 0 else 0.0
    n = 0
    t0 = time.perf_counter()
    try:
        for img, odo in feed():
            t_next = t0 + n * period
            now = time.perf_counter()
            if period and now < t_next:
                time.sleep(t_next - now)
            client.send_frame(img, odo)
            n += 1
            # keep the reply pipe drained so neither side blocks on a
            # full socket buffer (replies lag by up to the server chunk)
            if n % 16 == 0:
                for fid, pose, ok in client.drain():
                    if fid % 50 == 0:
                        print(f"frame {fid}: pose={pose}")
        for fid, pose, ok in client.drain():
            if fid % 50 == 0:
                print(f"frame {fid}: pose={pose}")
    finally:
        client.close()
    dt = time.perf_counter() - t0
    print(f"fed {n} frames in {dt:.1f}s ({n / max(dt, 1e-9):.1f} fps)")


if __name__ == "__main__":
    main()
