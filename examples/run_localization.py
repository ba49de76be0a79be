#!/usr/bin/env python
"""Localization-only demo — the LOCALIZATION_ONLY mode driver
(src/OdoSLAM.cpp:120-132): load a saved map and localize a fresh feed
against it, writing the per-frame trajectory CSV.

Usage:
    python examples/run_localization.py <map_dir> <dataset_dir> [--frames N]
    python examples/run_localization.py <map_dir> --synthetic [--frames N]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("map_dir")
    ap.add_argument("dataset", nargs="?")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--cam", help="CamConfig.yml (default: <dataset>/../)")
    ap.add_argument("--settings", help="Settings.yml (default: <dataset>/../)")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--out", default="./loc_out")
    ap.add_argument("--chunk", type=int, default=0, metavar="K",
                    help="speculative chunked localization: K frames per "
                         "host sync while tracked (Localizer.process_chunk)")
    args = ap.parse_args()

    from run_dataset import synthetic_cfg

    from se2lam_tpu.io import SyntheticWorld, load_map
    from se2lam_tpu.localizer import Localizer

    os.makedirs(args.out, exist_ok=True)
    ms, vocab, info = load_map(args.map_dir)
    print(f"loaded map: {info['n_kf']} KFs, vocab={'yes' if vocab else 'no'}")

    if args.synthetic:
        cfg = synthetic_cfg()
        world = SyntheticWorld(cfg, n_landmarks=800, room=12.0, seed=1)
        feed = world.sequence(args.frames, noise=(0.003, 0.002, 0.001), seed=7)
    else:
        if not args.dataset:
            ap.error("dataset directory or --synthetic required")
        from se2lam_tpu.config import SystemConfig
        from se2lam_tpu.io import DatasetRoom

        # the dataset's own intrinsics/settings — a map built by
        # run_dataset.py used these; synthetic intrinsics against a real
        # dataset would silently localize nothing
        cam = args.cam or os.path.join(args.dataset, "..", "CamConfig.yml")
        st = args.settings or os.path.join(args.dataset, "..", "Settings.yml")
        if os.path.exists(cam) and os.path.exists(st):
            cfg = SystemConfig.from_yaml(cam, st)
        else:
            print("warning: config YAMLs not found, using defaults")
            cfg = synthetic_cfg()
        feed = iter(DatasetRoom(args.dataset, count=args.frames))

    loc = Localizer(cfg, ms, vocab)
    n_ok = 0
    if args.chunk > 1:
        pending = []
        for item in feed:
            pending.append(item)
            if len(pending) == args.chunk:
                res = loc.process_chunk(
                    [f[0] for f in pending], [f[1] for f in pending]
                )
                n_ok += sum(p is not None for p in res)
                pending = []
                print(f"frame {loc.frame_id}: localized={n_ok}")
        if pending:
            res = loc.process_chunk(
                [f[0] for f in pending], [f[1] for f in pending]
            )
            n_ok += sum(p is not None for p in res)
    else:
        for i, (img, odo) in enumerate(feed):
            p = loc.process(img, odo)
            if p is not None:
                n_ok += 1
            if (i + 1) % 25 == 0:
                print(f"frame {i + 1}: localized={n_ok} pose={p}")
    out = os.path.join(args.out, "localizer_trajectory.csv")
    loc.save_trajectory(out)
    print(f"localized {n_ok}/{loc.frame_id} frames → {out}")


if __name__ == "__main__":
    main()
