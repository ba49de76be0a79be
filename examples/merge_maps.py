#!/usr/bin/env python
"""Merge two saved maps into one (cross-map place recognition + SE(2)
alignment + duplicate-landmark fusion + global BA — `se2lam_tpu.mapmerge`).

The reference has no analog (MapStorage handles exactly one map); this
is the rendezvous step of the fleet story: robots map independently,
maps merge, the fleet serves against the union.

Usage:
    python examples/merge_maps.py MAP_A MAP_B --out MERGED_DIR \
        [--cam CamConfig.yml --settings Settings.yml]

Without the YAMLs, the synthetic demo configuration is used (matching
maps produced by `run_dataset.py --synthetic`).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("map_a", help="saved map dir (kept frame/gauge)")
    ap.add_argument("map_b", help="saved map dir (aligned into A)")
    ap.add_argument("--out", required=True, help="merged map output dir")
    ap.add_argument("--cam")
    ap.add_argument("--settings")
    args = ap.parse_args()

    from se2lam_tpu.io import load_map, save_map
    from se2lam_tpu.mapmerge import merge_maps

    if bool(args.cam) != bool(args.settings):
        ap.error("--cam and --settings must be given together")
    if args.cam and args.settings:
        from se2lam_tpu.config import SystemConfig

        cfg = SystemConfig.from_yaml(args.cam, args.settings)
    else:
        from run_dataset import synthetic_cfg

        cfg = synthetic_cfg()

    ms_a, _vocab_a, info_a = load_map(args.map_a)
    ms_b, _, info_b = load_map(args.map_b)
    print(f"A: {info_a['n_kf']} KFs; B: {info_b['n_kf']} KFs")

    # a fresh vocabulary is trained on the UNION of both maps (A's saved
    # vocabulary only covers A's environment; union words are what make
    # cross-map scores meaningful) — the merged map is saved with it
    merged, info = merge_maps(ms_a, ms_b, cfg)
    print(
        f"merged at pair A:{info['pair'][0]} B:{info['pair'][1]} "
        f"(BoW {info['bow_score']:.3f}, {info['align_inliers']} align "
        f"inliers, {info['mps_fused']} duplicate landmarks fused)"
    )
    os.makedirs(args.out, exist_ok=True)
    save_map(args.out, merged, info["vocab"])
    print(f"wrote {args.out}: {int(merged.n_kf)} KFs")


if __name__ == "__main__":
    main()
