"""Compare two trajectory files: association by id, SE(2)-aligned ATE.

The reference's comparable artifact is ``se2lam_kf_trajectory.txt``
(``idKF x y z yaw`` rows, /root/reference/src/OdoSLAM.cpp:199-214); the
Localizer writes per-frame CSV (``frame,x,y,theta``,
/root/reference/src/Localizer.cpp:178-193). This tool reads either
format (auto-detected), associates rows by their id column, and reports
translational ATE after the optimal SE(2) alignment (gauge freedom: a
monocular+odometry run is defined up to the initial frame's pose).

Usage:
    python examples/evaluate_ate.py EST_FILE REF_FILE [--no-align]
        [--plot out.png]

Prints one JSON line: {"ate_rmse": ..., "mean": ..., "max": ...,
"n_associated": ...} — so runs can be diffed mechanically.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_any(path: str) -> np.ndarray:
    """(n, 3) [id, x, y] from either trajectory format.

    5+ whitespace columns -> ``id x y z yaw`` (kf txt); comma rows ->
    ``frame,x,y,theta`` (frame CSV); 4 whitespace columns -> id x y theta.
    """
    ids, xy = [], []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            parts = ln.split(",") if "," in ln else ln.split()
            if len(parts) < 3:
                continue
            x, y = float(parts[1]), float(parts[2])
            # the Localizer CSV writes nan rows for untracked frames
            # (localizer.save_trajectory); they carry no position and
            # would poison the RMSE into NaN
            if not (np.isfinite(x) and np.isfinite(y)):
                continue
            ids.append(float(parts[0]))
            xy.append((x, y))
    if not ids:
        raise SystemExit(f"no trajectory rows in {path}")
    out = np.column_stack([np.asarray(ids), np.asarray(xy)])
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("est", help="estimated trajectory file")
    ap.add_argument("ref", help="reference/ground-truth trajectory file")
    ap.add_argument("--no-align", action="store_true",
                    help="skip the SE(2) alignment (shared-gauge files)")
    ap.add_argument("--plot", metavar="PNG",
                    help="write an overlay plot of the aligned paths")
    args = ap.parse_args()

    from se2lam_tpu.io import ate_se2

    est = load_any(args.est)
    ref = load_any(args.ref)
    # associate by id (the reference renumbers KFs on save; ids shared
    # between the two files are the comparable set)
    ref_by_id = {int(r[0]): r[1:3] for r in ref}
    pairs = [(e[1:3], ref_by_id[int(e[0])])
             for e in est if int(e[0]) in ref_by_id]
    if len(pairs) < 2:
        raise SystemExit(
            f"only {len(pairs)} shared ids between {args.est} and "
            f"{args.ref}; need >= 2 (association is by the id column)"
        )
    e_xy = np.asarray([p[0] for p in pairs])
    r_xy = np.asarray([p[1] for p in pairs])
    rmse, aligned = ate_se2(e_xy, r_xy, align=not args.no_align)
    err = np.linalg.norm(aligned - r_xy, axis=1)

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6))
        ax.plot(r_xy[:, 0], r_xy[:, 1], "-", color="0.4", label="reference")
        ax.plot(aligned[:, 0], aligned[:, 1], "-", color="tab:blue",
                label="estimate (aligned)")
        ax.set_aspect("equal")
        ax.legend()
        ax.set_title(f"ATE RMSE {rmse:.3f} m over {len(pairs)} poses")
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")

    print(json.dumps({
        "ate_rmse": round(rmse, 6),
        "mean": round(float(err.mean()), 6),
        "max": round(float(err.max()), 6),
        "n_associated": len(pairs),
    }))


if __name__ == "__main__":
    main()
