"""Bank-scale system soak: drive the live system to >=200 keyframes
with forced pruning/compaction, vocabulary retrains, and >=10 loop
closures, then assert the structural invariants hold (VERDICT r4 #7).

The loop tests top out at K<=64; this exercises the regime where
capacity pressure (KF and MP watermarks), ftr-edge slots, and the
auto-scaled vocabulary all actually engage.

Asserted at the end:
  - forward/inverse observation-table consistency (vectorized version
    of tests/test_prune.check_consistency)
  - >=10 verified loop closures, >=200 keyframe insertions
  - per-KF host pulls of the loop stage bounded (<=2, the r4 budget)
  - ftr-edge slots not exhausted
  - corrected ATE bounded by raw odometry ATE

Run (CPU, ~20-40 min):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python examples/soak_bank_scale.py --out artifacts/soak_r5
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from study_drift import build_cfg  # noqa: E402


def check_consistency_fast(ms):
    """Vectorized forward<->inverse observation-table check."""
    obs_kf = np.asarray(ms.mp_obs_kf)
    obs_ft = np.asarray(ms.mp_obs_feat)
    kf_obs = np.asarray(ms.kf_obs_mp)
    n_obs = np.asarray(ms.mp_n_obs)
    mv = np.asarray(ms.mp_valid)
    kv = np.asarray(ms.kf_valid)
    M, P = obs_kf.shape
    # inverse -> forward
    pidx = np.arange(P)[None, :]
    live = mv[:, None] & (pidx < n_obs[:, None])
    k = np.where(live, obs_kf, 0)
    f = np.where(live, obs_ft, 0)
    assert np.all(~live | (obs_kf >= 0)), "negative observer in live row"
    assert np.all(~live | kv[k]), "observer KF invalid"
    fwd = kf_obs[k, f]
    assert np.all(~live | (fwd == np.arange(M)[:, None])), (
        "inverse entry without matching forward pointer")
    # forward -> inverse
    ks, fs = np.nonzero((kf_obs >= 0) & kv[:, None])
    ms_ = kf_obs[ks, fs]
    assert np.all(mv[ms_]), "forward pointer to invalid MP"
    hit = (obs_kf[ms_] == ks[:, None]) & (obs_ft[ms_] == fs[:, None]) & (
        np.arange(P)[None, :] < n_obs[ms_][:, None])
    assert np.all(hit.any(axis=1)), "forward pointer not in inverse list"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=int, default=14)
    ap.add_argument("--frames-per-lap", type=int, default=90)
    ap.add_argument("--noise", type=float, nargs=3,
                    default=(0.006, 0.003, 0.003))
    ap.add_argument("--out", default="artifacts/soak_r5")
    args = ap.parse_args()

    from se2lam_tpu.io import SyntheticWorld, ate_se2
    from se2lam_tpu.mapstate import MAX_FTR_EDGES
    from se2lam_tpu.system import SlamSystem

    # force high KF rate + capacity pressure: max_kfs=128 while ~300
    # insertions arrive; MP watermark engages likewise
    cfg = build_cfg(odo_noise=tuple(args.noise))
    cfg = cfg.replace(min_frames_between_kf=2, max_frames_between_kf=4)
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    # alternate two radii so revisits produce genuine loop closures on
    # both rings
    lap_a = world.circle_trajectory(args.frames_per_lap, radius=2.5)
    lap_b = world.circle_trajectory(args.frames_per_lap, radius=2.0)
    laps = []
    for i in range(args.laps):
        laps.append(lap_a if i % 3 != 2 else lap_b)
    gt = np.concatenate(laps)
    odo = world.odometry(gt, noise=tuple(args.noise), seed=3)

    slam = SlamSystem(cfg, enable_loops=True)
    slam.log_ba = True
    lc = slam._loop_closer
    t0 = time.time()
    max_pulls = 0
    n_inserts = 0
    last_nkf_list = 0
    for i in range(len(gt)):
        slam.process(world.render(gt[i]), odo[i])
        if len(slam.ba_log) > n_inserts:
            n_inserts = len(slam.ba_log)
            max_pulls = max(max_pulls, getattr(lc, "last_kf_pulls", 0))
        if i % 100 == 99:
            print(f"f{i + 1}/{len(gt)} kfs={slam.n_keyframes()} "
                  f"mps={slam.n_map_points()} "
                  f"loops={lc.n_loops_closed} "
                  f"inserts={n_inserts} "
                  f"kf_compactions={slam.capacity_compactions} "
                  f"mp_compactions={slam.mp_compactions} "
                  f"vocab_retrains={lc.n_vocab_trainings} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    slam._finish_loop_pending()

    ms = slam.ms
    check_consistency_fast(ms)
    n_ftr = int(np.sum(np.asarray(ms.ftr_valid)))
    live = np.asarray([p for _, p in slam.trajectory])
    corr = slam.corrected_trajectory()[:, 1:]
    from se2lam_tpu.io import ate_se2 as _ate
    ate_live, _ = _ate(live[:, :2], gt[: len(live), :2])
    ate_corr, _ = _ate(corr[:, :2], gt[: len(corr), :2])
    ate_odo, _ = _ate(odo[:, :2], gt[:, :2])

    report = {
        "frames": int(len(gt)),
        "kf_insertions": int(n_inserts),
        "final_kfs": int(slam.n_keyframes()),
        "final_mps": int(slam.n_map_points()),
        "loops_closed": int(lc.n_loops_closed),
        "renewal_gbas": int(lc.n_renewal_gbas),
        "vocab_trainings": int(lc.n_vocab_trainings),
        "kf_compactions": int(slam.capacity_compactions),
        "mp_compactions": int(slam.mp_compactions),
        "max_loop_stage_pulls_per_kf": int(max_pulls),
        "ftr_edges_used": n_ftr,
        "ftr_edges_cap": int(MAX_FTR_EDGES),
        "ate_live": round(float(ate_live), 4),
        "ate_corrected": round(float(ate_corr), 4),
        "ate_odo": round(float(ate_odo), 4),
        "wall_s": round(time.time() - t0, 1),
        "consistency": "ok",
    }
    print(json.dumps(report, indent=1), flush=True)

    assert n_inserts >= 200, f"only {n_inserts} KF insertions"
    assert lc.n_loops_closed >= 10, f"only {lc.n_loops_closed} closures"
    assert max_pulls <= 2, f"loop stage pulled {max_pulls}x for one KF"
    assert n_ftr < MAX_FTR_EDGES, "ftr-edge slots exhausted"
    assert ate_corr <= max(ate_odo, 0.5), (
        f"corrected ATE {ate_corr} unbounded vs odo {ate_odo}")
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "soak.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"SOAK OK -> {args.out}/soak.json")


if __name__ == "__main__":
    main()
