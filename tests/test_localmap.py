"""Local-mapping stage tests: keyframe insertion with 3-way data
association (reference LocalMapper::addNewKF/findCorrespd,
src/LocalMapper.cpp:51-170), local-graph selection, and local BA
write-back correcting odometry noise."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se2lam_tpu import localmap, tracking
from se2lam_tpu.mapstate import empty_map
from se2lam_tpu.ops import se2

from synth_utils import feats_at, make_cfg, make_scene


def drive_frames(cfg, poses_gt, odo_readings, pts, bits, ms=None,
                 kf_frames=None):
    """Run tracking + KF insertion over a pose list. Returns (ms, kf list).

    ``kf_frames``: optional list, filled with the frame index each
    keyframe was inserted at (for ground-truth association)."""
    ms = empty_map(cfg.cap) if ms is None else ms
    f0 = feats_at(cfg, odo_readings[0], pts, bits)
    ms = localmap.insert_first_kf(
        ms, f0, jnp.asarray(odo_readings[0]), jnp.asarray(odo_readings[0])
    )
    view, mask = localmap.kf_track_seed(ms, 0)
    ts = tracking.init_track_state(
        f0, jnp.asarray(odo_readings[0]), jnp.asarray(odo_readings[0]), 0,
        view, mask,
    )
    kfs = [0]
    if kf_frames is not None:
        kf_frames.append(0)
    for i in range(1, len(poses_gt)):
        f = feats_at(cfg, poses_gt[i], pts, bits)
        ts, res = tracking.track_frame(
            ts, f, jnp.asarray(odo_readings[i]), jax.random.PRNGKey(i), cfg
        )
        if bool(res.need_kf) or i == len(poses_gt) - 1:
            ms, k = localmap.add_keyframe(
                ms, f, ts.cur_pose, jnp.asarray(odo_readings[i]),
                ts.ref_kf_idx, ts.match_idx, ts.local_mps,
                ts.local_mp_valid, ts.good_prl, ts.pre_meas, ts.pre_cov, cfg,
            )
            kfs.append(int(k))
            if kf_frames is not None:
                kf_frames.append(i)
            view, mask = localmap.kf_track_seed(ms, k)
            ts = tracking.init_track_state(
                f, ms.kf_pose[k], jnp.asarray(odo_readings[i]), k, view, mask
            )
    return ms, kfs


def motion_poses(n, step=(0.12, 0.1, 0.02)):
    poses = [np.zeros(3, np.float32)]
    for _ in range(n - 1):
        poses.append(
            np.asarray(
                se2.compose(jnp.asarray(poses[-1]), jnp.asarray(step)),
                np.float32,
            )
        )
    return poses


def test_keyframe_insertion_builds_map(rng):
    cfg = make_cfg()
    pts, bits = make_scene(rng)
    poses = motion_poses(9)
    ms, kfs = drive_frames(cfg, poses, poses, pts, bits)  # perfect odometry
    assert int(ms.n_kf) == len(kfs) >= 2
    n_mp = int(jnp.sum(ms.mp_valid))
    assert n_mp > 25
    # minted map points must be near ground truth (perfect odo → exact geometry)
    mp = np.asarray(ms.mp_pos)
    mv = np.asarray(ms.mp_valid)
    # each valid MP's main feature indexes the landmark (identity ordering)
    feat = np.asarray(ms.mp_main_feat)
    err = np.linalg.norm(mp[mv] - pts[feat[mv]], axis=1)
    assert np.median(err) < 0.15

    # observations are bidirectionally consistent
    obs_kf = np.asarray(ms.mp_obs_kf)
    obs_ft = np.asarray(ms.mp_obs_feat)
    kf_obs = np.asarray(ms.kf_obs_mp)
    n_obs = np.asarray(ms.mp_n_obs)
    for m in np.nonzero(mv)[0][:40]:
        for p in range(n_obs[m]):
            k, f = obs_kf[m, p], obs_ft[m, p]
            assert kf_obs[k, f] == m, (m, p, k, f, kf_obs[k, f])


def test_second_kf_inherits_observations(rng):
    cfg = make_cfg()
    pts, bits = make_scene(rng)
    poses = motion_poses(15)
    ms, kfs = drive_frames(cfg, poses, poses, pts, bits)
    assert len(kfs) >= 3
    # later KFs must observe MPs minted earlier (inheritance/projection)
    k_last = kfs[-1]
    obs = np.asarray(ms.kf_obs_mp[k_last])
    n_obs_last = (obs >= 0).sum()
    assert n_obs_last > 15
    # covisibility connects consecutive KFs
    covis = np.asarray(ms.covis)
    assert covis[kfs[-1], kfs[-2]]


def test_local_graph_masks(rng):
    cfg = make_cfg()
    pts, bits = make_scene(rng)
    poses = motion_poses(15)
    ms, kfs = drive_frames(cfg, poses, poses, pts, bits)
    loc, ref, mps = localmap.local_graph_masks(ms, jnp.asarray(kfs[-1]))
    loc, ref, mps = np.asarray(loc), np.asarray(ref), np.asarray(mps)
    assert loc[kfs[-1]]
    assert loc.sum() >= 2
    assert not (loc & ref).any()
    assert mps.sum() > 0


def test_local_ba_corrects_odo_noise(rng):
    """With noisy odometry, local BA must pull KF poses toward ground truth
    (the paper's core claim: vision corrects odometric drift)."""
    cfg = make_cfg(odo_x_noise=0.01, odo_y_noise=0.01, odo_t_noise=0.005)
    pts, bits = make_scene(rng, n=64, depth=(2.0, 6.0))
    poses = motion_poses(13, step=(0.15, 0.1, 0.03))
    # noisy odometry: perturb relative steps
    nrng = np.random.default_rng(3)
    odo = [poses[0]]
    for i in range(1, len(poses)):
        d = np.asarray(
            se2.minus(jnp.asarray(poses[i]), jnp.asarray(poses[i - 1]))
        )
        d = d + nrng.normal(0, [0.01, 0.01, 0.004])
        odo.append(
            np.asarray(
                se2.compose(jnp.asarray(odo[-1]), jnp.asarray(d, jnp.float32)),
                np.float32,
            )
        )
    kf_frames: list = []
    ms, kfs = drive_frames(cfg, poses, odo, pts, bits, kf_frames=kf_frames)
    assert len(kfs) >= 3
    k_last = kfs[-1]

    before = np.asarray(ms.kf_pose)
    ms2, info = localmap.run_local_ba(ms, jnp.asarray(k_last), cfg)
    after = np.asarray(ms2.kf_pose)
    assert np.isfinite(after).all()
    # chi2 must drop substantially when odometry disagrees with vision —
    # no escape hatch: a no-op solver (chi2 == chi2_init) must FAIL here
    assert float(info["chi2"]) < 0.9 * float(info["chi2_init"]), (
        f"BA did not reduce chi2: {info['chi2_init']} -> {info['chi2']}"
    )
    # and the keyframe POSES must move toward ground truth (the first KF
    # is gauge-fixed at the noisy odo origin, so compare xy error sums
    # over the non-fixed keyframes)
    gt_kf = np.asarray([poses[f] for f in kf_frames])
    err_before = np.linalg.norm(
        before[kfs][1:, :2] - gt_kf[1:, :2], axis=1
    ).sum()
    err_after = np.linalg.norm(
        after[kfs][1:, :2] - gt_kf[1:, :2], axis=1
    ).sum()
    assert err_after < err_before, (
        f"BA moved poses away from ground truth: {err_before} -> {err_after}"
    )


def test_ba_noop_on_consistent_map(rng):
    """Perfect odometry + exact projections: BA must not corrupt the map."""
    cfg = make_cfg()
    pts, bits = make_scene(rng)
    poses = motion_poses(9)
    ms, kfs = drive_frames(cfg, poses, poses, pts, bits)
    pose_before = np.asarray(ms.kf_pose[: len(kfs)])
    ms2, info = localmap.run_local_ba(ms, jnp.asarray(kfs[-1]), cfg)
    pose_after = np.asarray(ms2.kf_pose[: len(kfs)])
    assert np.abs(pose_after - pose_before).max() < 0.05
    assert np.isfinite(np.asarray(ms2.mp_pos)).all()
