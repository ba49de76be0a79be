"""End-to-end system tests: SlamSystem on the synthetic rover world with
the real ORB extraction path (the analog of the reference's test_vn demo
run, validated numerically via SE(2)-aligned ATE instead of by eye)."""
import numpy as np
import pytest

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.io import SyntheticWorld, ate_se2
from se2lam_tpu.system import SlamSystem

from synth_utils import TCB


def small_cfg(n_feats):
    return SystemConfig(
        width=320, height=240,
        fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=n_feats, max_level=2, scale_factor=1.2,
        min_frames_between_kf=2, max_frames_between_kf=8,
        local_iter=6,
        cap=Capacity(
            n_features=n_feats, max_kfs=32, max_mps=2048,
            local_kfs=8, local_ref_kfs=8, local_mps=512,
            ransac_trials=64,
        ),
    )


@pytest.fixture(scope="module")
def run_result():
    cfg0 = small_cfg(256)
    # OrbConfig rounds per-level quotas; align capacity with actual slots
    from se2lam_tpu.frontend.orb import OrbConfig

    oc = OrbConfig(
        height=cfg0.height, width=cfg0.width, n_features=256,
        scale_factor=cfg0.scale_factor, n_levels=cfg0.max_level,
    )
    cfg = cfg0.replace(
        cap=Capacity(
            n_features=oc.n_slots, max_kfs=32, max_mps=2048,
            local_kfs=8, local_ref_kfs=8, local_mps=512, ransac_trials=64,
        )
    )
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=4)
    slam = SlamSystem(cfg, enable_loops=False)
    n_frames = 40
    for img, odo in world.sequence(n_frames, noise=(0.004, 0.002, 0.002)):
        slam.process(img, odo)
    return slam, world, n_frames


def test_pipeline_runs_and_builds_map(run_result):
    slam, world, n = run_result
    assert slam.frame_id == n
    assert slam.n_keyframes() >= 3
    assert slam.n_map_points() > 50
    for _, p in slam.trajectory:
        assert np.isfinite(p).all()


def test_ate_bounded(run_result):
    """SLAM trajectory must stay near ground truth — the numeric stand-in
    for the reference's 'looks right in rviz'. Measured ATE for this
    fixture is ~0.11 m in a 10 m room; the bound is 2x that, so CI fails
    on any real accuracy regression (the old 0.5 m bound would have let a
    ~5x regression through)."""
    slam, world, n = run_result
    est = np.asarray([p for _, p in slam.trajectory])
    rmse, _ = ate_se2(est[:, :2], world.gt[: len(est), :2])
    assert rmse < 0.2, f"ATE {rmse}"


def test_loop_closes_on_revisit():
    """Second lap over the same circle must fire the loop closer on the
    real rendered-image path (BoW detect → RANSAC verify → global BA)."""
    from se2lam_tpu.frontend.orb import OrbConfig

    cfg0 = small_cfg(256)
    oc = OrbConfig(
        height=cfg0.height, width=cfg0.width, n_features=256,
        scale_factor=cfg0.scale_factor, n_levels=cfg0.max_level,
    )
    cfg = cfg0.replace(
        # gates scaled to this 256-feature test scene (the reference
        # defaults assume ~1000 features)
        gm_dcl_min_kfid_offset=8,
        gm_vcl_num_min_match_mp=6,
        gm_vcl_num_min_match_kp=15,
        cap=Capacity(
            n_features=oc.n_slots, max_kfs=64, max_mps=4096,
            local_kfs=8, local_ref_kfs=8, local_mps=512, ransac_trials=64,
        ),
    )
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    slam = SlamSystem(cfg, enable_loops=True)
    gt = world.circle_trajectory(90)
    gt2 = np.concatenate([gt, gt[:45]])          # 1½ laps
    odo = world.odometry(gt2, noise=(0.004, 0.002, 0.002), seed=3)
    for i in range(len(gt2)):
        slam.process(world.render(gt2[i]), odo[i])
    assert slam._loop_closer.n_loops_closed >= 1
    est = np.asarray([p for _, p in slam.trajectory])
    from se2lam_tpu.io import ate_se2

    rmse, _ = ate_se2(est[:, :2], gt2[: len(est), :2])
    assert rmse < 0.5
    assert np.isfinite(np.asarray(slam.ms.kf_pose)).all()


def test_reference_named_api(run_result, tmp_path):
    """The OdoSLAM-named compatibility surface must exist and work
    (include/se2lam/OdoSLAM.h:27-59)."""
    slam, world, n = run_result
    p = slam.get_current_vehicle_pose()
    assert p.shape == (3,)
    slam.request_finish()
    slam.wait_for_finish()
    out = tmp_path / "saved"
    slam.save_map(str(out))
    from se2lam_tpu.io import load_map, load_trajectory

    ms, vocab, info = load_map(str(out))
    assert info["n_kf"] == slam.n_keyframes()
    assert vocab is not None           # trained at save time
    rows = load_trajectory(str(out / "se2lam_kf_trajectory.txt"))
    assert rows.shape[0] >= 1

    # split-feed aliases
    from se2lam_tpu.system import SlamSystem

    s2 = SlamSystem(slam.cfg, enable_loops=False)
    img, odo = next(iter(world.sequence(1)))
    s2.receive_odo_data(*odo)
    s2.receive_img_data(img)
    assert s2.frame_id == 1


def test_corrected_trajectory(run_result):
    """Retro-corrected per-frame poses re-anchor on the CURRENT keyframe
    estimates: at each keyframe's own frame the corrected pose must equal
    that keyframe's pose exactly."""
    slam, world, n = run_result
    corr = slam.corrected_trajectory()
    assert corr.shape == (n, 4)
    assert np.isfinite(corr).all()
    kf_pose = np.asarray(slam.ms.kf_pose)
    by_fid = {int(r[0]): r[1:] for r in corr}
    for slot, fid in enumerate(slam.kf_frame_ids):
        if not bool(slam.ms.kf_valid[slot]):
            continue
        np.testing.assert_allclose(
            by_fid[fid], kf_pose[slot], atol=1e-5
        )


def test_kf_trajectory_format(run_result, tmp_path):
    slam, world, n = run_result
    path = tmp_path / "kf_traj.txt"
    slam.save_kf_trajectory(str(path))
    from se2lam_tpu.io import load_trajectory

    rows = load_trajectory(str(path))
    assert rows.shape[0] == slam.n_keyframes()
    assert rows.shape[1] == 5
    assert (rows[:, 3] == 0).all()  # planar: z = 0


def test_np_se2_helpers_inverse(rng):
    """_np_se2_compose must be the exact inverse of _np_se2_minus: every
    host-side anchor site shares these two helpers, and retro-corrected
    trajectories are exact only while that inverse relation holds."""
    from se2lam_tpu.system import _np_se2_compose, _np_se2_minus

    for _ in range(20):
        ref = rng.uniform(-5, 5, 3).astype(np.float32)
        pose = rng.uniform(-5, 5, 3).astype(np.float32)
        rel = _np_se2_minus(pose, ref)
        back = _np_se2_compose(ref, rel)
        np.testing.assert_allclose(back[:2], pose[:2], atol=1e-4)
        dt = np.arctan2(np.sin(back[2] - pose[2]), np.cos(back[2] - pose[2]))
        assert abs(dt) < 1e-5
