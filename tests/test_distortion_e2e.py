"""End-to-end SLAM under lens distortion: the synthetic world renders
through the radial-tangential model and the system's keypoint
undistortion (the cv::undistort replacement, ops/camera.py) must keep
the geometry consistent."""
import numpy as np

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.frontend.orb import OrbConfig
from se2lam_tpu.io import SyntheticWorld, ate_se2
from se2lam_tpu.system import SlamSystem

from synth_utils import TCB


def test_slam_with_distortion():
    oc = OrbConfig(height=240, width=320, n_features=256,
                   scale_factor=1.2, n_levels=2)
    cfg = SystemConfig(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        dist=(-0.25, 0.08, 0.0005, -0.0005, 0.0),   # noticeable barrel
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=256, max_level=2,
        min_frames_between_kf=2, max_frames_between_kf=8, local_iter=6,
        cap=Capacity(n_features=oc.n_slots, max_kfs=64, max_mps=4096,
                     local_kfs=8, local_ref_kfs=8, local_mps=512,
                     ransac_trials=64),
    )
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    slam = SlamSystem(cfg, enable_loops=False)
    assert slam._undistort
    n = 36
    for img, odo in world.sequence(n, noise=(0.002, 0.001, 0.001)):
        slam.process(img, odo)

    assert slam.n_keyframes() >= 3
    assert slam.n_map_points() > 40
    est = np.asarray([p for _, p in slam.trajectory])
    rmse, _ = ate_se2(est[:, :2], world.gt[: len(est), :2])
    assert rmse < 0.3, f"ATE {rmse} under distortion"


def test_resume_with_loops_enabled(tmp_path):
    """Resume + loop closer active: the closer may immediately tie the
    seed into the old graph; everything must stay finite and consistent."""
    from se2lam_tpu.io import save_map
    from se2lam_tpu.vocab import train_vocab

    oc = OrbConfig(height=240, width=320, n_features=256,
                   scale_factor=1.2, n_levels=2)
    cfg = SystemConfig(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=256, max_level=2,
        min_frames_between_kf=2, max_frames_between_kf=8, local_iter=6,
        gm_dcl_min_kfid_offset=8, gm_vcl_num_min_match_mp=6,
        gm_vcl_num_min_match_kp=15,
        cap=Capacity(n_features=oc.n_slots, max_kfs=64, max_mps=4096,
                     local_kfs=8, local_ref_kfs=8, local_mps=512,
                     ransac_trials=64),
    )
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    slam = SlamSystem(cfg, enable_loops=False)
    for img, odo in world.sequence(50, noise=(0.001, 0.001, 0.0005)):
        slam.process(img, odo)
    desc = slam.ms.kf_desc.reshape(-1, 256)
    valid = (slam.ms.kf_feat_valid & slam.ms.kf_valid[:, None]).reshape(-1)
    path = str(tmp_path / "map")
    save_map(path, slam.ms, train_vocab(desc, valid, n_words=256, iters=5))

    slam2 = SlamSystem.resume(cfg, path, enable_loops=True)
    gt = world.circle_trajectory(60)
    odo = world.odometry(gt, noise=(0.002, 0.001, 0.001), seed=9)
    for i in range(15, 35):
        slam2.process(world.render(gt[i]), odo[i])
    assert np.isfinite(np.asarray(slam2.ms.kf_pose)).all()
    assert np.isfinite(np.asarray(slam2.ms.mp_pos)).all()
    assert slam2.n_keyframes() > 0
    from test_prune import check_consistency

    check_consistency(slam2.ms)
