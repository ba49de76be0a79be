"""DatasetRoom on-disk pipeline, end to end in ONE chain:

    render → BMP files + odo_raw.txt + CamConfig.yml/Settings.yml
    → SystemConfig.from_yaml → DatasetRoom (native C++ decoder when
    available) → SlamSystem → kf-trajectory txt → ATE.

This is the reference's de-facto integration test (test_vn reading
DatasetRoom, test/test_vn.cpp:33-55, writing se2lam_kf_trajectory.txt,
src/OdoSLAM.cpp:199-214) — validated numerically instead of by eye."""
import os

import numpy as np

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.io import (
    DatasetRoom,
    SyntheticWorld,
    ate_se2,
    load_trajectory,
    write_dataset_room,
)
from se2lam_tpu.system import SlamSystem

from synth_utils import TCB


def _render_cfg():
    from se2lam_tpu.frontend.orb import OrbConfig

    oc = OrbConfig(height=240, width=320, n_features=256,
                   scale_factor=1.2, n_levels=2)
    return SystemConfig(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=256, max_level=2, scale_factor=1.2,
        fps=9,          # from_yaml derives KF cadence from fps (9//3 = 3)
        local_iter=6,
        cap=Capacity(
            n_features=oc.n_slots, max_kfs=32, max_mps=2048,
            local_kfs=8, local_ref_kfs=8, local_mps=512, ransac_trials=64,
        ),
    )


def test_dataset_room_disk_pipeline(tmp_path):
    gen_cfg = _render_cfg()
    world = SyntheticWorld(gen_cfg, n_landmarks=500, room=10.0, seed=4)
    n = 36
    gt = world.circle_trajectory(n * 2)[:n]          # two-thirds of a lap
    odo = world.odometry(gt, noise=(0.003, 0.002, 0.002), seed=3)
    frames = (world.render(gt[i]) for i in range(n))

    root = write_dataset_room(str(tmp_path), frames, odo, gen_cfg)
    assert os.path.exists(os.path.join(root, "image", "0.bmp"))
    assert os.path.exists(os.path.join(root, "odo_raw.txt"))

    # the reference read path: YAMLs parsed with the reference key names
    cfg = SystemConfig.from_yaml(
        os.path.join(str(tmp_path), "CamConfig.yml"),
        os.path.join(str(tmp_path), "Settings.yml"),
    )
    assert cfg.width == gen_cfg.width and cfg.fx == gen_cfg.fx
    assert cfg.scale_factor == gen_cfg.scale_factor   # scale_facotr [sic]
    assert cfg.max_feature_num == gen_cfg.max_feature_num
    np.testing.assert_allclose(
        np.asarray(cfg.Tbc_mat), np.asarray(gen_cfg.Tbc_mat), atol=1e-9
    )

    ds = DatasetRoom(root)
    assert len(ds) == n

    slam = SlamSystem(cfg, enable_loops=False)
    n_fed = 0
    for img, od in ds:
        assert img.shape == (cfg.height, cfg.width)
        slam.process(img, od)
        n_fed += 1
    assert n_fed == n
    assert slam.n_keyframes() >= 3 and slam.n_map_points() > 50

    traj_txt = tmp_path / "se2lam_kf_trajectory.txt"
    slam.save_kf_trajectory(str(traj_txt))
    rows = load_trajectory(str(traj_txt))
    assert rows.shape[1] == 5 and rows.shape[0] == slam.n_keyframes()

    # ATE of the keyframe trajectory against ground truth at KF frames
    kf_xy = rows[:, 1:3]
    gt_xy = gt[[min(f, n - 1) for f in slam.kf_frame_ids], :2]
    rmse, _ = ate_se2(kf_xy, gt_xy)
    assert rmse < 0.3, f"ATE {rmse}"


def test_dataset_room_native_and_pil_agree(tmp_path):
    """The native BMP decode path and the PIL path must produce the same
    pixels for the written dataset."""
    import pytest

    from se2lam_tpu.io.native_loader import native_available

    if not native_available():
        pytest.skip("no native toolchain")
    gen_cfg = _render_cfg()
    world = SyntheticWorld(gen_cfg, n_landmarks=200, room=10.0, seed=1)
    frames = [world.render(world.circle_trajectory(8)[i]) for i in range(4)]
    odo = world.circle_trajectory(8)[:4]
    root = write_dataset_room(str(tmp_path), frames, odo, gen_cfg)
    a = [img for img, _ in DatasetRoom(root, use_native=True)]
    b = [img for img, _ in DatasetRoom(root, use_native=False)]
    assert len(a) == len(b) == 4
    for x, y in zip(a, b):
        # identical pixels up to float conversion rounding (the native
        # decoder scales palettized samples in f32)
        np.testing.assert_allclose(x, y, atol=1e-3)
