"""Loop closure at the reference's UNTOUCHED GlobalMapper gates.

The reference ships with GM_VCL_NumMinMatchMP=15, GM_VCL_NumMinMatchKP=30,
GM_VCL_RatioMinMatchMP=0.05, GM_DCL_MinKFidOffset=20 and
GM_DCL_MinScoreBest=0.005 (src/Config.cpp:76-81), calibrated for ~1000
features on 640x480 frames. Every other loop test in this suite scales the
gates down to its small scene; THIS one runs the full detect -> verify ->
merge -> global-BA stack at reference scale with the defaults untouched,
so CI fails if the loop stack regresses at the settings the reference
actually uses."""
import numpy as np

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.io import SyntheticWorld, ate_se2
from se2lam_tpu.system import SlamSystem

from synth_utils import TCB


def test_loop_closes_at_reference_gates():
    from se2lam_tpu.frontend.orb import OrbConfig

    oc = OrbConfig(height=480, width=640, n_features=1000,
                   scale_factor=1.2, n_levels=3)
    cfg = SystemConfig(
        width=640, height=480, fx=520.0, fy=520.0, cx=320.0, cy=240.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=1000, max_level=3, scale_factor=1.2,
        # KF cadence adapted to the short synthetic feed; NO gm_* override
        min_frames_between_kf=2, max_frames_between_kf=8,
        local_iter=6,
        cap=Capacity(
            n_features=oc.n_slots, max_kfs=64, max_mps=8192,
            local_kfs=8, local_ref_kfs=8, local_mps=1024,
            ransac_trials=64,
        ),
    )
    # the defaults ARE the reference values — assert, don't assume
    assert cfg.gm_vcl_num_min_match_mp == 15
    assert cfg.gm_vcl_num_min_match_kp == 30
    assert cfg.gm_vcl_ratio_min_match_mp == 0.05
    assert cfg.gm_dcl_min_kfid_offset == 20
    assert cfg.gm_dcl_min_score_best == 0.005

    world = SyntheticWorld(cfg, n_landmarks=1200, room=10.0, seed=4)
    slam = SlamSystem(cfg, enable_loops=True)
    lap = world.circle_trajectory(72)
    gt2 = np.concatenate([lap, lap[:24]])        # one lap + revisit
    odo = world.odometry(gt2, noise=(0.004, 0.002, 0.002), seed=3)
    for i in range(len(gt2)):
        slam.process(world.render(gt2[i]), odo[i])

    assert slam._loop_closer.n_loops_closed >= 1, (
        "no loop closed at reference-default gates"
    )
    est = np.asarray([p for _, p in slam.trajectory])
    assert np.isfinite(est).all()
    rmse, _ = ate_se2(est[:, :2], gt2[: len(est), :2])
    assert rmse < 0.4, f"ATE {rmse}"
