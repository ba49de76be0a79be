"""End-to-end distributed mapping: the live SlamSystem on a device mesh.

The round-3 state had proven distributed *solvers* but no way to run the
*system* on a mesh (VERDICT r3 #1). Here the same revisit-lap session
runs once single-device and once with SlamSystem(mesh=8 CPU devices) —
where loop detection scores a KF-sharded BoW bank, GlobalBA solves the
pose graph with edges sharded (matrix-free PCG), and the joint full-map
GBA runs map-block partitioned (parallel/{dist_loop,dist_posegraph,
dist_ba}.py). The distributed session must close loops and land within
tolerance of the single-device trajectory (parity is ATE-bound: the PCG
and the re-bucketed Schur accumulation sum in different orders, so
bit-equality is not expected).

Reference being distributed: the whole wired pipeline
src/OdoSLAM.cpp:75-157 + GlobalMapper thread src/GlobalMapper.cpp:66-535.
"""
import numpy as np


def _world_cfg():
    from se2lam_tpu.config import Capacity, SystemConfig
    from se2lam_tpu.frontend.orb import OrbConfig

    TCB = np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0.6], [1, 0, 0, 0], [0, 0, 0, 1]],
        np.float64,
    )
    cfg0 = SystemConfig(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=256, max_level=2, scale_factor=1.2,
        min_frames_between_kf=2, max_frames_between_kf=8, local_iter=6,
        gm_joint_ba_iters=3,
        # gates scaled to the 256-feature scene (reference defaults
        # assume ~1000 features; untouched-defaults coverage lives in
        # tests/test_loop_reference_gates.py)
        gm_dcl_min_kfid_offset=8,
        gm_vcl_num_min_match_mp=6,
        gm_vcl_num_min_match_kp=15,
    )
    oc = OrbConfig(
        height=240, width=320, n_features=256,
        scale_factor=1.2, n_levels=2,
    )
    return cfg0.replace(
        cap=Capacity(
            n_features=oc.n_slots, max_kfs=64, max_mps=4096,
            local_kfs=8, local_ref_kfs=8, local_mps=512,
            ransac_trials=64,
        )
    )


def _run_session(cfg, world, gt, odo, mesh):
    from se2lam_tpu.io import ate_se2
    from se2lam_tpu.system import SlamSystem

    slam = SlamSystem(cfg, enable_loops=True, mesh=mesh)
    for i in range(len(gt)):
        slam.process(world.render(gt[i]), odo[i])
    corr = slam.corrected_trajectory()[:, 1:]
    ate, _ = ate_se2(corr[:, :2], gt[: len(corr), :2])
    return slam, float(ate)


def test_distributed_system_matches_single_device():
    import jax

    from se2lam_tpu.io import SyntheticWorld, ate_se2
    from se2lam_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg = _world_cfg()
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    lap = world.circle_trajectory(90)
    gt = np.concatenate([lap, lap])[:126]
    odo = world.odometry(gt, noise=(0.012, 0.006, 0.006), seed=3)
    ate_odo, _ = ate_se2(odo[:, :2], gt[:, :2])

    slam_1, ate_1 = _run_session(cfg, world, gt, odo, mesh=None)
    mesh = make_mesh(8)
    slam_8, ate_8 = _run_session(cfg, world, gt, odo, mesh=mesh)

    lc1, lc8 = slam_1._loop_closer, slam_8._loop_closer
    assert not lc1._dist and lc8._dist
    # the distributed paths actually ran: at least one closure fired on
    # the mesh session (detect + GlobalBA + joint GBA all routed)
    assert lc1.n_loops_closed >= 1
    assert lc8.n_loops_closed >= 1
    # the sharded bank really is sharded across the mesh
    assert len(lc8.bank.sharding.device_set) == 8

    # both beat raw odometry, and they agree to tolerance
    assert ate_1 < ate_odo, (ate_1, ate_odo)
    assert ate_8 < ate_odo, (ate_8, ate_odo)
    assert abs(ate_8 - ate_1) < 0.02, (ate_1, ate_8)


def test_distributed_pipelined_feed_matches_per_frame():
    """The pipelined feed (process_async) over the MESH path: the
    staged loop machine's gate scalars ride the pipelined control pulls
    (prefetched at stage dispatch) and a closure's gauge re-base
    triggers an in-flight replay — the resolved sequence must equal the
    synchronous per-frame mesh session's."""
    import jax

    from se2lam_tpu.io import SyntheticWorld
    from se2lam_tpu.parallel import make_mesh
    from se2lam_tpu.system import SlamSystem

    assert len(jax.devices()) >= 8
    cfg = _world_cfg()
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    lap = world.circle_trajectory(90)
    gt = np.concatenate([lap, lap])[:110]
    odo = world.odometry(gt, noise=(0.012, 0.006, 0.006), seed=3)
    frames = [world.render(g) for g in gt]
    mesh = make_mesh(8)

    ref = SlamSystem(cfg, enable_loops=True, mesh=mesh)
    for img, o in zip(frames, odo):
        ref.process(img, o)

    pip = SlamSystem(cfg, enable_loops=True, mesh=mesh)
    pip.pipeline_depth = 3
    for img, o in zip(frames, odo):
        pip.process_async(img, o)
    pip.flush_async()

    assert ref._loop_closer.n_loops_closed >= 1
    assert (pip._loop_closer.n_loops_closed
            == ref._loop_closer.n_loops_closed)
    assert pip.kf_frame_ids == ref.kf_frame_ids
    np.testing.assert_allclose(
        np.asarray([p for _, p in pip.trajectory], np.float32),
        np.asarray([p for _, p in ref.trajectory], np.float32),
        atol=1e-5,
    )
