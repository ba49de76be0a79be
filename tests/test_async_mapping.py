"""Deferred (async) loop-closing must match the synchronous pipeline.

async_mapping=True (the default) overlaps the loop stage with tracking:
detection is dispatched at keyframe insertion without waiting, its gate
scalars ride later control pulls, and a verified closure applies
retroactively with a gauge re-base of the live tracking state — the
TPU-native analog of the reference's Track ∥ GlobalMapper thread
concurrency (src/OdoSLAM.cpp:142-150; LocalMapper/Track never wait for
GlobalBA either). The OBSERVABLE results — keyframe poses, loop count,
map, corrected trajectory — must match running the same stages
synchronously; only live poses inside a closure→apply window may differ
(they are published in the pre-closure gauge, exactly like the
reference's live poses before GlobalBA writes back).
"""
import numpy as np

from test_dist_system import _world_cfg


def _feed(slam, world, gt, odo, chunk=0):
    if chunk:
        for i in range(0, len(gt), chunk):
            imgs = [world.render(g) for g in gt[i:i + chunk]]
            slam.process_chunk(imgs, odo[i:i + chunk])
    else:
        for i in range(len(gt)):
            slam.process(world.render(gt[i]), odo[i])
    return slam


def test_fused_loop_stage_matches_sync_driver():
    """The fused single-dispatch loop stage (async_mapping default,
    loopclose.loop_stage — detect/verify/gates/closure all traced, zero
    host pulls) vs the staged synchronous driver (on_new_kf). The two
    consume different RNG streams (the fused program splits a key every
    keyframe and verifies a fixed-width batch; the staged driver splits
    only when candidates exist), so parity is SEMANTIC: same keyframes,
    loops close in both, both beat odometry, trajectories agree to
    loop-closure-realization tolerance."""
    from se2lam_tpu.io import SyntheticWorld, ate_se2
    from se2lam_tpu.system import SlamSystem

    cfg = _world_cfg()
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    lap = world.circle_trajectory(90)
    gt = np.concatenate([lap, lap])[:126]
    odo = world.odometry(gt, noise=(0.012, 0.006, 0.006), seed=3)

    sync = _feed(SlamSystem(cfg, async_mapping=False), world, gt, odo)
    fusd = _feed(SlamSystem(cfg), world, gt, odo)   # default: fused

    assert sync._loop_closer.n_loops_closed >= 1
    assert fusd._loop_closer.n_loops_closed >= 1
    assert fusd._loop_closer.last_kf_pulls == 0, (
        "the fused loop stage must not pull on the hot path"
    )
    corr_s = sync.corrected_trajectory()
    corr_f = fusd.corrected_trajectory()
    assert fusd.kf_frame_ids == sync.kf_frame_ids

    ate_f, _ = ate_se2(corr_f[:, 1:3], gt[: len(corr_f), :2])
    ate_s, _ = ate_se2(corr_s[:, 1:3], gt[: len(corr_s), :2])
    ate_o, _ = ate_se2(odo[:, :2], gt[:, :2])
    assert ate_f < ate_o and ate_s < ate_o
    assert abs(ate_f - ate_s) < 0.03, (ate_f, ate_s)


def test_async_mapping_chunked_matches_per_frame_corrected():
    """Chunked async: closures may apply several frames late (segment
    granularity), but the retro-corrected trajectory and map must still
    match the per-frame async run."""
    from se2lam_tpu.io import SyntheticWorld
    from se2lam_tpu.system import SlamSystem

    cfg = _world_cfg()
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    lap = world.circle_trajectory(90)
    gt = np.concatenate([lap, lap])[:112]
    odo = world.odometry(gt, noise=(0.012, 0.006, 0.006), seed=3)

    pf = _feed(SlamSystem(cfg), world, gt, odo)
    ck = _feed(SlamSystem(cfg), world, gt, odo, chunk=8)

    assert pf._loop_closer.n_loops_closed >= 1
    assert (
        ck._loop_closer.n_loops_closed == pf._loop_closer.n_loops_closed
    )
    assert ck.kf_frame_ids == pf.kf_frame_ids
    np.testing.assert_allclose(
        np.asarray(ck.ms.kf_pose), np.asarray(pf.ms.kf_pose), atol=1e-4
    )
    np.testing.assert_allclose(
        ck.corrected_trajectory(), pf.corrected_trajectory(), atol=1e-4
    )
