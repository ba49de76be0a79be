"""Pipelined per-frame feed (process_async) must reproduce process().

process_async dispatches tracking speculatively and resolves each
frame's control decisions ``pipeline_depth`` calls later, replaying the
in-flight frames whenever a resolve mutates tracking state (keyframe
insertion, loop-closure gauge re-base, capacity relief). The resolved
dispatch sequence is therefore IDENTICAL to the synchronous per-frame
path — same compiled program, same inputs, same PRNG splits — so
results must match bitwise, not just allclose. (The reference's pose
consumer is asynchronous the same way: getCurrentVehiclePose reads
whatever Track last published, src/OdoSLAM.cpp:60-73.)
"""
import numpy as np
import pytest

from se2lam_tpu.system import SlamSystem

from test_chunked import _cfg
from se2lam_tpu.io import SyntheticWorld


def _run_sync(cfg, frames, **kw):
    ref = SlamSystem(cfg, **kw)
    for img, odo in frames:
        ref.process(img, odo)
    return ref


def _run_pipelined(cfg, frames, depth, **kw):
    slam = SlamSystem(cfg, **kw)
    slam.pipeline_depth = depth
    returned = []
    for img, odo in frames:
        p = slam.process_async(img, odo)
        if p is not None:
            returned.append(np.asarray(p, np.float32))
    tail = slam.flush_async()
    returned.extend(np.asarray(t, np.float32) for t in tail)
    return slam, returned


@pytest.mark.parametrize("depth", [0, 1, 3])
def test_pipelined_matches_per_frame(depth):
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=4)
    frames = list(world.sequence(33, noise=(0.004, 0.002, 0.002)))

    ref = _run_sync(cfg, frames, enable_loops=False)
    pipe, returned = _run_pipelined(cfg, frames, depth, enable_loops=False)

    assert pipe.frame_id == ref.frame_id
    assert pipe.kf_frame_ids == ref.kf_frame_ids
    est_r = np.asarray([p for _, p in ref.trajectory], np.float32)
    est_p = np.asarray([p for _, p in pipe.trajectory], np.float32)
    np.testing.assert_array_equal(est_p, est_r)
    np.testing.assert_array_equal(
        np.asarray(pipe.ms.kf_pose), np.asarray(ref.ms.kf_pose)
    )
    # every fed frame's pose is eventually returned, in feed order
    # (bootstrap frames resolve immediately; the rest lag by depth)
    np.testing.assert_array_equal(
        np.asarray(returned, np.float32).reshape(-1, 3), est_r
    )


def test_pipelined_closes_loops_and_matches():
    """With the fused loop stage the resolve sequence still equals the
    sync path's (closures apply inside the insert dispatch in both
    modes), so trajectories match bitwise even across a loop closure."""
    cfg = _cfg().replace(
        gm_dcl_min_kfid_offset=8,
        # r5: gate 5 + a 28-frame revisit — the old 6/20-frame scenario
        # closed its loop with EXACTLY 6 MP matches, so any behavior-
        # preserving change that perturbs one association flipped this
        # test; the parity assertion only needs *a* closure, robustly
        gm_vcl_num_min_match_mp=5,
        gm_vcl_num_min_match_kp=15,
    )
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=4)
    lap = world.circle_trajectory(48)
    gt = np.concatenate([lap, lap[:28]])
    odo = world.odometry(gt, noise=(0.004, 0.002, 0.002), seed=3)
    frames = [(world.render(g), o) for g, o in zip(gt, odo)]

    ref = _run_sync(cfg, frames, enable_loops=True)
    pipe, _ = _run_pipelined(cfg, frames, 2, enable_loops=True)

    assert ref._loop_closer.n_loops_closed >= 1
    assert (pipe._loop_closer.n_loops_closed
            == ref._loop_closer.n_loops_closed)
    assert pipe.kf_frame_ids == ref.kf_frame_ids
    np.testing.assert_array_equal(
        np.asarray([p for _, p in pipe.trajectory], np.float32),
        np.asarray([p for _, p in ref.trajectory], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(pipe.corrected_trajectory()),
        np.asarray(ref.corrected_trajectory()),
    )


def test_pipelined_readers_drain():
    """State readers (current_pose, n_keyframes, kf_trajectory, ...)
    must resolve in-flight frames first — a reader mid-stream sees
    exactly what the synchronous path would have published."""
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=5)
    frames = list(world.sequence(14, noise=(0.004, 0.002, 0.002)))

    ref = _run_sync(cfg, frames, enable_loops=False)
    pipe = SlamSystem(cfg, enable_loops=False)
    pipe.pipeline_depth = 3
    for img, odo in frames:
        pipe.process_async(img, odo)
    assert len(pipe._pipe) > 0          # frames genuinely in flight
    assert pipe.n_keyframes() == ref.n_keyframes()
    assert not pipe._pipe               # the reader drained them
    np.testing.assert_array_equal(
        np.asarray(pipe.current_pose(), np.float32),
        np.asarray(ref.current_pose(), np.float32),
    )


def test_pipelined_mixes_with_sync_feed():
    """Interleaving process() and process_async() stays consistent:
    the sync call drains the pipeline before running."""
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=6)
    frames = list(world.sequence(16, noise=(0.004, 0.002, 0.002)))

    ref = _run_sync(cfg, frames, enable_loops=False)
    mix = SlamSystem(cfg, enable_loops=False)
    mix.pipeline_depth = 2
    for i, (img, odo) in enumerate(frames):
        if i % 5 == 4:
            mix.process(img, odo)
        else:
            mix.process_async(img, odo)
    mix.flush_async()
    assert mix.kf_frame_ids == ref.kf_frame_ids
    np.testing.assert_array_equal(
        np.asarray([p for _, p in mix.trajectory], np.float32),
        np.asarray([p for _, p in ref.trajectory], np.float32),
    )
