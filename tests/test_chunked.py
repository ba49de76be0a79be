"""Chunked speculative tracking must reproduce the per-frame pipeline.

process_chunk scans k frames per dispatch and replays the tail of a
chunk whenever a keyframe fires mid-chunk, so its OBSERVABLE behavior —
trajectory, keyframe set, map — must match feeding the same frames one
at a time through process(). (The reference has no such mode; this is
the sync-amortized serving path, see SlamSystem.process_chunk.)
"""
import numpy as np

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.io import SyntheticWorld
from se2lam_tpu.system import SlamSystem

from synth_utils import TCB


def _cfg():
    from se2lam_tpu.frontend.orb import OrbConfig

    cfg0 = SystemConfig(
        width=320, height=240,
        fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=256, max_level=2, scale_factor=1.2,
        min_frames_between_kf=2, max_frames_between_kf=8,
        local_iter=6,
    )
    oc = OrbConfig(
        height=cfg0.height, width=cfg0.width, n_features=256,
        scale_factor=cfg0.scale_factor, n_levels=cfg0.max_level,
    )
    return cfg0.replace(
        cap=Capacity(
            n_features=oc.n_slots, max_kfs=32, max_mps=2048,
            local_kfs=8, local_ref_kfs=8, local_mps=512,
            ransac_trials=64,
        )
    )


def test_chunked_matches_per_frame():
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=4)
    frames = list(world.sequence(33, noise=(0.004, 0.002, 0.002)))

    ref = SlamSystem(cfg, enable_loops=False)
    for img, odo in frames:
        ref.process(img, odo)

    chk = SlamSystem(cfg, enable_loops=False)
    i = 0
    for size in (1, 7, 8, 8, 9):  # uneven chunks incl. the bootstrap
        batch = frames[i:i + size]
        chk.process_chunk([f[0] for f in batch], [f[1] for f in batch])
        i += size
    assert i == len(frames)

    assert chk.frame_id == ref.frame_id
    assert chk.n_keyframes() == ref.n_keyframes()
    assert chk.kf_frame_ids == ref.kf_frame_ids

    est_r = np.asarray([p for _, p in ref.trajectory])
    est_c = np.asarray([p for _, p in chk.trajectory])
    # same program content but different XLA fusions (scan vs per-frame
    # jit), so identity is numerical, not bitwise
    np.testing.assert_allclose(est_c, est_r, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(chk.ms.kf_pose), np.asarray(ref.ms.kf_pose), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(chk.corrected_trajectory()),
        np.asarray(ref.corrected_trajectory()),
        atol=1e-4,
    )


def test_chunked_uint8_feed_matches_per_frame():
    """Camera-realistic uint8 frames (the dtype BMP datasets decode to,
    shipped at 1 byte/px and cast to f32 on device) must track the same
    in both modes."""
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=7)
    frames = [(np.asarray(img).astype(np.uint8), odo)
              for img, odo in world.sequence(20, noise=(0.004, 0.002, 0.002))]

    ref = SlamSystem(cfg, enable_loops=False)
    for img, odo in frames:
        ref.process(img, odo)
    chk = SlamSystem(cfg, enable_loops=False)
    for i in range(0, 20, 5):
        b = frames[i:i + 5]
        chk.process_chunk([f[0] for f in b], [f[1] for f in b])

    assert chk.n_keyframes() == ref.n_keyframes() >= 2
    est_r = np.asarray([p for _, p in ref.trajectory])
    est_c = np.asarray([p for _, p in chk.trajectory])
    np.testing.assert_allclose(est_c, est_r, atol=1e-4)


def test_chunked_prefetch_identical():
    """The next-chunk upload prefetch (process_chunk(next_imgs=...)) is a
    pure transfer-scheduling hint: results must be BITWISE identical to
    the unprefetched chunked run (same compiled programs, same arrays)."""
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=9)
    frames = [(np.asarray(img).astype(np.uint8), odo)
              for img, odo in world.sequence(24, noise=(0.004, 0.002, 0.002))]
    imgs = [f[0] for f in frames]
    odos = [f[1] for f in frames]

    plain = SlamSystem(cfg, enable_loops=False)
    for i in range(0, 24, 6):
        plain.process_chunk(imgs[i:i + 6], odos[i:i + 6])

    pref = SlamSystem(cfg, enable_loops=False)
    for i in range(0, 24, 6):
        nxt = imgs[i + 6:i + 12] if i + 12 <= 24 else None
        pref.process_chunk(imgs[i:i + 6], odos[i:i + 6], next_imgs=nxt)

    # the prefetch cache is one-shot and input-keyed: a mismatched
    # consumer gets a fresh transfer AND drops the stale entry (which
    # must not survive to match a later — possibly id-recycled — chunk)
    pref.prefetch_chunk(imgs[:6])
    assert pref._take_prefetched(imgs[6:12]) is None
    assert pref._take_prefetched(imgs[:6]) is None
    pref.prefetch_chunk(imgs[:6])
    assert pref._take_prefetched(imgs[:6]) is not None

    assert pref.kf_frame_ids == plain.kf_frame_ids
    np.testing.assert_array_equal(
        np.asarray([p for _, p in pref.trajectory]),
        np.asarray([p for _, p in plain.trajectory]),
    )
    np.testing.assert_array_equal(
        np.asarray(pref.ms.kf_pose), np.asarray(plain.ms.kf_pose)
    )


def test_chunked_closes_loops_too():
    """Chunk mode must drive the full keyframe pipeline (local BA, loop
    closer) — a revisit closes a loop exactly as in per-frame mode."""
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

    slam = SlamSystem(cfg, enable_loops=True)
    B = 8
    for i in range(0, len(gt), B):
        imgs = [world.render(g) for g in gt[i:i + B]]
        slam.process_chunk(imgs, odo[i:i + B])
    assert slam._loop_closer.n_loops_closed >= 1
    est = np.asarray([p for _, p in slam.trajectory])
    assert np.isfinite(est).all()


def _feed_chunk_async(slam, frames, B=8):
    out = []
    for i in range(0, len(frames), B):
        r = slam.process_chunk_async([f[0] for f in frames[i:i + B]],
                                     [f[1] for f in frames[i:i + B]])
        if r is not None:
            out.append(np.asarray(r, np.float32))
    out.append(slam.flush_chunk_async())
    return np.concatenate(out, 0)


def test_chunk_async_matches_chunked():
    """The chunk-pipelined feed (process_chunk_async) must reproduce
    process_chunk BITWISE: the resolved scans are the same compiled
    programs on the same inputs with the same key chain — only the
    dispatch/pull overlap differs."""
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=4)
    frames = [(np.asarray(img).astype(np.uint8), odo)
              for img, odo in world.sequence(40, noise=(0.004, 0.002, 0.002))]

    ref = SlamSystem(cfg, enable_loops=False)
    for i in range(0, 40, 8):
        ref.process_chunk([f[0] for f in frames[i:i + 8]],
                          [f[1] for f in frames[i:i + 8]])

    pip = SlamSystem(cfg, enable_loops=False)
    poses = _feed_chunk_async(pip, frames)

    assert pip.frame_id == ref.frame_id
    assert pip.kf_frame_ids == ref.kf_frame_ids
    ref_poses = np.asarray([p for _, p in ref.trajectory], np.float32)
    np.testing.assert_array_equal(
        np.asarray([p for _, p in pip.trajectory], np.float32), ref_poses
    )
    np.testing.assert_array_equal(
        np.asarray(pip.ms.kf_pose), np.asarray(ref.ms.kf_pose)
    )
    # every fed frame's pose comes back exactly once, in order
    np.testing.assert_array_equal(poses, ref_poses)


def test_chunk_async_closes_loops_and_matches():
    """Chunk-pipelined mode across live loop closures (fused loop
    stage): same closures, same trajectory as the sync chunked feed."""
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

    ref = SlamSystem(cfg, enable_loops=True)
    for i in range(0, len(frames), 8):
        ref.process_chunk([f[0] for f in frames[i:i + 8]],
                          [f[1] for f in frames[i:i + 8]])

    pip = SlamSystem(cfg, enable_loops=True)
    _feed_chunk_async(pip, frames)

    assert ref._loop_closer.n_loops_closed >= 1
    assert (pip._loop_closer.n_loops_closed
            == ref._loop_closer.n_loops_closed)
    assert pip.kf_frame_ids == ref.kf_frame_ids
    np.testing.assert_array_equal(
        np.asarray([p for _, p in pip.trajectory], np.float32),
        np.asarray([p for _, p in ref.trajectory], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(pip.corrected_trajectory()),
        np.asarray(ref.corrected_trajectory()),
    )
