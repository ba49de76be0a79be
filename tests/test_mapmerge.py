"""Cross-map merging: two robots map overlapping halves of a circuit in
their OWN gauges (each SLAM's world frame is its first body pose); the
merged map must be consistent, carry B's keyframes in A's frame, and
serve localization queries from both halves."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.io import SyntheticWorld
from se2lam_tpu.mapmerge import concat_maps, merge_maps, transform_map
from se2lam_tpu.ops import se2
from se2lam_tpu.system import SlamSystem

from synth_utils import TCB
from test_prune import check_consistency


def _cfg():
    from se2lam_tpu.frontend.orb import OrbConfig

    oc = OrbConfig(height=120, width=160, n_features=128,
                   scale_factor=1.2, n_levels=2)
    return SystemConfig(
        width=160, height=120, fx=130.0, fy=130.0, cx=80.0, cy=60.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=128, max_level=2,
        min_frames_between_kf=2, max_frames_between_kf=5,
        local_iter=4,
        # verification gates scaled to the 128-feature scene (the
        # reference defaults 30/15 are calibrated for ~1000 features)
        gm_vcl_num_min_match_kp=12, gm_vcl_num_min_match_mp=5,
        cap=Capacity(
            n_features=oc.n_slots, max_kfs=64, max_mps=2048,
            local_kfs=6, local_ref_kfs=6, local_mps=256,
            ransac_trials=32,
        ),
    )


def _build_half(cfg, world, gt, frames):
    slam = SlamSystem(cfg, enable_loops=False)
    for i in frames:
        slam.process(world.render(gt[i]), np.asarray(gt[i], np.float32))
    return slam


def test_merge_two_half_maps():
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=400, room=10.0, seed=2)
    n = 80
    gt = np.asarray(world.circle_trajectory(n))

    a_frames = list(range(0, 48))            # first ~60% of the circuit
    b_frames = list(range(40, 80))           # last half, overlapping 40-47
    slam_a = _build_half(cfg, world, gt, a_frames)
    slam_b = _build_half(cfg, world, gt, b_frames)
    assert slam_a.n_keyframes() >= 5 and slam_b.n_keyframes() >= 5

    na = slam_a.n_keyframes()
    merged, info = merge_maps(slam_a.ms, slam_b.ms, cfg)
    check_consistency(merged)
    assert info["n_kp"] >= 10 and info["align_inliers"] >= 15
    # some duplicate landmarks in the overlap were fused
    assert info["mps_fused"] >= 1

    # B's keyframes must land in A's gauge: pose of frame f in A's world
    # is gt[f] expressed relative to gt[a_frames[0]]
    kp = np.asarray(merged.kf_pose)
    errs = []
    for slot_b, fid in enumerate(slam_b.kf_frame_ids):
        f_global = b_frames[fid]
        expect = np.asarray(
            se2.minus(jnp.asarray(gt[f_global]),
                      jnp.asarray(gt[a_frames[0]]))
        )
        got = kp[na + slot_b]
        errs.append(np.linalg.norm(got[:2] - expect[:2]))
    errs = np.asarray(errs)
    assert errs.max() < 0.5, (
        f"B keyframes misaligned after merge: max {errs.max():.3f} m "
        f"(per-KF: {np.round(errs, 3)})"
    )

    # the merged map serves localization from BOTH halves (BoW reloc
    # against the shared vocabulary, no seed pose)
    from se2lam_tpu.localizer import Localizer

    loc = Localizer(cfg, merged, info["vocab"])
    n_ok = 0
    for f in (8, 60):                        # one query per half
        for j in range(3):                   # reloc may take a frame or two
            p = loc.process(
                world.render(gt[f + j]), np.asarray(gt[f + j], np.float32)
            )
            n_ok += p is not None
    assert n_ok >= 2, "merged map failed to serve both halves"


def test_concat_requires_capacity():
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=300, room=10.0, seed=3)
    gt = np.asarray(world.circle_trajectory(24))
    slam = _build_half(cfg, world, gt, list(range(24)))
    from se2lam_tpu.localmap import compact_map

    ms, _, _ = compact_map(slam.ms)
    # a state that would overflow the KF bank must be refused loudly
    big = ms._replace(n_kf=jnp.asarray(ms.K, jnp.int32),
                      kf_valid=jnp.ones((ms.K,), bool))
    import pytest

    with pytest.raises(ValueError, match="exceeds capacity"):
        concat_maps(big, ms)


def test_transform_map_rigid():
    """transform_map is an exact rigid SE(2) action: relative geometry
    (pairwise point distances, pose-to-point offsets) is preserved."""
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=300, room=10.0, seed=4)
    gt = np.asarray(world.circle_trajectory(20))
    slam = _build_half(cfg, world, gt, list(range(20)))
    ms = slam.ms
    T = jnp.asarray([0.8, -0.3, 0.7], jnp.float32)
    ms2 = transform_map(ms, T)
    v = np.asarray(ms.mp_valid)
    p0 = np.asarray(ms.mp_pos)[v]
    p1 = np.asarray(ms2.mp_pos)[v]
    if len(p0) >= 2:
        d0 = np.linalg.norm(p0[0] - p0[1:], axis=-1)
        d1 = np.linalg.norm(p1[0] - p1[1:], axis=-1)
        np.testing.assert_allclose(d0, d1, atol=1e-4)
    # z untouched
    np.testing.assert_allclose(p0[:, 2], p1[:, 2], atol=1e-6)
    # keyframe poses move by exactly T
    kv = np.asarray(ms.kf_valid)
    got = np.asarray(ms2.kf_pose)[kv]
    exp = np.asarray(
        jnp.stack([se2.compose(T, p) for p in jnp.asarray(ms.kf_pose)[kv]])
    )
    np.testing.assert_allclose(got[:, :2], exp[:, :2], atol=1e-5)


def test_merge_many_three_segments():
    """Three robots cover thirds of the circuit (with overlaps);
    merge_many folds them into one consistent map in robot 0's gauge."""
    from se2lam_tpu.mapmerge import merge_many

    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=400, room=10.0, seed=2)
    n = 90
    gt = np.asarray(world.circle_trajectory(n))
    segs = [list(range(0, 40)), list(range(30, 70)), list(range(60, 90))]
    maps = [_build_half(cfg, world, gt, s).ms for s in segs]
    merged, infos = merge_many(maps, cfg)
    assert len(infos) == 2
    assert "vocab" in infos[-1] and "vocab" not in infos[0]
    check_consistency(merged)
    assert int(merged.n_kf) == sum(
        int(jnp.sum(m.kf_valid)) for m in maps
    ) - sum(i.get("kfs_dropped", 0) for i in infos)


def test_resume_on_merged_map(tmp_path):
    """A merged map is a first-class map: save it with its union
    vocabulary, resume a mapping session against it, and keep mapping
    across the seam (relocalization + new keyframes landing on top of
    both components)."""
    from se2lam_tpu.io import save_map

    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=400, room=10.0, seed=2)
    n = 80
    gt = np.asarray(world.circle_trajectory(n))
    slam_a = _build_half(cfg, world, gt, list(range(0, 48)))
    slam_b = _build_half(cfg, world, gt, list(range(40, 80)))
    merged, info = merge_maps(slam_a.ms, slam_b.ms, cfg)
    path = str(tmp_path / "merged")
    save_map(path, merged, info["vocab"])

    slam = SlamSystem.resume(cfg, path, enable_loops=False)
    kf0 = slam.n_keyframes()
    # a third robot enters in B's half and drives through the seam
    for f in range(60, 80):
        p = slam.process(world.render(gt[f]), np.asarray(gt[f], np.float32))
        assert np.isfinite(p).all()
    assert not slam._resume_pending, "resume never relocalized"
    assert slam.n_keyframes() > kf0, (
        "no new keyframes landed on the merged map"
    )
    check_consistency(slam.ms)


def test_merge_with_loops_enabled_and_seam_covis():
    """Merging maps that were built WITH loop closing (non-empty feature
    edge tables in both) must carry every edge over, and the fused seam
    must create cross-map covisibility (recompute_covis) so local-graph
    BFS sees across it."""
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=400, room=10.0, seed=2)
    n = 80
    gt = np.asarray(world.circle_trajectory(n))

    def build(frames):
        slam = SlamSystem(cfg, enable_loops=True)
        for i in frames:
            slam.process(world.render(gt[i]),
                         np.asarray(gt[i], np.float32))
        return slam.ms

    ms_a = build(list(range(0, 48)))
    ms_b = build(list(range(40, 80)))
    fa = int(jnp.sum(ms_a.ftr_valid))
    fb = int(jnp.sum(ms_b.ftr_valid))

    from se2lam_tpu.mapstate import MAX_FTR_EDGES

    assert fa + fb + 1 <= MAX_FTR_EDGES, "scenario outgrew the edge table"
    merged, info = merge_maps(ms_a, ms_b, cfg)
    check_consistency(merged)
    # every pre-existing edge survived, plus the seam edge (the
    # precondition above guarantees no eviction was needed)
    assert int(jnp.sum(merged.ftr_valid)) == fa + fb + 1
    # covisibility spans the seam: some (A keyframe, B keyframe) pair
    na = int(jnp.sum(ms_a.kf_valid))
    cv = np.asarray(merged.covis)
    assert cv[:na, na:].any(), "no cross-map covisibility after fusion"
