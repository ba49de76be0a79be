"""Capacity stress: drive the system past its keyframe budget — the
insertion guard plus pruning must keep it healthy (finite poses, no
corruption, trajectory still produced)."""
import numpy as np

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.io import SyntheticWorld
from se2lam_tpu.system import SlamSystem

from synth_utils import TCB
from test_prune import check_consistency


def _cfg(**kw):
    """The module's shared capacity-stress configuration: tiny 8-KF
    budget, 160x120 frames, 128 features, fast keyframe cadence."""
    from se2lam_tpu.frontend.orb import OrbConfig

    oc = OrbConfig(height=120, width=160, n_features=128,
                   scale_factor=1.2, n_levels=2)
    cap = kw.pop("cap", None) or Capacity(
        n_features=oc.n_slots, max_kfs=8, max_mps=512,
        local_kfs=4, local_ref_kfs=4, local_mps=128, ransac_trials=32,
    )
    base = dict(
        width=160, height=120, fx=130.0, fy=130.0, cx=80.0, cy=60.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=128, max_level=2,
        min_frames_between_kf=1, max_frames_between_kf=2,
        local_iter=4,
    )
    base.update(kw)
    return SystemConfig(cap=cap, **base)


def test_kf_capacity_exhaustion():
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=300, room=10.0, seed=1)
    slam = SlamSystem(cfg, enable_loops=False)
    n = 40
    for img, odo in world.sequence(n, noise=(0.002, 0.001, 0.001)):
        slam.process(img, odo)

    assert slam.frame_id == n
    # the KF bank hit its cap and stopped growing (guard engaged),
    # possibly freeing slots through pruning — never exceeding capacity
    assert slam.n_keyframes() <= cfg.cap.max_kfs
    est = np.asarray([p for _, p in slam.trajectory])
    assert np.isfinite(est).all()
    # pose keeps following odometry even after the map stops growing
    # (compare in the map frame, gauged at the first body pose)
    import jax.numpy as jnp

    from se2lam_tpu.ops import se2

    gt_rel = np.asarray(
        se2.minus(jnp.asarray(world.gt[n - 1]), jnp.asarray(world.gt[0]))
    )
    assert np.linalg.norm(est[-1][:2] - gt_rel[:2]) < 1.0
    check_consistency(slam.ms)
    rows = slam.kf_trajectory()
    assert rows.shape[0] == int(np.asarray(slam.ms.kf_valid).sum())


def test_capacity_pressure_keeps_mapping():
    """2.5× over-capacity sequence: forced pruning + slot compaction must
    keep inserting keyframes (not silently degrade to odometry-only),
    with the retro-corrected trajectory bounded and the map consistent."""
    from se2lam_tpu.io import ate_se2

    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=300, room=10.0, seed=1)
    slam = SlamSystem(cfg, enable_loops=False)
    n = 44   # ~20+ KF-worthy frames against an 8-slot budget
    for img, odo in world.sequence(n, noise=(0.002, 0.001, 0.001)):
        slam.process(img, odo)

    assert slam.frame_id == n
    # pressure relief actually ran and freed slots
    assert slam.capacity_compactions >= 1
    # mapping continued past the lifetime-capacity point: more KF
    # insertions than slots ever existed
    assert len(slam.kf_frame_ids) == slam.n_keyframes()
    assert max(slam.kf_frame_ids) > 20, (
        "no keyframe inserted after the bank first filled"
    )
    check_consistency(slam.ms)
    corr = slam.corrected_trajectory()
    assert np.isfinite(corr).all()
    rmse, _ = ate_se2(corr[:, 1:3], world.gt[:n, :2])
    assert rmse < 0.5, f"ATE {rmse}"


def test_capacity_pressure_chunked_feed():
    """The chunked feed must survive capacity relief mid-chunk: the
    compaction permutes keyframe slots and remaps the tracking state
    while a chunk is in flight — the re-dispatch after the insert must
    pick up the remapped state (system.process_chunk's segment loop)."""
    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=300, room=10.0, seed=1)
    slam = SlamSystem(cfg, enable_loops=False)
    frames = list(world.sequence(40, noise=(0.002, 0.001, 0.001)))
    for i in range(0, 40, 8):
        b = frames[i:i + 8]
        poses = slam.process_chunk([f[0] for f in b], [f[1] for f in b])
        assert np.isfinite(poses).all()

    assert slam.frame_id == 40
    assert slam.n_keyframes() <= cfg.cap.max_kfs
    assert slam.capacity_compactions >= 1, "relief must have fired"
    check_consistency(slam.ms)
    est = np.asarray([p for _, p in slam.trajectory])
    assert np.isfinite(est).all()
    # retro-corrected trajectory survives the anchor remapping
    corr = slam.corrected_trajectory()
    assert np.isfinite(np.asarray(corr)).all()


def test_compacted_anchors_follow_corrections():
    """Frames whose anchor keyframe was compacted away must be
    RE-ANCHORED onto a surviving keyframe, not baked to an absolute
    pose: a later global correction (loop closure / GBA moving every
    keyframe) must move every retro-corrected frame coherently. Baked
    frames would stay at the pre-correction gauge, leaving a
    correction-sized discontinuity."""
    import jax.numpy as jnp

    cfg = _cfg()
    world = SyntheticWorld(cfg, n_landmarks=300, room=10.0, seed=1)
    slam = SlamSystem(cfg, enable_loops=False)
    for img, odo in world.sequence(44, noise=(0.002, 0.001, 0.001)):
        slam.process(img, odo)
    assert slam.capacity_compactions >= 1
    # the dead-reference path must actually have fired — otherwise the
    # rigid-shift check below passes without exercising re-anchoring
    assert slam.anchors_reanchored >= 1, (
        "no anchor referenced a compacted-away keyframe; the re-anchor "
        "branch was never exercised"
    )
    # every anchor survives on a live keyframe (none baked)
    refs = [ref for _, ref, _ in slam._frame_anchors]
    assert all(r >= 0 for r in refs), f"baked anchors remain: {refs}"

    before = slam.corrected_trajectory()
    # simulate a global correction: rigid world-frame shift of every KF
    d = np.float32([0.7, -0.4, 0.3])
    c, s = np.cos(d[2]), np.sin(d[2])
    kp = np.asarray(slam.ms.kf_pose)
    shifted = np.stack([
        d[0] + c * kp[:, 0] - s * kp[:, 1],
        d[1] + s * kp[:, 0] + c * kp[:, 1],
        kp[:, 2] + d[2],
    ], -1)
    slam.ms = slam.ms._replace(kf_pose=jnp.asarray(shifted))
    after = slam.corrected_trajectory()
    # every anchored frame moves by exactly the same rigid transform
    exp_xy = np.stack([
        d[0] + c * before[:, 1] - s * before[:, 2],
        d[1] + s * before[:, 1] + c * before[:, 2],
    ], -1)
    anchored = np.asarray([row[0] in {f for f, _, _ in slam._frame_anchors}
                           for row in before])
    err = np.linalg.norm(after[:, 1:3] - exp_xy, axis=-1)
    assert err[anchored].max() < 1e-4, (
        f"frames missed the global correction: max err {err[anchored].max()}"
    )


def test_mp_capacity_pressure_keeps_minting():
    """Map-POINT pressure (r3 VERDICT missing #3): a landmark-churning
    run that mints several times max_mps must keep minting — the MP
    watermark response (compaction + forced weak-point culling,
    system._relieve_mp_capacity) frees slots, where the old behavior
    silently dropped every overflow mint forever once n_mp (monotonic)
    hit capacity."""
    from se2lam_tpu.io import ate_se2

    cap = Capacity(
        n_features=128, max_kfs=32, max_mps=80,
        local_kfs=4, local_ref_kfs=4, local_mps=64, ransac_trials=32,
    )
    cfg = _cfg(cap=cap)
    world = SyntheticWorld(cfg, n_landmarks=300, room=10.0, seed=1)
    slam = SlamSystem(cfg, enable_loops=False)
    n = 60
    for img, odo in world.sequence(n, noise=(0.002, 0.001, 0.001)):
        slam.process(img, odo)
    # lifetime mints across compactions (n_mp resets to the live count
    # at each relief; the system counts reclaimed slots)
    mints = int(slam.ms.n_mp) + slam.mp_slots_reclaimed

    assert slam.frame_id == n
    assert mints > 2 * cap.max_mps, (
        f"only {mints} mints — the run never really pressured the bank"
    )
    assert slam.mp_compactions >= 1, "MP relief never fired"
    assert slam.mp_culled_weak >= 1, (
        "a dense map must force-cull weak points, not just compact holes"
    )
    # minting continued after the LAST relief event
    assert int(slam.ms.n_mp) > int(np.asarray(slam.ms.mp_valid).sum()) or (
        int(slam.ms.n_mp) < cap.max_mps
    )
    assert slam.n_map_points() > 0
    check_consistency(slam.ms)
    corr = slam.corrected_trajectory()
    assert np.isfinite(corr).all()
    rmse, _ = ate_se2(corr[:, 1:3], world.gt[:n, :2])
    assert rmse < 0.5, f"ATE {rmse}"


def test_capacity_pressure_with_loops_enabled():
    """Capacity relief with the loop closer ATTACHED: compaction must
    rebuild the BoW bank and remap the closer's state without error
    (the loops-and-compaction interplay; loop closures themselves are
    covered in test_system/test_loop_reference_gates)."""
    # loop gates scaled to the 128-feature scene
    cfg = _cfg(gm_dcl_min_kfid_offset=4, gm_vcl_num_min_match_mp=6,
               gm_vcl_num_min_match_kp=12)
    world = SyntheticWorld(cfg, n_landmarks=300, room=10.0, seed=1)
    slam = SlamSystem(cfg, enable_loops=True)
    for img, odo in world.sequence(44, noise=(0.002, 0.001, 0.001)):
        slam.process(img, odo)
    assert slam.capacity_compactions >= 1
    check_consistency(slam.ms)
    lc = slam._loop_closer
    if lc.vocab is not None:
        # bank rows must track the compacted keyframes: valid rows
        # nonzero, invalid rows zero
        bank = np.asarray(lc.bank)
        valid = np.asarray(slam.ms.kf_valid)
        assert np.any(bank[valid] != 0.0, axis=1).all()
        assert not np.any(bank[~valid] != 0.0)
    corr = slam.corrected_trajectory()
    assert np.isfinite(corr).all()
