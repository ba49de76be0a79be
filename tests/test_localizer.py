"""Localization-only mode tests: build a map on the synthetic world,
checkpoint it, reload, and localize a fresh traversal — including cold
relocalization from the lost state (the reference Localizer's role,
src/Localizer.cpp)."""
import numpy as np
import pytest

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.frontend.orb import OrbConfig
from se2lam_tpu.io import SyntheticWorld, load_map, save_map
from se2lam_tpu.localizer import Localizer
from se2lam_tpu.system import SlamSystem
from se2lam_tpu.vocab import train_vocab

from synth_utils import TCB


@pytest.fixture(scope="module")
def built_map(tmp_path_factory):
    oc = OrbConfig(
        height=240, width=320, n_features=256, scale_factor=1.2, n_levels=2
    )
    cfg = SystemConfig(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=256, max_level=2,
        min_frames_between_kf=2, max_frames_between_kf=8, local_iter=6,
        cap=Capacity(
            n_features=oc.n_slots, max_kfs=64, max_mps=4096,
            local_kfs=8, local_ref_kfs=8, local_mps=512, ransac_trials=64,
        ),
    )
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    slam = SlamSystem(cfg, enable_loops=False)
    for img, odo in world.sequence(60, noise=(0.001, 0.001, 0.0005)):
        slam.process(img, odo)

    import jax

    desc = slam.ms.kf_desc.reshape(-1, 256)
    valid = (slam.ms.kf_feat_valid & slam.ms.kf_valid[:, None]).reshape(-1)
    vocab = train_vocab(desc, valid, n_words=256, iters=5)

    path = str(tmp_path_factory.mktemp("map") / "saved_map")
    save_map(path, slam.ms, vocab, meta={"source": "synthetic"})
    return cfg, world, path, slam


def test_map_storage_roundtrip(built_map):
    cfg, world, path, slam = built_map
    ms2, vocab2, info = load_map(path)
    assert info["n_kf"] == slam.n_keyframes()
    assert vocab2 is not None
    np.testing.assert_array_equal(
        np.asarray(slam.ms.kf_pose), np.asarray(ms2.kf_pose)
    )
    np.testing.assert_array_equal(
        np.asarray(slam.ms.mp_pos), np.asarray(ms2.mp_pos)
    )
    assert info["meta"]["source"] == "synthetic"


def test_localizer_cold_start_and_track(built_map):
    cfg, world, path, _ = built_map
    ms, vocab, _ = load_map(path)
    loc = Localizer(cfg, ms, vocab, reloc_min_inliers=30)

    gt = world.circle_trajectory(60)
    # the map frame is gauged at the first SLAM frame's body pose, so
    # ground truth must be expressed relative to gt[0]
    import jax.numpy as jnp

    from se2lam_tpu.ops import se2

    gt_map = np.asarray(
        [np.asarray(se2.minus(jnp.asarray(g), jnp.asarray(gt[0]))) for g in gt]
    )
    # second traversal with noisy odometry, starting mid-circle (kidnapped)
    start = 15
    odo = world.odometry(gt, noise=(0.002, 0.001, 0.001), seed=9)
    errs = []
    n_localized = 0
    for i in range(start, start + 20):
        img = world.render(gt[i])
        p = loc.process(img, odo[i])
        if p is not None:
            n_localized += 1
            errs.append(np.linalg.norm(p[:2] - gt_map[i][:2]))
    assert n_localized >= 15, f"only {n_localized} frames localized"
    assert np.median(errs) < 0.3, f"median err {np.median(errs)}"


def test_localizer_trajectory_csv(built_map, tmp_path):
    cfg, world, path, _ = built_map
    ms, vocab, _ = load_map(path)
    loc = Localizer(cfg, ms, vocab, reloc_min_inliers=30)
    gt = world.circle_trajectory(60)
    odo = world.odometry(gt, noise=(0.0, 0.0, 0.0), seed=1)
    for i in range(3):
        loc.process(world.render(gt[i]), odo[i])
    out = tmp_path / "loc_traj.csv"
    loc.save_trajectory(str(out))
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 3


def test_localizer_pruned_kf_rows_cannot_win(built_map):
    """Relocalization against a map whose top BoW candidate was pruned:
    the pruned keyframe's bank row is all-zero after rebuild, scores
    -inf (vocab.bow_score zero-row guard) and must never be selected —
    the localizer still relocalizes via the next-best candidate."""
    import jax.numpy as jnp

    cfg, world, path, _ = built_map
    ms, vocab, _ = load_map(path)

    gt = world.circle_trajectory(60)
    probe = 20
    # find the keyframe that WOULD win for this probe frame
    loc0 = Localizer(cfg, ms, vocab, reloc_min_inliers=30)
    from se2lam_tpu import vocab as vocab_mod

    feats = loc0._extract(np.asarray(world.render(gt[probe]), np.float32))
    v, _ = vocab_mod.bow_transform(vocab, feats.desc_pm1, feats.valid)
    scores = jnp.where(ms.kf_valid, vocab_mod.bow_score(loc0.bank, v), -jnp.inf)
    best = int(jnp.argmax(scores))

    # prune it: invalidate the KF + its features (what prune does)
    ms2 = ms._replace(
        kf_valid=ms.kf_valid.at[best].set(False),
        kf_feat_valid=ms.kf_feat_valid.at[best].set(False),
    )
    loc = Localizer(cfg, ms2, vocab, reloc_min_inliers=30)
    assert float(loc.bank[best].sum()) == 0.0     # zeroed, not stale
    odo = world.odometry(gt, noise=(0.001, 0.001, 0.0005), seed=9)
    n_localized = 0
    for i in range(probe, probe + 8):
        p = loc.process(world.render(gt[i]), odo[i])
        if p is not None:
            n_localized += 1
    assert n_localized >= 4, "pruned-candidate map failed to relocalize"


def test_localizer_scale_change_revisit(built_map):
    """Revisit from a different distance (scale change): the map was
    built on a radius-2.5 circle; localize from poses pulled toward the
    center (farther from the walls), where features appear at coarser
    octaves — the octave-gated projection matching must still track."""
    import jax.numpy as jnp

    from se2lam_tpu.ops import se2

    cfg, world, path, _ = built_map
    ms, vocab, _ = load_map(path)
    loc = Localizer(cfg, ms, vocab, reloc_min_inliers=25,
                    min_tracked_matches=8)

    gt = world.circle_trajectory(60)          # map-building radius 2.5
    gt_in = world.circle_trajectory(60, radius=1.7)   # pulled to center
    gt0 = jnp.asarray(gt[0])
    start = 10
    odo = world.odometry(gt_in, noise=(0.001, 0.001, 0.0005), seed=7)
    errs = []
    for i in range(start, start + 16):
        p = loc.process(world.render(gt_in[i]), odo[i])
        if p is not None:
            g = np.asarray(se2.minus(jnp.asarray(gt_in[i]), gt0))
            errs.append(np.linalg.norm(p[:2] - g[:2]))
    # matching must stay alive across the scale change (octave gates),
    # and the pose must not diverge. NOTE: the error magnitude is
    # dominated by monocular depth observability — points 3-7 m away
    # constrain the radial direction weakly from a single view, so a
    # bias toward the mapped circle of ~60% of the radial offset is
    # geometry, not a matching failure (measured: 0.19 m at Δr = 0.3,
    # 0.68 m at Δr = 0.8).
    assert len(errs) >= 12, f"only {len(errs)} frames localized"
    assert np.median(errs) < 1.0, f"median err {np.median(errs)}"


def test_localizer_chunked_matches_per_frame(built_map):
    """process_chunk must reproduce the per-frame localization loop:
    same tracked flags and (numerically) the same poses, including a
    cold-start relocalization consumed per-frame inside the chunk."""
    cfg, world, path, _ = built_map
    ms, vocab, _ = load_map(path)

    gt = world.circle_trajectory(60)
    odo = world.odometry(gt, noise=(0.002, 0.001, 0.001), seed=9)
    start, n = 15, 24
    frames = [np.asarray(world.render(gt[i])) for i in range(start, start + n)]
    feeds = [np.asarray(odo[i]) for i in range(start, start + n)]

    ref = Localizer(cfg, ms, vocab, reloc_min_inliers=30)
    ref_out = [ref.process(f, o) for f, o in zip(frames, feeds)]

    chk = Localizer(cfg, ms, vocab, reloc_min_inliers=30)
    chk_out = []
    for i in range(0, n, 8):
        chk_out.extend(chk.process_chunk(frames[i:i + 8], feeds[i:i + 8]))

    assert len(chk_out) == len(ref_out) == n
    for a, b in zip(chk_out, ref_out):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_allclose(a, b, atol=1e-3)
    # tracked flags recorded identically
    tr_ref = [t for _, _, t in ref.trajectory]
    tr_chk = [t for _, _, t in chk.trajectory]
    assert tr_ref == tr_chk


def test_fleet_localizer_matches_single(built_map):
    """B robots × k frames against ONE shared map in one dispatch
    (parallel.make_fleet_localizer) must agree with each robot running
    its own single-robot Localizer chunk path."""
    import jax.numpy as jnp

    from se2lam_tpu.parallel import make_fleet_localizer

    cfg, world, path, _ = built_map
    ms, vocab, _ = load_map(path)

    gt = world.circle_trajectory(60)
    B, k, start = 3, 5, 10
    offs = [start, start + 6, start + 12]   # robots at different spots
    odo = world.odometry(gt, noise=(0.001, 0.001, 0.0005), seed=5)

    imgs = np.stack([
        np.stack([np.asarray(world.render(gt[o + j])) for j in range(k)])
        for o in offs
    ])                                       # (B, k, H, W)
    odos = np.stack([odo[o:o + k] for o in offs]).astype(np.float32)
    # the map gauge is the first SLAM frame's body pose: express seeds
    # relative to gt[0] with the proper SE(2) relative op
    import jax.numpy as _jnp

    from se2lam_tpu.ops import se2 as _se2

    pose0 = np.stack([
        np.asarray(_se2.minus(_jnp.asarray(gt[o]), _jnp.asarray(gt[0])),
                   np.float32)
        for o in offs
    ])
    last0 = np.stack([odo[o].astype(np.float32) for o in offs])

    extract_fn, step_fn = make_fleet_localizer(cfg, ms)
    feats_bk = extract_fn(jnp.asarray(imgs))
    poses, tracked = step_fn(
        jnp.asarray(pose0), jnp.asarray(last0),
        feats_bk, jnp.asarray(odos),
    )
    poses = np.asarray(poses)
    tracked = np.asarray(tracked)
    assert tracked.shape == (B, k)

    # single-robot reference: the same chunked localizer per robot
    for b, o in enumerate(offs):
        loc = Localizer(cfg, ms, vocab, reloc_min_inliers=30)
        loc.set_pose(pose0[b], last0[b])
        out = loc.process_chunk(
            [imgs[b, j] for j in range(k)], list(odos[b])
        )
        ref_tracked = [p is not None for p in out]
        # compare up to the fleet lane's first lost frame: the
        # single-robot path may RELOCALIZE mid-chunk (host reloc), while
        # a fleet lane freezes and waits for out-of-band recovery
        flags = list(map(bool, tracked[b]))
        upto = flags.index(False) if False in flags else k
        assert ref_tracked[:upto] == flags[:upto]
        for j in range(upto):
            np.testing.assert_allclose(poses[b, j], out[j], atol=1e-3)
    assert tracked.sum() >= B * k - 2, "fleet mostly tracked"

    # mesh-aware variant: robot axis sharded over B devices, extraction
    # as shard_map (parallel across devices) — same decisions, same poses
    # up to f32 reassociation (sharding changes XLA's fusion/layout
    # choices inside the extractor and the pose-only solver; observed
    # drift ~1e-4 in pose units)
    from se2lam_tpu.parallel import make_mesh, shard_fleet

    mesh = make_mesh(B)
    extract_m, step_m = make_fleet_localizer(cfg, ms, mesh=mesh)
    feats_m = extract_m(shard_fleet(jnp.asarray(imgs), mesh))
    poses_m, tracked_m = step_m(
        jnp.asarray(pose0), jnp.asarray(last0), feats_m, jnp.asarray(odos)
    )
    np.testing.assert_array_equal(np.asarray(tracked_m), tracked)
    np.testing.assert_allclose(np.asarray(poses_m), poses, atol=1e-3)


def test_localizer_pipelined_matches_per_frame(built_map):
    """process_async (depth-d pipelined serving) must reproduce the
    per-frame loop exactly: same tracked flags, same poses, same
    trajectory order — including the cold-start reloc (synchronous
    until tracked) and readers draining in-flight frames."""
    cfg, world, path, _ = built_map
    ms, vocab, _ = load_map(path)

    gt = world.circle_trajectory(60)
    odo = world.odometry(gt, noise=(0.002, 0.001, 0.001), seed=9)
    start, n = 15, 24
    frames = [np.asarray(world.render(gt[i])) for i in range(start, start + n)]
    feeds = [np.asarray(odo[i]) for i in range(start, start + n)]

    ref = Localizer(cfg, ms, vocab, reloc_min_inliers=30)
    ref_out = [ref.process(f, o) for f, o in zip(frames, feeds)]

    for depth in (0, 3):
        pip = Localizer(cfg, ms, vocab, reloc_min_inliers=30)
        pip.pipeline_depth = depth
        for f, o in zip(frames, feeds):
            pip.process_async(f, o)
        pip.flush_async()
        assert pip.frame_id == ref.frame_id
        tr_ref = [(t, None if p is None else tuple(np.round(p, 5)))
                  for _, p, t in ref.trajectory]
        tr_pip = [(t, None if p is None else tuple(np.round(p, 5)))
                  for _, p, t in pip.trajectory]
        assert [t for t, _ in tr_pip] == [t for t, _ in tr_ref]
        for (_, a), (_, b) in zip(tr_pip, tr_ref):
            assert (a is None) == (b is None)
            if a is not None:
                np.testing.assert_allclose(a, b, atol=1e-3)


def test_localizer_pipelined_lost_midstream(built_map):
    """A vision blackout mid-stream forces a lost transition while
    frames are in flight: the pipelined path must fall back to the
    host reloc path for the blackout frames and re-establish tracking
    afterward, matching the per-frame loop's tracked flags."""
    cfg, world, path, _ = built_map
    ms, vocab, _ = load_map(path)

    gt = world.circle_trajectory(60)
    odo = world.odometry(gt, noise=(0.002, 0.001, 0.001), seed=9)
    start, n = 15, 20
    frames = [np.asarray(world.render(gt[i])) for i in range(start, start + n)]
    feeds = [np.asarray(odo[i]) for i in range(start, start + n)]
    for j in (9, 10):   # blackout: no features -> tracked gates fail
        frames[j] = np.zeros_like(frames[j])

    ref = Localizer(cfg, ms, vocab, reloc_min_inliers=30)
    for f, o in zip(frames, feeds):
        ref.process(f, o)

    pip = Localizer(cfg, ms, vocab, reloc_min_inliers=30)
    pip.pipeline_depth = 3
    for f, o in zip(frames, feeds):
        pip.process_async(f, o)
    pip.flush_async()

    assert pip.frame_id == ref.frame_id
    tr_ref = [t for _, _, t in ref.trajectory]
    tr_pip = [t for _, _, t in pip.trajectory]
    assert tr_pip == tr_ref
    # tracking re-established after the blackout in both
    assert tr_ref[-1] and tr_pip[-1]
    for (_, a, _), (_, b, _) in zip(pip.trajectory, ref.trajectory):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_allclose(a, b, atol=1e-3)
