"""Resume-SLAM tests (the reference's USE_PREV_MAP mode): load a saved
map, relocalize the first frame, and continue mapping in the old gauge."""
import jax.numpy as jnp
import numpy as np
import pytest

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.frontend.orb import OrbConfig
from se2lam_tpu.io import SyntheticWorld, save_map
from se2lam_tpu.ops import se2
from se2lam_tpu.system import SlamSystem
from se2lam_tpu.vocab import train_vocab

from synth_utils import TCB


@pytest.fixture(scope="module")
def saved_session(tmp_path_factory):
    oc = OrbConfig(height=240, width=320, n_features=256,
                   scale_factor=1.2, n_levels=2)
    cfg = SystemConfig(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=256, max_level=2,
        min_frames_between_kf=2, max_frames_between_kf=8, local_iter=6,
        cap=Capacity(n_features=oc.n_slots, max_kfs=64, max_mps=4096,
                     local_kfs=8, local_ref_kfs=8, local_mps=512,
                     ransac_trials=64),
    )
    world = SyntheticWorld(cfg, n_landmarks=600, room=10.0, seed=4)
    slam = SlamSystem(cfg, enable_loops=False)
    for img, odo in world.sequence(60, noise=(0.001, 0.001, 0.0005)):
        slam.process(img, odo)
    desc = slam.ms.kf_desc.reshape(-1, 256)
    valid = (slam.ms.kf_feat_valid & slam.ms.kf_valid[:, None]).reshape(-1)
    vocab = train_vocab(desc, valid, n_words=256, iters=5)
    path = str(tmp_path_factory.mktemp("resume") / "map")
    save_map(path, slam.ms, vocab)
    return cfg, world, path, slam.n_keyframes()


def test_resume_continues_mapping(saved_session):
    cfg, world, path, n_kf_before = saved_session
    slam2 = SlamSystem.resume(cfg, path, enable_loops=False)
    assert slam2.n_keyframes() == n_kf_before

    gt = world.circle_trajectory(60)
    gt_map = np.asarray(
        [np.asarray(se2.minus(jnp.asarray(g), jnp.asarray(gt[0])))
         for g in gt]
    )
    start = 20                      # kidnapped mid-circle
    odo = world.odometry(gt, noise=(0.002, 0.001, 0.001), seed=9)
    poses = []
    for i in range(start, start + 15):
        poses.append(slam2.process(world.render(gt[i]), odo[i]))

    # relocalized within the first frames, in the loaded map's gauge
    errs = [
        np.linalg.norm(np.asarray(p)[:2] - gt_map[start + i][:2])
        for i, p in enumerate(poses)
        if np.linalg.norm(p) > 1e-6
    ]
    assert len(errs) >= 10, "relocalization never succeeded"
    assert np.median(errs) < 0.5, np.median(errs)
    # mapping continued: new keyframes appended to the loaded map
    assert slam2.n_keyframes() > n_kf_before
    assert np.isfinite(np.asarray(slam2.ms.kf_pose)).all()


def test_resume_frame_ids_slot_indexed(saved_session):
    """kf_frame_ids must stay slot-indexed after resume: loaded slots
    hold -1 (no session frame id), the relocalization seed and later
    insertions land at THEIR slot index — not at index 0. Compaction's
    slot remap (_remap_slots) iterates kf_frame_ids by index == slot, so
    a misaligned list silently attributes frame ids to wrong keyframes."""
    cfg, world, path, n_kf_before = saved_session
    slam2 = SlamSystem.resume(cfg, path, enable_loops=False)
    assert slam2.kf_frame_ids == [-1] * n_kf_before

    gt = world.circle_trajectory(60)
    odo = world.odometry(gt, noise=(0.002, 0.001, 0.001), seed=9)
    for i in range(20, 32):
        slam2.process(world.render(gt[i]), odo[i])
    assert slam2.n_keyframes() > n_kf_before
    ids = slam2.kf_frame_ids
    assert len(ids) == slam2.n_keyframes()
    # loaded prefix untouched, session keyframes at their own slots
    assert all(f == -1 for f in ids[:n_kf_before])
    assert all(f >= 0 for f in ids[n_kf_before:])
    assert ids[n_kf_before:] == sorted(ids[n_kf_before:])


def test_save_map_with_vocab_false(saved_session, tmp_path):
    """with_vocab=False must gate SAVING the vocabulary, not just
    training one — a loops-enabled session already holds a vocab."""
    cfg, world, path, _ = saved_session
    from se2lam_tpu.io import load_map

    slam2 = SlamSystem.resume(cfg, path, enable_loops=True)
    assert slam2._loop_closer.vocab is not None
    out = str(tmp_path / "novocab_save")
    slam2.save_map(out, with_vocab=False)
    _, vocab, _ = load_map(out)
    assert vocab is None


def test_resume_requires_vocab(saved_session, tmp_path):
    cfg, world, path, _ = saved_session
    from se2lam_tpu.io import load_map

    ms, _, _ = load_map(path)
    novocab = str(tmp_path / "novocab")
    save_map(novocab, ms, vocab=None)
    with pytest.raises(ValueError):
        SlamSystem.resume(cfg, novocab)
