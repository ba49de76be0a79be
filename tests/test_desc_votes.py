"""Majority-descriptor maintenance tests: the bit-vote accumulator must
converge to the per-bit majority over observations (the O(1) incremental
replacement for MapPoint::updateMainKFandDescriptor's min-median-distance
selection)."""
import jax.numpy as jnp
import numpy as np

from se2lam_tpu import localmap, tracking

from synth_utils import feats_at, make_cfg, make_scene
from test_localmap import drive_frames, motion_poses


def test_votes_track_observations(rng):
    cfg = make_cfg()
    pts, bits = make_scene(rng)
    poses = motion_poses(9)
    ms, kfs = drive_frames(cfg, poses, poses, pts, bits)

    mv = np.asarray(ms.mp_valid)
    votes = np.asarray(ms.mp_desc_votes)
    desc = np.asarray(ms.mp_desc)
    n_obs = np.asarray(ms.mp_n_obs)
    for m in np.nonzero(mv)[0][:30]:
        # vote magnitude bounded by observation count
        assert np.abs(votes[m]).max() <= n_obs[m]
        # descriptor is the sign of the votes
        np.testing.assert_array_equal(
            desc[m], np.where(votes[m] >= 0, 1, -1)
        )
        # identical descriptors across frames (synthetic scene) → votes
        # saturate at ±n_obs for every bit
        assert (np.abs(votes[m]) == n_obs[m]).mean() > 0.99

    # normals are unit length for valid MPs
    normals = np.asarray(ms.mp_normal)[mv]
    np.testing.assert_allclose(
        np.linalg.norm(normals, axis=1), 1.0, atol=1e-4
    )


def test_majority_beats_noise(rng):
    """Flip random descriptor bits per frame; the majority descriptor must
    be closer to the true pattern than any single noisy observation."""
    cfg = make_cfg()
    pts, bits_true = make_scene(rng)

    poses = motion_poses(17)
    # drive manually with per-frame bit noise
    from se2lam_tpu.mapstate import empty_map
    import jax

    def noisy(i):
        # keyed by frame index: noisy(i) is deterministic per frame
        r = np.random.default_rng(1000 + i)
        flip = r.random(bits_true.shape) < 0.08
        return np.where(flip, 1 - bits_true, bits_true).astype(np.uint8)

    ms = empty_map(cfg.cap)
    f0 = feats_at(cfg, poses[0], pts, noisy(0))
    ms = localmap.insert_first_kf(
        ms, f0, jnp.asarray(poses[0]), jnp.asarray(poses[0])
    )
    view, mask = localmap.kf_track_seed(ms, 0)
    ts = tracking.init_track_state(
        f0, jnp.asarray(poses[0]), jnp.asarray(poses[0]), 0, view, mask
    )
    for i in range(1, len(poses)):
        f = feats_at(cfg, poses[i], pts, noisy(i))
        ts, res = tracking.track_frame(
            ts, f, jnp.asarray(poses[i]), jax.random.PRNGKey(i), cfg
        )
        if bool(res.need_kf) or i == len(poses) - 1:
            ms, k = localmap.add_keyframe(
                ms, f, ts.cur_pose, jnp.asarray(poses[i]), ts.ref_kf_idx,
                ts.match_idx, ts.local_mps, ts.local_mp_valid, ts.good_prl,
                ts.pre_meas, ts.pre_cov, cfg,
            )
            view, mask = localmap.kf_track_seed(ms, k)
            ts = tracking.init_track_state(
                f, ms.kf_pose[k], jnp.asarray(poses[i]), k, view, mask
            )

    true_pm1 = (1 - 2 * bits_true.astype(np.int8))
    mv = np.asarray(ms.mp_valid)
    desc = np.asarray(ms.mp_desc)
    n_obs = np.asarray(ms.mp_n_obs)
    feat = np.asarray(ms.mp_main_feat)
    errs = []
    for m in np.nonzero(mv)[0]:
        if n_obs[m] >= 3:
            ham = (desc[m] != true_pm1[feat[m]]).sum()
            errs.append(ham)
    assert len(errs) > 5, (len(errs), n_obs[mv].max())
    # single observation would average ~0.08*256 ≈ 20 bit errors;
    # 4+-vote majority should cut that well below half
    assert np.mean(errs) < 12, np.mean(errs)
