"""Outlier-observation removal tests (the removeOutlierChi2 /
removeLocalOutlierMP re-derivation)."""
import jax.numpy as jnp
import numpy as np

from se2lam_tpu import localmap

from synth_utils import make_cfg, make_scene
from test_localmap import drive_frames, motion_poses
from test_prune import check_consistency


def test_outlier_obs_removed(rng):
    cfg = make_cfg()
    pts, bits = make_scene(rng)
    poses = motion_poses(11)
    ms, kfs = drive_frames(cfg, poses, poses, pts, bits)

    # clean map: nothing should be flagged
    ms1, n_bad = localmap.remove_outlier_obs(ms, jnp.asarray(kfs[-1]), cfg)
    assert int(n_bad) == 0

    # corrupt one map point's position → its observations become outliers
    mv = np.asarray(ms.mp_valid)
    victim = int(np.nonzero(mv)[0][0])
    ms_bad = ms._replace(
        mp_pos=ms.mp_pos.at[victim].add(jnp.asarray([5.0, 5.0, 3.0]))
    )
    ms2, n_bad2 = localmap.remove_outlier_obs(
        ms_bad, jnp.asarray(kfs[-1]), cfg
    )
    assert int(n_bad2) >= 1
    # victim's observations gone from every KF row
    assert not np.any(np.asarray(ms2.kf_obs_mp) == victim)
    # dropped below 2 observations → point killed
    assert not bool(ms2.mp_valid[victim])
    check_consistency(ms2)


def test_sharded_loop_detect(rng):
    import jax

    from se2lam_tpu.parallel import (
        make_mesh, shard_bank, sharded_bow_detect, sharded_hamming_detect,
    )

    mesh = make_mesh(8)
    K, W = 64, 128
    bank = jnp.asarray(rng.random((K, W)), jnp.float32)
    bank = bank / jnp.sum(jnp.abs(bank), axis=1, keepdims=True)
    q = bank[37]
    sb = shard_bank(bank, mesh)
    idx, score = sharded_bow_detect(sb, q, jnp.ones(K, bool))
    assert int(idx) == 37
    np.testing.assert_allclose(float(score), 1.0, atol=1e-5)
    # eligibility mask respected
    elig = jnp.ones(K, bool).at[37].set(False)
    idx2, _ = sharded_bow_detect(sb, q, elig)
    assert int(idx2) != 37

    desc = jnp.asarray(
        1 - 2 * rng.integers(0, 2, (K, 256)).astype(np.int8)
    )
    db = shard_bank(desc, mesh)
    i, d = sharded_hamming_detect(db, desc[11][None])
    assert int(i) == 11 and float(d) == 0.0
    # a zeroed (padded/pruned) row scores a flat 128 against any query —
    # on a miss it would win the argmin unless masked out. Make the miss
    # total: EVERY valid row is the query's complement (distance 256),
    # so the padded row's 128 wins the argmin iff the mask is dropped
    desc_pad = jnp.broadcast_to(desc[11], desc.shape).at[5].set(0)
    valid = jnp.ones(K, bool).at[5].set(False)
    db_pad = shard_bank(desc_pad, mesh)
    far = -desc[11][None]
    i3, d3 = sharded_hamming_detect(db_pad, far, valid)
    assert int(i3) != 5
    assert float(d3) == 256.0  # the honest miss distance, not the pad's 128
