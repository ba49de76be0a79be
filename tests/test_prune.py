"""Keyframe pruning tests (Map::pruneRedundantKF, src/Map.cpp:146-283):
redundant interior KFs are removed, the odometry chain is spliced with a
composed preintegration, and observation lists stay consistent."""
import jax
import jax.numpy as jnp
import numpy as np

from se2lam_tpu import localmap
from se2lam_tpu.ops import se2

from synth_utils import feats_at, make_cfg, make_scene
from test_localmap import drive_frames, motion_poses


def dense_map(rng):
    """Slow forward motion with KFs every frame → heavy redundancy."""
    cfg = make_cfg(min_frames_between_kf=1, max_frames_between_kf=2)
    pts, bits = make_scene(rng, n=64, depth=(3.0, 8.0))
    poses = motion_poses(17, step=(0.08, 0.05, 0.01))
    ms, kfs = drive_frames(cfg, poses, poses, pts, bits)
    return cfg, ms, kfs


def check_consistency(ms):
    obs_kf = np.asarray(ms.mp_obs_kf)
    obs_ft = np.asarray(ms.mp_obs_feat)
    kf_obs = np.asarray(ms.kf_obs_mp)
    n_obs = np.asarray(ms.mp_n_obs)
    mv = np.asarray(ms.mp_valid)
    kv = np.asarray(ms.kf_valid)
    for m in np.nonzero(mv)[0]:
        for p in range(n_obs[m]):
            k, f = obs_kf[m, p], obs_ft[m, p]
            assert k >= 0 and kv[k], (m, p, k)
            assert kf_obs[k, f] == m, (m, p, k, f, kf_obs[k, f])
    # forward → inverse: every claimed observation must appear in the
    # point's observer list (catches dangling forward pointers)
    for k in np.nonzero(kv)[0]:
        for f in np.nonzero(kf_obs[k] >= 0)[0]:
            m = kf_obs[k, f]
            assert mv[m], (k, f, m)
            recorded = any(
                obs_kf[m, p] == k and obs_ft[m, p] == f
                for p in range(n_obs[m])
            )
            assert recorded, (k, f, m)


def test_prune_removes_redundant_kf(rng):
    cfg, ms, kfs = dense_map(rng)
    n_valid_before = int(jnp.sum(ms.kf_valid))
    assert n_valid_before >= 6

    ms2, kid = localmap.prune_redundant_kf(ms, jnp.asarray(kfs[-1]))
    kid = int(kid)
    assert kid >= 0, "no redundant KF found in a dense map"
    assert not bool(ms2.kf_valid[kid])
    assert int(jnp.sum(ms2.kf_valid)) == n_valid_before - 1
    # pruned KF's row cleared; no MP list references it
    assert int((ms2.kf_obs_mp[kid] >= 0).sum()) == 0
    assert not np.any(np.asarray(ms2.mp_obs_kf) == kid)
    check_consistency(ms2)


def test_prune_splices_odometry_chain(rng):
    cfg, ms, kfs = dense_map(rng)
    ms2, kid = localmap.prune_redundant_kf(ms, jnp.asarray(kfs[-1]))
    kid = int(kid)
    assert kid >= 0
    nxt_arr = np.asarray(ms.kf_pre_next)
    prev = int(np.nonzero(nxt_arr == kid)[0][0])
    nxt = int(nxt_arr[kid])
    # chain now skips the pruned KF
    assert int(ms2.kf_pre_next[prev]) == nxt
    assert int(ms2.kf_pre_next[kid]) == -1
    # composed measurement equals the direct relative odometry
    odo_prev = np.asarray(ms.kf_odom[prev])
    odo_next = np.asarray(ms.kf_odom[nxt])
    direct = np.asarray(
        se2.minus(jnp.asarray(odo_next), jnp.asarray(odo_prev))
    )
    np.testing.assert_allclose(
        np.asarray(ms2.kf_pre_meas[prev]), direct, atol=1e-5
    )
    # covariance stays SPD
    ev = np.linalg.eigvalsh(np.asarray(ms2.kf_pre_cov[prev]))
    assert (ev > 0).all()


def test_prune_ignores_culled_points_stale_inverse_rows(rng):
    """Culling invalidates a point and clears its FORWARD pointers but
    leaves the inverse observation row stale (MapPoint::setNull leaves
    the dead object behind too). The redundancy count is taken from the
    inverse tables, so it must mask by mp_valid — stale rows of culled
    well-observed points would otherwise inflate every observer's
    well-seen ratio (above 1 in the limit) and over-prune."""
    cfg, ms, kfs = dense_map(rng)

    # Build the post-cull state: keep 8 survivor points TRUNCATED to
    # their last two observers (n_obs = 2, i.e. not well-seen), cull
    # everything else clearing forward pointers ONLY — exactly the shape
    # add_keyframe's parallax kill and merge_loop_mps leave behind
    # (MapPoint::setNull also leaves the dead object's lists around).
    # The correct redundancy ratio is then 0 for every keyframe (no
    # well-seen forward entry exists) and NOTHING is prunable, while the
    # stale inverse rows still carry every old well-seen observation.
    mv = np.asarray(ms.mp_valid)
    obs_kf = np.asarray(ms.mp_obs_kf).copy()
    obs_ft = np.asarray(ms.mp_obs_feat).copy()
    kf_obs = np.asarray(ms.kf_obs_mp).copy()
    n_obs = np.asarray(ms.mp_n_obs)
    surv = np.nonzero(mv & (n_obs >= 3))[0][:8]
    assert len(surv) >= 4, "scene has too few well-observed points"
    for m in surv:  # drop all but the LAST two observations (late =
        n = int(n_obs[m])  # interior keyframes keep forward entries)
        for p in range(0, n - 2):
            kf_obs[obs_kf[m, p], obs_ft[m, p]] = -1
        obs_kf[m, : 2] = obs_kf[m, n - 2 : n]
        obs_ft[m, : 2] = obs_ft[m, n - 2 : n]
        obs_kf[m, 2:] = -1
        obs_ft[m, 2:] = -1
    cull = mv.copy()
    cull[surv] = False
    cullm = (kf_obs >= 0) & cull[np.clip(kf_obs, 0, None)]
    kf_obs[cullm] = -1
    ms_culled = ms._replace(
        mp_valid=jnp.asarray(mv & ~cull),
        mp_obs_kf=jnp.asarray(obs_kf),
        mp_obs_feat=jnp.asarray(obs_ft),
        mp_n_obs=jnp.asarray(
            np.where(np.isin(np.arange(ms.M), surv), 2, n_obs)
        ),
        kf_obs_mp=jnp.asarray(kf_obs),
    )
    check_consistency(ms_culled)
    # interior KFs must retain forward entries, or the n_mp_kf > 0 gate
    # would mask the statistic under test
    n_mp_kf = (kf_obs >= 0).sum(1)
    assert (n_mp_kf[2:] > 0).any(), "no interior KF kept a survivor"

    ms2, kid = localmap.prune_redundant_kf(
        ms_culled, jnp.asarray(kfs[-1])
    )
    assert int(kid) == -1, (
        f"pruned KF {int(kid)} whose true well-seen ratio is 0 — the "
        "inverse-table count included stale rows of culled points"
    )


def test_prune_noop_when_nothing_redundant(rng):
    """A sparse map (long baseline, few shared MPs) must not be pruned."""
    cfg = make_cfg()
    pts, bits = make_scene(rng)
    poses = motion_poses(5, step=(0.4, 0.3, 0.05))
    ms, kfs = drive_frames(cfg, poses, poses, pts, bits)
    # strip covisibility info to below the redundancy bar: drop every MP
    # to ≤2 observers by truncating observation lists
    n_obs = jnp.minimum(ms.mp_n_obs, 2)
    P = ms.mp_obs_kf.shape[1]
    keep = jax.lax.broadcasted_iota(jnp.int32, ms.mp_obs_kf.shape, 1) < 2
    ms = ms._replace(
        mp_n_obs=n_obs,
        mp_obs_kf=jnp.where(keep, ms.mp_obs_kf, -1),
        mp_obs_feat=jnp.where(keep, ms.mp_obs_feat, -1),
    )
    ms2, kid = localmap.prune_redundant_kf(ms, jnp.asarray(kfs[-1]))
    assert int(kid) == -1
    np.testing.assert_array_equal(
        np.asarray(ms.kf_valid), np.asarray(ms2.kf_valid)
    )


def test_ba_works_after_prune(rng):
    cfg, ms, kfs = dense_map(rng)
    ms2, kid = localmap.prune_redundant_kf(ms, jnp.asarray(kfs[-1]))
    assert int(kid) >= 0
    ms3, info = localmap.run_local_ba(ms2, jnp.asarray(kfs[-1]), cfg)
    assert np.isfinite(float(info["chi2"]))
    assert np.isfinite(np.asarray(ms3.kf_pose)).all()


def test_prune_skips_ftr_edge_endpoints(rng):
    """A KF that anchors a verified loop/feature constraint must not be
    pruned: unlike odometry edges (spliced via composed preintegration),
    a ftr edge has no re-targeting machinery — dropping its endpoint
    would silently discard paid-for loop information."""
    cfg, ms, kfs = dense_map(rng)
    _, kid = localmap.prune_redundant_kf(ms, jnp.asarray(kfs[-1]))
    kid = int(kid)
    assert kid >= 0
    # pin a feature edge onto the KF prune would otherwise pick
    ms_ftr = ms._replace(
        ftr_i=ms.ftr_i.at[0].set(kid),
        ftr_j=ms.ftr_j.at[0].set(0),
        ftr_valid=ms.ftr_valid.at[0].set(True),
    )
    ms2, kid2 = localmap.prune_redundant_kf(ms_ftr, jnp.asarray(kfs[-1]))
    assert int(kid2) != kid
    assert bool(ms2.kf_valid[kid])
    # an INVALID edge row naming the same KF must not protect it
    ms_stale = ms._replace(
        ftr_i=ms.ftr_i.at[0].set(kid),
        ftr_j=ms.ftr_j.at[0].set(0),
    )
    _, kid3 = localmap.prune_redundant_kf(ms_stale, jnp.asarray(kfs[-1]))
    assert int(kid3) == kid
    # the capacity escape hatch (min_ratio <= 0) overrides the
    # protection — and the orphaned edge is dropped with its endpoint
    ms4, kid4 = localmap.prune_redundant_kf(
        ms_ftr, jnp.asarray(kfs[-1]), min_ratio=0.0
    )
    assert int(kid4) >= 0
    if int(kid4) == kid:
        assert not bool(ms4.ftr_valid[0])


def test_ftr_bank_full_evicts_weakest(rng):
    """A full constraint bank evicts the lowest-information edge for a
    new verified one (endpoints are prune-protected, so without eviction
    a full bank would reject every later loop closure)."""
    from se2lam_tpu import loopclose

    cfg, ms, kfs = dense_map(rng)
    F = ms.ftr_valid.shape[0]
    info = jnp.tile(jnp.eye(3, dtype=jnp.float32), (F, 1, 1)) * (
        10.0 + jnp.arange(F, dtype=jnp.float32)[:, None, None]
    )
    ms_full = ms._replace(
        ftr_i=jnp.arange(F, dtype=jnp.int32) % 4,
        ftr_j=(jnp.arange(F, dtype=jnp.int32) % 4) + 4,
        ftr_info=info.at[2].set(jnp.eye(3) * 0.5),  # slot 2 weakest
        ftr_valid=jnp.ones(F, bool),
    )
    new_info = jnp.eye(3, dtype=jnp.float32) * 50.0
    # default policy (covisibility densification): full bank DROPS
    ms_drop = loopclose.add_ftr_edge(
        ms_full, jnp.int32(1), jnp.int32(9),
        jnp.zeros(3, jnp.float32), new_info,
    )
    np.testing.assert_array_equal(np.asarray(ms_drop.ftr_i),
                                  np.asarray(ms_full.ftr_i))
    # loop-closure policy: full bank evicts the weakest edge
    ms2 = loopclose.add_ftr_edge(
        ms_full, jnp.int32(1), jnp.int32(9),
        jnp.zeros(3, jnp.float32), new_info, evict_if_full=True,
    )
    assert int(ms2.ftr_i[2]) == 1 and int(ms2.ftr_j[2]) == 9
    assert bool(ms2.ftr_valid[2])
    np.testing.assert_allclose(np.asarray(ms2.ftr_info[2]),
                               np.asarray(new_info))
    # a non-full bank still fills the first free slot
    ms_gap = ms_full._replace(ftr_valid=ms_full.ftr_valid.at[5].set(False))
    ms3 = loopclose.add_ftr_edge(
        ms_gap, jnp.int32(1), jnp.int32(9),
        jnp.zeros(3, jnp.float32), new_info,
    )
    assert bool(ms3.ftr_valid[5]) and int(ms3.ftr_i[5]) == 1


def test_append_obs_overflow_masked(rng):
    """Appends past the fan-in capacity P are dropped AND reported: the
    returned mask is what keeps callers from writing a forward pointer
    with no inverse entry (the dangling-pointer class check_consistency
    catches)."""
    cfg, ms, kfs = dense_map(rng)
    P = ms.mp_obs_kf.shape[1]
    victim = int(np.nonzero(np.asarray(ms.mp_valid))[0][0])
    ms_full = ms._replace(mp_n_obs=ms.mp_n_obs.at[victim].set(P))
    idx = jnp.asarray([victim], jnp.int32)
    ft = jnp.asarray([3], jnp.int32)
    on = jnp.asarray([True])
    ms2, ok = localmap._append_obs(
        ms_full, idx, jnp.asarray(kfs[-1]), ft, on
    )
    assert not bool(ok[0])
    assert int(ms2.mp_n_obs[victim]) == P
    np.testing.assert_array_equal(
        np.asarray(ms2.mp_obs_kf[victim]),
        np.asarray(ms_full.mp_obs_kf[victim]),
    )
    # a non-full point still lands and reports True
    ms3, ok3 = localmap._append_obs(ms, idx, jnp.asarray(kfs[-1]), ft, on)
    assert bool(ok3[0])
    assert int(ms3.mp_n_obs[victim]) == int(ms.mp_n_obs[victim]) + 1
