"""Tracking-stage tests on synthetic scenes.

Covers the per-frame step semantics of the reference tracking thread
(src/Track.cpp:56-204): odometry-predicted pose, SE2 preintegration
accumulation, window matching + RANSAC survival on a rigid scene, the
triangulation depth gate, and the new-keyframe decision gates.
"""
import jax
import jax.numpy as jnp
import numpy as np

from se2lam_tpu import factors
from se2lam_tpu.ops import se2
from se2lam_tpu.tracking import init_track_state, track_frame

# scene/config/projection helpers are shared with the other stage tests
# (an earlier local copy of feats_at had dropped the z==0 divide guard)
from synth_utils import feats_at, make_cfg, make_scene, se2_mat


def feats_from_scene(rng, cfg, pose_se2, pts_w, bits):
    return feats_at(cfg, pose_se2, pts_w, bits)


def setup_scene(rng, cfg, n=64):
    # landmarks 3-8 m ahead of the origin-facing camera (+x body)
    return make_scene(rng, n=n, depth=(3.0, 8.0))


def run_step(ts, feats, odom, cfg, seed=0):
    return track_frame(ts, feats, jnp.asarray(odom, jnp.float32),
                       jax.random.PRNGKey(seed), cfg)


def test_pose_is_odometry_prediction(rng):
    """Vision never moves the live pose (src/Track.cpp:162-167)."""
    cfg = make_cfg()
    pts, bits = setup_scene(rng, cfg)
    odo0 = np.array([0.0, 0.0, 0.0], np.float32)
    f0 = feats_from_scene(rng, cfg, odo0, pts, bits)
    ts = init_track_state(
        f0, odo0, odo0, 0,
        view_mp=jnp.zeros((64, 3), jnp.float32),
        obs_mask=jnp.zeros(64, bool),
    )
    odo1 = np.array([0.25, 0.05, 0.1], np.float32)
    f1 = feats_from_scene(rng, cfg, odo1, pts, bits)
    ts2, res = run_step(ts, f1, odo1, cfg)
    expect = se2.compose(jnp.asarray(odo0), se2.minus(jnp.asarray(odo1), jnp.asarray(odo0)))
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(expect), atol=1e-5)


def test_matches_survive_rigid_motion(rng):
    cfg = make_cfg()
    pts, bits = setup_scene(rng, cfg)
    odo0 = np.array([0.0, 0.0, 0.0], np.float32)
    f0 = feats_from_scene(rng, cfg, odo0, pts, bits)
    ts = init_track_state(
        f0, odo0, odo0, 0,
        view_mp=jnp.zeros((64, 3), jnp.float32),
        obs_mask=jnp.zeros(64, bool),
    )
    odo1 = np.array([0.15, 0.02, 0.03], np.float32)
    f1 = feats_from_scene(rng, cfg, odo1, pts, bits)
    ts2, res = run_step(ts, f1, odo1, cfg)
    assert int(res.n_matched) > 30
    # matched indices agree with identity correspondence (same landmark order)
    m = np.asarray(ts2.match_idx)
    hits = m[m >= 0]
    idx = np.nonzero(m >= 0)[0]
    assert np.mean(hits == idx) > 0.9


def test_preintegration_accumulates(rng):
    cfg = make_cfg()
    pts, bits = setup_scene(rng, cfg)
    odo = np.array([0.0, 0.0, 0.0], np.float32)
    f0 = feats_from_scene(rng, cfg, odo, pts, bits)
    ts = init_track_state(
        f0, odo, odo, 0,
        view_mp=jnp.zeros((64, 3), jnp.float32),
        obs_mask=jnp.zeros(64, bool),
    )
    deltas = [np.array([0.1, 0.0, 0.05], np.float32),
              np.array([0.1, 0.01, 0.05], np.float32)]
    cur = odo.copy()
    expect_meas = jnp.zeros(3)
    expect_cov = jnp.zeros((3, 3))
    noise = jnp.asarray([cfg.odo_x_noise, cfg.odo_y_noise, cfg.odo_t_noise])
    for i, d in enumerate(deltas):
        nxt = np.asarray(se2.compose(jnp.asarray(cur), jnp.asarray(d)), np.float32)
        d_odo = se2.minus(jnp.asarray(nxt), jnp.asarray(cur))
        expect_meas, expect_cov = factors.preintegrate_se2(
            expect_meas, expect_cov, d_odo, noise
        )
        f = feats_from_scene(rng, cfg, nxt, pts, bits)
        ts, _ = run_step(ts, f, nxt, cfg, seed=i)
        cur = nxt
    np.testing.assert_allclose(np.asarray(ts.pre_meas), np.asarray(expect_meas), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts.pre_cov), np.asarray(expect_cov), atol=1e-7)
    assert np.all(np.linalg.eigvalsh(np.asarray(ts.pre_cov)) > 0)


def test_triangulation_fills_local_mps(rng):
    """After min_frames, new matches triangulate into camera-frame estimates
    close to ground truth (doTriangulate, src/Track.cpp:378-419)."""
    cfg = make_cfg()
    pts, bits = setup_scene(rng, cfg)
    odo0 = np.array([0.0, 0.0, 0.0], np.float32)
    f0 = feats_from_scene(rng, cfg, odo0, pts, bits)
    ts = init_track_state(
        f0, odo0, odo0, 0,
        view_mp=jnp.zeros((64, 3), jnp.float32),
        obs_mask=jnp.zeros(64, bool),
    )
    # small steps (window matcher needs <20 px/frame) accumulating baseline
    for i, o in enumerate(
        [[0.1, 0.1, 0.0], [0.2, 0.2, 0.0], [0.3, 0.3, 0.0], [0.4, 0.4, 0.0]]
    ):
        odo = np.asarray(o, np.float32)
        f = feats_from_scene(rng, cfg, odo, pts, bits)
        ts, res = run_step(ts, f, odo, cfg, seed=i)
    lm = np.asarray(ts.local_mps)
    lv = np.asarray(ts.local_mp_valid)
    assert lv.sum() > 20
    # ground truth in ref-camera frame
    Tcw = cfg.Tcb_mat @ np.linalg.inv(se2_mat(odo0))
    gt_c = (Tcw[:3, :3] @ pts.T).T + Tcw[:3, 3]
    err = np.linalg.norm(lm[lv] - gt_c[lv], axis=1)
    assert np.median(err) < 0.1


def test_need_kf_on_max_frames(rng):
    cfg = make_cfg()
    pts, bits = setup_scene(rng, cfg)
    odo = np.array([0.0, 0.0, 0.0], np.float32)
    f0 = feats_from_scene(rng, cfg, odo, pts, bits)
    ts = init_track_state(
        f0, odo, odo, 0,
        view_mp=jnp.zeros((64, 3), jnp.float32),
        obs_mask=jnp.zeros(64, bool),
    )
    need = False
    cur = odo
    for i in range(12):
        nxt = np.asarray(
            se2.compose(jnp.asarray(cur), jnp.asarray([0.05, 0.0, 0.01])),
            np.float32,
        )
        f = feats_from_scene(rng, cfg, nxt, pts, bits)
        ts, res = run_step(ts, f, nxt, cfg, seed=i)
        cur = nxt
        if bool(res.need_kf):
            need = True
            break
    assert need  # max_frames_between_kf=10 must force a KF within 12 frames
