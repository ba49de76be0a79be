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
from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.frontend.orb import OrbFeatures, pack_bits
from se2lam_tpu.ops import se2
from se2lam_tpu.tracking import init_track_state, track_frame


def body_to_cam():
    # camera looks along +x of the body: standard ground-robot rig
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64)
    T = np.eye(4)
    T[:3, :3] = R
    return T


def make_cfg(n_feats=64):
    Tbc = np.linalg.inv(body_to_cam())
    return SystemConfig(
        fx=420.0, fy=420.0, cx=320.0, cy=240.0,
        Tbc=tuple(Tbc.ravel()),
        max_feature_num=n_feats,
        upper_depth=50.0, lower_depth=0.1,
        min_frames_between_kf=2, max_frames_between_kf=10,
        cap=Capacity(n_features=n_feats, ransac_trials=64),
    )


def feats_from_scene(rng, cfg, pose_se2, pts_w, bits):
    """Project world points through an SE2 body pose into OrbFeatures."""
    N = pts_w.shape[0]
    Tcb = cfg.Tcb_mat
    Tbw = np.linalg.inv(se2_mat(pose_se2))
    Tcw = Tcb @ Tbw
    pc = (Tcw[:3, :3] @ pts_w.T).T + Tcw[:3, 3]
    u = cfg.fx * pc[:, 0] / pc[:, 2] + cfg.cx
    v = cfg.fy * pc[:, 1] / pc[:, 2] + cfg.cy
    xy = np.stack([u, v], -1).astype(np.float32)
    valid = (pc[:, 2] > 0.05) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
    b = jnp.asarray(bits)
    return OrbFeatures(
        xy=jnp.asarray(xy),
        angle=jnp.zeros(N, jnp.float32),
        octave=jnp.zeros(N, jnp.int32),
        response=jnp.ones(N, jnp.float32),
        valid=jnp.asarray(valid),
        desc_bits=pack_bits(b),
        desc_pm1=(1 - 2 * b.astype(jnp.int8)),
    )


def se2_mat(p):
    c, s = np.cos(p[2]), np.sin(p[2])
    T = np.eye(4)
    T[:2, :2] = [[c, -s], [s, c]]
    T[0, 3], T[1, 3] = p[0], p[1]
    return T


def setup_scene(rng, cfg, n=64):
    # landmarks 3-8 m ahead of the origin-facing camera (+x body)
    pts = np.stack(
        [
            rng.uniform(3.0, 8.0, n),
            rng.uniform(-2.0, 2.0, n),
            rng.uniform(-1.0, 1.0, n),
        ],
        -1,
    )
    bits = (rng.random((n, 256)) < 0.5).astype(np.uint8)
    return pts, bits


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
