"""Fleet tracking tests: a vmapped batch of robots must match running
each robot alone, and the robot axis must shard over the mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.frontend.orb import OrbConfig
from se2lam_tpu.io import SyntheticWorld
from se2lam_tpu.parallel import make_fleet_tracker, make_mesh, shard_fleet

from synth_utils import TCB


def fleet_cfg():
    oc = OrbConfig(height=120, width=160, n_features=128,
                   scale_factor=1.2, n_levels=2)
    cfg = SystemConfig(
        width=160, height=120, fx=130.0, fy=130.0, cx=80.0, cy=60.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        upper_depth=30.0, lower_depth=0.2,
        max_feature_num=128, max_level=2,
        min_frames_between_kf=2, max_frames_between_kf=8,
        cap=Capacity(n_features=oc.n_slots, max_kfs=16, max_mps=512,
                     ransac_trials=32),
    )
    return cfg, oc


def make_streams(cfg, B, T):
    worlds = [SyntheticWorld(cfg, n_landmarks=300, seed=s) for s in range(B)]
    imgs, odos = [], []
    for w in worlds:
        gt = w.circle_trajectory(T + 1, radius=2.0)
        imgs.append(np.stack([w.render(gt[t]) for t in range(T + 1)]))
        odos.append(gt[: T + 1])
    return (
        np.stack(imgs),                      # (B, T+1, H, W)
        np.stack(odos).astype(np.float32),   # (B, T+1, 3)
    )


def test_fleet_matches_single(rng):
    cfg, oc = fleet_cfg()
    B, T = 3, 4
    imgs, odos = make_streams(cfg, B, T)
    init_fn, step_fn, extract_fn = make_fleet_tracker(cfg, oc)

    f0_b = extract_fn(jnp.asarray(imgs[:, 0]))
    ts_b = init_fn(f0_b, jnp.asarray(odos[:, 0]), jnp.asarray(odos[:, 0]))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    poses_batched = []
    for t in range(1, T + 1):
        ts_b, res_b = step_fn(
            ts_b, jnp.asarray(imgs[:, t]), jnp.asarray(odos[:, t]), keys
        )
        poses_batched.append(np.asarray(res_b.pose))
    poses_batched = np.stack(poses_batched)   # (T, B, 3)

    # single-robot runs
    for b in range(B):
        f0 = extract_fn(jnp.asarray(imgs[b : b + 1, 0]))
        ts = init_fn(f0, jnp.asarray(odos[b : b + 1, 0]),
                     jnp.asarray(odos[b : b + 1, 0]))
        for t in range(1, T + 1):
            ts, res = step_fn(
                ts, jnp.asarray(imgs[b : b + 1, t]),
                jnp.asarray(odos[b : b + 1, t]), keys[b : b + 1],
            )
            np.testing.assert_allclose(
                np.asarray(res.pose)[0], poses_batched[t - 1, b], atol=1e-5
            )


def test_fleet_shards_over_mesh(rng):
    cfg, oc = fleet_cfg()
    B, T = 8, 2
    imgs, odos = make_streams(cfg, B, T)
    init_fn, step_fn, extract_fn = make_fleet_tracker(cfg, oc)
    mesh = make_mesh(8)

    imgs_d = shard_fleet(jnp.asarray(imgs[:, 0]), mesh)
    f0_b = extract_fn(imgs_d)
    ts_b = init_fn(f0_b, jnp.asarray(odos[:, 0]), jnp.asarray(odos[:, 0]))
    ts_b = shard_fleet(ts_b, mesh)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    for t in range(1, T + 1):
        ts_b, res_b = step_fn(
            ts_b, shard_fleet(jnp.asarray(imgs[:, t]), mesh),
            jnp.asarray(odos[:, t]), keys,
        )
    pose = np.asarray(res_b.pose)
    assert pose.shape == (B, 3)
    assert np.isfinite(pose).all()
    # each robot followed its own odometry
    np.testing.assert_allclose(pose, odos[:, T], atol=1e-4)

    # mesh-aware tracker: extraction as shard_map (parallel across
    # devices, sequential only within a device's chunk) must reproduce
    # the plain tracker's poses exactly
    init_m, step_m, extract_m = make_fleet_tracker(cfg, oc, mesh=mesh)
    f0_m = extract_m(shard_fleet(jnp.asarray(imgs[:, 0]), mesh))
    ts_m = shard_fleet(init_m(f0_m, jnp.asarray(odos[:, 0]),
                              jnp.asarray(odos[:, 0])), mesh)
    for t in range(1, T + 1):
        ts_m, res_m = step_m(
            ts_m, shard_fleet(jnp.asarray(imgs[:, t]), mesh),
            jnp.asarray(odos[:, t]), keys,
        )
    np.testing.assert_allclose(np.asarray(res_m.pose), pose, atol=1e-5)
