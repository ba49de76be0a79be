"""Shared synthetic-scene helpers for stage-level tests: project landmark
sets through SE(2) body poses into OrbFeatures records with stable random
descriptors (no rendering, no extractor — isolates the geometry path)."""
import jax.numpy as jnp
import numpy as np

from se2lam_tpu.config import Capacity, SystemConfig
from se2lam_tpu.frontend.orb import OrbFeatures, pack_bits

TCB = np.array(
    [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float64
)


def make_cfg(n_feats=64, **kw):
    base = dict(
        fx=420.0, fy=420.0, cx=320.0, cy=240.0,
        Tbc=tuple(np.linalg.inv(TCB).ravel()),
        max_feature_num=n_feats,
        upper_depth=50.0, lower_depth=0.1,
        min_frames_between_kf=2, max_frames_between_kf=10,
        cap=Capacity(
            n_features=n_feats, ransac_trials=64,
            max_kfs=64, max_mps=512, local_kfs=8, local_ref_kfs=8,
            local_mps=256,
        ),
    )
    base.update(kw)
    return SystemConfig(**base)


def se2_mat(p):
    c, s = np.cos(p[2]), np.sin(p[2])
    T = np.eye(4)
    T[:2, :2] = [[c, -s], [s, c]]
    T[0, 3], T[1, 3] = p[0], p[1]
    return T


def make_scene(rng, n=64, depth=(3.0, 8.0)):
    pts = np.stack(
        [
            rng.uniform(*depth, n),
            rng.uniform(-2.0, 2.0, n),
            rng.uniform(-1.0, 1.0, n),
        ],
        -1,
    )
    bits = (rng.random((n, 256)) < 0.5).astype(np.uint8)
    return pts, bits


def feats_at(cfg, pose, pts, bits):
    """OrbFeatures of the scene viewed from an SE(2) body pose."""
    N = pts.shape[0]
    Tcw = TCB @ np.linalg.inv(se2_mat(pose))
    pc = (Tcw[:3, :3] @ pts.T).T + Tcw[:3, 3]
    z = np.where(pc[:, 2] == 0, 1.0, pc[:, 2])
    u = cfg.fx * pc[:, 0] / z + cfg.cx
    v = cfg.fy * pc[:, 1] / z + cfg.cy
    valid = (pc[:, 2] > 0.05) & (u > 0) & (u < cfg.width) & (v > 0) & (v < cfg.height)
    b = jnp.asarray(bits)
    return OrbFeatures(
        xy=jnp.asarray(np.stack([u, v], -1), jnp.float32),
        angle=jnp.zeros(N, jnp.float32),
        octave=jnp.zeros(N, jnp.int32),
        response=jnp.ones(N, jnp.float32),
        valid=jnp.asarray(valid),
        desc_bits=pack_bits(b),
        desc_pm1=(1 - 2 * b.astype(jnp.int8)),
    )
