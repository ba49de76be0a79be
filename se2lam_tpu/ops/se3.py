"""SE(3) matrix-group operations, batched and jit-friendly.

TPU-native re-derivation of the reference's cvutil SE3 helpers and the
SO(3)/SE(3) exp/log machinery used by its pose graph and sparsifier
(reference: src/cvutil.cpp:15-43, src/optimizer.cpp:64-157).

Transforms are (..., 4, 4) homogeneous matrices. Twists are (..., 6)
ordered ``[rho(3), phi(3)]`` = [translation part, rotation part], matching
g2o's SE3Quat::log vector order used by the reference ([upsilon, omega] in
g2o is actually [omega, upsilon]; we document OUR order here and keep it
consistent internally).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "skew",
    "inv",
    "apply",
    "so3_exp",
    "so3_log",
    "se3_exp",
    "se3_log",
    "adjoint",
    "make_rt",
]

_EPS = 1e-8


def skew(v):
    """Skew-symmetric matrix/matrices of 3-vector(s). Shape (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    rows = [
        jnp.stack([o, -z, y], axis=-1),
        jnp.stack([z, o, -x], axis=-1),
        jnp.stack([-y, x, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def make_rt(R, t):
    """Assemble (..., 4, 4) from rotation (..., 3, 3) and translation (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def inv(T):
    """Fast SE(3) inverse: [Rᵀ, -Rᵀt] (reference cvu::inv, src/cvutil.cpp:15)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def apply(T, pt):
    """Transform 3D point(s): R·p + t (reference cvu::se3map, src/cvutil.cpp:100)."""
    return (
        jnp.einsum("...ij,...j->...i", T[..., :3, :3], pt) + T[..., :3, 3]
    )


def so3_exp(phi):
    """Rodrigues: axis-angle 3-vector(s) → rotation matrix (..., 3, 3)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    # Taylor-safe coefficients
    a = jnp.sinc(theta / jnp.pi)  # sin(theta)/theta
    b = jnp.where(
        theta2 > 1e-8,
        (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS),
        0.5 - theta2 / 24.0,
    )
    K = skew(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R):
    """Rotation matrix → axis-angle 3-vector(s)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # w = 2 sin(theta) * axis ; scale = theta / (2 sin theta), safe near 0
    sin_t = jnp.sin(theta)
    scale = jnp.where(
        jnp.abs(sin_t) > 1e-6,
        theta / jnp.maximum(2.0 * sin_t, _EPS),
        0.5 + theta * theta / 12.0,
    )
    return scale[..., None] * w
    # Note: theta ≈ pi is ill-conditioned here; planar SLAM never produces
    # near-pi relative rotations between consecutive/covisible KFs.


def _so3_left_jacobian(phi):
    """Left Jacobian of SO(3) (reference Jl, src/optimizer.cpp:64-80)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    K = skew(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    a = jnp.where(
        theta2 > 1e-8,
        (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS),
        0.5 - theta2 / 24.0,
    )
    b = jnp.where(
        theta2 > 1e-8,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS),
        1.0 / 6.0 - theta2 / 120.0,
    )
    return I + a[..., None, None] * K + b[..., None, None] * (K @ K)


def se3_exp(xi):
    """Twist [rho, phi] (..., 6) → SE(3) matrix (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return make_rt(R, t)


def se3_log(T):
    """SE(3) matrix → twist [rho, phi] (..., 6)."""
    phi = so3_log(T[..., :3, :3])
    V = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(V, T[..., :3, 3][..., :, None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def adjoint(T):
    """Adjoint of SE(3) in [rho, phi] ordering: (..., 6, 6).

    Ad(T) @ [rho, phi] = [R rho + [t]x R phi, R phi]. Matches g2o
    SE3Quat::adj() up to the block ordering documented at module top
    (reference uses [rot, trans]; used for plane-prior info transport,
    src/optimizer.cpp:293).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = skew(t) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
