"""SE(2) group operations, batched and jit-friendly.

TPU-native re-derivation of the reference ``Se2`` struct algebra
(reference: src/Config.cpp:193-245, include/se2lam/Config.h:15-41).

Poses are arrays whose last dimension is 3: ``(x, y, theta)``. All ops
broadcast over leading dimensions so they vmap/batch for free.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "normalize_angle",
    "compose",
    "inv",
    "minus",
    "to_se3",
    "from_se3",
    "rot2",
    "apply",
]


def normalize_angle(theta):
    """Wrap angle(s) to [-pi, pi) — note +pi maps to -pi."""
    return theta - 2.0 * jnp.pi * jnp.floor((theta + jnp.pi) / (2.0 * jnp.pi))


def rot2(theta):
    """2x2 rotation matrix/matrices for angle(s). Shape (..., 2, 2)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def compose(a, b):
    """Group composition a ∘ b (reference Se2::operator+, src/Config.cpp:205)."""
    ax, ay, at = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bt = b[..., 0], b[..., 1], b[..., 2]
    c, s = jnp.cos(at), jnp.sin(at)
    return jnp.stack(
        [
            ax + bx * c - by * s,
            ay + bx * s + by * c,
            normalize_angle(at + bt),
        ],
        axis=-1,
    )


def inv(a):
    """Group inverse (reference Se2::inv, src/Config.cpp:198)."""
    x, y, t = a[..., 0], a[..., 1], a[..., 2]
    c, s = jnp.cos(t), jnp.sin(t)
    return jnp.stack([-c * x - s * y, s * x - c * y, normalize_angle(-t)], axis=-1)


def minus(a, b):
    """Relative pose b⁻¹ ∘ a (reference Se2::operator-, src/Config.cpp:215)."""
    dx = a[..., 0] - b[..., 0]
    dy = a[..., 1] - b[..., 1]
    dt = normalize_angle(a[..., 2] - b[..., 2])
    c, s = jnp.cos(b[..., 2]), jnp.sin(b[..., 2])
    return jnp.stack([c * dx + s * dy, -s * dx + c * dy, dt], axis=-1)


def to_se3(a):
    """SE(2) → 4x4 homogeneous SE(3) matrix, rotation about z
    (reference Se2::toCvSE3, src/Config.cpp:225). Shape (..., 4, 4)."""
    x, y, t = a[..., 0], a[..., 1], a[..., 2]
    c, s = jnp.cos(t), jnp.sin(t)
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows = [
        jnp.stack([c, -s, z, x], axis=-1),
        jnp.stack([s, c, z, y], axis=-1),
        jnp.stack([z, z, o, z], axis=-1),
        jnp.stack([z, z, z, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def from_se3(T):
    """4x4 SE(3) matrix → (x, y, yaw) (reference Se2::fromCvSE3,
    src/Config.cpp:238)."""
    yaw = jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
    return jnp.stack(
        [T[..., 0, 3], T[..., 1, 3], normalize_angle(yaw)], axis=-1
    )


def apply(a, pt):
    """Transform 2D point(s) by SE(2) pose(s). pt shape (..., 2)."""
    x, y, t = a[..., 0], a[..., 1], a[..., 2]
    c, s = jnp.cos(t), jnp.sin(t)
    px, py = pt[..., 0], pt[..., 1]
    return jnp.stack([x + c * px - s * py, y + s * px + c * py], axis=-1)
