"""Batched two-view DLT triangulation and parallax tests.

TPU-native equivalent of cvu::triangulate (src/cvutil.cpp:46-84, 4x4 SVD)
and cvu::checkParallax (src/cvutil.cpp:92-98). Instead of a per-point SVD
we form the 4x4 normal matrix AᵀA and take the eigenvector of its smallest
eigenvalue via ``jnp.linalg.eigh`` — identical null-space, batches cleanly.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["triangulate", "check_parallax", "parallax_cos"]

# cos thresholds for 1..4 degrees of minimum parallax
# (reference minCos table, src/cvutil.cpp:93)
_MIN_COS = (0.9998, 0.9994, 0.9986, 0.9976)


def triangulate(pt1, pt2, P1, P2):
    """DLT triangulation.

    pt1, pt2: (..., 2) pixel coords in views 1/2.
    P1, P2:   (..., 3, 4) projection matrices (K [R|t]).
    Returns (..., 3) homogeneous-normalized 3D points (in the frame the
    P matrices map from).
    """
    rows = [
        pt1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        pt1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        pt2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        pt2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    # eigh returns ascending eigenvalues: null vector = first column
    _, vecs = jnp.linalg.eigh(AtA)
    x = vecs[..., :, 0]
    w = x[..., 3]
    # Guard w≈0 (point at infinity) — produces a huge-depth point that the
    # caller's depth gate rejects, same net effect as the reference.
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return x[..., :3] / w[..., None]


def parallax_cos(o1, o2, pt3):
    """|cos| of ray angle from camera centers o1,o2 to point pt3 (... ,3)."""
    p1 = pt3 - o1
    p2 = pt3 - o2
    num = jnp.abs(jnp.sum(p1 * p2, axis=-1))
    den = jnp.linalg.norm(p1, axis=-1) * jnp.linalg.norm(p2, axis=-1)
    return num / jnp.maximum(den, 1e-12)


def check_parallax(o1, o2, pt3, min_degree: int):
    """True where parallax exceeds min_degree (1..4)
    (reference cvu::checkParallax, src/cvutil.cpp:92)."""
    return parallax_cos(o1, o2, pt3) < _MIN_COS[min_degree - 1]
