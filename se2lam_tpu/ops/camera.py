"""Pinhole camera model: projection, distortion, undistortion.

TPU-native equivalent of the reference's camera handling. The reference
undistorts the *whole image* per frame (src/Frame.cpp:19-82, cv::undistort)
before feature extraction; we instead extract features on the raw image and
undistort the keypoint *coordinates* (iterative inverse of the radial-
tangential model) — far cheaper and the standard choice in ORB-SLAM-family
systems. Projection matches cvu::camprjc (src/cvutil.cpp:86).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["CameraModel", "project", "distort_normalized", "undistort_points"]


class CameraModel(NamedTuple):
    """Static camera intrinsics. fx/fy/cx/cy scalars, dist = (k1,k2,p1,p2,k3)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # (5,)

    @staticmethod
    def create(fx, fy, cx, cy, dist=None, dtype=jnp.float32):
        d = jnp.zeros(5, dtype) if dist is None else jnp.asarray(dist, dtype)
        d = jnp.pad(d, (0, 5 - d.shape[0]))
        return CameraModel(
            jnp.asarray(fx, dtype),
            jnp.asarray(fy, dtype),
            jnp.asarray(cx, dtype),
            jnp.asarray(cy, dtype),
            d,
        )

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )


def project(cam: CameraModel, pts_c):
    """Project camera-frame 3D point(s) (..., 3) to pixels (..., 2).

    No distortion — matches the reference which projects into the
    undistorted image (cvu::camprjc, src/cvutil.cpp:86).
    """
    z = pts_c[..., 2]
    inv_z = 1.0 / z
    u = cam.fx * pts_c[..., 0] * inv_z + cam.cx
    v = cam.fy * pts_c[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def distort_normalized(cam: CameraModel, xy):
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: CameraModel, uv, iters: int = 20):
    """Undistort pixel coords (..., 2) → undistorted pixel coords.

    Fixed-point iteration inverting ``distort_normalized`` (the same
    algorithm as cv::undistortPoints), bounded iterations for jit.
    """
    f = jnp.stack([cam.fx, cam.fy], axis=-1)
    c = jnp.stack([cam.cx, cam.cy], axis=-1)
    xy_d = (uv - c) / f

    def body(_, xy):
        d = distort_normalized(cam, xy) - xy
        return xy_d - d

    xy = jax.lax.fori_loop(0, iters, body, xy_d)
    return xy * f + c
