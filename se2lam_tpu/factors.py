"""Factor residuals, analytic Jacobians, and information models.

TPU-native re-derivation of the reference's custom g2o factors:

- SE2-XYZ reprojection factor  (reference EdgeSE2XYZ, src/EdgeSE2XYZ.cpp:61-106)
- preintegrated-SE2 odometry factor (reference PreEdgeSE2,
  include/se2lam/EdgeSE2XYZ.h:62-102)
- the marginalized plane-motion measurement covariance for SE2-XYZ edges
  (reference Map::loadLocalGraph, src/Map.cpp:1024-1049)
- SE2 odometry preintegration (reference Track::updateFramePose,
  src/Track.cpp:169-188)
- anisotropic triangulation information (reference Track::calcSE3toXYZInfo,
  src/Track.cpp:259-306)

Everything is written per-instance on unbatched inputs and composed with
``jax.vmap`` by the solver, so XLA sees one fused batched program.
"""
from __future__ import annotations

import jax.numpy as jnp

from .ops import se2, se3
from .ops.camera import CameraModel

__all__ = [
    "se2_to_se3_mat",
    "se2xyz_residual",
    "se2xyz_residual_jac",
    "se2xyz_sigma",
    "pre_se2_residual",
    "pre_se2_residual_jac",
    "preintegrate_se2",
    "se3_to_xyz_info",
]


def se2_to_se3_mat(pose):
    """(x,y,theta) → 4x4 SE(3), z=0 rotation about z (g2o SE2ToSE3,
    src/EdgeSE2XYZ.cpp:27)."""
    return se2.to_se3(pose)


def _camera_frame_point(pose, point_w, Tcb):
    """lc = Tcb · SE3(pose⁻¹) · X and Rcw."""
    Tbw = se2.to_se3(se2.inv(pose))
    Tcw = Tcb @ Tbw
    lc = se3.apply(Tcw, point_w)
    return lc, Tcw[..., :3, :3]


def _safe_z(z, eps: float = 1e-4):
    """Clamp |z| away from 0 so behind-camera/degenerate points produce
    large-but-FINITE residuals: a zero robust weight cannot mask NaN
    (0·NaN = NaN), so the projection itself must never emit one."""
    return jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)


def se2xyz_depth(pose, point_w, Tcb):
    """Camera-frame depth of a world point seen from an SE(2) body pose
    — the behind-camera guard statistic for the BA weight mask."""
    lc, _ = _camera_frame_point(pose, point_w, Tcb)
    return lc[..., 2]


def se2xyz_residual(pose, point_w, uv, cam: CameraModel, Tcb):
    """Reprojection error of world point through an SE(2) body pose.

    e = π(Tcb · SE3(ξ⁻¹) · X) − uv   (reference EdgeSE2XYZ::computeError,
    src/EdgeSE2XYZ.cpp:61-72).
    """
    lc, _ = _camera_frame_point(pose, point_w, Tcb)
    z = _safe_z(lc[..., 2])
    u = cam.fx * lc[..., 0] / z + cam.cx
    v = cam.fy * lc[..., 1] / z + cam.cy
    return jnp.stack([u, v], axis=-1) - uv


def huber_rho(chi2, delta):
    """Huber robust cost: χ² below the kink, 2δ√χ² − δ² above. Shared by
    every LM accept test so the solvers optimize one objective."""
    sqrt_chi = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(sqrt_chi > delta, 2.0 * delta * sqrt_chi - delta * delta,
                     chi2)


def pixel_jacobian(lc, cam: CameraModel):
    """∂(u,v)/∂(camera-frame point): the 2x3 pinhole Jacobian at ``lc``
    (z clamped away from 0)."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=lc.dtype), lc.shape[:-1] + (3, 3))
    return _proj_jac_rcw(lc, eye, cam)


def _proj_jac_rcw(lc, Rcw, cam: CameraModel):
    """J_π · Rcw  (2x3). The reference uses fx for both rows via g2o's
    single-focal CameraParameters (src/optimizer.cpp:207-215); we use
    fx/fy properly."""
    zinv = 1.0 / _safe_z(lc[..., 2])
    zinv2 = zinv * zinv
    zero = jnp.zeros_like(zinv)
    J_pi = jnp.stack(
        [
            jnp.stack([cam.fx * zinv, zero, -cam.fx * lc[..., 0] * zinv2], -1),
            jnp.stack([zero, cam.fy * zinv, -cam.fy * lc[..., 1] * zinv2], -1),
        ],
        axis=-2,
    )
    return J_pi @ Rcw


def se2xyz_residual_jac(pose, point_w, uv, cam: CameraModel, Tcb):
    """Residual + analytic Jacobians wrt pose (2x3) and point (2x3).

    Matches EdgeSE2XYZ::linearizeOplus (src/EdgeSE2XYZ.cpp:75-106):
      J_pose[:, :2] = −(JπRcw)[:, :2]
      J_pose[:, 2]  = (JπRcw · [X − p]ₓ)[:, 2]   with p = (x, y, 0)
      J_point       = JπRcw
    """
    lc, Rcw = _camera_frame_point(pose, point_w, Tcb)
    z = _safe_z(lc[..., 2])
    u = cam.fx * lc[..., 0] / z + cam.cx
    v = cam.fy * lc[..., 1] / z + cam.cy
    r = jnp.stack([u, v], axis=-1) - uv

    JR = _proj_jac_rcw(lc, Rcw, cam)  # (2, 3)
    pi = jnp.stack(
        [pose[..., 0], pose[..., 1], jnp.zeros_like(pose[..., 0])], axis=-1
    )
    J_theta = (JR @ se3.skew(point_w - pi))[..., :, 2:3]
    J_pose = jnp.concatenate([-JR[..., :, :2], J_theta], axis=-1)
    return r, J_pose, JR


def se2xyz_sigma(pose, point_w, lc, cam: CameraModel, Tcw, sigma2_uv,
                 sigma_rotxy, sigma_z):
    """2x2 measurement covariance marginalizing out-of-plane motion.

    Σ = σ_rotxy · J_rotxy J_rotxyᵀ + σ_z · J_z J_zᵀ + σ_uv² I
    (reference Map::loadLocalGraph, src/Map.cpp:1024-1046). ``lc`` is the
    point in the observing camera frame; ``Tcw`` that camera's pose.
    """
    Rcw = Tcw[..., :3, :3]
    JR = _proj_jac_rcw(lc, Rcw, cam)
    pi = jnp.stack(
        [pose[..., 0], pose[..., 1], jnp.zeros_like(pose[..., 0])], axis=-1
    )
    J_rotxy = (JR @ se3.skew(point_w - pi))[..., :2, :2]
    J_z = -JR[..., :, 2:3]
    eye = jnp.eye(2, dtype=JR.dtype)
    return (
        sigma_rotxy * (J_rotxy @ jnp.swapaxes(J_rotxy, -1, -2))
        + sigma_z * (J_z @ jnp.swapaxes(J_z, -1, -2))
        + sigma2_uv[..., None, None] * eye
    )


def pre_se2_residual(pose_i, pose_j, meas):
    """Preintegrated SE2 odometry error (PreEdgeSE2::computeError,
    include/se2lam/EdgeSE2XYZ.h:68-81).

    e[:2] = Rᵢᵀ(rⱼ − rᵢ) − Δr,  e[2] = θⱼ − θᵢ − Δθ (angle-normalized).
    """
    Ri = se2.rot2(pose_i[..., 2])
    rij = pose_j[..., :2] - pose_i[..., :2]
    e_xy = jnp.einsum("...ji,...j->...i", Ri, rij) - meas[..., :2]
    e_t = se2.normalize_angle(
        pose_j[..., 2] - pose_i[..., 2] - meas[..., 2]
    )
    return jnp.concatenate([e_xy, e_t[..., None]], axis=-1)


def pre_se2_residual_jac(pose_i, pose_j, meas):
    """Residual + analytic 3x3 Jacobians (PreEdgeSE2::linearizeOplus,
    include/se2lam/EdgeSE2XYZ.h:82-99)."""
    r = pre_se2_residual(pose_i, pose_j, meas)
    Ri = se2.rot2(pose_i[..., 2])
    RiT = jnp.swapaxes(Ri, -1, -2)
    rij = pose_j[..., :2] - pose_i[..., :2]
    rij_perp = jnp.stack([-rij[..., 1], rij[..., 0]], axis=-1)

    Ji = jnp.zeros(r.shape[:-1] + (3, 3), r.dtype)
    Ji = Ji.at[..., :2, :2].set(-RiT)
    Ji = Ji.at[..., :2, 2].set(
        -jnp.einsum("...ij,...j->...i", RiT, rij_perp)
    )
    Ji = Ji.at[..., 2, 2].set(-1.0)

    Jj = jnp.zeros_like(Ji)
    Jj = Jj.at[..., :2, :2].set(RiT)
    Jj = Jj.at[..., 2, 2].set(1.0)
    return r, Ji, Jj


def preintegrate_se2(meas, cov, d_odo, odo_noise):
    """One SE2 preintegration step (Track::updateFramePose,
    src/Track.cpp:169-188).

    meas (3,), cov (3,3): accumulated relative measurement + covariance.
    d_odo (3,): raw odometry delta this step (odom_k ⊖ odom_{k-1}).
    odo_noise (3,): per-step noise std (x, y, theta).
    Returns updated (meas, cov).
    """
    Phi = se2.rot2(meas[..., 2])
    dr = d_odo[..., :2]
    new_xy = meas[..., :2] + jnp.einsum("...ij,...j->...i", Phi, dr)
    new_t = meas[..., 2] + d_odo[..., 2]
    new_meas = jnp.concatenate([new_xy, new_t[..., None]], axis=-1)

    dr_perp = jnp.stack([-dr[..., 1], dr[..., 0]], axis=-1)
    Ak = jnp.broadcast_to(
        jnp.eye(3, dtype=meas.dtype), cov.shape
    ).at[..., :2, 2].set(jnp.einsum("...ij,...j->...i", Phi, dr_perp))
    Bk = jnp.broadcast_to(jnp.eye(3, dtype=meas.dtype), cov.shape)
    Bk = Bk.at[..., :2, :2].set(Phi)
    Sigma_v = jnp.zeros_like(cov)
    Sigma_v = Sigma_v.at[..., 0, 0].set(odo_noise[..., 0] ** 2)
    Sigma_v = Sigma_v.at[..., 1, 1].set(odo_noise[..., 1] ** 2)
    Sigma_v = Sigma_v.at[..., 2, 2].set(odo_noise[..., 2] ** 2)
    new_cov = (
        Ak @ cov @ jnp.swapaxes(Ak, -1, -2)
        + Bk @ Sigma_v @ jnp.swapaxes(Bk, -1, -2)
    )
    return new_meas, new_cov


def compose_preintegration(meas_a, cov_a, meas_b, cov_b):
    """Chain two preintegrated SE2 segments a→b→c into one a→c.

    Same error-state propagation as ``preintegrate_se2`` but with a whole
    segment as the step: meas = meas_a ⊕ meas_b, cov = A Σa Aᵀ + B Σb Bᵀ
    with A = [[I, R(θa)·J·Δr_b], [0, 1]], B = [[R(θa), 0], [0, 1]].
    Used when pruning a keyframe splices its two odometry edges into one
    (reference Map::pruneRedundantKF, src/Map.cpp:222-257).
    """
    Phi = se2.rot2(meas_a[..., 2])
    drb = meas_b[..., :2]
    new_xy = meas_a[..., :2] + jnp.einsum("...ij,...j->...i", Phi, drb)
    new_t = meas_a[..., 2] + meas_b[..., 2]
    new_meas = jnp.concatenate([new_xy, new_t[..., None]], axis=-1)

    drb_perp = jnp.stack([-drb[..., 1], drb[..., 0]], axis=-1)
    A = jnp.broadcast_to(
        jnp.eye(3, dtype=meas_a.dtype), cov_a.shape
    ).at[..., :2, 2].set(jnp.einsum("...ij,...j->...i", Phi, drb_perp))
    B = jnp.broadcast_to(jnp.eye(3, dtype=meas_a.dtype), cov_a.shape)
    B = B.at[..., :2, :2].set(Phi)
    new_cov = (
        A @ cov_a @ jnp.swapaxes(A, -1, -2)
        + B @ cov_b @ jnp.swapaxes(B, -1, -2)
    )
    return new_meas, new_cov


# NOTE: the reference's Track::calcOdoConstraintCam (src/Track.cpp:224-257)
# builds a 6x6 SE3 information for odometry edges only because its g2o
# backend lacks SE2 vertex types. Our pose graph is SE2-native — odo-edge
# information comes straight from the inverted SE2 preintegration
# covariance (loopclose.py builds chain_info from kf_pre_cov) — so the
# SE3 diag form has no call site here by design.


def _rotation_aligning_z(xyz):
    """Rodrigues rotation taking the camera z-axis onto ray ``xyz``
    direction — reproduces the k-vector construction in
    Track::calcSE3toXYZInfo (src/Track.cpp:286-301)."""
    length = jnp.linalg.norm(xyz, axis=-1)
    z_axis = jnp.zeros_like(xyz).at[..., 2].set(length)
    k = jnp.cross(xyz, z_axis)
    normk = jnp.linalg.norm(k, axis=-1)
    sin_a = normk / jnp.maximum(length * length, 1e-12)
    angle = jnp.arcsin(jnp.clip(sin_a, -1.0, 1.0))
    axis = k * (angle / jnp.maximum(normk, 1e-12))[..., None]
    return se3.so3_exp(axis)


def se3_to_xyz_info(xyz1, Tcw1, Tcw2, fx):
    """Anisotropic 3x3 information of a triangulated point in both camera
    frames (Track::calcSE3toXYZInfo, src/Track.cpp:259-306).

    xyz1: point in camera-1 frame. Tcw1/Tcw2: camera poses. Returns
    (info1, info2), each (3,3): tight in the image plane, loose along the
    viewing ray, scaled by parallax.
    """
    o1 = se3.inv(Tcw1)[..., :3, 3]
    o2 = se3.inv(Tcw2)[..., :3, 3]
    xyz_w = se3.apply(se3.inv(Tcw1), xyz1)
    v1 = xyz_w - o1
    v2 = xyz_w - o2
    sin_parallax = jnp.linalg.norm(jnp.cross(v1, v2), axis=-1) / jnp.maximum(
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), 1e-12
    )
    sin_parallax = jnp.maximum(sin_parallax, 1e-6)

    xyz2 = se3.apply(Tcw2, xyz_w)
    len1 = jnp.linalg.norm(xyz1, axis=-1)
    len2 = jnp.linalg.norm(xyz2, axis=-1)
    dxy1 = 2.0 * len1 / fx
    dxy2 = 2.0 * len2 / fx
    dz1 = dxy2 / sin_parallax
    dz2 = dxy1 / sin_parallax

    def diag_info(dxy, dz, dtype):
        return jnp.zeros(dxy.shape + (3, 3), dtype).at[..., 0, 0].set(
            1.0 / (dxy * dxy)
        ).at[..., 1, 1].set(1.0 / (dxy * dxy)).at[..., 2, 2].set(
            1.0 / (dz * dz)
        )

    I1 = diag_info(dxy1, dz1, xyz1.dtype)
    I2 = diag_info(dxy2, dz2, xyz1.dtype)
    R1 = _rotation_aligning_z(xyz1)
    R2 = _rotation_aligning_z(xyz2)
    info1 = jnp.swapaxes(R1, -1, -2) @ I1 @ R1
    info2 = jnp.swapaxes(R2, -1, -2) @ I2 @ R2
    return info1, info2
