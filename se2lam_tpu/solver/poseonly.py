"""Pose-only Gauss-Newton: one free SE(2) pose against fixed map points.

TPU-native re-derivation of the reference Localizer's DoLocalBA
(src/Localizer.cpp:233-302): one SE3Expmap vertex with a plane-motion
prior and FIXED MapPoint vertices, LM for 30 iterations. On SE(2) the
plane prior is structural, so this is a 3x3 damped GN on (x, y, theta) —
residual/Jacobian blocks batched over observations with vmap, solved in
closed form each iteration.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import factors
from ..ops import se2
from ..ops.camera import CameraModel

__all__ = ["solve_pose_only"]


@partial(jax.jit, static_argnames=("iters",))
def solve_pose_only(
    pose,          # (3,) initial SE2
    points,        # (M, 3) fixed world points
    uv,            # (M, 2) measurements
    valid,         # (M,) bool
    cam: CameraModel,
    Tcb,
    iters: int = 30,
    huber_delta: float = 5.0,   # Config::TH_HUBER = sqrt(th_huber2=25)
    #                             (src/Config.cpp:155; Localizer::DoLocalBA
    #                              uses it as the kernel delta, :255)
    lm_lambda: float = 1e-4,
):
    """Returns (pose, chi2, n_inliers). Observations with chi2 > huber²
    at convergence count as outliers."""

    def chi2_of(p):
        """Huber-robustified cost — the SAME objective the weighted GN
        steps descend. Accepting on the raw chi2 lets one gross outlier
        veto every step: a move toward the inlier consensus increases
        the outlier's squared residual faster than it reduces the
        inliers' (the bug class fixed in solver/ba.py's accept test)."""
        r = jax.vmap(
            lambda x, u: factors.se2xyz_residual(p, x, u, cam, Tcb)
        )(points, uv)
        c = jnp.sum(r * r, axis=-1)
        rho = factors.huber_rho(jnp.minimum(c, 1e6), huber_delta)
        return jnp.sum(jnp.where(valid, rho, 0.0)), c

    def step(_, state):
        p, lam, last = state
        r, Jp, _ = jax.vmap(
            lambda x, u: factors.se2xyz_residual_jac(p, x, u, cam, Tcb)
        )(points, uv)
        c = jnp.sum(r * r, axis=-1)
        sqrt_c = jnp.sqrt(jnp.maximum(c, 1e-12))
        w = jnp.where(sqrt_c > huber_delta, huber_delta / sqrt_c, 1.0)
        w = jnp.where(valid, w, 0.0)
        H = jnp.einsum("mai,m,maj->ij", Jp, w, Jp)
        b = -jnp.einsum("mai,m,ma->i", Jp, w, r)
        H = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(3, dtype=H.dtype)
        dp = jnp.linalg.solve(H, b)
        cand = p + dp
        cand = cand.at[2].set(se2.normalize_angle(cand[2]))
        new, _ = chi2_of(cand)
        accept = new < last
        p = jnp.where(accept, cand, p)
        lam = jnp.where(accept, lam * 0.5, lam * 10.0)
        return p, lam, jnp.where(accept, new, last)

    chi0, _ = chi2_of(pose)
    p, _, chi = jax.lax.fori_loop(
        0, iters, step, (pose, jnp.asarray(lm_lambda, pose.dtype), chi0)
    )
    _, c = chi2_of(p)
    n_inliers = jnp.sum((valid & (c < huber_delta**2)).astype(jnp.int32))
    return p, chi, n_inliers
