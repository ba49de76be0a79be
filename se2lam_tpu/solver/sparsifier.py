"""Loop-constraint sparsification: 2-KF + M-points Schur marginalization.

TPU-native re-derivation of the reference Sparsifier
(src/sparsifier.cpp:105-274): a verified loop pair's dense 2-KF+M-point
subgraph is compressed into a single relative-pose constraint whose
information matrix comes from Schur-marginalizing the points and
projecting onto the relative pose, with eigenvalue clamping. Differences
from the reference are deliberate TPU-first choices:

- analytic SE2-XYZ Jacobians instead of numeric differentiation
  (reference JacobianSE3XYZ, src/sparsifier.cpp:59-93, uses delta=1e-6)
- the pose pair lives on SE(2) (exact for planar motion), so the result
  is a 3x3 information matrix over (x, y, theta) instead of the
  reference's 6x6 with plane directions reinserted by priors
- the point Schur complement is the same dense-block reduction as the
  local BA solver, batched on the MXU (reference: per-point LDLT loop,
  DoMarginalizeSE3XYZ src/sparsifier.cpp:105-177)
- eigenvalue clamping to [1e-6, 1e4] with symmetrization follows
  InfoSE3 (src/sparsifier.cpp:219-274)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import factors
from ..ops import linalg, se2
from ..ops.camera import CameraModel

__all__ = ["marginalize_pair_constraint"]


def marginalize_pair_constraint(
    pose_i,
    pose_j,
    points,          # (M, 3) world positions of the shared map points
    uv_i,            # (M, 2) measurements in KF i
    uv_j,            # (M, 2) measurements in KF j
    obs_valid,       # (M,) bool
    cam: CameraModel,
    Tcb,
    sigma2_uv=1.0,
    clamp=(1e-6, 1e4),
):
    """Relative SE2 constraint (meas, info) from a verified loop pair.

    Treats KF i as fixed (the reference's OptKFPairMatch gauge), computes
    the conditional information of pose j after marginalizing the shared
    points, and transports it onto the relative measurement
    ξ = pose_j ⊖ pose_i via the relative factor's Jacobian.
    """
    dtype = pose_i.dtype
    w = jnp.where(obs_valid, 1.0 / sigma2_uv, 0.0)

    def blocks(pose, uv):
        r, Jp, Jx = jax.vmap(
            lambda x, u: factors.se2xyz_residual_jac(pose, x, u, cam, Tcb)
        )(points, uv)
        return r, Jp, Jx

    _, Jpj, Jxj = blocks(pose_j, uv_j)
    _, _, Jxi = blocks(pose_i, uv_i)

    # H over (pose_j, points) with pose_i fixed:
    #   Hjj = Σ Jpjᵀ W Jpj           (3x3)
    #   Hjx[m] = Jpj[m]ᵀ W Jxj[m]    (M, 3, 3)
    #   Hxx[m] = Jxi[m]ᵀ W Jxi[m] + Jxj[m]ᵀ W Jxj[m]
    Hjj = jnp.einsum("mab,m,mac->bc", Jpj, w, Jpj)
    Hjx = jnp.einsum("mab,m,mac->mbc", Jpj, w, Jxj)
    Hxx = jnp.einsum("mab,m,mac->mbc", Jxi, w, Jxi) + jnp.einsum(
        "mab,m,mac->mbc", Jxj, w, Jxj
    )
    eye3 = jnp.eye(3, dtype=dtype)
    # adjugate 3x3 inverse, not batched jnp.linalg.inv: tiny batched LU
    # is a slow TPU custom-call (ops/linalg.py module doc) and every
    # other solver already routes through inv3x3
    Hxx_inv = linalg.inv3x3(Hxx + 1e-8 * eye3[None])

    # Schur: conditional info of pose_j (reference DoMarginalizeSE3XYZ,
    # src/sparsifier.cpp:149-170)
    Hjj_marg = Hjj - jnp.einsum(
        "mab,mbc,mdc->ad", Hjx, Hxx_inv, Hjx
    )

    # transport onto the relative measurement: e = f(pose_j) near the
    # optimum, info_rel = Jj⁻ᵀ Hjj_marg Jj⁻¹
    meas = se2.minus(pose_j, pose_i)
    _, _, Jj = factors.pre_se2_residual_jac(pose_i, pose_j, meas)
    Jj_inv = linalg.inv3x3(Jj)
    info = Jj_inv.T @ Hjj_marg @ Jj_inv

    # symmetrize + eigenvalue clamp (reference InfoSE3,
    # src/sparsifier.cpp:239-263)
    info = 0.5 * (info + info.T)
    evals, evecs = jnp.linalg.eigh(info)
    evals = jnp.clip(evals, clamp[0], clamp[1])
    info = (evecs * evals[None, :]) @ evecs.T
    # the f32 reconstruction carries ~eps·λmax absolute noise, which can
    # push the clamp-floor eigenvalues negative again (the reference
    # does this in f64 where the floor survives); a diagonal shift of
    # that magnitude restores positive-definiteness with negligible
    # distortion of the informative directions
    shift = clamp[0] + 8.0 * jnp.finfo(info.dtype).eps * jnp.max(evals)
    info = 0.5 * (info + info.T) + shift * jnp.eye(3, dtype=info.dtype)
    return meas, info
