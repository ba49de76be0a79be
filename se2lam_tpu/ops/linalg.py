"""Closed-form small-matrix linear algebra.

``jnp.linalg.inv`` on batches of tiny matrices lowers to batched LU on
TPU — workable but far slower than the explicit adjugate formulas, which
fuse into a handful of VPU ops. Used throughout the solvers (2x2
observation information, 3x3 point blocks / preintegration covariances).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "inv2x2", "inv3x3", "inv_psd_small", "block_tridiag_factor",
    "block_tridiag_solve",
]


def inv_psd_small(M, eps: float = 1e-30):
    """Batched inverse of small (…, n, n) positive-definite matrices via
    unrolled Gauss–Jordan without pivoting.

    For PD matrices the running pivots are the (positive) Schur-complement
    diagonals, so pivot-free elimination is stable. n is static and small
    (≤ ~12): the n unrolled elimination steps are pure fused vector ops,
    while ``jnp.linalg.inv`` lowers to a batched LU custom-call that
    dominates profiles (e.g. RANSAC's inverse iteration).
    """
    n = M.shape[-1]
    A = M
    I = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape).copy()
    for k in range(n):
        piv = A[..., k, k]
        piv = jnp.where(jnp.abs(piv) < eps, eps, piv)
        inv_piv = (1.0 / piv)[..., None]
        row_a = A[..., k, :] * inv_piv
        row_i = I[..., k, :] * inv_piv
        A = A.at[..., k, :].set(row_a)
        I = I.at[..., k, :].set(row_i)
        col = A[..., :, k]
        mask = jnp.arange(n) != k
        factor = jnp.where(mask, col, 0.0)[..., :, None]
        A = A - factor * row_a[..., None, :]
        I = I - factor * row_i[..., None, :]
    return I


def block_tridiag_factor(D, L, eps: float = 1e-9):
    """Block-Cholesky-style forward factorization of a symmetric block-
    tridiagonal system with (K, b, b) diagonal blocks ``D`` and (K, b, b)
    sub-diagonal blocks ``L`` (``L[k]`` couples row k to row k-1; L[0]
    is ignored). Returns (Cinv, L) where ``Cinv[k]`` is the inverse of
    the running Schur complement C_k = D_k − L_k C_{k-1}⁻¹ L_kᵀ.

    This is the chain-aware preconditioner factor for SLAM pose graphs:
    the odometry chain is exactly block-tridiagonal, and solving it
    directly removes the O(K) CG-iteration wall a block-Jacobi
    preconditioner hits on chain-dominated graphs (the condition number
    of a K-pose chain grows as K²). The K-step scan is sequential but
    each step is a b×b (=3×3) solve — microseconds of VPU math, traded
    against ~K matrix-free CG iterations of full edge sweeps + psums.
    """
    import jax

    b = D.shape[-1]
    eye = jnp.eye(b, dtype=D.dtype)

    def step(Cprev_inv, xs):
        Dk, Lk = xs
        Ck = Dk - Lk @ Cprev_inv @ jnp.swapaxes(Lk, -1, -2)
        Ck_inv = inv3x3(Ck + eps * eye) if b == 3 else inv_psd_small(
            Ck + eps * eye
        )
        return Ck_inv, Ck_inv

    # L[0] must be zero (no row -1); the caller guarantees it
    _, Cinv = jax.lax.scan(step, jnp.zeros((b, b), D.dtype), (D, L))
    return Cinv, L


def block_tridiag_solve(Cinv, L, r):
    """Solve M x = r with the factorization from block_tridiag_factor.

    Forward sweep y_k = C_k⁻¹ (r_k − L_k y_{k-1}'s term), backward sweep
    x_k = y_k − C_k⁻¹ L_{k+1}ᵀ x_{k+1}. ``r`` is (K, b); returns (K, b).
    """
    import jax

    def fwd(y_prev, xs):
        Ck_inv, Lk, rk = xs
        yk = Ck_inv @ (rk - Lk @ y_prev)
        return yk, yk

    _, y = jax.lax.scan(
        fwd, jnp.zeros(r.shape[-1], r.dtype), (Cinv, L, r)
    )

    def bwd(x_next, xs):
        Ck_inv, Lnext, yk = xs
        xk = yk - Ck_inv @ (jnp.swapaxes(Lnext, -1, -2) @ x_next)
        return xk, xk

    # L shifted: row k couples to k+1 through L[k+1]
    Lnext = jnp.concatenate(
        [L[1:], jnp.zeros_like(L[:1])], axis=0
    )
    _, x_rev = jax.lax.scan(
        bwd, jnp.zeros(r.shape[-1], r.dtype),
        (Cinv[::-1], Lnext[::-1], y[::-1]),
    )
    return x_rev[::-1]


def inv2x2(M, eps: float = 1e-30):
    """Batched (…, 2, 2) inverse via the adjugate."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]


def inv3x3(M, eps: float = 1e-30):
    """Batched (…, 3, 3) inverse via the adjugate (cofactor) formula."""
    m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    m10, m11, m12 = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    m20, m21, m22 = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    c00 = m11 * m22 - m12 * m21
    c01 = m02 * m21 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c10 = m12 * m20 - m10 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m02 * m10 - m00 * m12
    c20 = m10 * m21 - m11 * m20
    c21 = m01 * m20 - m00 * m21
    c22 = m00 * m11 - m01 * m10
    det = m00 * c00 + m01 * c10 + m02 * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]
