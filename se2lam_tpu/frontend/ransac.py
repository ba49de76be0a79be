"""Batched fundamental-matrix RANSAC.

TPU-native equivalent of the cv::findFundamentalMat outlier gates used in
tracking (src/Track.cpp:308-344) and loop verification
(src/GlobalMapper.cpp:1207-1248). Instead of sequential hypothesize-verify,
ALL trials run at once: (T, 8) samples → T normalized 8-point solves (eigh
of 9x9 normal matrices) → T×N Sampson tests → argmax. Fixed trial count,
fixed shapes, no data-dependent control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["FundamentalResult", "ransac_fundamental"]


class FundamentalResult(NamedTuple):
    F: jnp.ndarray         # (3, 3) best model
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray  # scalar int32


def _normalize(pts, valid):
    """Hartley normalization over valid points: centroid 0, RMS √2."""
    w = valid.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / n
    d = jnp.linalg.norm(pts - mean, axis=-1)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / n, 1e-9)
    T = jnp.asarray(
        [
            [scale, 0.0, -scale * mean[0]],
            [0.0, scale, -scale * mean[1]],
            [0.0, 0.0, 1.0],
        ],
        pts.dtype,
    )
    return (pts - mean) * scale, T


def _min_eigvec(M, iters: int = 3):
    """Smallest eigenvector of a symmetric PSD matrix via inverse
    iteration: v ← (M + εI)⁻¹ v, renormalized.

    Batched eigh/svd of tiny matrices lower to slow iterative programs
    on TPU; a batched LU inverse is direct, and 2-3 applications give
    machine-precision convergence whenever the smallest eigenvalue is
    separated (degenerate RANSAC samples lose the Sampson vote anyway).
    The shift ε is scaled to the matrix magnitude to keep the solve
    well-posed near an exact nullspace.
    """
    from ..ops.linalg import inv_psd_small

    n = M.shape[-1]
    scale = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] / n
    Minv = inv_psd_small(
        M + 1e-9 * scale * jnp.eye(n, dtype=M.dtype)
        + 1e-30 * jnp.eye(n, dtype=M.dtype)
    )
    v = jnp.full(M.shape[:-2] + (n,), 1.0, M.dtype).at[..., 0].add(0.5)
    for _ in range(iters):
        v = jnp.einsum("...ij,...j->...i", Minv, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def _eight_point(p1, p2):
    """(8,2),(8,2) normalized correspondences → F (3,3), rank-2 enforced."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (8, 9)
    AtA = A.T @ A
    f = _min_eigvec(AtA)
    F = f.reshape(3, 3)
    # rank-2 projection: F ← F − u3 (u3ᵀ F v3) v3ᵀ with v3/u3 the smallest
    # right/left singular directions (power iteration again — for an
    # already rank-2 F the correction magnitude σ3 is ~0, so u3 direction
    # noise is harmless)
    v3 = _min_eigvec(F.T @ F, iters=20)
    u3_raw = F @ v3
    u3 = u3_raw / jnp.maximum(jnp.linalg.norm(u3_raw), 1e-12)
    s3 = u3 @ F @ v3
    return F - s3 * jnp.outer(u3, v3)


def _sampson(F, p1, p2):
    """Sampson distance² of correspondences under F. p1,p2: (N,2)."""
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    Fx1 = x1 @ F.T      # (N,3) = F·x1
    Ftx2 = x2 @ F       # (N,3) = Fᵀ·x2
    num = jnp.sum(x2 * Fx1, axis=-1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    # a (near-)zero F makes 0/0: such a degenerate hypothesis must reject
    # every point, not accept it
    return jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), jnp.inf)


def ransac_fundamental(
    key,
    pts1,
    pts2,
    valid,
    n_trials: int = 256,
    thresh_px: float = 3.0,
    min_inliers: int = 10,
) -> FundamentalResult:
    """RANSAC fundamental matrix with the reference's discard-all rule:
    fewer than ``min_inliers`` survivors → everything outlier
    (src/Track.cpp:336-341).
    """
    N = pts1.shape[0]
    dtype = pts1.dtype

    n1, T1 = _normalize(pts1, valid)
    n2, T2 = _normalize(pts2, valid)

    # sample 8 valid indices per trial via masked Gumbel top-k
    g = jax.random.gumbel(key, (n_trials, N), dtype)
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, sample_idx = jax.lax.top_k(g, 8)  # (T, 8)

    Fs = jax.vmap(lambda idx: _eight_point(n1[idx], n2[idx]))(sample_idx)

    # score in normalized coords; threshold scaled by normalization
    # (approximate: use the average scale of the two transforms)
    scale = 0.5 * (T1[0, 0] + T2[0, 0])
    th2 = (thresh_px * scale) ** 2
    d2 = jax.vmap(lambda F: _sampson(F, n1, n2))(Fs)  # (T, N)
    inl = (d2 < th2) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    F_best = T2.T @ Fs[best] @ T1  # denormalize
    inliers = inl[best]
    n_in = counts[best]
    enough = n_in >= min_inliers
    return FundamentalResult(
        F=F_best,
        inliers=inliers & enough,
        n_inliers=jnp.where(enough, n_in, 0).astype(jnp.int32),
    )
