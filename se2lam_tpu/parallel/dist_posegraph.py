"""Distributed SE(2) pose-graph solver: edge-sharded matrix-free PCG.

The single-device pose-graph solver (solver/posegraph.py — the GlobalBA
replacement, src/GlobalMapper.cpp:328-535) materializes the dense
(3K, 3K) Hessian and Cholesky-factorizes it: O(K²) memory and O(K³)
replicated work. Here the **edge set is sharded across the mesh** and the
Gauss-Newton system is solved by preconditioned conjugate gradients with
a matrix-free operator:

- each device holds E/n edges; one H·v application is a local gather /
  3x3-block multiply / scatter-add over its edge shard plus ONE (K, 3)
  ``psum`` — O(E/n) work, O(K) communication, and the Hessian is never
  materialized anywhere;
- the preconditioner is the psum'd block-Jacobi diagonal (K 3x3 blocks,
  inverted in closed form);
- pose values (K·3 floats — kilobytes) replicate; what scales with the
  map (edges, and the O(K²)/O(K³) dense solve they would otherwise feed)
  is sharded or eliminated.

Levenberg damping, Huber weights, and accept/reject mirror the dense
solver, so at converged settings the two agree to float tolerance
(tests/test_parallel.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import factors
from ..ops import linalg, se2
from ..solver.posegraph import PoseGraphProblem

__all__ = ["dist_solve_pose_graph"]


def _pad_edges(prob: PoseGraphProblem, n: int) -> PoseGraphProblem:
    E = prob.edge_i.shape[0]
    pad = (-E) % n
    if pad == 0:
        return prob
    return prob._replace(
        edge_i=jnp.pad(prob.edge_i, (0, pad)),
        edge_j=jnp.pad(prob.edge_j, (0, pad)),
        edge_meas=jnp.pad(prob.edge_meas, ((0, pad), (0, 0))),
        edge_info=jnp.pad(prob.edge_info, ((0, pad), (0, 0), (0, 0))),
        edge_valid=jnp.pad(prob.edge_valid, (0, pad)),
    )


def _make_solver(mesh: Mesh, axis: str, iters: int, cg_iters: int,
                 huber_delta: float, lm_init_lambda: float,
                 precond: str = "tridiag"):
    spec_s = P(axis)
    spec_r = P()
    in_specs = (
        PoseGraphProblem(
            poses=spec_r, pose_valid=spec_r, pose_fixed=spec_r,
            edge_i=spec_s, edge_j=spec_s, edge_meas=spec_s,
            edge_info=spec_s, edge_valid=spec_s,
        ),
    )
    out_specs = (spec_r, spec_r)

    def run(prob: PoseGraphProblem):
        K = prob.poses.shape[0]
        dtype = prob.poses.dtype
        free = prob.pose_valid & ~prob.pose_fixed
        fm = free.astype(dtype)[:, None]          # (K, 1) free mask
        ei, ej = prob.edge_i, prob.edge_j

        def edge_terms(p, delta):
            r, Ji, Jj = jax.vmap(factors.pre_se2_residual_jac)(
                p[ei], p[ej], prob.edge_meas
            )
            chi2 = jnp.einsum("ei,eij,ej->e", r, prob.edge_info, r)
            sqrt_chi = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w = jnp.where(sqrt_chi > delta, delta / sqrt_chi, 1.0)
            W = prob.edge_info * jnp.where(
                prob.edge_valid, w, 0.0
            )[:, None, None]
            return r, Ji, Jj, W, chi2

        def robust_cost(p):
            _, _, _, _, chi2 = edge_terms(p, jnp.inf)
            rho = factors.huber_rho(chi2, huber_delta)
            return jax.lax.psum(
                jnp.sum(jnp.where(prob.edge_valid, rho, 0.0)), axis
            )

        def gn_step(_, state):
            p, lam, last = state
            r, Ji, Jj, W, _ = edge_terms(p, huber_delta)
            JiW = jnp.einsum("eab,eac->ebc", Ji, W)
            JjW = jnp.einsum("eab,eac->ebc", Jj, W)

            # gradient (rhs) — one psum
            b = jnp.zeros((K, 3), dtype)
            b = b.at[ei].add(-jnp.einsum("eab,eb->ea", JiW, r))
            b = b.at[ej].add(-jnp.einsum("eab,eb->ea", JjW, r))
            b = jax.lax.psum(b, axis) * fm

            # preconditioner blocks — one psum; Marquardt scaling matches
            # the dense solver's lam·diag(diag(H))
            D = jnp.zeros((K, 3, 3), dtype)
            D = D.at[ei].add(JiW @ Ji)
            D = D.at[ej].add(JjW @ Jj)
            D = jax.lax.psum(D, axis)
            dvec = jnp.diagonal(D, axis1=-2, axis2=-1)       # (K, 3)
            damp = lam * dvec + 1e-9
            D_pc = D + jax.vmap(jnp.diag)(damp)
            D_pc = jnp.where(
                free[:, None, None], D_pc, jnp.eye(3, dtype=dtype)[None]
            )
            if precond == "tridiag":
                # chain-aware block-tridiagonal preconditioner: the
                # odometry chain (consecutive-id edges) conditions a
                # K-pose graph as O(K²) — solving it EXACTLY per CG
                # application removes the cg_iters ≈ K wall block-Jacobi
                # hits on chain-dominated graphs (the psum storm of r3's
                # SCALING.md). Off-diagonal chain blocks are psum'd like
                # the diagonal; loop edges stay diagonal-only.
                from ..ops.linalg import (
                    block_tridiag_factor, block_tridiag_solve,
                )

                chain = prob.edge_valid & (ej == ei + 1)
                free_prev = jnp.concatenate(
                    [jnp.zeros((1,), bool), free[:-1]]
                )
                Lrow = jnp.where(chain, ej, K)
                Lblk = jnp.zeros((K, 3, 3), dtype).at[Lrow].add(
                    JjW @ Ji, mode="drop"
                )
                Lblk = jax.lax.psum(Lblk, axis)
                Lblk = jnp.where(
                    (free & free_prev)[:, None, None], Lblk, 0.0
                )
                Cinv, _ = block_tridiag_factor(D_pc, Lblk)

                def precond_apply(v):
                    return block_tridiag_solve(Cinv, Lblk, v * fm) * fm
            else:
                Minv = linalg.inv3x3(D_pc)

                def precond_apply(v):
                    return jnp.einsum("kab,kb->ka", Minv, v) * fm

            def Hv(v):
                v = v * fm
                t = jnp.einsum("eab,eb->ea", Ji, v[ei]) + jnp.einsum(
                    "eab,eb->ea", Jj, v[ej]
                )
                Wt = jnp.einsum("eab,eb->ea", W, t)
                out = jnp.zeros((K, 3), dtype)
                out = out.at[ei].add(jnp.einsum("eba,eb->ea", Ji, Wt))
                out = out.at[ej].add(jnp.einsum("eba,eb->ea", Jj, Wt))
                out = jax.lax.psum(out, axis)
                return (out + damp * v) * fm

            def cg_body(_, s):
                x, rr, pp, rz = s
                Ap = Hv(pp)
                pAp = jnp.sum(pp * Ap)
                alpha = jnp.where(pAp > 1e-30, rz / pAp, 0.0)
                x = x + alpha * pp
                rr = rr - alpha * Ap
                z = precond_apply(rr)
                rz_new = jnp.sum(rr * z)
                beta = jnp.where(rz > 1e-30, rz_new / rz, 0.0)
                pp = z + beta * pp
                return x, rr, pp, rz_new

            z0 = precond_apply(b)
            x, _, _, _ = jax.lax.fori_loop(
                0, cg_iters, cg_body,
                (jnp.zeros((K, 3), dtype), b, z0, jnp.sum(b * z0)),
            )

            new_p = p + x * fm
            new_p = new_p.at[..., 2].set(
                se2.normalize_angle(new_p[..., 2])
            )
            new_chi2 = robust_cost(new_p)
            accept = new_chi2 < last
            p = jnp.where(accept, new_p, p)
            lam = jnp.where(accept, lam * 0.5, lam * 10.0)
            return p, lam, jnp.where(accept, new_chi2, last)

        chi0 = robust_cost(prob.poses)
        poses, _, chi = jax.lax.fori_loop(
            0, iters, gn_step,
            (prob.poses, jnp.asarray(lm_init_lambda, dtype), chi0),
        )
        return poses, {"chi2": chi, "chi2_init": chi0}

    return jax.jit(
        shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )


_SOLVER_CACHE: dict = {}


def dist_solve_pose_graph(
    prob: PoseGraphProblem, mesh: Mesh, iters: int = 15,
    cg_iters: int = 64, huber_delta: float = jnp.inf,
    lm_init_lambda: float = 1e-6, axis: str = "d",
    precond: str = "tridiag",
):
    """Solve the pose graph with edges sharded over ``mesh``.

    Returns (poses, {"chi2", "chi2_init"}) replicated. ``cg_iters``
    bounds the inner PCG. ``precond``: "tridiag" (default) solves the
    odometry chain's block-tridiagonal system exactly per CG
    application, removing the cg_iters ≈ K wall that chain-dominated
    graphs (condition O(K²)) hit under "jacobi" — measured in
    artifacts/pcg_precond_r4 (pose-graph table): the dense-solve match
    that took cg≈K block-Jacobi iterations lands in a few dozen. Each
    iteration is O(E/n) work + one (K,3) psum vs the dense solver's
    O(K³) replicated factorization."""
    key = (
        tuple(d.id for d in mesh.devices.flat), mesh.axis_names, axis,
        iters, cg_iters, float(huber_delta), float(lm_init_lambda),
        precond,
    )
    fn = _SOLVER_CACHE.get(key)
    if fn is None:
        fn = _make_solver(
            mesh, axis, iters, cg_iters, huber_delta, lm_init_lambda,
            precond,
        )
        _SOLVER_CACHE[key] = fn
    return fn(_pad_edges(prob, mesh.shape[axis]))
