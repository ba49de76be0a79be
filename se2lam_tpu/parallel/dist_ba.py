"""Distributed bundle adjustment: map-block partitioned Schur-GN.

The TPU-native replacement for what the reference cannot do at all
(single-process g2o + Cholmod, include/se2lam/optimizer.h:30-34): the
map-point axis of the window is partitioned into blocks, one per device
(the keyframe/map-block sharding of SURVEY §7 step 8 / BASELINE
north-star config 5), and the whole LM loop runs as one SPMD program
under ``shard_map``:

- each device owns a **point block** (M/n points) plus the observations
  of those points — points are never replicated, and the (K, M/n) pose–
  point coupling blocks live only on the owning device;
- point elimination (Hxx⁻¹, T = Hpx·Hxx⁻¹) is local per device;
- the Schur-reduced camera system S = Hpp − Σ_blocks T·Hpxᵀ is formed by
  one ``psum`` of per-device (K, K, 3, 3) partials over the mesh axis —
  the "reduction of Schur-reduced camera systems" pattern; it rides ICI
  within a slice;
- the reduced (3K, 3K) solve is replicated compute (K is the small axis —
  a local window or pose chain, kilobytes of state); point
  back-substitution dx = Hxx⁻¹(bx − Hpxᵀ·dp) is again local per device.

Per-device memory is O(K² + K·M/n + O/n) instead of the single-device
O(K·M + O); communication is one (K,3K²)-word psum + one scalar psum per
LM iteration.

Cross-device observations (a point seen by keyframes "owned" elsewhere)
are free here: poses are optimized globally in the reduced system, so
partitioning only the point/observation axes keeps the math exact — the
sharded result matches the single-device solver to float tolerance
(tests/test_parallel.py).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import factors
from ..ops import linalg, se2
from ..solver import ba as ba_mod
from ..solver.ba import BAConfig, BAProblem, schur_reduce

__all__ = [
    "DistBAProblem",
    "partition_points",
    "dist_solve_local_ba",
    "sharded_solve_local_ba",
    "sharded_solve_joint_ba",
]


class DistBAProblem(NamedTuple):
    """A BAProblem re-bucketed for map-block distribution.

    Leading-axis layout: ``points``/``point_valid`` are (n·Mb, …) with
    block b owning rows [b·Mb, (b+1)·Mb); ``obs_*`` are (n·Ob, …) with
    block b's observations in rows [b·Ob, (b+1)·Ob) and point indices
    **local to the block**. Everything else is replicated.
    """

    poses: jnp.ndarray        # (K, 3) replicated
    pose_valid: jnp.ndarray   # (K,)
    pose_fixed: jnp.ndarray   # (K,)
    points: jnp.ndarray       # (n·Mb, 3) sharded by block
    point_valid: jnp.ndarray  # (n·Mb,)
    obs_kf: jnp.ndarray       # (n·Ob,) global KF index
    obs_mp: jnp.ndarray       # (n·Ob,) block-LOCAL point index
    obs_uv: jnp.ndarray       # (n·Ob, 2)
    obs_info: jnp.ndarray     # (n·Ob, 2, 2)
    obs_valid: jnp.ndarray    # (n·Ob,)
    edge_i: jnp.ndarray       # (E,) replicated odometry edges
    edge_j: jnp.ndarray
    edge_meas: jnp.ndarray
    edge_info: jnp.ndarray
    edge_valid: jnp.ndarray
    n_obs_dropped: jnp.ndarray  # () int32 — overflow past per-block capacity


@partial(jax.jit, static_argnames=("n", "obs_cap", "grid"))
def partition_points(prob: BAProblem, n: int, obs_cap: int,
                     grid: bool = False) -> DistBAProblem:
    """Bucket a BAProblem into ``n`` point blocks with ≤ ``obs_cap``
    observations per block.

    Points are padded to a multiple of n; observations are stably sorted
    by owning block and scattered into fixed-capacity per-block slots
    (overflow beyond ``obs_cap`` is dropped and counted — size the
    capacity with slack for block skew).

    ``grid``: the problem's observation axis is the M×P grid
    (o = m·P + p, build_global_ba's enumeration). Rows are then already
    block-contiguous, and bucketing by ``obs_mp`` REGARDLESS of validity
    (invalid rows carry zero weight anyway) preserves the per-block
    (Mb, P) grid exactly — the matrix-free PCG solver exploits it to
    reduce point-side sums with free reshapes instead of scatters.
    Requires M divisible by n and obs_cap = (M/n)·P."""
    M = prob.points.shape[0]
    O = prob.obs_kf.shape[0]
    Mb = -(-M // n)          # ceil
    Mp = Mb * n

    pad_m = Mp - M
    points = jnp.pad(prob.points, ((0, pad_m), (0, 0)))
    point_valid = jnp.pad(prob.point_valid, (0, pad_m))

    if grid:
        assert pad_m == 0, "grid partition requires M divisible by n"
        P = O // M
        assert obs_cap == Mb * P, (obs_cap, Mb, P)
    bid = (
        prob.obs_mp // Mb if grid
        else jnp.where(prob.obs_valid, prob.obs_mp // Mb, n)
    )
    order = jnp.argsort(bid, stable=True)
    counts = jnp.bincount(bid, length=n + 1)
    starts = jnp.cumsum(counts) - counts
    bid_s = bid[order]
    rank = jnp.arange(O, dtype=jnp.int32) - starts[bid_s].astype(jnp.int32)
    ok = (bid_s < n) & (rank < obs_cap)
    row = jnp.where(ok, bid_s, n)
    col = jnp.where(ok, rank, 0)

    def scat(x, fill):
        out = jnp.full((n + 1, obs_cap) + x.shape[1:], fill, x.dtype)
        out = out.at[row, col].set(x[order], mode="drop")
        return out[:n].reshape((n * obs_cap,) + x.shape[1:])

    obs_local = (prob.obs_mp % Mb).astype(jnp.int32)
    n_in_blocks = jnp.sum(counts[:n])
    return DistBAProblem(
        poses=prob.poses,
        pose_valid=prob.pose_valid,
        pose_fixed=prob.pose_fixed,
        points=points,
        point_valid=point_valid,
        obs_kf=scat(prob.obs_kf, 0),
        obs_mp=scat(obs_local, 0),
        obs_uv=scat(prob.obs_uv, 0.0),
        obs_info=scat(prob.obs_info, 0.0),
        obs_valid=scat(prob.obs_valid, False),
        edge_i=prob.edge_i,
        edge_j=prob.edge_j,
        edge_meas=prob.edge_meas,
        edge_info=prob.edge_info,
        edge_valid=prob.edge_valid,
        n_obs_dropped=(n_in_blocks - jnp.sum(ok)).astype(jnp.int32),
    )


def _dp_obs_terms(dp: DistBAProblem, cam, Tcb, cfg: BAConfig,
                  poses, points_sh, huber_delta):
    """Per-observation residual/Jacobian/weight blocks on this device's
    observation shard (shared by the dense-reduced and matrix-free PCG
    solvers)."""
    mp = jnp.clip(dp.obs_mp, 0)
    p = poses[dp.obs_kf]
    x = points_sh[mp]
    r, Jp, Jx = jax.vmap(
        lambda pp, xx, uu: factors.se2xyz_residual_jac(
            pp, xx, uu, cam, Tcb
        )
    )(p, x, dp.obs_uv)
    chi2 = jnp.einsum("oi,oij,oj->o", r, dp.obs_info, r)
    sqrt_chi = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_h = jnp.where(sqrt_chi > huber_delta, huber_delta / sqrt_chi, 1.0)
    # zero-weight points at/behind the camera at the CURRENT state (same
    # guard as solver/ba._obs_blocks: _safe_z-clamped depths produce
    # ~fx/z² Jacobians that swamp f32 rows)
    z = jax.vmap(
        lambda pp, xx: factors.se2xyz_depth(pp, xx, Tcb)
    )(p, x)
    z_ok = z > 1e-3
    W = dp.obs_info * jnp.where(
        dp.obs_valid & z_ok, w_h, 0.0
    )[:, None, None]
    return r, Jp, Jx, W, chi2, z_ok


def _dp_edge_terms(dp: DistBAProblem, poses):
    r, Ji, Jj = jax.vmap(factors.pre_se2_residual_jac)(
        poses[dp.edge_i], poses[dp.edge_j], dp.edge_meas
    )
    W = jnp.where(dp.edge_valid[:, None, None], dp.edge_info, 0.0)
    chi2 = jnp.einsum("ei,eij,ej->e", r, dp.edge_info, r)
    return r, Ji, Jj, W, chi2


def _dp_robust_cost(dp: DistBAProblem, cam, Tcb, cfg: BAConfig, axis,
                    poses, points_sh):
    """ba_chi2 analog: psum'd Huber rho over sharded obs + replicated
    edge chi2. Behind-camera obs carry zero step weight, so their accept
    cost is pinned at the cap — state-independent, it cancels between
    last/new sums instead of vetoing undescendable steps (same scheme as
    solver.ba.ba_chi2/_CHI2_CAP)."""
    r_o, _, _, _, chi_o, z_ok = _dp_obs_terms(
        dp, cam, Tcb, cfg, poses, points_sh, jnp.inf
    )
    chi_c = jnp.where(
        z_ok, jnp.minimum(chi_o, ba_mod._CHI2_CAP), ba_mod._CHI2_CAP
    )
    rho = factors.huber_rho(chi_c, cfg.huber_delta)
    c_obs = jax.lax.psum(
        jnp.sum(jnp.where(dp.obs_valid, rho, 0.0)), axis
    )
    _, _, _, _, chi_e = _dp_edge_terms(dp, poses)
    return c_obs + jnp.sum(jnp.where(dp.edge_valid, chi_e, 0.0))


def _make_dist_solver(mesh: Mesh, axis: str, cfg: BAConfig):
    """Build the shard_map'd LM solver for one (mesh, axis, cfg)."""

    spec_s = P(axis)
    spec_r = P()
    in_specs = (
        DistBAProblem(
            poses=spec_r, pose_valid=spec_r, pose_fixed=spec_r,
            points=spec_s, point_valid=spec_s,
            obs_kf=spec_s, obs_mp=spec_s, obs_uv=spec_s,
            obs_info=spec_s, obs_valid=spec_s,
            edge_i=spec_r, edge_j=spec_r, edge_meas=spec_r,
            edge_info=spec_r, edge_valid=spec_r, n_obs_dropped=spec_r,
        ),
        spec_r,   # cam (pytree of scalars)
        spec_r,   # Tcb
    )
    out_specs = (spec_r, spec_s, spec_r)

    def run(dp: DistBAProblem, cam, Tcb):
        K = dp.poses.shape[0]
        dtype = dp.poses.dtype
        eye3 = jnp.eye(3, dtype=dtype)
        free = dp.pose_valid & ~dp.pose_fixed
        free3 = jnp.repeat(free.astype(dtype), 3)
        diag_idx = jnp.arange(K)
        mp = jnp.clip(dp.obs_mp, 0)

        def obs_terms(poses, points_sh, huber_delta):
            return _dp_obs_terms(
                dp, cam, Tcb, cfg, poses, points_sh, huber_delta
            )

        def edge_terms(poses):
            return _dp_edge_terms(dp, poses)

        def robust_cost(poses, points_sh):
            return _dp_robust_cost(
                dp, cam, Tcb, cfg, axis, poses, points_sh
            )

        def solve_inner(poses, points_sh, pv_sh, lam):
            """One damped step: local point-block elimination, psum of
            the Schur-reduced camera system, replicated reduced solve,
            local back-substitution."""
            Mb = points_sh.shape[0]
            r_o, Jp, Jx, W, chi_o, _ = obs_terms(
                poses, points_sh, cfg.huber_delta
            )
            JpW = jnp.einsum("oab,oac->obc", Jp, W)
            JxW = jnp.einsum("oab,oac->obc", Jx, W)

            # local accumulation (device-owned point block) — shared
            # lowering router with the single-device assembly: one-hot
            # MXU matmuls on TPU, scatter-adds elsewhere (DESIGN §9;
            # Hpx comes back in the (K, 3, Mb, 3) layout schur_reduce
            # and the Pallas kernel expect)
            Hpp_p, bp_p, Hxx, bx, Hpx = ba_mod.accumulate_obs(
                K, Mb, dp.obs_kf, mp,
                JpW @ Jp, JxW @ Jx, JpW @ Jx,
                -jnp.einsum("oab,ob->oa", JpW, r_o),
                -jnp.einsum("oab,ob->oa", JxW, r_o),
                cfg.accum,
            )

            # local point elimination — Marquardt damping with
            # block-relative floors, EXACTLY as the single-device solver
            # (solver/ba.py _solve_inner): point blocks are
            # device-local, so the math is bitwise-shared
            dxx = jnp.diagonal(Hxx, axis1=-2, axis2=-1)
            dxx = jnp.maximum(
                dxx, 1e-3 * jnp.max(dxx, axis=-1, keepdims=True) + 1e-6
            )
            Hxx = Hxx + lam * dxx[..., None] * eye3[None]
            Hxx_safe = jnp.where(
                pv_sh[:, None, None], Hxx + cfg.eps * eye3[None],
                eye3[None],
            )
            Hxx_inv = linalg.inv3x3(Hxx_safe)
            # per-device point-block elimination; routes through the
            # fused Pallas kernel at bank-scale Mb on TPU (solver/ba.py)
            S_p, b_p = schur_reduce(Hpp_p, bp_p, Hpx, Hxx_inv, bx)

            # ONE collective round: reduce the Schur-reduced camera
            # systems (plus the tiny (K, 3) pose-Hessian diagonal the
            # Marquardt damping needs — single-device damps the
            # UNREDUCED Hpp diagonal, so parity requires the psum'd one)
            dpp_p = jnp.diagonal(
                Hpp_p[diag_idx, diag_idx], axis1=-2, axis2=-1
            )
            S, b_red, dpp_obs, chi2 = jax.lax.psum(
                (S_p, b_p, dpp_p,
                 jnp.sum(jnp.where(dp.obs_valid, chi_o, 0.0))),
                axis,
            )

            # odometry edges: replicated compute added post-reduction
            r_e, Ji, Jj, We, chi_e = edge_terms(poses)
            JiW = jnp.einsum("eab,eac->ebc", Ji, We)
            JjW = jnp.einsum("eab,eac->ebc", Jj, We)
            S = S.at[dp.edge_i, dp.edge_i].add(JiW @ Ji)
            S = S.at[dp.edge_i, dp.edge_j].add(JiW @ Jj)
            S = S.at[dp.edge_j, dp.edge_i].add(JjW @ Ji)
            S = S.at[dp.edge_j, dp.edge_j].add(JjW @ Jj)
            b_red = b_red.at[dp.edge_i].add(
                -jnp.einsum("eab,eb->ea", JiW, r_e)
            )
            b_red = b_red.at[dp.edge_j].add(
                -jnp.einsum("eab,eb->ea", JjW, r_e)
            )
            chi2 = chi2 + jnp.sum(jnp.where(dp.edge_valid, chi_e, 0.0))

            # Marquardt on the total (obs + odometry-edge) Hpp diagonal,
            # block-relative floors — the single-device _solve_inner's
            # damping verbatim
            dpp = dpp_obs
            dpp = dpp.at[dp.edge_i].add(
                jnp.diagonal(JiW @ Ji, axis1=-2, axis2=-1)
            )
            dpp = dpp.at[dp.edge_j].add(
                jnp.diagonal(JjW @ Jj, axis1=-2, axis2=-1)
            )
            dpp = jnp.maximum(
                dpp, 1e-3 * jnp.max(dpp, axis=-1, keepdims=True) + 1e-6
            )
            S = S.at[diag_idx, diag_idx].add(
                lam * dpp[..., None] * eye3[None]
            )
            S_d = S.transpose(0, 2, 1, 3).reshape(3 * K, 3 * K)
            b_d = b_red.reshape(3 * K)
            S_d = S_d * free3[:, None] * free3[None, :] + jnp.diag(
                1.0 - free3
            )
            b_d = b_d * free3
            # pivoted LU, not cholesky+cho_solve (latency-bound custom
            # calls; solver/ba.py round-3 microbench) — replicated on
            # every device either way
            dpose = jnp.linalg.solve(
                S_d + cfg.eps * jnp.eye(3 * K, dtype=dtype), b_d
            )
            dpose = (dpose * free3).reshape(K, 3)

            # local back-substitution for the owned point block
            rhs_x = bx - jnp.einsum("kamb,ka->mb", Hpx, dpose)
            dx = jnp.einsum("mab,mb->ma", Hxx_inv, rhs_x)
            dx = jnp.where(pv_sh[:, None], dx, 0.0)
            return dpose, dx, chi2

        def lm_step(_, state):
            poses, points_sh, lam, last = state
            dpose, dx, _ = solve_inner(
                poses, points_sh, dp.point_valid, lam
            )
            new_poses = poses + dpose
            new_poses = new_poses.at[..., 2].set(
                se2.normalize_angle(new_poses[..., 2])
            )
            new_points = points_sh + dx
            new_chi2 = robust_cost(new_poses, new_points)
            # accept on the SAME robust objective carried across
            # iterations (solve_inner's chi2 is raw — raw >= robust, so
            # comparing against it would accept robust-increasing steps)
            accept = new_chi2 < last
            poses = jnp.where(accept, new_poses, poses)
            points_sh = jnp.where(accept, new_points, points_sh)
            lam = jnp.where(accept, lam * cfg.lm_down, lam * cfg.lm_up)
            return poses, points_sh, lam, jnp.where(accept, new_chi2, last)

        lam0 = jnp.asarray(cfg.lm_init_lambda, dtype)
        chi0 = robust_cost(dp.poses, dp.points)
        poses, points_sh, lam, chi = jax.lax.fori_loop(
            0, cfg.iters, lm_step, (dp.poses, dp.points, lam0, chi0)
        )
        info = {
            "chi2": chi,
            "chi2_init": chi0,
            "lambda": lam,
            "n_obs_dropped": dp.n_obs_dropped,
        }
        return poses, points_sh, info

    return jax.jit(
        shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )


def _make_dist_pcg_solver(mesh: Mesh, axis: str, cfg: BAConfig,
                          cg_iters: int, grid_p: int,
                          precond: str = "tridiag"):
    """Matrix-free distributed Schur-GN: the composition of the two
    distribution halves (r3 VERDICT weak #7). The dense-reduced solver
    (_make_dist_solver) materializes the (K, 3, Mb, 3) pose–point
    coupling and a replicated (3K)² camera system — exact and fast at
    window scale, but O(K·M/n) memory and O(K³) replicated compute caps
    it at bank scale. Here NOTHING quadratic is materialized:

    - per LM iteration, per-point 3×3 blocks (Hxx, bx) reduce locally
      (free reshape-sums when ``grid_p`` promises the M×P observation
      grid, scatter-adds otherwise) and the reduced camera system is
      solved by preconditioned CG whose operator
      S·v = (Hpp_obs + Hpp_edge + λ)·v − Hpx·(Hxx⁻¹·(Hpxᵀ·v))
      is three observation sweeps + ONE (K, 3) psum per iteration;
    - the preconditioner is chain-aware: the block-TRIDIAGONAL system
      of the odometry chain (diagonal blocks from all terms,
      off-diagonals from consecutive-pose edges) is factored and solved
      exactly per application (ops/linalg.block_tridiag_*) — a K-pose
      chain conditions as O(K²), which is precisely what block-Jacobi
      cannot see and what makes unpreconditioned CG need ~K iterations;
    - per-device memory is O(K + M/n + O/n); per-device compute is
      O(O/n) per CG iteration plus the O(K) sequential 3×3 chain solve.

    Replaces: the reference's single-process Cholmod GlobalBA
    (src/Map.cpp:891-1053, include/se2lam/optimizer.h:30-34) at scales
    it could never reach.
    """
    from ..ops.linalg import block_tridiag_factor, block_tridiag_solve

    spec_s = P(axis)
    spec_r = P()
    in_specs = (
        DistBAProblem(
            poses=spec_r, pose_valid=spec_r, pose_fixed=spec_r,
            points=spec_s, point_valid=spec_s,
            obs_kf=spec_s, obs_mp=spec_s, obs_uv=spec_s,
            obs_info=spec_s, obs_valid=spec_s,
            edge_i=spec_r, edge_j=spec_r, edge_meas=spec_r,
            edge_info=spec_r, edge_valid=spec_r, n_obs_dropped=spec_r,
        ),
        spec_r,   # cam
        spec_r,   # Tcb
    )
    out_specs = (spec_r, spec_s, spec_r)

    def run(dp: DistBAProblem, cam, Tcb):
        K = dp.poses.shape[0]
        dtype = dp.poses.dtype
        eye3 = jnp.eye(3, dtype=dtype)
        free = dp.pose_valid & ~dp.pose_fixed
        fm = free.astype(dtype)[:, None]
        mp = jnp.clip(dp.obs_mp, 0)
        ei, ej = dp.edge_i, dp.edge_j
        Mb = dp.points.shape[0]

        def point_reduce(contrib):
            """(O, …) → (Mb, …): free reshape-sum on the grid layout,
            scatter-add otherwise."""
            if grid_p > 0:
                return jnp.sum(
                    contrib.reshape((Mb, grid_p) + contrib.shape[1:]),
                    axis=1,
                )
            return jnp.zeros(
                (Mb,) + contrib.shape[1:], dtype
            ).at[mp].add(contrib)

        def kf_reduce(contrib):
            """(O, …) → replicated (K, …): local scatter + one psum."""
            local = jnp.zeros(
                (K,) + contrib.shape[1:], dtype
            ).at[dp.obs_kf].add(contrib)
            return jax.lax.psum(local, axis)

        def solve_inner(poses, points_sh, pv_sh, lam):
            r_o, Jp, Jx, W, chi_o, _ = _dp_obs_terms(
                dp, cam, Tcb, cfg, poses, points_sh, cfg.huber_delta
            )
            JpW = jnp.einsum("oab,oac->obc", Jp, W)
            JxW = jnp.einsum("oab,oac->obc", Jx, W)

            # Marquardt (λ·diag) damping, NOT the dense solver's additive
            # λ·I: the raw reduced system spans ~11 decades (fx²-scaled
            # observation blocks vs λ=1e-4 floors), and f32 CG at that
            # conditioning accumulates enough sloppy-direction noise to
            # walk poses away while the cost still descends. λ·diag
            # bounds the damped system's condition number at ~1+1/λ —
            # the classic reason Levenberg became Levenberg-MARQUARDT.
            # Same optimum, different (better-conditioned) LM trajectory.
            Hxx_raw = point_reduce(JxW @ Jx)
            dxx = jnp.diagonal(Hxx_raw, axis1=-2, axis2=-1)
            Hxx = Hxx_raw + lam * jax.vmap(jnp.diag)(dxx)
            Hxx_safe = jnp.where(
                pv_sh[:, None, None], Hxx + cfg.eps * eye3[None],
                eye3[None],
            )
            Hxx_inv = linalg.inv3x3(Hxx_safe)
            bx = point_reduce(-jnp.einsum("oab,ob->oa", JxW, r_o))
            bp = kf_reduce(-jnp.einsum("oab,ob->oa", JpW, r_o))
            D_obs = kf_reduce(JpW @ Jp)                  # (K, 3, 3)
            chi2 = jax.lax.psum(
                jnp.sum(jnp.where(dp.obs_valid, chi_o, 0.0)), axis
            )

            r_e, Ji, Jj, We, chi_e = _dp_edge_terms(dp, poses)
            JiW = jnp.einsum("eab,eac->ebc", Ji, We)
            JjW = jnp.einsum("eab,eac->ebc", Jj, We)
            bp = bp.at[ei].add(-jnp.einsum("eab,eb->ea", JiW, r_e))
            bp = bp.at[ej].add(-jnp.einsum("eab,eb->ea", JjW, r_e))
            chi2 = chi2 + jnp.sum(jnp.where(dp.edge_valid, chi_e, 0.0))

            # chain-aware block-tridiagonal preconditioner: diagonal =
            # obs + edge + damping; sub-diagonal = consecutive-pose edge
            # coupling (the odometry chain); loop edges contribute to
            # the diagonal only (they are what CG itself handles well)
            D = D_obs.at[ei].add(JiW @ Ji).at[ej].add(JjW @ Jj)
            dpp = jnp.diagonal(D, axis1=-2, axis2=-1)    # (K, 3)
            damp = lam * dpp + cfg.eps
            chain = dp.edge_valid & (ej == ei + 1)
            free_prev = jnp.concatenate(
                [jnp.zeros((1,), bool), free[:-1]]
            )
            Lrow = jnp.where(chain, ej, K)
            Lblk = jnp.zeros((K, 3, 3), dtype).at[Lrow].set(
                JjW @ Ji, mode="drop"
            )
            Lblk = jnp.where(
                (free & free_prev)[:, None, None], Lblk, 0.0
            )
            D_pc = jnp.where(
                free[:, None, None],
                D + jax.vmap(jnp.diag)(damp),
                eye3[None],
            )
            if precond == "jacobi":
                Lblk = jnp.zeros_like(Lblk)   # diag-only: block-Jacobi
            Cinv, _ = block_tridiag_factor(D_pc, Lblk)

            def Hxxinv_apply(y):
                return jnp.einsum("mab,mb->ma", Hxx_inv, y)

            def HpxT_v(v):
                """(K,3) → (Mb,3): Hpxᵀ·v as an observation sweep."""
                t = jnp.einsum("oab,ob->oa", Jp, v[dp.obs_kf])
                Wt = jnp.einsum("oab,ob->oa", W, t)
                return point_reduce(jnp.einsum("oba,ob->oa", Jx, Wt))

            def Hpx_y(y):
                """(Mb,3) → replicated (K,3): Hpx·y (one psum)."""
                t = jnp.einsum("oab,ob->oa", Jx, y[mp])
                Wt = jnp.einsum("oab,ob->oa", W, t)
                return kf_reduce(jnp.einsum("oba,ob->oa", Jp, Wt))

            def Sv(v):
                v = v * fm
                out = jnp.einsum("kab,kb->ka", D_obs, v)
                te = jnp.einsum("eab,eb->ea", Ji, v[ei]) + jnp.einsum(
                    "eab,eb->ea", Jj, v[ej]
                )
                Wte = jnp.einsum("eab,eb->ea", We, te)
                out = out.at[ei].add(jnp.einsum("eba,eb->ea", Ji, Wte))
                out = out.at[ej].add(jnp.einsum("eba,eb->ea", Jj, Wte))
                out = out - Hpx_y(Hxxinv_apply(HpxT_v(v)))
                return (out + damp * v) * fm

            def apply_precond(v):
                if precond == "none":
                    return v * fm
                return block_tridiag_solve(Cinv, Lblk, v * fm) * fm

            b_red = (bp - Hpx_y(Hxxinv_apply(bx))) * fm

            def cg_body(_, s):
                x, rr, pp, rz = s
                Ap = Sv(pp)
                pAp = jnp.sum(pp * Ap)
                alpha = jnp.where(pAp > 1e-30, rz / pAp, 0.0)
                x = x + alpha * pp
                rr = rr - alpha * Ap
                z = apply_precond(rr)
                rz_new = jnp.sum(rr * z)
                beta = jnp.where(rz > 1e-30, rz_new / rz, 0.0)
                pp = z + beta * pp
                return x, rr, pp, rz_new

            z0 = apply_precond(b_red)
            dpose, _, _, _ = jax.lax.fori_loop(
                0, cg_iters, cg_body,
                (jnp.zeros((K, 3), dtype), b_red, z0,
                 jnp.sum(b_red * z0)),
            )
            dpose = dpose * fm

            rhs_x = bx - HpxT_v(dpose)
            dx = Hxxinv_apply(rhs_x)
            dx = jnp.where(pv_sh[:, None], dx, 0.0)
            return dpose, dx, chi2

        def lm_step(_, state):
            poses, points_sh, lam, last = state
            dpose, dx, _ = solve_inner(
                poses, points_sh, dp.point_valid, lam
            )
            new_poses = poses + dpose
            new_poses = new_poses.at[..., 2].set(
                se2.normalize_angle(new_poses[..., 2])
            )
            new_points = points_sh + dx
            new_chi2 = _dp_robust_cost(
                dp, cam, Tcb, cfg, axis, new_poses, new_points
            )
            accept = new_chi2 < last
            poses = jnp.where(accept, new_poses, poses)
            points_sh = jnp.where(accept, new_points, points_sh)
            lam = jnp.where(accept, lam * cfg.lm_down, lam * cfg.lm_up)
            return poses, points_sh, lam, jnp.where(accept, new_chi2, last)

        lam0 = jnp.asarray(cfg.lm_init_lambda, dtype)
        chi0 = _dp_robust_cost(dp, cam, Tcb, cfg, axis, dp.poses, dp.points)
        poses, points_sh, lam, chi = jax.lax.fori_loop(
            0, cfg.iters, lm_step, (dp.poses, dp.points, lam0, chi0)
        )
        info = {
            "chi2": chi,
            "chi2_init": chi0,
            "lambda": lam,
            "n_obs_dropped": dp.n_obs_dropped,
        }
        return poses, points_sh, info

    return jax.jit(
        shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )


_SOLVER_CACHE: dict = {}


def dist_solve_local_ba(
    dprob: DistBAProblem, cam, Tcb, cfg: BAConfig, mesh: Mesh,
    axis: str = "d",
):
    """Solve a pre-partitioned problem on the mesh. Returns
    (poses (K,3) replicated, points (n·Mb,3) block-sharded, info).

    The compiled SPMD program is cached per (mesh, axis, cfg) —
    rebuilding jit wrappers per call would recompile every time."""
    key = (
        tuple(d.id for d in mesh.devices.flat), mesh.axis_names, axis, cfg
    )
    fn = _SOLVER_CACHE.get(key)
    if fn is None:
        fn = _make_dist_solver(mesh, axis, cfg)
        _SOLVER_CACHE[key] = fn
    return fn(dprob, cam, Tcb)


def sharded_solve_joint_ba(
    prob: BAProblem, cam, Tcb, cfg: BAConfig, mesh: Mesh,
    axis: str = "d", cg_iters: int = 64, grid_p: int = 0,
    obs_cap: int | None = None, precond: str = "tridiag",
):
    """Partition + matrix-free PCG solve + reassemble: the bank-scale
    counterpart of ``sharded_solve_local_ba`` for joint full-map BA
    where K is too large for the replicated dense reduced solve
    (_make_dist_pcg_solver). ``grid_p``: set to the observation grid
    period P when ``prob`` enumerates observations as the M×P grid
    (build_global_ba) — point-side reductions then cost a reshape
    instead of a scatter and the partition preserves the grid exactly.
    Returns (poses (K,3), points (M,3), info)."""
    n = mesh.shape[axis]
    M = prob.points.shape[0]
    O = prob.obs_kf.shape[0]
    if grid_p > 0:
        assert M % n == 0 and O == M * grid_p, (M, n, O, grid_p)
        obs_cap = (M // n) * grid_p
        dprob = partition_points(prob, n=n, obs_cap=obs_cap, grid=True)
    else:
        if obs_cap is None:
            obs_cap = max(1, math.ceil(O / n) * 2)
        dprob = partition_points(prob, n=n, obs_cap=obs_cap)
    key = (
        tuple(d.id for d in mesh.devices.flat), mesh.axis_names, axis,
        cfg, cg_iters, grid_p, "pcg", precond,
    )
    fn = _SOLVER_CACHE.get(key)
    if fn is None:
        fn = _make_dist_pcg_solver(
            mesh, axis, cfg, cg_iters, grid_p, precond
        )
        _SOLVER_CACHE[key] = fn
    poses, points_sh, info = fn(dprob, cam, Tcb)
    return poses, points_sh[:M], info


def sharded_solve_local_ba(
    prob: BAProblem, cam, Tcb, cfg: BAConfig, mesh: Mesh,
    axis: str = "d", obs_cap: int | None = None,
):
    """Partition + solve + reassemble: drop-in distributed counterpart of
    ``solver.ba.solve_local_ba`` (same LM semantics, results match to
    float tolerance). ``obs_cap`` bounds per-block observations; default
    2·O/n (overflow from block skew is dropped and reported in
    ``info["n_obs_dropped"]``)."""
    n = mesh.shape[axis]
    O = prob.obs_kf.shape[0]
    M = prob.points.shape[0]
    if obs_cap is None:
        obs_cap = max(1, math.ceil(O / n) * 2)
    dprob = partition_points(prob, n=n, obs_cap=obs_cap)
    poses, points_sh, info = dist_solve_local_ba(
        dprob, cam, Tcb, cfg, mesh, axis
    )
    return poses, points_sh[:M], info
