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


@partial(jax.jit, static_argnames=("n", "obs_cap"))
def partition_points(prob: BAProblem, n: int, obs_cap: int) -> DistBAProblem:
    """Bucket a BAProblem into ``n`` point blocks with ≤ ``obs_cap``
    observations per block.

    Points are padded to a multiple of n; observations are stably sorted
    by owning block and scattered into fixed-capacity per-block slots
    (overflow beyond ``obs_cap`` is dropped and counted — size the
    capacity with slack for block skew)."""
    M = prob.points.shape[0]
    O = prob.obs_kf.shape[0]
    Mb = -(-M // n)          # ceil
    Mp = Mb * n

    pad_m = Mp - M
    points = jnp.pad(prob.points, ((0, pad_m), (0, 0)))
    point_valid = jnp.pad(prob.point_valid, (0, pad_m))

    bid = jnp.where(prob.obs_valid, prob.obs_mp // Mb, n)
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
            p = poses[dp.obs_kf]
            x = points_sh[mp]
            r, Jp, Jx = jax.vmap(
                lambda pp, xx, uu: factors.se2xyz_residual_jac(
                    pp, xx, uu, cam, Tcb
                )
            )(p, x, dp.obs_uv)
            chi2 = jnp.einsum("oi,oij,oj->o", r, dp.obs_info, r)
            sqrt_chi = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w_h = jnp.where(
                sqrt_chi > huber_delta, huber_delta / sqrt_chi, 1.0
            )
            # zero-weight points at/behind the camera at the CURRENT
            # state (same guard as solver/ba._obs_blocks: _safe_z-clamped
            # depths produce ~fx/z² Jacobians that swamp f32 rows)
            z = jax.vmap(
                lambda pp, xx: factors.se2xyz_depth(pp, xx, Tcb)
            )(p, x)
            z_ok = z > 1e-3
            W = dp.obs_info * jnp.where(
                dp.obs_valid & z_ok, w_h, 0.0
            )[:, None, None]
            return r, Jp, Jx, W, chi2, z_ok

        def edge_terms(poses):
            r, Ji, Jj = jax.vmap(factors.pre_se2_residual_jac)(
                poses[dp.edge_i], poses[dp.edge_j], dp.edge_meas
            )
            W = jnp.where(dp.edge_valid[:, None, None], dp.edge_info, 0.0)
            chi2 = jnp.einsum("ei,eij,ej->e", r, dp.edge_info, r)
            return r, Ji, Jj, W, chi2

        def robust_cost(poses, points_sh):
            """ba_chi2 analog: psum'd Huber rho over sharded obs +
            replicated edge chi2."""
            r_o, _, _, _, chi_o, z_ok = obs_terms(
                poses, points_sh, jnp.inf
            )
            # behind-camera obs carry zero step weight, so their accept
            # cost is pinned at the cap — state-independent, it cancels
            # between last/new sums instead of vetoing undescendable
            # steps (same scheme as solver.ba.ba_chi2/_CHI2_CAP)
            chi_c = jnp.where(
                z_ok, jnp.minimum(chi_o, ba_mod._CHI2_CAP),
                ba_mod._CHI2_CAP,
            )
            rho = factors.huber_rho(chi_c, cfg.huber_delta)
            c_obs = jax.lax.psum(
                jnp.sum(jnp.where(dp.obs_valid, rho, 0.0)), axis
            )
            _, _, _, _, chi_e = edge_terms(poses)
            return c_obs + jnp.sum(jnp.where(dp.edge_valid, chi_e, 0.0))

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

            # local point elimination
            Hxx = Hxx + lam * eye3[None]
            Hxx_safe = jnp.where(
                pv_sh[:, None, None], Hxx + cfg.eps * eye3[None],
                eye3[None],
            )
            Hxx_inv = linalg.inv3x3(Hxx_safe)
            # per-device point-block elimination; routes through the
            # fused Pallas kernel at bank-scale Mb on TPU (solver/ba.py)
            S_p, b_p = schur_reduce(Hpp_p, bp_p, Hpx, Hxx_inv, bx)

            # ONE collective: reduce the Schur-reduced camera systems
            S = jax.lax.psum(S_p, axis)
            b_red = jax.lax.psum(b_p, axis)
            chi2 = jax.lax.psum(
                jnp.sum(jnp.where(dp.obs_valid, chi_o, 0.0)), axis
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

            S = S.at[diag_idx, diag_idx].add(lam * eye3[None])
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
