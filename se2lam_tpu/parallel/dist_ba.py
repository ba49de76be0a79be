"""Distributed bundle adjustment: observation-sharded Schur-GN.

The TPU-native replacement for what the reference cannot do at all
(single-process g2o + Cholmod): the observation set of the local window is
sharded across the mesh; each device computes its partial JᵀWJ / JᵀWr
blocks; the Schur-reduced camera system is formed by an XLA-inserted
``psum`` (from the sharding annotations — no hand-written collectives) and
solved replicated. This is the "camera-block elimination + reduction"
pattern from SURVEY §7 step 8 / BASELINE north-star config 5.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.ba import BAConfig, BAProblem, solve_local_ba

__all__ = ["shard_ba_problem", "sharded_solve_local_ba"]


def _pad_to_multiple(x, mult, axis=0):
    import jax.numpy as jnp

    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def shard_ba_problem(prob: BAProblem, mesh: Mesh, axis: str = "d") -> BAProblem:
    """Place the problem on the mesh: observations sharded along the mesh
    axis, poses/points/edges replicated. Observation arrays are padded to a
    multiple of the mesh size with invalid (zero-weight) slots."""
    n = mesh.shape[axis]
    obs_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place_obs(x):
        return jax.device_put(_pad_to_multiple(x, n), obs_sh)

    def place_rep(x):
        return jax.device_put(x, rep)

    return BAProblem(
        poses=place_rep(prob.poses),
        points=place_rep(prob.points),
        pose_valid=place_rep(prob.pose_valid),
        pose_fixed=place_rep(prob.pose_fixed),
        point_valid=place_rep(prob.point_valid),
        obs_kf=place_obs(prob.obs_kf),
        obs_mp=place_obs(prob.obs_mp),
        obs_uv=place_obs(prob.obs_uv),
        obs_info=place_obs(prob.obs_info),
        obs_valid=place_obs(prob.obs_valid),
        edge_i=place_rep(prob.edge_i),
        edge_j=place_rep(prob.edge_j),
        edge_meas=place_rep(prob.edge_meas),
        edge_info=place_rep(prob.edge_info),
        edge_valid=place_rep(prob.edge_valid),
    )


_JIT_CACHE: dict = {}


def sharded_solve_local_ba(
    prob: BAProblem, cam, Tcb, cfg: BAConfig, mesh: Mesh, axis: str = "d"
):
    """Solve with observations sharded over ``mesh``.

    The solver body is unchanged — XLA's SPMD partitioner turns the
    scatter-adds of per-observation Hessian blocks into local partial sums
    plus a psum into the replicated reduced system, and keeps the dense
    Cholesky replicated. Returns (poses, points, info) replicated.

    The jitted wrapper is cached per (mesh, axis, cfg): building a fresh
    ``jax.jit`` each call would retrace and recompile every time (minutes
    on TPU).
    """
    sp = shard_ba_problem(prob, mesh, axis)
    # key on mesh structure (not object identity): structurally identical
    # meshes share the executable, and dead mesh objects aren't pinned
    key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names, axis, cfg)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        rep = NamedSharding(mesh, P())
        fn = jax.jit(
            lambda p, c, T: solve_local_ba(p, c, T, cfg),
            out_shardings=(rep, rep, rep),
        )
        _JIT_CACHE[key] = fn
    return fn(sp, cam, Tcb)
