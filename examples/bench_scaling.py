#!/usr/bin/env python
"""Multi-device scaling benchmark for the distributed local BA
(BASELINE.md protocol item 3: scaling efficiency at N devices).

Runs the observation-sharded Schur-GN solve at fixed problem size over
growing mesh sizes and reports wall time + efficiency. On real multi-chip
hardware this measures ICI scaling; on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) it validates the
mechanics only — flagged in the output.

Usage:
    python examples/bench_scaling.py [--obs 65536] [--kfs 64] [--mps 2048]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_problem(rng, K, M, O):
    import jax
    import jax.numpy as jnp

    from se2lam_tpu.ops import se2
    from se2lam_tpu.ops.camera import CameraModel
    from se2lam_tpu.solver import BAProblem

    cam = CameraModel.create(500.0, 500.0, 320.0, 240.0)
    Tcb = jnp.asarray(
        np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                 np.float32)
    )
    poses = np.cumsum(rng.normal(0.08, 0.01, (K, 3)).astype(np.float32), 0)
    points = np.stack(
        [rng.uniform(3, 10, M), rng.uniform(-4, 4, M), rng.uniform(-1, 1, M)],
        -1,
    ).astype(np.float32)
    obs_kf = rng.integers(0, K, O).astype(np.int32)
    obs_mp = rng.integers(0, M, O).astype(np.int32)
    pj = jnp.asarray(poses)[obs_kf]
    xj = jnp.asarray(points)[obs_mp]
    Tcw = Tcb @ jax.vmap(lambda p: jnp.linalg.inv(se2.to_se3(p)))(pj)
    lc = jnp.einsum("oij,oj->oi", Tcw[:, :3, :3], xj) + Tcw[:, :3, 3]
    ok = lc[:, 2] > 0.2
    uv = jnp.stack(
        [cam.fx * lc[:, 0] / lc[:, 2] + cam.cx,
         cam.fy * lc[:, 1] / lc[:, 2] + cam.cy], -1,
    )
    prob = BAProblem(
        poses=jnp.asarray(poses + rng.normal(0, 0.01, (K, 3)).astype(np.float32)),
        points=jnp.asarray(points),
        pose_valid=jnp.ones(K, bool),
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        point_valid=jnp.ones(M, bool),
        obs_kf=jnp.asarray(obs_kf), obs_mp=jnp.asarray(obs_mp),
        obs_uv=uv,
        obs_info=jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (O, 2, 2)),
        obs_valid=ok,
        edge_i=jnp.arange(K - 1, dtype=jnp.int32),
        edge_j=jnp.arange(1, K, dtype=jnp.int32),
        edge_meas=jax.vmap(se2.minus)(jnp.asarray(poses)[1:], jnp.asarray(poses)[:-1]),
        edge_info=jnp.broadcast_to(100.0 * jnp.eye(3, dtype=jnp.float32),
                                   (K - 1, 3, 3)),
        edge_valid=jnp.ones(K - 1, bool),
    )
    return prob, cam, Tcb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", type=int, default=65536)
    ap.add_argument("--kfs", type=int, default=64)
    ap.add_argument("--mps", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    from se2lam_tpu.parallel import make_mesh, sharded_solve_local_ba
    from se2lam_tpu.solver import BAConfig

    devs = jax.devices()
    platform = devs[0].platform
    print(f"# {len(devs)} {platform} devices"
          + (" (virtual mesh — mechanics only, not real scaling)"
             if platform == "cpu" else ""))

    rng = np.random.default_rng(0)
    prob, cam, Tcb = make_problem(rng, args.kfs, args.mps, args.obs)
    cfg = BAConfig(iters=args.iters)

    results = []
    n = 1
    while n <= len(devs):
        mesh = make_mesh(n)
        out = sharded_solve_local_ba(prob, cam, Tcb, cfg, mesh)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            p2 = prob._replace(poses=prob.poses + r * 1e-6)
            out = sharded_solve_local_ba(p2, cam, Tcb, cfg, mesh)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        results.append((n, dt))
        base = results[0][1]
        eff = base / (dt * n)
        print(json.dumps({
            "devices": n, "time_s": round(dt, 4),
            "speedup": round(base / dt, 2),
            "efficiency": round(eff, 3),
        }))
        n *= 2


if __name__ == "__main__":
    main()
