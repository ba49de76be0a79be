#!/usr/bin/env python
"""Multi-device scaling benchmark for the distributed solvers
(BASELINE.md protocol item 3: scaling efficiency at N devices).

Benchmarks, at fixed problem size over growing mesh sizes:
  - the map-block partitioned distributed local BA
    (parallel.dist_ba: per-device point-block elimination + psum of
    Schur-reduced camera systems), and
  - the edge-sharded distributed pose graph
    (parallel.dist_posegraph: matrix-free PCG, one (K,3) psum per
    H·v apply).

On real multi-chip hardware this measures ICI scaling; on a virtual CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) it validates
the mechanics and the communication pattern only — flagged in the
output (virtual devices share host cores, so CPU "efficiency" is a
lower bound contaminated by core contention).

Timing discipline (docs/DESIGN.md §9): inputs are perturbed per rep so
no dispatch repeats, and results are blocked on every rep.

Usage:
    python examples/bench_scaling.py [--obs 65536] [--kfs 64]
        [--mps 2048] [--pg-kfs 1024] [--json out.json]
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
    """Synthetic window via the shared consistent-geometry builder
    (solver.ba.synthetic_grid_ba — the r5 dryrun/test fixture; the old
    random-scatter _ba_problem mixed near-zero-depth garbage
    observations into the cost and was retired when it turned out the
    additive-damped LM had been 'passing' parity on it by rejecting
    every step)."""
    import jax.numpy as jnp

    from se2lam_tpu.ops.camera import CameraModel
    from se2lam_tpu.solver.ba import synthetic_grid_ba

    cam = CameraModel.create(500.0, 500.0, 320.0, 240.0)
    Tcb = jnp.asarray(
        np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                 np.float32)
    )
    P = max(1, O // M)
    prob, _ = synthetic_grid_ba(rng, K, M, P, cam, Tcb)
    return prob, cam, Tcb


def make_pose_graph(rng, K, n_loops=16):
    from se2lam_tpu.solver.posegraph import synthetic_pose_graph

    return synthetic_pose_graph(rng, K, n_random_loops=n_loops)


def bench(fn, reps=5):
    """Median wall time of ``fn(r)`` with per-rep distinct inputs.

    Completion is forced by FETCHING a scalar reduced from every output
    leaf — block_until_ready does not reliably block through the axon
    tunnel (CLAUDE.md / DESIGN §9), and fetching also defeats partial
    DCE. On the CPU mesh the fetch is free; on real hardware it costs
    one RTT, identical across the device counts being compared."""
    import jax
    import jax.numpy as jnp

    def force(out):
        return float(sum(
            jnp.sum(jnp.asarray(x, jnp.float32))
            for x in jax.tree.leaves(out)
        ))

    for w in range(3):                  # compile + axon 2-exec warmup
        force(fn(-1 - w))
    times = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        force(fn(r))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", type=int, default=65536)
    ap.add_argument("--kfs", type=int, default=64)
    ap.add_argument("--mps", type=int, default=2048)
    ap.add_argument("--pg-kfs", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cg-iters", type=int, default=128)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax

    from se2lam_tpu.parallel import (
        dist_solve_pose_graph, make_mesh, sharded_solve_local_ba,
    )
    from se2lam_tpu.solver import BAConfig

    devs = jax.devices()
    platform = devs[0].platform
    header = {
        "devices_available": len(devs), "platform": platform,
        "virtual": platform == "cpu",
        "ba": {"K": args.kfs, "M": args.mps, "O": args.obs,
               "iters": args.iters},
        "pose_graph": {"K": args.pg_kfs, "iters": args.iters,
                       "cg_iters": args.cg_iters},
    }
    print("#", json.dumps(header))
    if platform == "cpu":
        print("# virtual CPU mesh — validates mechanics/communication "
              "pattern; devices share host cores")

    rng = np.random.default_rng(0)
    prob, cam, Tcb = make_problem(rng, args.kfs, args.mps, args.obs)
    cfg = BAConfig(iters=args.iters)
    pg = make_pose_graph(rng, args.pg_kfs)

    rows = []
    n = 1
    while n <= len(devs):
        mesh = make_mesh(n)

        def ba_run(r):
            p2 = prob._replace(poses=prob.poses + r * 1e-6)
            return sharded_solve_local_ba(p2, cam, Tcb, cfg, mesh)[:2]

        t_ba = bench(ba_run)

        def pg_run(r):
            p2 = pg._replace(poses=pg.poses + r * 1e-6)
            return dist_solve_pose_graph(
                p2, mesh, iters=args.iters, cg_iters=args.cg_iters
            )[0]

        t_pg = bench(pg_run)

        rows.append({"devices": n, "ba_time_s": round(t_ba, 4),
                     "pg_time_s": round(t_pg, 4)})
        base_ba, base_pg = rows[0]["ba_time_s"], rows[0]["pg_time_s"]
        rows[-1]["ba_speedup"] = round(base_ba / t_ba, 2)
        rows[-1]["ba_efficiency"] = round(base_ba / (t_ba * n), 3)
        rows[-1]["pg_speedup"] = round(base_pg / t_pg, 2)
        rows[-1]["pg_efficiency"] = round(base_pg / (t_pg * n), 3)
        print(json.dumps(rows[-1]))
        n *= 2

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"header": header, "rows": rows}, f, indent=1)
        print(f"# wrote {args.json}")


if __name__ == "__main__":
    main()
