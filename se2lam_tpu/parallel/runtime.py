"""Multi-host runtime: jax.distributed initialization + global mesh.

The reference is strictly single-process (4 POSIX threads, one address
space — src/OdoSLAM.cpp:142-155). This module is the entry point for the
framework's new multi-host capability: each host runs the same SPMD
program; ``jax.distributed`` wires the processes into one JAX runtime so
``jax.devices()`` spans every host's chips and the shard_map solvers in
this package (dist_ba, dist_posegraph, dist_loop) run unchanged with
their psums riding ICI within a slice and DCN across hosts.

Deployment shape (BASELINE north-star config 5):

    # on every host, before any jax call:
    from se2lam_tpu.parallel import runtime
    runtime.init_distributed(coordinator="host0:9999",
                             num_processes=N, process_id=i)
    mesh = runtime.global_mesh()          # spans all hosts
    ... dist_solve_local_ba(..., mesh) ...

On TPU pods the three arguments are auto-detected from the environment
and ``init_distributed()`` with no arguments suffices. A CPU-simulated
two-process bring-up is exercised in tests/test_runtime.py.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["init_distributed", "global_mesh", "is_initialized"]

_INITIALIZED = False


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Join this process to the multi-host JAX runtime.

    Thin, idempotent wrapper over ``jax.distributed.initialize``: on TPU
    pods all arguments auto-detect; on CPU/GPU fleets pass the
    coordinator address (host:port of process 0), the world size, and
    this process's rank. Must run before the first JAX computation.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def is_initialized() -> bool:
    return _INITIALIZED


def global_mesh(axis: str = "d") -> Mesh:
    """1-D mesh over ALL devices of the (possibly multi-host) runtime.

    Unlike ``make_mesh`` (local devices only), this spans every process
    after ``init_distributed``; shard_map programs over it are true
    multi-host SPMD — each host executes its shards, XLA routes the
    psums over ICI/DCN."""
    devs = jax.devices()
    return Mesh(np.asarray(devs), (axis,))
