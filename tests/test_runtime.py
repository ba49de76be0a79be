"""CPU-simulated multi-host bring-up: two OS processes join one JAX
runtime via ``parallel.runtime.init_distributed`` (jax.distributed +
Gloo CPU collectives) and run a shard_map psum over the global mesh —
the mechanics of BASELINE north-star config 5 without TPU pod hardware.

The worker runs in subprocesses because ``jax.distributed.initialize``
must precede backend init, which the test process has already done.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import sys
    pid, n, port, repo = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    sys.path.insert(0, repo)
    from se2lam_tpu.parallel import runtime
    runtime.init_distributed(
        coordinator=f"127.0.0.1:{port}", num_processes=n, process_id=pid
    )
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = runtime.global_mesh()
    assert len(jax.devices()) == 2 * n, jax.devices()

    # cross-process psum over the global mesh
    x = jnp.arange(4.0 * n)
    f = jax.jit(
        jax.shard_map(
            lambda a: jax.lax.psum(jnp.sum(a), "d"),
            mesh=mesh, in_specs=P("d"), out_specs=P(),
        )
    )
    xs = jax.device_put(x, NamedSharding(mesh, P("d")))
    total = float(f(xs))
    expect = float(np.arange(4 * n).sum())
    assert total == expect, (total, expect)

    # the distributed pose-graph solver runs unchanged on the
    # multi-process mesh (its psums cross the process boundary)
    from se2lam_tpu.ops import se2
    from se2lam_tpu.parallel import dist_solve_pose_graph
    from se2lam_tpu.solver.posegraph import PoseGraphProblem

    rng = np.random.default_rng(0)
    K = 16
    gt = np.cumsum(rng.normal(0.1, 0.02, (K, 3)).astype(np.float32), 0)
    ei = jnp.arange(K - 1, dtype=jnp.int32)
    ej = jnp.arange(1, K, dtype=jnp.int32)
    meas = jax.vmap(se2.minus)(jnp.asarray(gt)[1:], jnp.asarray(gt)[:-1])
    noise = rng.normal(0, 0.03, gt.shape).astype(np.float32)
    noise[0] = 0
    prob = PoseGraphProblem(
        poses=jnp.asarray(gt + noise),
        pose_valid=jnp.ones(K, bool),
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        edge_i=ei, edge_j=ej, edge_meas=meas,
        edge_info=jnp.broadcast_to(
            100.0 * jnp.eye(3, dtype=jnp.float32), (K - 1, 3, 3)
        ),
        edge_valid=jnp.ones(K - 1, bool),
    )
    poses, info = dist_solve_pose_graph(prob, mesh, iters=8, cg_iters=32)
    err = float(jnp.abs(poses - jnp.asarray(gt)).max())
    assert err < 5e-3, err
    print("OK", pid, total, err, flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # never dial the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out in outs:
        low = out.lower()
        if rc != 0 and any(
            s in low for s in (
                "coordinator", "gloo", "unavailable",
                "failed to connect", "collectives",
            )
        ):
            # jax builds without CPU collectives / blocked local ports:
            # the runtime is unavailable, which is what this test would
            # be skipped for — not a solver failure
            pytest.skip(f"distributed CPU runtime unavailable: {out[-400:]}")
        assert rc == 0, out[-2000:]
        assert "OK" in out
