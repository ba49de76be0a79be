"""Multi-device tests on the 8-way virtual CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8): the map-block
partitioned distributed BA and the edge-sharded pose-graph PCG must
match their single-device counterparts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se2lam_tpu.ops import se2
from se2lam_tpu.parallel import (
    dist_solve_pose_graph,
    make_mesh,
    partition_points,
    sharded_solve_local_ba,
)
from se2lam_tpu.solver import BAConfig, solve_local_ba
from se2lam_tpu.solver.posegraph import PoseGraphProblem, solve_pose_graph

from test_ba import body_to_cam, make_problem


def test_mesh_has_8_devices():
    assert len(jax.devices()) >= 8


def _perturbed_problem(K=8, M=48):
    prob, cam, Tcb = make_problem(np.random.default_rng(0), K=K, M=M)
    pr = np.random.default_rng(1)
    return prob._replace(
        poses=prob.poses + jnp.asarray(
            pr.normal(0, 0.02, prob.poses.shape), jnp.float32
        ) * (~prob.pose_fixed)[:, None],
        points=prob.points + jnp.asarray(
            pr.normal(0, 0.05, prob.points.shape), jnp.float32
        ),
    ), cam, Tcb


@pytest.mark.parametrize(
    "n_dev,accum", [(2, "auto"), (8, "auto"), (8, "onehot")]
)
def test_sharded_ba_matches_single_device(rng, n_dev, accum):
    # accum="onehot" forces, on the CPU mesh, the exact per-device
    # accumulation lowering the distributed solver uses on real TPUs
    prob, cam, Tcb = _perturbed_problem()
    cfg = BAConfig(iters=6, accum=accum)

    p1, x1, info1 = solve_local_ba(prob, cam, Tcb, BAConfig(iters=6))

    mesh = make_mesh(n_dev)
    p2, x2, info2 = sharded_solve_local_ba(prob, cam, Tcb, cfg, mesh)

    assert int(info2["n_obs_dropped"]) == 0
    # atol 5e-4: at 8 shards the psum order differs from the
    # single-device accumulation order; the r5 Marquardt damping tracks
    # per-direction curvature, so that f32 noise reaches the pose
    # estimates at the ~1e-4 absolute / ~7e-5 relative level (the old
    # additive-lambda damping hid this by stalling on hard fixtures)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=2e-3)
    # both solvers drive chi2 from ~1e4 to the 1e-4-scale noise floor of
    # this exact-measurement problem; the floor itself is summation-order
    # noise (the Marquardt λ trajectories decouple there), so the
    # absolute tolerance must sit above it — pose/point parity above is
    # the meaningful assertion
    np.testing.assert_allclose(
        float(info1["chi2"]), float(info2["chi2"]), rtol=1e-2, atol=1e-3
    )


def test_partition_points_buckets_and_drops():
    """Every surviving observation lands in the block owning its point,
    with the point index rebased to the block; overflow is counted."""
    prob, cam, Tcb = _perturbed_problem(K=4, M=16)
    n = 4
    O = prob.obs_kf.shape[0]
    dp = partition_points(prob, n=n, obs_cap=max(1, O))  # no drops
    assert int(dp.n_obs_dropped) == 0
    Mb = dp.points.shape[0] // n
    obs_kf = np.asarray(dp.obs_kf).reshape(n, -1)
    obs_mp = np.asarray(dp.obs_mp).reshape(n, -1)
    obs_uv = np.asarray(dp.obs_uv).reshape(n, -1, 2)
    ok = np.asarray(dp.obs_valid).reshape(n, -1)
    pts = np.asarray(dp.points)
    # reconstruct the original (kf, global mp, uv) triples
    orig = {
        (int(k), int(m), round(float(u), 3))
        for k, m, (u, v), valid in zip(
            np.asarray(prob.obs_kf), np.asarray(prob.obs_mp),
            np.asarray(prob.obs_uv), np.asarray(prob.obs_valid),
        )
        if valid
    }
    got = set()
    for b in range(n):
        for k, m, (u, v), valid in zip(
            obs_kf[b], obs_mp[b], obs_uv[b], ok[b]
        ):
            if not valid:
                continue
            g = b * Mb + int(m)          # rebase to global
            got.add((int(k), g, round(float(u), 3)))
            np.testing.assert_allclose(
                pts[g], np.asarray(prob.points)[g]
            )
    assert got == orig

    # tight capacity → drops are counted, not silently lost
    dp_tight = partition_points(prob, n=n, obs_cap=1)
    n_valid = int(np.sum(np.asarray(prob.obs_valid)))
    assert int(dp_tight.n_obs_dropped) == max(0, n_valid - n)


def _make_pose_graph(K=64, n_loops=3, seed=0):
    from se2lam_tpu.solver.posegraph import synthetic_pose_graph

    return synthetic_pose_graph(
        np.random.default_rng(seed), K,
        loop_pairs=[(0, K - 20), (5, K - 8), (10, K - 1)][:n_loops],
        step_mu=0.1, step_sigma=0.05, pose_noise=0.05,
    )


@pytest.mark.parametrize("n_dev", [2, 8])
def test_dist_pose_graph_matches_dense(n_dev):
    prob = _make_pose_graph()
    p1, info1 = solve_pose_graph(prob, iters=15)
    mesh = make_mesh(n_dev)
    p2, info2 = dist_solve_pose_graph(prob, mesh, iters=15, cg_iters=64)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
    np.testing.assert_allclose(
        float(info1["chi2"]), float(info2["chi2"]), rtol=1e-3, atol=1e-8
    )


def test_dist_pose_graph_huber_matches_dense():
    """With one gross outlier edge the robustified solves must also agree
    (the global-BA path runs with huber_delta=3)."""
    prob = _make_pose_graph()
    bad = prob.edge_meas.at[-1].add(
        jnp.asarray([1.0, -1.0, 0.5], jnp.float32)
    )
    prob = prob._replace(edge_meas=bad)
    p1, _ = solve_pose_graph(prob, iters=15, huber_delta=3.0)
    mesh = make_mesh(8)
    p2, _ = dist_solve_pose_graph(
        prob, mesh, iters=15, cg_iters=64, huber_delta=3.0
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_block_tridiag_solve_matches_dense(rng):
    """ops/linalg.block_tridiag_factor/solve vs a dense solve on a
    random SPD block-tridiagonal system (the chain-aware preconditioner
    kernel)."""
    from se2lam_tpu.ops.linalg import (
        block_tridiag_factor, block_tridiag_solve,
    )

    K, b = 24, 3
    D = np.zeros((K, b, b), np.float32)
    L = np.zeros((K, b, b), np.float32)
    A = np.zeros((K * b, K * b), np.float64)
    for k in range(K):
        Q = rng.normal(size=(b, b))
        Dk = (Q @ Q.T + 5 * np.eye(b)).astype(np.float32)
        D[k] = Dk
        A[k * b:(k + 1) * b, k * b:(k + 1) * b] = Dk
    for k in range(1, K):
        Lk = (0.5 * rng.normal(size=(b, b))).astype(np.float32)
        L[k] = Lk
        A[k * b:(k + 1) * b, (k - 1) * b:k * b] = Lk
        A[(k - 1) * b:k * b, k * b:(k + 1) * b] = Lk.T
    r = rng.normal(size=(K, b)).astype(np.float32)
    Cinv, Lj = block_tridiag_factor(
        jnp.asarray(D), jnp.asarray(L), eps=0.0
    )
    x = np.asarray(block_tridiag_solve(Cinv, Lj, jnp.asarray(r)))
    x_ref = np.linalg.solve(A, r.reshape(-1)).reshape(K, b)
    np.testing.assert_allclose(x, x_ref, atol=1e-5)


def test_dist_pose_graph_tridiag_beats_jacobi_at_low_cg():
    """The chain-exact preconditioner must match the dense solve at a
    small inner-iteration budget where block-Jacobi cannot (the r3
    cg ≈ K wall; artifacts/pcg_precond_r4)."""
    prob = _make_pose_graph(K=192)
    p_ref, _ = solve_pose_graph(prob, iters=15)
    mesh = make_mesh(8)
    p_tri, _ = dist_solve_pose_graph(
        prob, mesh, iters=15, cg_iters=12, precond="tridiag"
    )
    p_jac, _ = dist_solve_pose_graph(
        prob, mesh, iters=15, cg_iters=12, precond="jacobi"
    )
    err_tri = float(jnp.max(jnp.abs(p_tri - p_ref)))
    err_jac = float(jnp.max(jnp.abs(p_jac - p_ref)))
    assert err_tri < 1e-2, err_tri
    assert err_tri < 0.2 * err_jac, (err_tri, err_jac)


def test_sharded_joint_ba_pcg_matches_optimum(rng):
    """Matrix-free PCG joint BA (grid partition + chain-aware
    preconditioner) vs the single-device optimum at window scale.
    Parity is at the OPTIMUM: the PCG path damps Marquardt-style (the
    raw reduced system conditions at ~1e11 where additive damping makes
    f32 CG unusable — artifacts/pcg_precond_r4/RESULTS.md), so the LM
    trajectories differ while the converged poses agree."""
    from se2lam_tpu.ops.camera import CameraModel
    from se2lam_tpu.parallel import sharded_solve_joint_ba
    from se2lam_tpu.solver.ba import (
        BAConfig, solve_local_ba, synthetic_grid_ba,
    )

    cam = CameraModel.create(500.0, 500.0, 320.0, 240.0)
    Tcb = jnp.asarray(np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
        np.float32,
    ))
    P = 8
    prob, gt = synthetic_grid_ba(rng, 64, 2048, P, cam, Tcb)
    cfg = BAConfig(iters=8)
    p_ref, _, _ = solve_local_ba(prob, cam, Tcb, cfg)
    mesh = make_mesh(8)
    p, x, info = sharded_solve_joint_ba(
        prob, cam, Tcb, cfg, mesh, cg_iters=32, grid_p=P
    )
    assert int(info["n_obs_dropped"]) == 0
    d = np.array(p - p_ref)
    d[:, 2] = np.arctan2(np.sin(d[:, 2]), np.cos(d[:, 2]))
    # f32 optimum wiggle along sloppy directions is problem-dependent
    # (measured 2e-3..7e-3 across seeds); the cost check below pins the
    # quality tighter than the pose tolerance alone
    assert float(np.abs(d).max()) < 1e-2, float(np.abs(d).max())
    assert np.isfinite(np.asarray(x)).all()
    from se2lam_tpu.solver.ba import ba_chi2

    c_pcg = float(ba_chi2(
        prob._replace(poses=p, points=x), cam, Tcb, cfg.huber_delta
    ))
    c0 = float(ba_chi2(prob, cam, Tcb, cfg.huber_delta))
    assert c_pcg < 1e-3 * c0, (c_pcg, c0)
