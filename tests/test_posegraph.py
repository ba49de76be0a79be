"""Pose-graph solver tests: a drifted loop must snap closed when a loop
edge is added (the GlobalBA role, src/GlobalMapper.cpp:328-535)."""
import jax.numpy as jnp
import numpy as np

from se2lam_tpu.ops import se2
from se2lam_tpu.solver.posegraph import (
    PoseGraphProblem, pose_graph_chi2, solve_pose_graph,
)


def ring_problem(K=24, drift=0.02, with_loop=True, seed=0):
    """Ground truth: K poses around a circle; odometry edges have a
    systematic drift; one loop edge ties last to first."""
    rng = np.random.default_rng(seed)
    step = np.asarray([2 * np.pi * 2.5 / K, 0.0, 2 * np.pi / K], np.float32)
    gt = [np.zeros(3, np.float32)]
    for _ in range(K - 1):
        gt.append(np.asarray(se2.compose(jnp.asarray(gt[-1]), jnp.asarray(step))))
    gt = np.stack(gt)

    # drifted initial estimate: integrate noisy steps
    est = [gt[0]]
    metas, infos = [], []
    for k in range(K - 1):
        d = np.asarray(se2.minus(jnp.asarray(gt[k + 1]), jnp.asarray(gt[k])))
        metas.append(d)  # measurements are exact
        infos.append(np.eye(3, dtype=np.float32) * 100.0)
        d_noisy = d + rng.normal(0, drift, 3).astype(np.float32)
        est.append(np.asarray(se2.compose(jnp.asarray(est[-1]), jnp.asarray(d_noisy))))
    est = np.stack(est)

    edge_i = list(range(K - 1))
    edge_j = list(range(1, K))
    if with_loop:
        edge_i.append(K - 1)
        edge_j.append(0)
        metas.append(
            np.asarray(se2.minus(jnp.asarray(gt[0]), jnp.asarray(gt[K - 1])))
        )
        infos.append(np.eye(3, dtype=np.float32) * 1e4)

    E = len(edge_i)
    prob = PoseGraphProblem(
        poses=jnp.asarray(est),
        pose_valid=jnp.ones(K, bool),
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        edge_i=jnp.asarray(edge_i, jnp.int32),
        edge_j=jnp.asarray(edge_j, jnp.int32),
        edge_meas=jnp.asarray(np.stack(metas)),
        edge_info=jnp.asarray(np.stack(infos)),
        edge_valid=jnp.ones(E, bool),
    )
    return prob, gt, est


def test_loop_closure_corrects_drift():
    prob, gt, est = ring_problem()
    poses, info = solve_pose_graph(prob, iters=15)
    poses = np.asarray(poses)
    err_before = np.linalg.norm(est[:, :2] - gt[:, :2], axis=1).max()
    err_after = np.linalg.norm(poses[:, :2] - gt[:, :2], axis=1).max()
    assert float(info["chi2"]) < 1e-3 * float(info["chi2_init"]) + 1e-8
    assert err_after < 0.2 * err_before
    assert err_after < 0.05


def test_gauge_fixed():
    prob, gt, est = ring_problem()
    poses, _ = solve_pose_graph(prob, iters=10)
    np.testing.assert_allclose(np.asarray(poses)[0], est[0], atol=1e-7)


def test_invalid_edges_ignored():
    prob, gt, est = ring_problem()
    # add garbage edges that are masked out — result must be unchanged
    prob2 = prob._replace(
        edge_i=jnp.concatenate([prob.edge_i, jnp.asarray([3], jnp.int32)]),
        edge_j=jnp.concatenate([prob.edge_j, jnp.asarray([7], jnp.int32)]),
        edge_meas=jnp.concatenate(
            [prob.edge_meas, jnp.asarray([[9.0, 9.0, 2.0]])]
        ),
        edge_info=jnp.concatenate(
            [prob.edge_info, 1e6 * jnp.eye(3)[None]]
        ),
        edge_valid=jnp.concatenate([prob.edge_valid, jnp.asarray([False])]),
    )
    p1, _ = solve_pose_graph(prob, iters=8)
    p2, _ = solve_pose_graph(prob2, iters=8)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
