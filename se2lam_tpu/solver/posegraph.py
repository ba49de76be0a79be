"""Global SE(2) pose-graph Gauss-Newton solver.

TPU-native replacement for the reference GlobalBA (GlobalMapper::GlobalBA,
src/GlobalMapper.cpp:328-535): there, every KF gets a VertexSE3 plus a
plane-motion prior edge pinning roll/pitch/z (addVertexSE3PlaneMotion,
src/optimizer.cpp:336-468), optimized with LM over odometry + feature/loop
SE3 edges. On SE(2) the plane prior is exact by construction, so the
pose graph is solved directly in (x, y, theta) with the preintegrated-SE2
relative factor (PreEdgeSE2 residual/Jacobians) — a dense 3Kx3K system
that XLA maps straight onto the MXU; K0 is held fixed as the gauge.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import factors
from ..ops import se2

__all__ = [
    "PoseGraphProblem", "solve_pose_graph", "pose_graph_chi2",
    "synthetic_pose_graph",
]


class PoseGraphProblem(NamedTuple):
    poses: jnp.ndarray       # (K, 3) SE2
    pose_valid: jnp.ndarray  # (K,) bool
    pose_fixed: jnp.ndarray  # (K,) bool (gauge anchors, e.g. KF0)
    edge_i: jnp.ndarray      # (E,) int32
    edge_j: jnp.ndarray      # (E,) int32
    edge_meas: jnp.ndarray   # (E, 3) relative SE2 (j in i's frame)
    edge_info: jnp.ndarray   # (E, 3, 3)
    edge_valid: jnp.ndarray  # (E,) bool


def synthetic_pose_graph(
    rng,
    K: int,
    loop_pairs=None,
    n_random_loops: int = 0,
    step_mu: float = 0.08,
    step_sigma: float = 0.02,
    meas_noise: float = 0.002,
    pose_noise: float = 0.03,
    edge_info_scale: float = 100.0,
):
    """Chain + loop-closure fixture shared by tests, benchmarks, and the
    driver dryrun (one construction so gauge/info conventions can't
    silently diverge between them).

    ``rng`` is a ``np.random.Generator``. Odometry edges chain 0..K-1;
    ``loop_pairs`` adds explicit (i, j) closures, ``n_random_loops``
    samples long-range ones. KF0 is the gauge anchor and its initial
    noise is zeroed."""
    import numpy as np

    gt = np.cumsum(
        rng.normal(step_mu, step_sigma, (K, 3)).astype(np.float32), 0
    )
    ei = list(range(K - 1))
    ej = list(range(1, K))
    for a, b in (loop_pairs or []):
        ei.append(int(a))
        ej.append(int(b))
    for _ in range(n_random_loops):
        a = int(rng.integers(0, K - 30))
        b = int(rng.integers(a + 25, K))
        ei.append(a)
        ej.append(b)
    ei = np.asarray(ei, np.int32)
    ej = np.asarray(ej, np.int32)
    E = len(ei)
    meas = np.asarray(
        jax.vmap(se2.minus)(jnp.asarray(gt)[ej], jnp.asarray(gt)[ei])
    ) + rng.normal(0, meas_noise, (E, 3)).astype(np.float32)
    noise = rng.normal(0, pose_noise, gt.shape).astype(np.float32)
    noise[0] = 0
    return PoseGraphProblem(
        poses=jnp.asarray(gt + noise),
        pose_valid=jnp.ones(K, bool),
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_meas=jnp.asarray(meas, jnp.float32),
        edge_info=jnp.broadcast_to(
            edge_info_scale * jnp.eye(3, dtype=jnp.float32), (E, 3, 3)
        ),
        edge_valid=jnp.ones(E, bool),
    )


def _edge_terms(prob: PoseGraphProblem, huber_delta):
    r, Ji, Jj = jax.vmap(factors.pre_se2_residual_jac)(
        prob.poses[prob.edge_i], prob.poses[prob.edge_j], prob.edge_meas
    )
    chi2 = jnp.einsum("ei,eij,ej->e", r, prob.edge_info, r)
    sqrt_chi = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w = jnp.where(sqrt_chi > huber_delta, huber_delta / sqrt_chi, 1.0)
    W = prob.edge_info * jnp.where(prob.edge_valid, w, 0.0)[:, None, None]
    return r, Ji, Jj, W, chi2


def pose_graph_chi2(prob: PoseGraphProblem, huber_delta=jnp.inf):
    r, _, _, _, chi2 = _edge_terms(prob, jnp.inf)
    rho = factors.huber_rho(chi2, huber_delta)
    return jnp.sum(jnp.where(prob.edge_valid, rho, 0.0))


@partial(jax.jit, static_argnames=("iters",))
def solve_pose_graph(
    prob: PoseGraphProblem,
    iters: int = 15,
    huber_delta: float = jnp.inf,
    lm_init_lambda: float = 1e-6,
):
    """Bounded LM loop (Config::GLOBAL_ITER=15 analog). Returns
    (poses, {"chi2", "chi2_init"})."""
    K = prob.poses.shape[0]
    dtype = prob.poses.dtype

    def assemble(p: PoseGraphProblem):
        r, Ji, Jj, W, _ = _edge_terms(p, huber_delta)
        JiW = jnp.einsum("eab,eac->ebc", Ji, W)
        JjW = jnp.einsum("eab,eac->ebc", Jj, W)
        H = jnp.zeros((K, K, 3, 3), dtype)
        H = H.at[p.edge_i, p.edge_i].add(JiW @ Ji)
        H = H.at[p.edge_i, p.edge_j].add(JiW @ Jj)
        H = H.at[p.edge_j, p.edge_i].add(JjW @ Ji)
        H = H.at[p.edge_j, p.edge_j].add(JjW @ Jj)
        b = jnp.zeros((K, 3), dtype)
        b = b.at[p.edge_i].add(-jnp.einsum("eab,eb->ea", JiW, r))
        b = b.at[p.edge_j].add(-jnp.einsum("eab,eb->ea", JjW, r))
        return H, b

    free = prob.pose_valid & ~prob.pose_fixed
    free3 = jnp.repeat(free.astype(dtype), 3)

    def step(_, state):
        p, lam, last = state
        H, b = assemble(p)
        Hd = H.transpose(0, 2, 1, 3).reshape(3 * K, 3 * K)
        Hd = Hd + lam * jnp.diag(jnp.diag(Hd)) + 1e-9 * jnp.eye(
            3 * K, dtype=dtype
        )
        Hd = Hd * free3[:, None] * free3[None, :] + jnp.diag(1.0 - free3)
        bd = b.reshape(-1) * free3
        # pivoted LU: cholesky+cho_solve is a latency-bound custom-call
        # chain at these sizes (0.80 vs 0.22 ms at 144x144 on a v5e;
        # worse at 3K=768 — solver/ba.py round-3 microbench)
        dp = jnp.linalg.solve(Hd, bd).reshape(K, 3)
        new_poses = p.poses + dp * free[:, None]
        new_poses = new_poses.at[..., 2].set(
            se2.normalize_angle(new_poses[..., 2])
        )
        cand = p._replace(poses=new_poses)
        new_chi2 = pose_graph_chi2(cand, huber_delta)
        accept = new_chi2 < last
        out = jax.tree.map(lambda a, c: jnp.where(accept, a, c), cand, p)
        lam = jnp.where(accept, lam * 0.5, lam * 10.0)
        return out, lam, jnp.where(accept, new_chi2, last)

    chi0 = pose_graph_chi2(prob, huber_delta)
    final, _, chi = jax.lax.fori_loop(
        0, iters, step, (prob, jnp.asarray(lm_init_lambda, dtype), chi0)
    )
    return final.poses, {"chi2": chi, "chi2_init": chi0}
