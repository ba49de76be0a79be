"""Local-BA solver tests on synthetic SE2-XYZ factor graphs with known optima
(the test strategy SURVEY.md §4 calls for: solver tests on synthetic graphs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se2lam_tpu.ops import se2, se3
from se2lam_tpu.ops.camera import CameraModel
from se2lam_tpu.solver import BAConfig, BAProblem, ba_chi2, solve_local_ba


def body_to_cam():
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    t = np.array([0.0, 0.0, 0.2], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return jnp.asarray(T)


def make_problem(rng, K=8, M=48, noise_px=0.0):
    """Ground-truth trajectory arcs forward; landmarks ahead of the robot."""
    cam = CameraModel.create(420.0, 420.0, 320.0, 240.0)
    Tcb = body_to_cam()

    gt_poses = np.zeros((K, 3), np.float32)
    for k in range(1, K):
        gt_poses[k] = np.asarray(
            se2.compose(jnp.asarray(gt_poses[k - 1]), jnp.asarray([0.4, 0.02, 0.05]))
        )
    gt_poses = jnp.asarray(gt_poses)

    # landmarks in front of mid-trajectory, in world frame
    pts = np.stack(
        [
            rng.uniform(2.0, 8.0, M),     # ahead (+x world)
            rng.uniform(-3.0, 3.0, M),    # lateral
            rng.uniform(-0.5, 1.5, M),    # height
        ],
        axis=-1,
    ).astype(np.float32)
    gt_points = jnp.asarray(pts)

    # all points observed by all KFs (dense O = K*M), gated by depth>0.5
    Tcw = Tcb @ se2.to_se3(se2.inv(gt_poses))  # (K,4,4)
    lc = jax.vmap(lambda T: se3.apply(T, gt_points))(Tcw)  # (K,M,3)
    valid = lc[..., 2] > 0.5
    uv = jnp.stack(
        [
            cam.fx * lc[..., 0] / lc[..., 2] + cam.cx,
            cam.fy * lc[..., 1] / lc[..., 2] + cam.cy,
        ],
        axis=-1,
    )
    if noise_px > 0:
        uv = uv + jnp.asarray(rng.normal(0, noise_px, uv.shape).astype(np.float32))

    obs_kf = jnp.repeat(jnp.arange(K, dtype=jnp.int32), M)
    obs_mp = jnp.tile(jnp.arange(M, dtype=jnp.int32), K)
    obs_uv = uv.reshape(K * M, 2)
    obs_valid = valid.reshape(K * M)
    obs_info = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (K * M, 2, 2))

    # odometry chain edges with exact relative measurements
    edge_i = jnp.arange(K - 1, dtype=jnp.int32)
    edge_j = edge_i + 1
    edge_meas = se2.minus(gt_poses[1:], gt_poses[:-1])
    edge_info = jnp.broadcast_to(
        jnp.diag(jnp.asarray([1e4, 1e4, 1e4], jnp.float32)), (K - 1, 3, 3)
    )

    prob_gt = BAProblem(
        poses=gt_poses,
        points=gt_points,
        pose_valid=jnp.ones(K, bool),
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        point_valid=jnp.ones(M, bool),
        obs_kf=obs_kf,
        obs_mp=obs_mp,
        obs_uv=obs_uv,
        obs_info=obs_info,
        obs_valid=obs_valid,
        edge_i=edge_i,
        edge_j=edge_j,
        edge_meas=edge_meas,
        edge_info=edge_info,
        edge_valid=jnp.ones(K - 1, bool),
    )
    return prob_gt, cam, Tcb


class TestLocalBA:
    def test_converges_to_ground_truth(self, rng):
        prob_gt, cam, Tcb = make_problem(rng)
        K = prob_gt.poses.shape[0]
        # perturb everything but the fixed pose
        dp = rng.normal(0, 0.05, (K, 3)).astype(np.float32)
        dp[0] = 0
        dx = rng.normal(0, 0.05, prob_gt.points.shape).astype(np.float32)
        prob = prob_gt._replace(
            poses=prob_gt.poses + jnp.asarray(dp),
            points=prob_gt.points + jnp.asarray(dx),
        )
        chi0 = float(ba_chi2(prob, cam, Tcb))
        poses, points, info = jax.jit(
            lambda p: solve_local_ba(p, cam, Tcb, BAConfig(iters=12))
        )(prob)
        assert float(info["chi2"]) < 1e-2 * chi0
        np.testing.assert_allclose(
            np.asarray(poses), np.asarray(prob_gt.poses), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(points), np.asarray(prob_gt.points), atol=2e-2
        )

    def test_fixed_pose_untouched(self, rng):
        prob_gt, cam, Tcb = make_problem(rng)
        dp = rng.normal(0, 0.03, prob_gt.poses.shape).astype(np.float32)
        dp[0] = 0
        prob = prob_gt._replace(poses=prob_gt.poses + jnp.asarray(dp))
        poses, _, _ = solve_local_ba(prob, cam, Tcb, BAConfig(iters=5))
        np.testing.assert_allclose(
            np.asarray(poses[0]), np.asarray(prob.poses[0]), atol=1e-7
        )

    def test_padding_invariance(self, rng):
        """Adding invalid padded poses/points/obs must not change the
        solution for the real variables (the masking-correctness property
        SURVEY.md §7 flags as a hard part)."""
        prob_gt, cam, Tcb = make_problem(rng, K=6, M=24)
        dp = rng.normal(0, 0.04, prob_gt.poses.shape).astype(np.float32)
        dp[0] = 0
        prob = prob_gt._replace(poses=prob_gt.poses + jnp.asarray(dp))
        poses_a, points_a, _ = solve_local_ba(prob, cam, Tcb, BAConfig(iters=8))

        # pad with garbage-but-invalid entries
        Kp, Mp, Op = 4, 16, 64
        pad_poses = jnp.asarray(rng.normal(0, 10, (Kp, 3)).astype(np.float32))
        pad_pts = jnp.asarray(rng.normal(0, 10, (Mp, 3)).astype(np.float32))
        prob_pad = BAProblem(
            poses=jnp.concatenate([prob.poses, pad_poses]),
            points=jnp.concatenate([prob.points, pad_pts]),
            pose_valid=jnp.concatenate([prob.pose_valid, jnp.zeros(Kp, bool)]),
            pose_fixed=jnp.concatenate([prob.pose_fixed, jnp.zeros(Kp, bool)]),
            point_valid=jnp.concatenate([prob.point_valid, jnp.zeros(Mp, bool)]),
            obs_kf=jnp.concatenate(
                [prob.obs_kf, jnp.zeros(Op, jnp.int32)]
            ),
            obs_mp=jnp.concatenate(
                [prob.obs_mp, jnp.zeros(Op, jnp.int32)]
            ),
            obs_uv=jnp.concatenate(
                [prob.obs_uv, jnp.full((Op, 2), 1e3, jnp.float32)]
            ),
            obs_info=jnp.concatenate(
                [prob.obs_info, jnp.broadcast_to(jnp.eye(2), (Op, 2, 2)).astype(jnp.float32)]
            ),
            obs_valid=jnp.concatenate([prob.obs_valid, jnp.zeros(Op, bool)]),
            edge_i=prob.edge_i,
            edge_j=prob.edge_j,
            edge_meas=prob.edge_meas,
            edge_info=prob.edge_info,
            edge_valid=prob.edge_valid,
        )
        poses_b, points_b, _ = solve_local_ba(prob_pad, cam, Tcb, BAConfig(iters=8))
        K, M = prob.poses.shape[0], prob.points.shape[0]
        np.testing.assert_allclose(
            np.asarray(poses_a), np.asarray(poses_b[:K]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(points_a), np.asarray(points_b[:M]), atol=1e-3
        )

    def test_grid_layout_matches_flat(self, rng):
        """BAConfig.obs_grid_p promises MP-major grid enumeration
        (o = m*P + p, build_global_ba's layout); the reshape-sum
        assembly it enables must reproduce the generic scatter
        assembly's solution on the same problem."""
        prob_gt, cam, Tcb = make_problem(rng, K=6, M=24)
        K, M = prob_gt.poses.shape[0], prob_gt.points.shape[0]
        # reorder the dense K-major observation grid to MP-major
        order = (
            jnp.arange(K * M).reshape(K, M).T.reshape(-1)
        )
        prob_gt = prob_gt._replace(
            obs_kf=prob_gt.obs_kf[order],
            obs_mp=prob_gt.obs_mp[order],
            obs_uv=prob_gt.obs_uv[order],
            obs_info=prob_gt.obs_info[order],
            obs_valid=prob_gt.obs_valid[order],
        )
        dp = rng.normal(0, 0.04, (K, 3)).astype(np.float32)
        dp[0] = 0
        dx = rng.normal(0, 0.04, (M, 3)).astype(np.float32)
        prob = prob_gt._replace(
            poses=prob_gt.poses + jnp.asarray(dp),
            points=prob_gt.points + jnp.asarray(dx),
        )
        poses_a, points_a, ia = solve_local_ba(
            prob, cam, Tcb, BAConfig(iters=8)
        )
        poses_b, points_b, ib = solve_local_ba(
            prob, cam, Tcb, BAConfig(iters=8, obs_grid_p=K)
        )
        np.testing.assert_allclose(
            np.asarray(poses_a), np.asarray(poses_b), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(points_a), np.asarray(points_b), atol=1e-4
        )

    def test_onehot_accum_matches_scatter(self, rng):
        """BAConfig(accum='onehot') forces the one-hot MXU accumulation —
        the path production local BA takes on the real TPU — so the CPU
        suite covers its index algebra and precision against the scatter
        lowering."""
        prob_gt, cam, Tcb = make_problem(rng, K=6, M=24)
        K, M = prob_gt.poses.shape[0], prob_gt.points.shape[0]
        dp = rng.normal(0, 0.04, (K, 3)).astype(np.float32)
        dp[0] = 0
        dx = rng.normal(0, 0.04, (M, 3)).astype(np.float32)
        prob = prob_gt._replace(
            poses=prob_gt.poses + jnp.asarray(dp),
            points=prob_gt.points + jnp.asarray(dx),
        )
        poses_a, points_a, _ = solve_local_ba(
            prob, cam, Tcb, BAConfig(iters=8, accum="scatter")
        )
        poses_b, points_b, _ = solve_local_ba(
            prob, cam, Tcb, BAConfig(iters=8, accum="onehot")
        )
        np.testing.assert_allclose(
            np.asarray(poses_a), np.asarray(poses_b), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(points_a), np.asarray(points_b), atol=1e-4
        )

    def test_huber_downweights_outlier(self, rng):
        prob_gt, cam, Tcb = make_problem(rng, K=6, M=24)
        # corrupt a handful of observations grossly
        uv = np.array(prob_gt.obs_uv)
        idx = rng.choice(len(uv), 8, replace=False)
        uv[idx] += 200.0
        dp = rng.normal(0, 0.03, prob_gt.poses.shape).astype(np.float32)
        dp[0] = 0
        prob = prob_gt._replace(
            obs_uv=jnp.asarray(uv), poses=prob_gt.poses + jnp.asarray(dp)
        )
        poses, _, _ = solve_local_ba(prob, cam, Tcb, BAConfig(iters=10))
        # robustified solve should still land near ground truth
        err = np.abs(np.asarray(poses) - np.asarray(prob_gt.poses)).max()
        assert err < 0.02, err

    def test_behind_camera_obs_does_not_stall(self, rng):
        """An obs_valid observation whose point sits behind the camera is
        zero-weighted in the step AND pinned at the chi2 cap in the
        accept cost: it must neither blow up the solve nor veto the
        steps that converge the healthy observations (the accept/step
        objective-mismatch bug class)."""
        prob_gt, cam, Tcb = make_problem(rng, K=6, M=24)
        dp = rng.normal(0, 0.05, prob_gt.poses.shape).astype(np.float32)
        dp[0] = 0
        dx = rng.normal(0, 0.05, prob_gt.points.shape).astype(np.float32)
        # drag point 0 far behind every camera, but KEEP its
        # observations marked valid — the build-time gate cannot see
        # mid-solve geometry, so the solver must handle this live
        pts = (prob_gt.points + jnp.asarray(dx)).at[0].set(
            jnp.asarray([-5.0, 0.0, 0.0], jnp.float32)
        )
        prob = prob_gt._replace(
            poses=prob_gt.poses + jnp.asarray(dp), points=pts
        )
        poses, points, info = solve_local_ba(
            prob, cam, Tcb, BAConfig(iters=12)
        )
        assert np.isfinite(float(info["chi2"]))
        err = np.abs(np.asarray(poses) - np.asarray(prob_gt.poses)).max()
        assert err < 0.02, err
        good = np.asarray(points)[1:]
        np.testing.assert_allclose(
            good, np.asarray(prob_gt.points)[1:], atol=2e-2
        )


class TestTermRel:
    def test_early_exit_is_opt_in_and_preserves_quality(self, rng):
        """term_rel=0 (the default — reference parity: se2lam installs
        no g2o terminate action, optimize(LOCAL_ITER) runs the full
        budget, src/LocalMapper.cpp:260) uses every iteration; an
        opt-in tolerance stops once an accepted step's relative gain
        stalls, with the solution still at the optimum."""
        import jax.numpy as jnp

        # pixel noise floors the chi2, so the relative gain genuinely
        # stalls (a noiseless problem decays geometrically forever and
        # never trips a relative-gain test)
        prob_gt, cam, Tcb = make_problem(rng, noise_px=0.5)
        K = prob_gt.poses.shape[0]
        dp = rng.normal(0, 0.05, (K, 3)).astype(np.float32)
        dp[0] = 0
        prob = prob_gt._replace(poses=prob_gt.poses + jnp.asarray(dp))

        _, _, info0 = solve_local_ba(
            prob, cam, Tcb, BAConfig(iters=20, term_rel=0.0)
        )
        assert int(info0["iters"]) == 20     # full budget, no early exit

        poses, _, info1 = solve_local_ba(
            prob, cam, Tcb, BAConfig(iters=20, term_rel=1e-4)
        )
        assert int(info1["iters"]) < 20      # stalled-gain exit fired
        # quality within noise of the full-budget run
        assert float(info1["chi2"]) <= 1.01 * float(info0["chi2"]) + 1e-6
        np.testing.assert_allclose(
            np.asarray(poses), np.asarray(prob_gt.poses), atol=2e-2
        )
