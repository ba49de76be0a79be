"""Multi-device tests on the 8-way virtual CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8): observation-sharded
BA must match the single-device solve."""
import jax
import numpy as np
import pytest

from se2lam_tpu.parallel import make_mesh, sharded_solve_local_ba
from se2lam_tpu.solver import BAConfig, solve_local_ba

from test_ba import body_to_cam, make_problem


def test_mesh_has_8_devices():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_ba_matches_single_device(rng, n_dev):
    import jax.numpy as jnp

    prob, cam, Tcb = make_problem(np.random.default_rng(0), K=8, M=48)
    # perturb so the solve does real work
    pr = np.random.default_rng(1)
    prob = prob._replace(
        poses=prob.poses + jnp.asarray(
            pr.normal(0, 0.02, prob.poses.shape), jnp.float32
        ) * (~prob.pose_fixed)[:, None],
        points=prob.points + jnp.asarray(
            pr.normal(0, 0.05, prob.points.shape), jnp.float32
        ),
    )
    cfg = BAConfig(iters=6)

    p1, x1, info1 = solve_local_ba(prob, cam, Tcb, cfg)

    mesh = make_mesh(n_dev)
    p2, x2, info2 = sharded_solve_local_ba(prob, cam, Tcb, cfg, mesh)

    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-3)
    np.testing.assert_allclose(
        float(info1["chi2"]), float(info2["chi2"]), rtol=1e-3, atol=1e-5
    )
