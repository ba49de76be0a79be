"""Factor Jacobians validated against jax autodiff (the numeric-diff oracle
pattern of the reference's Sparsifier, src/sparsifier.cpp:59-93)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se2lam_tpu import factors
from se2lam_tpu.ops import se2, se3
from se2lam_tpu.ops.camera import CameraModel


@pytest.fixture
def cam():
    return CameraModel.create(420.0, 420.0, 320.0, 240.0)


@pytest.fixture
def Tcb():
    # a plausible body→camera extrinsic: camera looking forward (+x body),
    # z optical axis
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    t = np.array([0.1, -0.05, 0.3], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return jnp.asarray(T)


def make_scene(rng, cam, Tcb, n=32):
    poses = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    poses[:, 2] = rng.uniform(-np.pi, np.pi, n)
    # points in front of each camera: sample in camera frame, map to world
    pts_c = np.stack(
        [
            rng.uniform(-1, 1, n),
            rng.uniform(-1, 1, n),
            rng.uniform(2.0, 8.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    Tbw = se2.to_se3(se2.inv(jnp.asarray(poses)))
    Tcw = Tcb @ Tbw
    Twc = se3.inv(Tcw)
    pts_w = se3.apply(Twc, jnp.asarray(pts_c))
    uv = rng.uniform(0, 640, (n, 2)).astype(np.float32)
    return jnp.asarray(poses), pts_w, jnp.asarray(uv)


class TestSE2XYZ:
    def test_zero_residual_at_projection(self, rng, cam, Tcb):
        poses, pts_w, _ = make_scene(rng, cam, Tcb)
        # project exactly, residual must vanish
        Tcw = Tcb @ se2.to_se3(se2.inv(poses))
        lc = se3.apply(Tcw, pts_w)
        uv = jnp.stack(
            [
                cam.fx * lc[:, 0] / lc[:, 2] + cam.cx,
                cam.fy * lc[:, 1] / lc[:, 2] + cam.cy,
            ],
            axis=-1,
        )
        r = jax.vmap(lambda p, x, m: factors.se2xyz_residual(p, x, m, cam, Tcb))(
            poses, pts_w, uv
        )
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-3)

    def test_jacobians_vs_autodiff(self, rng, cam, Tcb):
        poses, pts_w, uv = make_scene(rng, cam, Tcb)

        def res(p, x, m):
            return factors.se2xyz_residual(p, x, m, cam, Tcb)

        r, Jp, Jx = jax.vmap(
            lambda p, x, m: factors.se2xyz_residual_jac(p, x, m, cam, Tcb)
        )(poses, pts_w, uv)
        Jp_ad = jax.vmap(jax.jacfwd(res, argnums=0))(poses, pts_w, uv)
        Jx_ad = jax.vmap(jax.jacfwd(res, argnums=1))(poses, pts_w, uv)
        r_ref = jax.vmap(res)(poses, pts_w, uv)
        # f32 autodiff through the to_se3/matmul chain accumulates ~1%
        # rounding on O(400) entries; exact f64 agreement (diff ~1e-12)
        # is verified separately — this gate catches formula-level bugs.
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-5)
        scale = np.abs(np.asarray(Jp_ad)).max()
        np.testing.assert_allclose(
            np.asarray(Jp), np.asarray(Jp_ad), atol=0.02 * scale
        )
        np.testing.assert_allclose(
            np.asarray(Jx), np.asarray(Jx_ad), atol=0.02 * scale
        )


class TestPreSE2:
    def test_zero_residual_at_measurement(self, rng):
        pi = jnp.asarray(rng.uniform(-3, 3, (16, 3)).astype(np.float32))
        pj = jnp.asarray(rng.uniform(-3, 3, (16, 3)).astype(np.float32))
        meas = se2.minus(pj, pi)  # exact relative measurement
        r = factors.pre_se2_residual(pi, pj, meas)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-4)

    def test_jacobians_vs_autodiff(self, rng):
        pi = jnp.asarray(rng.uniform(-3, 3, (16, 3)).astype(np.float32))
        pj = jnp.asarray(rng.uniform(-3, 3, (16, 3)).astype(np.float32))
        meas = jnp.asarray(rng.uniform(-1, 1, (16, 3)).astype(np.float32))
        r, Ji, Jj = jax.vmap(factors.pre_se2_residual_jac)(pi, pj, meas)
        Ji_ad = jax.vmap(jax.jacfwd(factors.pre_se2_residual, argnums=0))(pi, pj, meas)
        Jj_ad = jax.vmap(jax.jacfwd(factors.pre_se2_residual, argnums=1))(pi, pj, meas)
        np.testing.assert_allclose(np.asarray(Ji), np.asarray(Ji_ad), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(Jj), np.asarray(Jj_ad), rtol=1e-4, atol=1e-4)


class TestPreintegration:
    def test_matches_direct_relative_pose(self, rng):
        """Integrating odometry deltas must reproduce the direct relative
        pose (noise-free consistency of Track::updateFramePose math)."""
        n_steps = 20
        odo = np.cumsum(rng.uniform(-0.1, 0.1, (n_steps, 3)), axis=0).astype(np.float32)
        odo = jnp.asarray(odo)
        noise = jnp.asarray([0.01, 0.01, 0.005], jnp.float32)
        meas = jnp.zeros(3, jnp.float32)
        cov = jnp.zeros((3, 3), jnp.float32)
        for k in range(1, n_steps):
            d = se2.minus(odo[k], odo[k - 1])
            meas, cov = factors.preintegrate_se2(meas, cov, d, noise)
        direct = se2.minus(odo[-1], odo[0])
        np.testing.assert_allclose(np.asarray(meas), np.asarray(direct), atol=1e-4)
        # covariance grows and stays symmetric PSD
        c = np.asarray(cov)
        np.testing.assert_allclose(c, c.T, atol=1e-7)
        assert np.all(np.linalg.eigvalsh(c) > 0)


class TestInfoModels:
    def test_se2xyz_sigma_psd(self, rng, cam, Tcb):
        poses, pts_w, _ = make_scene(rng, cam, Tcb)
        Tcw = Tcb @ se2.to_se3(se2.inv(poses))
        lc = se3.apply(Tcw, pts_w)
        sig = jax.vmap(
            lambda p, x, l, T: factors.se2xyz_sigma(
                p, x, l, cam, T, jnp.float32(1.0), 1e-6, 1.0
            )
        )(poses, pts_w, lc, Tcw)
        s = np.asarray(sig)
        assert np.all(np.linalg.eigvalsh(s) > 0)

    def test_se3_to_xyz_info_psd_and_anisotropic(self, rng, cam, Tcb):
        xyz1 = jnp.asarray([[0.3, -0.2, 5.0]], jnp.float32)
        Tcw1 = jnp.eye(4, dtype=jnp.float32)[None]
        Tcw2 = se3.make_rt(
            se3.so3_exp(jnp.asarray([[0.0, 0.05, 0.0]], jnp.float32)),
            jnp.asarray([[0.5, 0.0, 0.0]], jnp.float32),
        )
        i1, i2 = factors.se3_to_xyz_info(xyz1, Tcw1, Tcw2, cam.fx)
        for m in (np.asarray(i1)[0], np.asarray(i2)[0]):
            np.testing.assert_allclose(m, m.T, atol=1e-4)
            ev = np.linalg.eigvalsh(m)
            assert np.all(ev > 0)
            assert ev[-1] / ev[0] > 3.0  # genuinely anisotropic

