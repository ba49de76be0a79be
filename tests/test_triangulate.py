"""Triangulation + camera model tests."""
import jax.numpy as jnp
import numpy as np

from se2lam_tpu.ops import se3
from se2lam_tpu.ops.camera import CameraModel, project, undistort_points
from se2lam_tpu.ops.triangulate import check_parallax, triangulate


def test_triangulate_recovers_points(rng):
    cam = CameraModel.create(420.0, 400.0, 320.0, 240.0)
    K = np.asarray(cam.K)
    n = 64
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1, 1, n), rng.uniform(3, 10, n)],
        axis=-1,
    ).astype(np.float32)
    # camera 1 at identity; camera 2 translated + slightly rotated
    T2 = np.eye(4, dtype=np.float32)
    c, s = np.cos(0.1), np.sin(0.1)
    T2[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    T2[:3, 3] = [-0.8, 0.1, 0.2]
    P1 = jnp.asarray(K @ np.eye(4)[:3], jnp.float32)
    P2 = jnp.asarray(K @ T2[:3], jnp.float32)

    pts_j = jnp.asarray(pts)
    uv1 = project(cam, pts_j)
    uv2 = project(cam, se3.apply(jnp.asarray(T2), pts_j))
    rec = triangulate(uv1, uv2, jnp.broadcast_to(P1, (n, 3, 4)), jnp.broadcast_to(P2, (n, 3, 4)))
    np.testing.assert_allclose(np.asarray(rec), pts, rtol=1e-2, atol=2e-2)


def test_parallax_gate():
    o1 = jnp.zeros(3)
    o2 = jnp.asarray([1.0, 0.0, 0.0])
    near = jnp.asarray([0.5, 0.0, 3.0])   # wide baseline-to-depth → good parallax
    far = jnp.asarray([0.5, 0.0, 500.0])  # tiny parallax
    assert bool(check_parallax(o1, o2, near, 2))
    assert not bool(check_parallax(o1, o2, far, 2))


def test_undistort_roundtrip(rng):
    cam = CameraModel.create(
        420.0, 400.0, 320.0, 240.0, dist=[-0.28, 0.07, 1e-4, -2e-4, 0.0]
    )
    uv = jnp.asarray(
        np.stack([rng.uniform(50, 590, 128), rng.uniform(50, 430, 128)], -1).astype(
            np.float32
        )
    )
    und = undistort_points(cam, uv)
    # re-distort the undistorted normalized coords → must land on original
    from se2lam_tpu.ops.camera import distort_normalized

    f = jnp.stack([cam.fx, cam.fy], -1)
    c = jnp.stack([cam.cx, cam.cy], -1)
    xy = (und - c) / f
    redist = distort_normalized(cam, xy) * f + c
    np.testing.assert_allclose(np.asarray(redist), np.asarray(uv), atol=0.05)
