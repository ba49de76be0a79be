"""Fundamental-matrix RANSAC tests on synthetic two-view geometry."""
import jax
import jax.numpy as jnp
import numpy as np

from se2lam_tpu.ops import se3
from se2lam_tpu.ops.camera import CameraModel, project
from se2lam_tpu.frontend.ransac import ransac_fundamental


def two_view_scene(rng, n=200, outlier_frac=0.3):
    cam = CameraModel.create(420.0, 420.0, 320.0, 240.0)
    pts = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)],
        axis=-1,
    ).astype(np.float32)
    T2 = np.eye(4, dtype=np.float32)
    c, s = np.cos(0.08), np.sin(0.08)
    T2[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    T2[:3, 3] = [-0.5, 0.05, 0.1]
    uv1 = np.asarray(project(cam, jnp.asarray(pts)))
    uv2 = np.asarray(project(cam, se3.apply(jnp.asarray(T2), jnp.asarray(pts))))
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    uv2_c = uv2.copy()
    uv2_c[out_idx] += rng.uniform(30, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    is_outlier = np.zeros(n, bool)
    is_outlier[out_idx] = True
    return uv1, uv2_c, is_outlier


def test_ransac_separates_inliers(rng):
    uv1, uv2, is_outlier = two_view_scene(rng)
    res = ransac_fundamental(
        jax.random.PRNGKey(0),
        jnp.asarray(uv1),
        jnp.asarray(uv2),
        jnp.ones(len(uv1), bool),
    )
    inl = np.asarray(res.inliers)
    # all found inliers must be true inliers; recall high
    assert inl[~is_outlier].mean() > 0.9
    assert inl[is_outlier].mean() < 0.05
    assert int(res.n_inliers) > 100


def test_ransac_discard_all_when_degenerate(rng):
    # pure noise correspondences → below min_inliers → all discarded
    uv1 = jnp.asarray(rng.uniform(0, 640, (40, 2)).astype(np.float32))
    uv2 = jnp.asarray(rng.uniform(0, 640, (40, 2)).astype(np.float32))
    res = ransac_fundamental(
        jax.random.PRNGKey(1), uv1, uv2, jnp.ones(40, bool), min_inliers=35
    )
    assert int(res.n_inliers) == 0
    assert not bool(res.inliers.any())


def test_ransac_respects_valid_mask(rng):
    uv1, uv2, is_outlier = two_view_scene(rng, n=100, outlier_frac=0.0)
    valid = jnp.asarray(rng.uniform(size=100) > 0.5)
    res = ransac_fundamental(
        jax.random.PRNGKey(2), jnp.asarray(uv1), jnp.asarray(uv2), valid
    )
    assert not bool((np.asarray(res.inliers) & ~np.asarray(valid)).any())
