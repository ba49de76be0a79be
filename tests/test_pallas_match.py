"""Pallas windowed-top2 matcher vs the dense reference path (interpreter
mode on CPU; the same kernel compiles natively on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from se2lam_tpu.frontend.matcher import hamming_matrix
from se2lam_tpu.frontend.pallas_match import windowed_top2


def dense_reference(d1, d2, pred, xy2, oct2, lo, hi, v1, v2, win):
    D = hamming_matrix(d1, d2)
    gate = (
        (jnp.abs(xy2[None, :, 0] - pred[:, None, 0]) <= win[:, None])
        & (jnp.abs(xy2[None, :, 1] - pred[:, None, 1]) <= win[:, None])
        & (oct2[None, :].astype(jnp.float32) >= lo[:, None])
        & (oct2[None, :].astype(jnp.float32) <= hi[:, None])
        & v1[:, None]
        & v2[None, :]
    )
    Dm = jnp.where(gate, D, 1e9)
    b = jnp.min(Dm, axis=1)
    a = jnp.argmin(Dm, axis=1)
    Dm2 = Dm.at[jnp.arange(Dm.shape[0]), a].set(1e9)
    s = jnp.min(Dm2, axis=1)
    return b, s, a


def test_kernel_matches_dense(rng):
    N1, N2 = 200, 300
    d1 = jnp.asarray(1 - 2 * rng.integers(0, 2, (N1, 256)).astype(np.int8))
    d2 = jnp.asarray(1 - 2 * rng.integers(0, 2, (N2, 256)).astype(np.int8))
    xy2 = jnp.asarray(rng.uniform(0, 640, (N2, 2)), jnp.float32)
    pred = jnp.asarray(rng.uniform(0, 640, (N1, 2)), jnp.float32)
    oct2 = jnp.asarray(rng.integers(0, 5, N2), jnp.int32)
    win = jnp.asarray(rng.uniform(30, 300, N1), jnp.float32)
    lo = jnp.asarray(rng.integers(0, 2, N1), jnp.float32)
    hi = lo + 2.0
    v1 = jnp.asarray(rng.random(N1) > 0.1)
    v2 = jnp.asarray(rng.random(N2) > 0.1)

    b, s, a = windowed_top2(
        d1, pred, win, lo, hi, v1, d2, xy2, oct2, v2, interpret=True
    )
    rb, rs, ra = dense_reference(d1, d2, pred, xy2, oct2, lo, hi, v1, v2, win)
    np.testing.assert_allclose(np.asarray(b), np.asarray(rb))
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs))
    # argbest may differ only on exact-distance ties
    diff = np.asarray(a) != np.asarray(ra)
    if diff.any():
        D = np.asarray(hamming_matrix(d1, d2))
        for i in np.nonzero(diff)[0]:
            assert D[i, int(a[i])] == D[i, int(ra[i])]


def test_kernel_all_gated_rows(rng):
    """Rows with zero candidates must return BIG distances, not garbage."""
    N = 64
    d = jnp.asarray(1 - 2 * rng.integers(0, 2, (N, 256)).astype(np.int8))
    xy = jnp.asarray(rng.uniform(0, 100, (N, 2)), jnp.float32)
    b, s, a = windowed_top2(
        d, xy, jnp.zeros(N) - 1.0,                 # negative window: no hits
        jnp.zeros(N), jnp.full(N, 9.0), jnp.ones(N, bool),
        d, xy, jnp.zeros(N, jnp.int32), jnp.ones(N, bool),
        interpret=True,
    )
    assert float(jnp.min(b)) >= 1e8
    assert float(jnp.min(s)) >= 1e8
