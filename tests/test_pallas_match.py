"""Pallas windowed-top2 matcher vs the dense reference path (interpreter
mode on CPU; the same kernel compiles natively on TPU, where it is the
production Localizer projection-matching path)."""
import jax
import jax.numpy as jnp
import numpy as np

from se2lam_tpu.frontend.matcher import hamming_matrix, match_by_projection
from se2lam_tpu.frontend.orb import OrbFeatures
from se2lam_tpu.frontend.pallas_match import (
    match_by_projection_streamed,
    windowed_top2,
)


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
    a2 = jnp.argmin(Dm2, axis=1)
    return b, s, a, a2


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

    b, s, a, a2 = windowed_top2(
        d1, pred, win, lo, hi, v1, d2, xy2, oct2, v2, interpret=True
    )
    rb, rs, ra, ra2 = dense_reference(
        d1, d2, pred, xy2, oct2, lo, hi, v1, v2, win
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(rb))
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs))
    # arg best/second may differ only on exact-distance ties
    D = np.asarray(hamming_matrix(d1, d2))
    for got, ref in ((a, ra), (a2, ra2)):
        diff = np.asarray(got) != np.asarray(ref)
        for i in np.nonzero(diff)[0]:
            assert D[i, int(got[i])] == D[i, int(ref[i])]


def test_kernel_all_gated_rows(rng):
    """Rows with zero candidates must return BIG distances, not garbage."""
    N = 64
    d = jnp.asarray(1 - 2 * rng.integers(0, 2, (N, 256)).astype(np.int8))
    xy = jnp.asarray(rng.uniform(0, 100, (N, 2)), jnp.float32)
    b, s, a, a2 = windowed_top2(
        d, xy, jnp.zeros(N) - 1.0,                 # negative window: no hits
        jnp.zeros(N), jnp.full(N, 9.0), jnp.ones(N, bool),
        d, xy, jnp.zeros(N, jnp.int32), jnp.ones(N, bool),
        interpret=True,
    )
    assert float(jnp.min(b)) >= 1e8
    assert float(jnp.min(s)) >= 1e8


def test_streamed_projection_match_equivalent(rng):
    """The Localizer's streamed projection matcher must reproduce the
    dense match_by_projection end to end (accept gates, level-aware
    ratio, mutual filter, per-feature inversion) on a realistic scene:
    map descriptors observed again with a few corrupted bits."""
    M, N = 160, 96
    mp_desc = 1 - 2 * rng.integers(0, 2, (M, 256)).astype(np.int8)
    # features: first N map points re-observed with ~8 bit flips
    feat_desc = mp_desc[:N].copy()
    for i in range(N):
        flips = rng.choice(256, 8, replace=False)
        feat_desc[i, flips] *= -1
    mp_uv = rng.uniform(20, 300, (M, 2)).astype(np.float32)
    feat_xy = mp_uv[:N] + rng.normal(0, 3, (N, 2)).astype(np.float32)
    mp_oct = rng.integers(0, 3, M).astype(np.int32)
    feat_oct = mp_oct[:N].copy()
    feats = OrbFeatures(
        xy=jnp.asarray(feat_xy),
        angle=jnp.zeros((N,), jnp.float32),
        octave=jnp.asarray(feat_oct),
        response=jnp.ones((N,), jnp.float32),
        valid=jnp.asarray(rng.random(N) > 0.05),
        desc_bits=jnp.zeros((N, 8), jnp.uint32),
        desc_pm1=jnp.asarray(feat_desc),
    )
    mp_valid = jnp.asarray(rng.random(M) > 0.1)
    feat_free = jnp.asarray(rng.random(N) > 0.1)

    fm_dense, n_dense = match_by_projection(
        feats, jnp.asarray(mp_uv), jnp.asarray(mp_oct),
        jnp.asarray(mp_desc), mp_valid, feat_free,
    )
    fm_str, n_str = match_by_projection_streamed(
        feats, jnp.asarray(mp_uv), jnp.asarray(mp_oct),
        jnp.asarray(mp_desc), mp_valid, feat_free, interpret=True,
    )
    assert int(n_dense) == int(n_str)
    np.testing.assert_array_equal(np.asarray(fm_dense), np.asarray(fm_str))
