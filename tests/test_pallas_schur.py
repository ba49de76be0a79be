"""Fused Pallas Schur reduction vs the einsum pair (interpreter mode on
CPU; the kernel compiles natively on TPU, where solver.ba.schur_reduce
routes bank-scale eliminations through it)."""
import jax.numpy as jnp
import numpy as np

from se2lam_tpu.solver.pallas_schur import schur_reduce_pallas


def _einsum_ref(Hpx4, Hxx_inv):
    """Hpx4 is the solver's (K, 3, M, 3) layout."""
    T = jnp.einsum("kamb,mbc->kamc", Hpx4, Hxx_inv)
    return jnp.einsum("kamb,lcmb->klac", T, Hpx4)


def test_schur_kernel_matches_einsum(rng):
    for K, M in [(4, 12), (8, 130), (24, 512)]:
        Hpx = jnp.asarray(rng.normal(0, 1, (K, 3, M, 3)), jnp.float32)
        Hxx = jnp.asarray(rng.normal(0, 1, (M, 3, 3)), jnp.float32)
        Hxx = Hxx @ jnp.swapaxes(Hxx, -1, -2) + jnp.eye(3)
        Hxx_inv = jnp.linalg.inv(Hxx)
        S = schur_reduce_pallas(Hpx, Hxx_inv, interpret=True)
        S_ref = _einsum_ref(Hpx, Hxx_inv)
        rel = float(
            jnp.max(jnp.abs(S - S_ref)) / jnp.max(jnp.abs(S_ref))
        )
        assert rel < 1e-5, (K, M, rel)


def test_schur_kernel_zero_padding_blocks(rng):
    """Zeroed coupling rows (invalid points) must contribute nothing."""
    K, M = 6, 40
    Hpx = jnp.asarray(rng.normal(0, 1, (K, 3, M, 3)), jnp.float32)
    Hpx = Hpx.at[:, :, M // 2:].set(0.0)
    Hxx_inv = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (M, 3, 3))
    S = schur_reduce_pallas(Hpx, Hxx_inv, interpret=True)
    S_half = schur_reduce_pallas(
        Hpx[:, :, : M // 2], Hxx_inv[: M // 2], interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(S), np.asarray(S_half), atol=1e-4
    )
