"""Fused Schur point-elimination as a Pallas TPU kernel.

The Schur reduction S = Hpp − Hpx·Hxx⁻¹·Hpxᵀ (the point-block elimination
of solver/ba.py, the batched form of the reference's hand-rolled
marginalization in src/sparsifier.cpp:105-177) is two chained
contractions. The einsum path materializes the intermediate
T = Hpx·Hxx⁻¹ — a (3K, 3M) tensor written to and read back from HBM
(151 MB at K=256, M=16384, i.e. ~3× the size of every other operand
combined): at bank scale the reduction is HBM-bandwidth-bound on that
roundtrip, not FLOP-bound.

This kernel fuses the chain: map-point column tiles of the flattened
coupling matrix A = Hpx (3K, 3M) stream through VMEM; each tile is
multiplied by its block-diagonal Hxx⁻¹ slice (constructed in registers
from a (Tc, 3) side input via iota masks — no gathers) and immediately
contracted against itself into the resident (3K, 3K) accumulator. T
never exists outside VMEM.

Measured on the v5e (examples/bench_schur.py, committed in
docs/DESIGN.md §9): the fusion wins at bank scale and the einsum wins at
local-window scale — solver/ba.py routes on M at trace time.

Shape limits: 3K ≤ ~1500 (the A row-panel and the f32 accumulator must
fit VMEM together: 3K·(Tc+3K)·4 B ≤ ~16 MB). The local-window and
pose-chain solvers are far below this; bank-scale marginalization
(K ≤ 341) fits.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["schur_reduce_pallas"]

_TC = 384          # column tile: multiple of 3 (block alignment) and 128


def _kernel(a_ref, x_ref, m_ref, s_ref):
    """Grid over column (map-point) tiles; s_ref is a revisited-output
    accumulator resident across the sweep.

    a_ref: (3Kp, TC) tile of the flattened coupling matrix.
    x_ref: (TC, 8) — cols 0..2 hold Hxx⁻¹[m, b, d] at row 3m+b.
    m_ref: (3·TC, TC) constant block-diag selection masks, stacked
           [m0; m1; m2] with m_d[p, q] = (p//3 == q//3)·(q%3 == d) —
           precomputed on the host: building them in-kernel from iota
           with integer div/mod is VPU-murderous (measured 48× slowdown).
    """
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        s_ref[:] = jnp.zeros_like(s_ref)

    Tc = a_ref.shape[1]
    # block-diagonal BD[p, q] = Hxx⁻¹[p//3, p%3, q%3] · (p//3 == q//3):
    # three broadcast multiplies against constant masks, no gathers
    bd = (
        m_ref[0:Tc, :] * x_ref[:, 0:1]
        + m_ref[Tc:2 * Tc, :] * x_ref[:, 1:2]
        + m_ref[2 * Tc:3 * Tc, :] * x_ref[:, 2:3]
    )

    a = a_ref[:]                                  # (3Kp, Tc)
    t = jax.lax.dot_general(                      # T tile = A · BD
        a, bd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s_ref[:] += jax.lax.dot_general(              # += T · Aᵀ
        t, a, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_axis(x, mult, axis):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_reduce_pallas(Hpx, Hxx_inv, interpret: bool = False):
    """S_red (K, K, 3, 3) = Σ_m Hpx[k,:,m,:]·Hxx⁻¹[m]·Hpx[l,:,m,:]ᵀ, fused.

    Hpx: (K, 3, M, 3) pose–point coupling blocks in [k,a],[m,b] layout —
    the (3K, 3M) matrix view is then a FREE row-major reshape (the
    natural (K, M, 3, 3) layout needs a strided transpose costing ~40×
    the whole reduction at bank scale).
    Hxx_inv: (M, 3, 3) inverted (damped) point blocks.
    """
    K, M = Hpx.shape[0], Hpx.shape[2]
    dtype = Hpx.dtype
    A = Hpx.reshape(3 * K, 3 * M)
    X = jnp.zeros((3 * M, 8), dtype)
    X = X.at[:, :3].set(Hxx_inv.reshape(3 * M, 3))

    A = _pad_axis(_pad_axis(A, 128, 0), _TC, 1)
    X = _pad_axis(X, _TC, 0)
    Kp3, Mp3 = A.shape

    # constant block-diag selection masks (see _kernel docstring)
    p = np.arange(_TC)
    q = np.arange(_TC)
    block = (p[:, None] // 3) == (q[None, :] // 3)
    masks = np.concatenate(
        [(block & ((q[None, :] % 3) == d)).astype(np.float32)
         for d in range(3)], axis=0,
    )                                             # (3·TC, TC)
    masks = jnp.asarray(masks)

    S = pl.pallas_call(
        _kernel,
        grid=(Mp3 // _TC,),
        in_specs=[
            pl.BlockSpec((Kp3, _TC), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC, 8), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * _TC, _TC), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Kp3, Kp3), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp3, Kp3), jnp.float32),
        interpret=interpret,
    )(A, X, masks)
    S = S[: 3 * K, : 3 * K]
    return S.reshape(K, 3, K, 3).transpose(0, 2, 1, 3)
