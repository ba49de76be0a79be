#!/usr/bin/env python
"""Einsum vs fused-Pallas Schur reduction on the real chip.

Decides (and documents) solver.ba.PALLAS_SCHUR_MIN_M: at which point-bank
size the fused kernel (T never hits HBM) overtakes the einsum pair.

Measurement discipline (docs/DESIGN.md §9): each op is scanned R times
inside ONE jit with a carried dependency (the accumulator feeds a scaled
re-use of the inputs); outputs are consumed via sum-of-SQUARES (a plain
sum lets XLA's algebraic simplifier collapse dot+reduce into
reduce+multiply, deleting the matmul being measured); inputs differ per
run; completion is forced by FETCHING the scalar result
(block_until_ready does not reliably block through the axon tunnel —
observed returning in 0.15 ms for a 4.4 TFLOP program), and the ~30 ms
tunnel RTT is measured separately and subtracted.

Usage:  python examples/bench_schur.py          # ambient env → TPU
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from se2lam_tpu.solver.pallas_schur import schur_reduce_pallas

    def einsum_reduce(Hpx4, Hxx_inv):
        # the solver's (K, 3, M, 3) coupling layout (solver.ba.schur_reduce)
        T = jnp.einsum("kamb,mbc->kamc", Hpx4, Hxx_inv)
        return jnp.einsum("kamb,lcmb->klac", T, Hpx4)

    R = 16

    def scanned(fn):
        @jax.jit
        def run(Hpx, Hxx_inv, seed):
            def body(carry, _):
                # carried dependency: scale inputs by a value derived
                # from the previous output so no iteration can be CSE'd
                s = 1.0 + carry * 1e-20 + seed * 1e-12
                out = fn(Hpx * s, Hxx_inv)
                return jnp.sum(out * out), None

            tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
            return tot

        return run

    # tunnel round-trip floor: the shared probe (one discipline)
    from se2lam_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()

    rng = np.random.default_rng(0)
    print(f"# backend: {jax.default_backend()}, reps/scan: {R}, "
          f"rtt_ms: {rtt * 1e3:.1f}")
    for K, M in [(24, 512), (64, 2048), (128, 8192), (256, 16384)]:
        Hpx = jnp.asarray(rng.normal(0, 1, (K, 3, M, 3)), jnp.float32)
        Hxx = jnp.asarray(rng.normal(0, 0.3, (M, 3, 3)), jnp.float32)
        Hxx_inv = jnp.linalg.inv(
            Hxx @ jnp.swapaxes(Hxx, -1, -2)
            + jnp.eye(3, dtype=jnp.float32)
        )
        row = {"K": K, "M": M}
        for name, fn in (
            ("einsum", einsum_reduce),
            ("pallas", schur_reduce_pallas),
        ):
            run = scanned(fn)
            float(run(Hpx, Hxx_inv, jnp.float32(0)))     # compile + warm
            times = []
            for r in range(1, 4):
                t0 = time.perf_counter()
                float(run(Hpx, Hxx_inv, jnp.float32(r)))  # distinct input
                times.append(time.perf_counter() - t0)
            row[f"{name}_ms"] = round(
                max(min(times) - rtt, 0.0) / R * 1e3, 3
            )
        row["speedup"] = round(
            row["einsum_ms"] / max(row["pallas_ms"], 1e-9), 2
        )
        print(json.dumps(row))


if __name__ == "__main__":
    main()
