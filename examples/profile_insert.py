"""Device profile of the keyframe-insertion path at steady state.

Builds a realistic map (~60+ KFs, thousands of MPs) by running the real
system over a synthetic sequence, then times each insertion-path stage —
``add_keyframe``, ``prune_redundant_kf``, ``run_local_ba``, and the
loop-closer's detect program — with the DESIGN §9 discipline (lax.scan
over varying inputs inside one jit, ≥3 warm executions, scalar-fetch
completion). Also reports the end-to-end chunked wall fps of the
build-up phase as a free by-product.

Usage:  python examples/profile_insert.py            # real chip
        JAX_PLATFORMS=cpu python examples/...        # CPU sanity
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.devices()

    import os
    if jax.default_backend() != "cpu":
        from se2lam_tpu import enable_compilation_cache
        enable_compilation_cache(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache"))

    from __graft_entry__ import _default_cfg
    from se2lam_tpu import localmap, tracking
    from se2lam_tpu.io import SyntheticWorld
    from se2lam_tpu.system import SlamSystem
    from se2lam_tpu.utils.timing import measure_rtt

    cfg, oc = _default_cfg()
    world = SyntheticWorld(cfg, n_landmarks=500, seed=0)

    n_frames = 240
    gt = world.circle_trajectory(n_frames, radius=2.5)
    sys_ = SlamSystem(cfg, enable_loops=True)

    k = 8
    t0 = time.perf_counter()
    for i in range(0, n_frames - (n_frames % k), k):
        imgs = [np.asarray(world.render(gt[j]), np.uint8)
                for j in range(i, i + k)]
        odos = [np.asarray(gt[j], np.float32) for j in range(i, i + k)]
        sys_.process_chunk(imgs, odos)
    build_wall = time.perf_counter() - t0
    n_done = n_frames - (n_frames % k)
    print(f"build-up: {n_done} frames in {build_wall:.1f}s "
          f"({n_done / build_wall:.1f} fps e2e, cold-compile included), "
          f"n_kf={int(sys_.ms.n_kf)} n_mp={int(sys_.ms.n_mp)}")
    for name, v in sorted(sys_.timings.items()):
        print(f"  last {name:12s} {v * 1e3:8.1f} ms (dispatch wall)")

    ms = sys_.ms
    ts = sys_.ts
    rtt = measure_rtt()
    print(f"rtt: {rtt*1e3:.1f} ms   backend: {jax.default_backend()}")

    n_iter = 8

    def consume(x):
        return sum(jnp.sum(jnp.asarray(v, jnp.float32))
                   for v in jax.tree.leaves(x))

    def timed(name, fn, args, n=n_iter):
        fnj = jax.jit(fn)
        for w in range(3):
            pert = jax.tree.map(
                lambda x: x + np.float32(w + 1) * 1e-5
                if isinstance(x, jax.Array)
                and jnp.issubdtype(x.dtype, jnp.floating) else x, args)
            float(fnj(*pert))
        times = []
        for r in range(3):
            pert = jax.tree.map(
                lambda x: x + np.float32(r + 1) * 1e-6
                if isinstance(x, jax.Array)
                and jnp.issubdtype(x.dtype, jnp.floating) else x, args)
            t0 = time.perf_counter()
            float(fnj(*pert))
            times.append(time.perf_counter() - t0 - rtt)
        ms_per = max(min(times), 0.0) / n * 1e3
        print(f"{name:28s} {ms_per:8.3f} ms/call")
        return ms_per

    feats = ts.cur_feats
    cur = ts.ref_kf_idx

    # add_keyframe: scan n_iter inserts carrying the map (realistic
    # growth from steady state; capacities are far from full)
    def fn_add(ms0, pose0):
        def body(c, i):
            msi, _tot = c
            p = pose0 + 0.01 * i.astype(pose0.dtype)
            ms2, kk = localmap.add_keyframe(
                msi, feats, p, p, cur, ts.match_idx, ts.local_mps,
                ts.local_mp_valid, ts.good_prl, ts.pre_meas, ts.pre_cov,
                cfg)
            return (ms2, _tot + jnp.sum(ms2.kf_pose) + kk), None
        (msf, tot), _ = jax.lax.scan(
            body, (ms0, jnp.float32(0)), jnp.arange(n_iter))
        return tot + consume(msf.mp_pos)
    timed("add_keyframe", fn_add, (ms, ts.cur_pose))

    # prune: scan over the same state (first call may prune, later ones
    # no-op — both paths execute the same program)
    def fn_prune(ms0):
        def body(c, i):
            msi, tot = c
            ms2, kid = localmap.prune_redundant_kf(
                msi, cur, protect=-1, cfg=cfg)
            return (ms2, tot + kid), None
        (msf, tot), _ = jax.lax.scan(
            body, (ms0, jnp.int32(0)), jnp.arange(n_iter))
        return consume(msf.kf_pose) + tot
    timed("prune_redundant_kf", fn_prune, (ms,))

    # local BA
    def fn_ba(ms0):
        def body(c, i):
            msi, tot = c
            ms2, info = localmap.run_local_ba(msi, cur, cfg)
            return (ms2, tot + info["chi2"]), None
        (msf, tot), _ = jax.lax.scan(
            body, (ms0, jnp.float32(0)), jnp.arange(n_iter))
        return consume(msf.kf_pose) + consume(msf.mp_pos) + tot
    timed("run_local_ba (10 it)", fn_ba, (ms,))

    # build_local_ba assembly alone
    def fn_asm(ms0):
        def body(tot, i):
            win = localmap.build_local_ba(ms0, cur, cfg)
            return tot + consume(win.prob.obs_info) + consume(
                win.prob.poses) + i.astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iter))
        return tot
    timed("  build_local_ba asm", fn_asm, (ms,))

    # loop detect (BoW transform + bank score), if a vocab is live
    lc = sys_._loop_closer
    if lc is not None and lc.vocab is not None:
        from se2lam_tpu import vocab as vocabmod
        bank = lc.bank
        voc = lc.vocab
        def fn_detect(desc, valid, bank_a):
            def body(tot, i):
                v, wid = vocabmod.bow_transform(
                    voc, desc, valid & (i >= 0))
                s = vocabmod.bow_score(bank_a, v)
                return tot + jnp.sum(jnp.where(
                    jnp.isfinite(s), s, 0.0)) + jnp.sum(wid), None
            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n_iter))
            return tot
        timed("bow detect (xform+score)",
              fn_detect, (feats.desc_pm1, feats.valid, bank))


if __name__ == "__main__":
    main()
