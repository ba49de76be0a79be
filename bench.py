"""Headline benchmark: full tracking-loop throughput on one chip.

Measures frames/s of the per-frame hot path — ORB pyramid extraction,
MXU Hamming window matching, fundamental RANSAC, odometry-fused pose +
SE2 preintegration, DLT triangulation, KF decision — on 640x480 frames
with 1000 features (the reference's demo configuration).

Measurement discipline (docs/DESIGN.md §9): the tracking state is
threaded through the loop and every iteration gets a distinct image,
odometry reading, and PRNG key, so no two dispatches are identical (the
axon path can serve repeated identical dispatches from a cache). The
state is a steady-state one — a populated map/ref_obs_mask produced by a
real first-KF + tracking + keyframe-insertion warm-up, not a cold start.
Alongside the wall-clock fps, a `lax.scan` of the same step inside ONE
jit (carried state, all outputs consumed, perturbed inputs per run)
reports pure device ms/frame.

Completion is forced by FETCHING a scalar derived from the final state,
not block_until_ready — the latter does not reliably block through the
axon tunnel (observed returning in 0.15 ms for a 4.4 TFLOP program);
the ~30 ms tunnel round-trip is measured and subtracted once per timed
region (it amortizes to zero in continuous operation).

Baseline: the reference consumes its demo feed at Config::FPS = 30
frames/s (test/test_vn.cpp:38; the repo publishes no other numbers —
BASELINE.md). vs_baseline = measured_fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _dial_watchdog(seconds: int | None = None):
    """Fail fast if the device backend never comes up.

    The axon dial normally takes ~4 min; a dead host-side relay makes
    jax.devices() block FOREVER inside a GIL-holding C call (observed:
    relay ports closed, 25 min hang, SIGALRM handlers never run), which
    burns the whole driver timeout and records nothing. A tiny separate
    WATCHDOG PROCESS kills this one with a clear message unless the dial
    writes the sentinel in time. Returns cancel()."""
    import os
    import subprocess
    import sys
    import tempfile

    if seconds is None:
        seconds = int(os.environ.get("BENCH_DIAL_TIMEOUT_S", "600"))
    sentinel = os.path.join(
        tempfile.mkdtemp(prefix="bench_dial_"), "ok"
    )
    code = (
        "import os,signal,sys,time\n"
        f"ppid={os.getpid()};deadline=time.time()+{seconds}\n"
        "while time.time()<deadline:\n"
        "    time.sleep(1.0)\n"
        f"    if os.path.exists({sentinel!r}): sys.exit(0)\n"
        "    try: os.kill(ppid,0)\n"
        "    except OSError: sys.exit(0)\n"
        "# a dial that succeeded just under the deadline may have written\n"
        "# the sentinel during the final sleep: re-check before killing\n"
        f"if os.path.exists({sentinel!r}): sys.exit(0)\n"
        f"sys.stderr.write('bench.py: device backend did not come up "
        f"within {seconds}s - the axon relay is likely down (ports "
        "closed); rerun when the tunnel is restored\\n')\n"
        "os.kill(ppid,signal.SIGKILL)\n"
    )
    # -S skips site processing so the child does NOT run sitecustomize
    # (which would itself dial the dead relay and hang); the env is
    # inherited — a stripped env can break interpreters that need
    # LD_LIBRARY_PATH/PYTHONHOME, silently losing the guard
    proc = subprocess.Popen([sys.executable, "-S", "-c", code])
    import time as _time

    _time.sleep(0.3)
    if proc.poll() is not None:
        raise RuntimeError(
            f"bench dial watchdog died at startup (rc={proc.returncode})"
        )

    def cancel():
        with open(sentinel, "w"):
            pass
        proc.wait(timeout=10)

    return cancel


def main():
    import os

    import jax
    import jax.numpy as jnp

    _cancel = _dial_watchdog()
    jax.devices()  # force the dial under the watchdog
    _cancel()

    if jax.default_backend() != "cpu" and not os.environ.get(
        "BENCH_NO_COMPILE_CACHE"
    ):
        # persistent compilation cache: compiles through the axon tunnel
        # take minutes; a repo-local cache makes repeat bench runs (the
        # common case: a manual run followed by the driver's) start in
        # seconds. CPU is excluded — the XLA:CPU AOT loader logs feature
        # mismatch warnings when reloading across machine types.
        from se2lam_tpu import enable_compilation_cache

        enable_compilation_cache(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
        )

    from __graft_entry__ import _default_cfg
    from se2lam_tpu import localmap, tracking
    from se2lam_tpu.frontend.orb import make_extractor
    from se2lam_tpu.io import SyntheticWorld
    from se2lam_tpu.mapstate import empty_map

    cfg, oc = _default_cfg()
    extract = make_extractor(oc)
    world = SyntheticWorld(cfg, n_landmarks=500, seed=0)

    n_seed, n_iter = 12, 32
    n_total = n_seed + n_iter
    gt = world.circle_trajectory(n_total * 8, radius=2.5)[:n_total]
    imgs = [jnp.asarray(world.render(gt[i])) for i in range(n_total)]
    odos = [jnp.asarray(gt[i], jnp.float32) for i in range(n_total)]

    @jax.jit
    def step(img, ts, odo, key):
        feats = extract(img)
        return tracking.track_frame(ts, feats, odo, key, cfg)

    # ---- steady-state warm-up: first KF, track a window, insert a real
    #      keyframe (mints map points), re-seed tracking on it — the
    #      state the system actually tracks from, with ref_obs_mask and
    #      local map populated ----
    extract_j = jax.jit(extract)
    feats0 = extract_j(imgs[0])
    ms = localmap.insert_first_kf(
        empty_map(cfg.cap), feats0, jnp.zeros(3, jnp.float32), odos[0]
    )
    view_mp, obs_mask = localmap.kf_track_seed(ms, 0)
    ts = tracking.init_track_state(
        feats0, jnp.zeros(3, jnp.float32), odos[0], 0, view_mp, obs_mask
    )
    key = jax.random.PRNGKey(0)
    for i in range(1, n_seed):
        key, sub = jax.random.split(key)
        ts, res = step(imgs[i], ts, odos[i], sub)
    feats_kf = extract_j(imgs[n_seed - 1])
    ms, k = localmap.add_keyframe(
        ms, feats_kf, ts.cur_pose, odos[n_seed - 1], ts.ref_kf_idx,
        ts.match_idx, ts.local_mps, ts.local_mp_valid, ts.good_prl,
        ts.pre_meas, ts.pre_cov, cfg,
    )
    view_mp, obs_mask = localmap.kf_track_seed(ms, k)
    ts = tracking.init_track_state(
        feats_kf, ms.kf_pose[k], odos[n_seed - 1], k, view_mp, obs_mask
    )
    jax.block_until_ready(ts.ref_pose)
    n_tracked = int(jnp.sum(obs_mask))  # sanity: steady state is populated

    timed_imgs = imgs[n_seed:]
    timed_odos = odos[n_seed:]
    keys = list(jax.random.split(jax.random.PRNGKey(7), n_iter))

    # tunnel round-trip floor (subtracted once per timed region)
    from se2lam_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()

    @jax.jit
    def force(ts_f, res_f):
        # scalar derived from the final carried state: fetching it forces
        # the whole dispatch chain to have executed
        return sum(
            jnp.sum(jnp.asarray(x, jnp.float32))
            for x in jax.tree.leaves(ts_f)
        ) + jnp.sum(res_f.pose)

    # ---- wall-clock fps: threaded state, all-distinct inputs; the
    #      carried dependency chains every step, one value fetch at the
    #      end forces the chain ----
    # warm/compile with keys outside the timed set so the warm dispatches
    # are not bitwise identical to timed iteration 0 (cache-serve trap).
    # BOTH programs (step and force) need >=3 executions on distinct
    # inputs before timing: the remote runtime reaches steady state only
    # after ~2 executions of a compiled program (76 s -> 21 s -> 0.15 s
    # observed), so a once-warmed program charges its pre-steady-state
    # execution to the timed region
    ts_w = ts
    for w in range(3):
        ts_w, res_w = step(
            timed_imgs[w % len(timed_imgs)] + np.float32(w + 1) * 1e-3,
            ts_w, timed_odos[w % len(timed_odos)],
            jax.random.PRNGKey(991 + w),
        )
        float(force(ts_w, res_w))

    ts_run = ts
    t0 = time.perf_counter()
    for i in range(n_iter):
        ts_run, res = step(timed_imgs[i], ts_run, timed_odos[i], keys[i])
    float(force(ts_run, res))
    wall_dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    fps = n_iter / wall_dt

    # ---- device ms/frame: the same step scanned inside one jit with a
    #      genuinely carried state and full output consumption; inputs
    #      perturbed per invocation so no run repeats another ----
    img_stack = jnp.stack(timed_imgs)
    odo_stack = jnp.stack(timed_odos)
    key_stack = jnp.stack(keys)

    @jax.jit
    def scan_steps(ts0, imgs, odos, ks):
        def body(carry, xs):
            img, odo, kk = xs
            ts2, r = step(img, carry, odo, kk)
            return ts2, (r.pose, r.n_matched)

        ts_f, (poses, nm) = jax.lax.scan(
            body, ts0, (imgs, odos, ks)
        )
        # consume every output so XLA cannot DCE part of the program
        tot = sum(
            jnp.sum(jnp.asarray(x, jnp.float32))
            for x in jax.tree.leaves(ts_f)
        )
        return tot + jnp.sum(poses) + jnp.sum(nm)

    float(scan_steps(ts, img_stack, odo_stack, key_stack))
    dev_times = []
    for r in range(1, 3):
        perturbed = img_stack + np.float32(r) * 1e-3
        t0 = time.perf_counter()
        float(scan_steps(ts, perturbed, odo_stack, key_stack))
        dev_times.append(time.perf_counter() - t0 - rtt)
    dev_ms = max(min(dev_times), 1e-9) / n_iter * 1e3

    # ---- MFU accounting (r5 VERDICT #3): XLA's own FLOP count for the
    #      scanned step -> achieved TFLOP/s -> fraction of v5e bf16 peak
    #      (197 TFLOP/s). A low number here is not automatically waste:
    #      the step mixes MXU matmuls with VPU image ops and
    #      latency-bound small solves — docs/DESIGN.md §9 carries the
    #      per-kernel roofline argument.
    # cost_analysis of the SINGLE step program — XLA reports a scan
    # body's flops once, not times the trip count, so lowering
    # scan_steps and dividing by n_iter under-counts 32x (measured)
    flops_per_frame = None
    try:
        ca = step.lower(
            timed_imgs[0], ts, timed_odos[0], keys[0]
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if ca and "flops" in ca:
            flops_per_frame = float(ca["flops"])
    except Exception:
        pass

    baseline_fps = 30.0  # reference demo feed rate (test/test_vn.cpp:38)
    out = {
        "metric": "tracking_fps_640x480_1000feat",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "device_ms_per_frame": round(dev_ms, 3),
        "device_fps": round(1e3 / dev_ms, 1),
        "steady_state_tracked_mps": n_tracked,
    }
    if flops_per_frame is not None:
        v5e_bf16_peak = 197e12
        achieved = flops_per_frame / (dev_ms * 1e-3)
        out["gflops_per_frame"] = round(flops_per_frame / 1e9, 2)
        out["device_tflops"] = round(achieved / 1e12, 2)
        out["mfu_pct_bf16_peak"] = round(100.0 * achieved / v5e_bf16_peak, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
