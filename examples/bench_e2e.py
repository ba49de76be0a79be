"""End-to-end mapping throughput through the host↔device dispatch path.

Feeds a synthetic 640x480/1000-feature sequence into the full system —
speculative chunked tracking, keyframe insertion with data association,
pruning, local BA, loop closing — and reports WALL frames/s as the host
sees them (transfers, syncs, and Python dispatch included; this is the
number an embedder gets, unlike bench.py's device-side tracking rate).

Protocol: a warm-up lap runs every program shape (chunk scans at both
segment shapes, the insertion path, BoW detect) before the timed lap;
the timed lap is a fresh traversal of unseen frames (distinct inputs —
the axon path can serve repeated identical dispatches from a cache).
Loop closing stays ENABLED: a realistic run pays for its global BAs.

Writes E2E_BENCH.json at the repo root.

Usage: python examples/bench_e2e.py [--chunk 8] [--frames 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--frames", type=int, default=256,
                    help="timed frames (after an equal warm-up lap)")
    ap.add_argument("--per-frame", action="store_true",
                    help="also time the 1-sync-per-frame mode")
    ap.add_argument("--chunk-async", action="store_true",
                    help="also time the chunk-pipelined mode "
                         "(process_chunk_async)")
    ap.add_argument("--pipelined", action="store_true",
                    help="also time the depth-d pipelined per-frame "
                         "mode (process_async)")
    ap.add_argument("--depth", type=int, nargs="*", default=[3],
                    help="pipeline depths to time with --pipelined")
    ap.add_argument("--paired", default="",
                    help="interleaved paired A/B: two comma-separated "
                         "modes from {chunked, chunk_async, per_frame, "
                         "pipelined_dN}; runs A,B,A,B,... each trial a "
                         "fresh system on identical frames, reports "
                         "per-pair deltas + sign count. Sequential "
                         "same-session A/B is the WRONG protocol at "
                         "this hardware's ±20% session variance "
                         "(r4 VERDICT weak #4) — this is the right one.")
    ap.add_argument("--pairs", type=int, default=10)
    ap.add_argument("--ab-sync", action="store_true",
                    help="also time async_mapping=False (the inline "
                         "loop stage) in the SAME session for a fair "
                         "A/B — session-to-session variance is ~±20%")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "E2E_BENCH.json"))
    args = ap.parse_args()

    import jax

    jax.devices()
    if jax.default_backend() != "cpu":
        from se2lam_tpu import enable_compilation_cache
        enable_compilation_cache(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))

    from __graft_entry__ import _default_cfg
    from se2lam_tpu.io import SyntheticWorld
    from se2lam_tpu.system import SlamSystem

    cfg, _ = _default_cfg()
    world = SyntheticWorld(cfg, n_landmarks=500, seed=0)
    k = args.chunk
    n = args.frames - (args.frames % k)
    # The warm-up lap must execute EVERY program the timed lap will hit,
    # including the loop-closure stack (verify, constraint, merge, pose
    # graph, joint GBA) — with the persistent compile cache a first use
    # costs a ~0.5-1 s cache load that would otherwise contaminate the
    # timed lap. A full circle plus a quarter revisit closes a loop.
    lap = world.circle_trajectory(224, radius=2.5)
    n_warm = 224 + 64
    total = n_warm + n
    laps = int(np.ceil(total / len(lap)))
    gt = np.concatenate([lap] * laps)[:total]
    # uint8 feed: 1 byte/px on the wire (DESIGN §12)
    frames = [np.asarray(world.render(gt[i]), np.uint8) for i in range(total)]
    odos = [np.asarray(gt[i], np.float32) for i in range(total)]

    def run(chunked: bool, lo: int, hi: int, slam: SlamSystem,
            pipelined: bool = False, chunk_async: bool = False):
        t0 = time.perf_counter()
        if chunk_async:
            for i in range(lo, hi, k):
                slam.process_chunk_async(frames[i:i + k], odos[i:i + k])
            slam.flush_chunk_async()
        elif chunked:
            for i in range(lo, hi, k):
                nxt = frames[i + k:i + 2 * k] if i + 2 * k <= hi else None
                slam.process_chunk(frames[i:i + k], odos[i:i + k],
                                   next_imgs=nxt)
        elif pipelined:
            for i in range(lo, hi):
                slam.process_async(frames[i], odos[i])
            slam.flush_async()
        else:
            for i in range(lo, hi):
                slam.process(frames[i], odos[i])
        return time.perf_counter() - t0

    results = {"chunk": k, "frames": n, "backend": jax.default_backend()}

    def run_mode(mode: str):
        slam_m = SlamSystem(cfg, enable_loops=True)
        if mode.startswith("pipelined_d"):
            slam_m.pipeline_depth = int(mode.split("_d")[1])
        kw = dict(
            chunked=(mode == "chunked"),
            pipelined=mode.startswith("pipelined"),
            chunk_async=(mode == "chunk_async"),
        )
        run(lo=0, hi=n_warm, slam=slam_m, **kw)
        t = run(lo=n_warm, hi=total, slam=slam_m, **kw)
        return n / t

    if args.paired:
        mode_a, mode_b = args.paired.split(",")
        fps_a, fps_b = [], []
        for p in range(args.pairs):
            fa = run_mode(mode_a)
            fb = run_mode(mode_b)
            fps_a.append(round(fa, 1))
            fps_b.append(round(fb, 1))
            print(f"pair {p}: {mode_a} {fa:.1f} fps | "
                  f"{mode_b} {fb:.1f} fps | delta {fb - fa:+.1f}",
                  flush=True)
        deltas = [b - a for a, b in zip(fps_a, fps_b)]
        results["paired"] = {
            "mode_a": mode_a, "mode_b": mode_b,
            "fps_a": fps_a, "fps_b": fps_b,
            "median_a": round(float(np.median(fps_a)), 1),
            "median_b": round(float(np.median(fps_b)), 1),
            "median_delta": round(float(np.median(deltas)), 1),
            "b_wins": int(sum(d > 0 for d in deltas)),
            "pairs": args.pairs,
        }
        print(f"paired {mode_a} vs {mode_b}: medians "
              f"{results['paired']['median_a']} vs "
              f"{results['paired']['median_b']} fps, median delta "
              f"{results['paired']['median_delta']:+.1f}, "
              f"{mode_b} wins {results['paired']['b_wins']}/{args.pairs}")
        # merge into any existing E2E_BENCH.json rather than clobbering
        # the absolute-throughput records
        if os.path.exists(args.out):
            try:
                with open(args.out) as f:
                    prev = json.load(f)
                prev.setdefault("paired_runs", []).append(results["paired"])
                prev["paired"] = results["paired"]
                results = prev
            except Exception:
                pass
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
        print(f"wrote {args.out}")
        return

    slam = SlamSystem(cfg, enable_loops=True)
    warm_s = run(True, 0, n_warm, slam)
    timed_s = run(True, n_warm, total, slam)
    results["e2e_chunked_fps"] = round(n / timed_s, 1)
    results["warmup_s"] = round(warm_s, 1)
    results["n_kf"] = int(slam.ms.n_kf)
    results["n_loops"] = int(
        slam._loop_closer.n_loops_closed if slam._loop_closer else 0
    )
    # pressure telemetry: capacity reliefs inside the timed lap are a
    # real (and legitimate) cost, but must be VISIBLE when comparing
    # sessions
    results["kf_compactions"] = int(slam.capacity_compactions)
    results["mp_compactions"] = int(slam.mp_compactions)
    print(f"chunked k={k}: {n / timed_s:.1f} fps wall "
          f"({results['n_kf']} KFs, {results['n_loops']} loops, "
          f"{results['mp_compactions']} MP reliefs; "
          f"warm-up lap {warm_s:.1f}s)")

    if args.ab_sync:
        slam_s = SlamSystem(cfg, enable_loops=True, async_mapping=False)
        warm_b = run(True, 0, n_warm, slam_s)
        timed_b = run(True, n_warm, total, slam_s)
        results["e2e_chunked_sync_fps"] = round(n / timed_b, 1)
        print(f"sync-mapping: {n / timed_b:.1f} fps wall "
              f"({int(slam_s.ms.n_kf)} KFs, "
              f"{slam_s._loop_closer.n_loops_closed} loops; "
              f"warm-up {warm_b:.1f}s)")

    if args.per_frame:
        slam2 = SlamSystem(cfg, enable_loops=True)
        warm2 = run(False, 0, n_warm, slam2)
        timed2 = run(False, n_warm, total, slam2)
        results["e2e_per_frame_fps"] = round(n / timed2, 1)
        print(f"per-frame:   {n / timed2:.1f} fps wall "
              f"({int(slam2.ms.n_kf)} KFs; warm-up {warm2:.1f}s)")

    if args.chunk_async:
        slam4 = SlamSystem(cfg, enable_loops=True)
        warm4 = run(False, 0, n_warm, slam4, chunk_async=True)
        timed4 = run(False, n_warm, total, slam4, chunk_async=True)
        results["e2e_chunk_async_fps"] = round(n / timed4, 1)
        print(f"chunk-async k={k}: {n / timed4:.1f} fps wall "
              f"({int(slam4.ms.n_kf)} KFs, "
              f"{slam4._loop_closer.n_loops_closed} loops; "
              f"warm-up {warm4:.1f}s)")

    if args.pipelined:
        for d in args.depth:
            slam3 = SlamSystem(cfg, enable_loops=True)
            slam3.pipeline_depth = d
            warm3 = run(False, 0, n_warm, slam3, pipelined=True)
            timed3 = run(False, n_warm, total, slam3, pipelined=True)
            results[f"e2e_pipelined_d{d}_fps"] = round(n / timed3, 1)
            print(f"pipelined d={d}: {n / timed3:.1f} fps wall "
                  f"({int(slam3.ms.n_kf)} KFs, "
                  f"{slam3._loop_closer.n_loops_closed} loops; "
                  f"warm-up {warm3:.1f}s)")

    # absolute runs must not clobber the paired-protocol record
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            for k in ("paired", "paired_runs", "protocol_note"):
                if k in prev and k not in results:
                    results[k] = prev[k]
        except Exception:
            pass
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
