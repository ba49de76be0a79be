"""Serve a live SLAM session over TCP — the `test_ros` analog.

The reference's online mode wires camera + odometry ROS topics into
OdoSLAM and publishes vehicle poses (test/test_ros.cpp:61-105). TPU
hosts don't run ROS; this serves the same loop over a plain socket
(protocol in se2lam_tpu/io/liveserver.py). Feed it with
examples/feed_live.py or any client speaking the 4-line protocol.

Usage:
  python examples/serve_live.py [--port 7207] [--chunk 8 | --pipeline 4]
      [--map PATH]            # RESUME MAPPING on an existing checkpoint
                              # (relocalizes, then keeps extending it)
      [--map PATH --localize] # read-only localization against the
                              # frozen map (the LOCALIZATION_ONLY mode)
      [--save PATH]           # write the built map at shutdown
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7207)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--flush-ms", type=float, default=50.0)
    ap.add_argument("--pipeline", type=int, default=None, metavar="D",
                    help="depth-D pipelined per-frame serving "
                         "(process_async): replies lag ~D frames "
                         "instead of up to --chunk")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--features", type=int, default=1000)
    ap.add_argument("--map", default=None,
                    help="existing map checkpoint: resume mapping on it "
                         "(default) or serve it frozen with --localize")
    ap.add_argument("--localize", action="store_true",
                    help="with --map: localization-only against the "
                         "frozen map (never mutates it; lost frames "
                         "reply flags=0)")
    ap.add_argument("--save", default=None,
                    help="save the map at shutdown (Ctrl-C)")
    args = ap.parse_args()

    from __graft_entry__ import _default_cfg
    from se2lam_tpu.io.liveserver import SlamServer
    from se2lam_tpu.system import SlamSystem

    cfg, _ = _default_cfg(width=args.width, height=args.height,
                          n_features=args.features)
    if args.localize:
        if not args.map:
            ap.error("--localize requires --map")
        from se2lam_tpu.io import load_map
        from se2lam_tpu.localizer import Localizer

        ms, vocab, _meta = load_map(args.map)
        system = Localizer(cfg, ms, vocab)
    elif args.map:
        system = SlamSystem.resume(cfg, args.map)
    else:
        system = SlamSystem(cfg, enable_loops=True)

    server = SlamServer(system, host=args.host, port=args.port,
                        chunk=args.chunk, flush_ms=args.flush_ms,
                        pipeline=args.pipeline)
    mode = (f"pipeline={args.pipeline}" if args.pipeline is not None
            else f"chunk={args.chunk}")
    print(f"serving on {server.address} ({mode}); Ctrl-C stops")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
        print(f"served {server.frames_served} frames")
        if args.save:
            if args.localize:
                print("--save ignored: --localize never mutates the map")
            else:
                system.save_map(args.save)
                print(f"map saved to {args.save}")


if __name__ == "__main__":
    main()
