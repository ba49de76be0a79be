"""Live TCP serving (the test_ros analog): a socket round trip must
produce exactly the poses the direct API produces, frame for frame."""
import numpy as np

from se2lam_tpu.io import SyntheticWorld
from se2lam_tpu.io.liveserver import LiveClient, SlamServer
from se2lam_tpu.system import SlamSystem

from test_chunked import _cfg


def _sequence(cfg, n, seed=11):
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=seed)
    return [(np.asarray(img).astype(np.uint8), np.asarray(odo, np.float32))
            for img, odo in world.sequence(n, noise=(0.004, 0.002, 0.002))]


def test_live_server_streamed_feed():
    """Fire-and-forget feed: send everything, drain at the end — every
    frame must get exactly one in-order reply and the served map must
    match the direct API's."""
    cfg = _cfg()
    frames = _sequence(cfg, 24)

    ref = SlamSystem(cfg, enable_loops=False)
    for i in range(0, 24, 6):
        b = frames[i:i + 6]
        ref.process_chunk([f[0] for f in b], [f[1] for f in b])

    served = SlamSystem(cfg, enable_loops=False)
    server = SlamServer(served, chunk=6, flush_ms=200.0).start()
    try:
        client = LiveClient(server.address, cfg.height, cfg.width)
        for img, odo in frames:
            client.send_frame(img, odo)
        replies = client.drain()
        client.close()
    finally:
        server.stop()

    assert [fid for fid, _, _ in replies] == list(range(24))
    assert server.frames_served == 24
    assert served.n_keyframes() == ref.n_keyframes()


def test_live_server_pose_stream_exact():
    """Lock-step: send a chunk, drain its replies, compare to direct."""
    cfg = _cfg()
    frames = _sequence(cfg, 18, seed=13)

    ref = SlamSystem(cfg, enable_loops=False)
    ref_poses = []
    for i in range(0, 18, 6):
        b = frames[i:i + 6]
        ref_poses.append(ref.process_chunk([f[0] for f in b],
                                           [f[1] for f in b]))
    ref_poses = np.concatenate(ref_poses)

    served = SlamSystem(cfg, enable_loops=False)
    server = SlamServer(served, chunk=6, flush_ms=500.0).start()
    try:
        client = LiveClient(server.address, cfg.height, cfg.width)
        poses = np.zeros((18, 3), np.float32)
        for i in range(0, 18, 6):
            for img, odo in frames[i:i + 6]:
                client.send_frame(img, odo)
            for fid, pose, ok in client.drain():
                assert ok
                poses[fid] = pose
        client.close()
    finally:
        server.stop()

    np.testing.assert_allclose(poses, ref_poses, atol=1e-5)
    assert served.n_keyframes() == ref.n_keyframes()
    np.testing.assert_allclose(
        np.asarray(served.ms.kf_pose), np.asarray(ref.ms.kf_pose),
        atol=1e-5,
    )


def _loc_fixture(cfg, n_serve=12):
    """Map a full circle lap, then serve a revisit segment: a scenario
    where the tracked path GENUINELY tracks (the earlier straight-feed
    fixture built a map too sparse for projection matching, making the
    serving comparison vacuously all-lost)."""
    world = SyntheticWorld(cfg, n_landmarks=500, room=10.0, seed=21)
    gt = world.circle_trajectory(60)
    path = np.concatenate([gt, gt[:n_serve]])
    odo = world.odometry(path, noise=(0.002, 0.001, 0.001), seed=9)
    frames = [(np.asarray(world.render(g), np.uint8), o)
              for g, o in zip(path, odo)]
    mapper = SlamSystem(cfg, enable_loops=False)
    for img, o in frames[:60]:
        mapper.process(img, o)
    assert mapper.n_keyframes() >= 8
    return mapper.ms, mapper.trajectory[-1][1], frames[59][1], frames[60:]


def test_live_server_localization_mode():
    """A Localizer behind the server: lost frames reply flags=0 (never
    dropped, never crash the server thread), tracked frames carry poses
    matching the direct Localizer — and the scenario must genuinely
    track (an all-lost comparison is vacuous)."""
    from se2lam_tpu.localizer import Localizer

    cfg = _cfg()
    ms, seed_pose, seed_odo, feed = _loc_fixture(cfg)
    feed = [list(f) for f in feed]
    # blackout near the END: with no vocabulary there is no reloc, so
    # everything after the blackout stays lost — keep the tracked
    # prefix long enough to be a real comparison
    feed[10][0] = np.zeros_like(feed[10][0])

    ref = Localizer(cfg, ms, None, reloc_min_inliers=30)
    ref.set_pose(seed_pose, seed_odo)
    ref_out = []
    for i in range(0, len(feed), 6):
        ref_out.extend(ref.process_chunk([f[0] for f in feed[i:i + 6]],
                                         [f[1] for f in feed[i:i + 6]]))
    assert sum(p is not None for p in ref_out) >= 8   # really tracking
    assert any(p is None for p in ref_out)            # and really losing

    served = Localizer(cfg, ms, None, reloc_min_inliers=30)
    served.set_pose(seed_pose, seed_odo)
    server = SlamServer(served, chunk=6, flush_ms=500.0).start()
    try:
        client = LiveClient(server.address, cfg.height, cfg.width)
        for img, odo in feed:
            client.send_frame(img, odo)
        replies = client.drain()
        client.close()
    finally:
        server.stop()

    assert len(replies) == len(feed)
    for (fid, pose, ok), want in zip(replies, ref_out):
        if want is None:
            assert not ok
        else:
            assert ok
            np.testing.assert_allclose(pose, want, atol=1e-5)


def test_live_server_flush_timeout_partial_chunk():
    """A quiet feed must still get replies: fewer frames than the chunk
    size are flushed by the timeout, not held forever."""
    cfg = _cfg()
    frames = _sequence(cfg, 4, seed=17)

    served = SlamSystem(cfg, enable_loops=False)
    server = SlamServer(served, chunk=8, flush_ms=80.0).start()
    try:
        client = LiveClient(server.address, cfg.height, cfg.width)
        for img, odo in frames:
            client.send_frame(img, odo)
        replies = client.drain()   # blocks until the timeout flush fires
        client.close()
    finally:
        server.stop()
    assert [fid for fid, _, _ in replies] == [0, 1, 2, 3]
    assert server.frames_served == 4


def test_live_server_pipelined_mode():
    """pipeline=D serving: every frame gets exactly one in-order reply,
    poses match the direct per-frame API, and replies stream out with
    ~D-frame lag (the flush timeout only finishes the tail)."""
    cfg = _cfg()
    frames = _sequence(cfg, 20, seed=23)

    ref = SlamSystem(cfg, enable_loops=False)
    ref_poses = np.stack([ref.process(f[0], f[1]) for f in frames])

    served = SlamSystem(cfg, enable_loops=False)
    server = SlamServer(served, flush_ms=200.0, pipeline=3).start()
    try:
        client = LiveClient(server.address, cfg.height, cfg.width)
        for img, odo in frames:
            client.send_frame(img, odo)
        replies = client.drain()
        client.close()
    finally:
        server.stop()

    assert [fid for fid, _, _ in replies] == list(range(20))
    assert server.frames_served == 20
    np.testing.assert_allclose(
        np.stack([p for _, p, _ in replies]), ref_poses, atol=1e-5
    )
    assert served.n_keyframes() == ref.n_keyframes()


def test_live_server_pipelined_localization():
    """pipeline=D over a Localizer: tracked replies match the direct
    per-frame localizer; a blackout frame replies flags=0."""
    from se2lam_tpu.localizer import Localizer

    cfg = _cfg()
    ms, seed_pose, seed_odo, feed = _loc_fixture(cfg)
    feed = [list(f) for f in feed]
    feed[9][0] = np.zeros_like(feed[9][0])   # blackout → lost tail (no vocab)

    ref = Localizer(cfg, ms, None, reloc_min_inliers=30)
    ref.set_pose(seed_pose, seed_odo)
    ref_out = [ref.process(f[0], f[1]) for f in feed]

    served = Localizer(cfg, ms, None, reloc_min_inliers=30)
    served.set_pose(seed_pose, seed_odo)
    server = SlamServer(served, flush_ms=300.0, pipeline=2).start()
    try:
        client = LiveClient(server.address, cfg.height, cfg.width)
        for img, odo in feed:
            client.send_frame(img, odo)
        replies = client.drain()
        client.close()
    finally:
        server.stop()

    assert len(replies) == len(feed)
    assert [fid for fid, _, _ in replies] == list(range(len(feed)))
    assert sum(p is not None for p in ref_out) >= 8   # really tracking
    for (fid, pose, ok), want in zip(replies, ref_out):
        if want is None:
            assert not ok
        else:
            assert ok
            # cross-mode: the fused _localize_step program vs the eager
            # per-frame path — different XLA fusions, f32-tight not exact
            # (same bound as test_localizer_chunked_matches_per_frame)
            np.testing.assert_allclose(pose, want, atol=1e-3)


def test_live_server_pipelined_survives_dead_client():
    """A pipelined client that dies mid-message with frames in flight
    must not poison the next client: its unresolved frames drain before
    the next session's reply pairing is established (regression for a
    cross-client trajectory-baseline leak)."""
    import socket
    import struct
    import time as _time

    from se2lam_tpu.io import liveserver as lv

    cfg = _cfg()
    frames = _sequence(cfg, 16, seed=29)

    ref = SlamSystem(cfg, enable_loops=False)
    for img, odo in frames:
        ref.process(img, odo)

    served = SlamSystem(cfg, enable_loops=False)
    server = SlamServer(served, flush_ms=150.0, pipeline=4).start()
    try:
        # client A: hello + 8 full frames + half a frame header, then die
        s = socket.create_connection(server.address, timeout=10.0)
        s.sendall(lv._HELLO.pack(lv._MAGIC, 1, cfg.height, cfg.width))
        assert s.recv(lv._HELLO_ACK.size)
        for fid, (img, odo) in enumerate(frames[:8]):
            s.sendall(lv._FRAME_HDR.pack(
                fid, float(odo[0]), float(odo[1]), float(odo[2])))
            s.sendall(np.ascontiguousarray(img, np.uint8).tobytes())
        s.sendall(b"\x05\x00")          # truncated header...
        s.shutdown(socket.SHUT_WR)       # ...then die (half-close: a
        # hard close() would RST and destroy the still-buffered frames
        # — then the scenario becomes timing-dependent instead of
        # 'all frames received, client gone mid-header')
        while s.recv(65536):             # drain replies until EOF so the
            pass                         # final close cannot RST either
        s.close()
        # wait for the server to notice the dead client and drain
        deadline = _time.monotonic() + 20.0
        while ((served._pipe or served.frame_id < 8)
               and _time.monotonic() < deadline):
            _time.sleep(0.1)

        # client B feeds the REMAINING frames; its replies must pair
        # with its own fids and match the reference session's poses
        client = LiveClient(server.address, cfg.height, cfg.width)
        for fid, (img, odo) in enumerate(frames[8:]):
            client.send_frame(img, odo)
        replies = client.drain()
        client.close()
    finally:
        server.stop()

    assert [fid for fid, _, _ in replies] == list(range(8))
    ref_poses = np.asarray([p for _, p in ref.trajectory], np.float32)
    np.testing.assert_allclose(
        np.stack([p for _, p, _ in replies]), ref_poses[8:], atol=1e-5
    )
