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


def test_live_server_localization_mode():
    """A Localizer behind the server: lost frames reply flags=0 (never
    dropped, never crash the server thread), tracked frames carry poses
    matching the direct Localizer."""
    from se2lam_tpu.localizer import Localizer

    cfg = _cfg()
    frames = _sequence(cfg, 18, seed=21)
    mapper = SlamSystem(cfg, enable_loops=False)
    for img, odo in frames[:12]:
        mapper.process(img, odo)
    assert mapper.n_keyframes() >= 2
    ms = mapper.ms

    seed_pose = mapper.trajectory[-1][1]
    seed_odo = frames[11][1]

    ref = Localizer(cfg, ms, None, reloc_min_inliers=30)
    ref.set_pose(seed_pose, seed_odo)
    ref_out = ref.process_chunk([f[0] for f in frames[12:]],
                                [f[1] for f in frames[12:]])

    served = Localizer(cfg, ms, None, reloc_min_inliers=30)
    served.set_pose(seed_pose, seed_odo)
    server = SlamServer(served, chunk=6, flush_ms=500.0).start()
    try:
        client = LiveClient(server.address, cfg.height, cfg.width)
        for img, odo in frames[12:]:
            client.send_frame(img, odo)
        replies = client.drain()
        client.close()
    finally:
        server.stop()

    assert len(replies) == 6
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
