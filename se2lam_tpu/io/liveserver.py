"""Live SLAM serving over a TCP socket — the `test_ros` analog.

The reference's online mode is a ROS node: odometry + image topics in,
vehicle poses out (test/test_ros.cpp:61-105, receiveOdoData/
receiveImgData → getCurrentVehiclePose). TPU hosts don't run ROS; the
TPU-native equivalent is a plain length-framed TCP stream feeding the
same `SlamSystem` API, with the speculative chunked path (DESIGN §12)
as the batching layer: frames buffer up to ``chunk`` deep (or
``flush_ms`` of silence) before one device dispatch, so a remote-tunnel
deployment keeps its sync amortization while a lightly-loaded feed
still gets low-latency replies.

Wire protocol (little-endian):
  client hello :  b"SE2L" u16 version=1  u32 H  u32 W
  server hello :  b"SE2L" u16 version=1
  frame        :  u32 frame_id  3*f32 odo(x,y,theta)  H*W u8 gray image
                  (frame_id 0xFFFFFFFF = end of stream)
  reply        :  u32 frame_id  3*f32 pose(x,y,theta)  u8 flags
                  (flags bit0: pose valid)

Replies are in frame order, one per frame, possibly delayed by up to
``chunk`` frames (the chunk adds latency, not loss — same trade as
`examples/run_dataset.py --chunk`).
"""
from __future__ import annotations

import logging
from collections import deque
import socket
import struct
import threading
import time

import numpy as np

__all__ = ["SlamServer", "LiveClient"]

log = logging.getLogger(__name__)

_MAGIC = b"SE2L"
_HELLO = struct.Struct("<4sHII")
_HELLO_ACK = struct.Struct("<4sH")
_FRAME_HDR = struct.Struct("<Ifff")
_REPLY = struct.Struct("<IfffB")
_END_ID = 0xFFFFFFFF


def _recv_exact(conn, n: int, stop=None, deadline=None) -> bytes:
    """Read exactly n bytes; mid-message socket timeouts keep waiting
    (the flush timeout is a BOUNDARY poll — once a message started, its
    remainder is already in flight and must not be dropped). A stop
    event or a monotonic ``deadline`` aborts the wait."""
    buf = bytearray()
    while len(buf) < n:
        try:
            part = conn.recv(n - len(buf))
        except socket.timeout:
            if stop is not None and stop.is_set():
                raise ConnectionError("server stopping")
            if deadline is not None and time.monotonic() > deadline:
                raise ConnectionError("peer timed out mid-message")
            continue
        if not part:
            raise ConnectionError("peer closed mid-message")
        buf.extend(part)
    return bytes(buf)


class SlamServer:
    """Serve ONE SlamSystem (or Localizer-compatible) over TCP.

    `system` must expose `process_chunk(imgs, odos) -> (k, 3) poses`
    (SlamSystem does; a mapping or localization session both work
    through it) — or, with ``pipeline=`` set, the pipelined feed
    `process_async`/`flush_async`/`trajectory`. One client at a time —
    the map state is a single sequential estimator, exactly like the
    reference's one OdoSLAM instance per process (src/OdoSLAM.cpp:75-157).
    """

    def __init__(self, system, host: str = "127.0.0.1", port: int = 0,
                 chunk: int = 8, flush_ms: float = 50.0,
                 pipeline: int | None = None):
        """``pipeline``: serve with the depth-d pipelined per-frame feed
        (`process_async`, DESIGN §18) instead of chunk batching — each
        frame's reply lags ~``pipeline`` frames instead of up to
        ``chunk``, at comparable throughput. The system must expose
        `process_async`/`flush_async`/`trajectory` (SlamSystem and
        Localizer both do)."""
        self.system = system
        self.chunk = max(1, int(chunk))
        self.pipeline = pipeline
        self.flush_s = flush_ms / 1e3
        self._sock = socket.create_server((host, port))
        self._sock.settimeout(1.0)
        self.address = self._sock.getsockname()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.frames_served = 0

    # -- lifecycle ---------------------------------------------------
    def serve_forever(self):
        """Accept clients until stop(); each client streams to completion."""
        while not self._stop.is_set():
            try:
                conn, _addr = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            with conn:
                try:
                    self._serve_client(conn)
                except (ConnectionError, OSError) as e:
                    # client vanished: keep the map, await the next —
                    # but say why (a silently dropped client is
                    # undebuggable from the feed side)
                    log.warning("client dropped: %s", e)
                except Exception:
                    # an estimator error (JAX failure, capacity edge,
                    # assertion) must not kill the serving thread: the
                    # daemon would die silently while clients hang in
                    # recv_pose until their timeout. Drop this client,
                    # keep serving.
                    log.exception("estimator error while serving client")
        self._sock.close()

    def start(self):
        self._thread = threading.Thread(
            target=self.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10.0)

    # -- one client --------------------------------------------------
    def _serve_client(self, conn: socket.socket):
        # 1 s poll + 10 s hello deadline: a connection that never speaks
        # (port scanner, crashed client) must not wedge the accept loop,
        # and stop() must be able to interrupt the wait
        conn.settimeout(1.0)
        magic, ver, H, W = _HELLO.unpack(
            _recv_exact(conn, _HELLO.size, self._stop,
                        deadline=time.monotonic() + 10.0)
        )
        if magic != _MAGIC or ver != 1:
            raise ConnectionError(f"bad hello {magic!r} v{ver}")
        if (H, W) != (self.system.cfg.height, self.system.cfg.width):
            raise ConnectionError(
                f"frame size {H}x{W} != configured "
                f"{self.system.cfg.height}x{self.system.cfg.width}"
            )
        conn.sendall(_HELLO_ACK.pack(_MAGIC, 1))
        n_px = H * W
        if self.pipeline is not None:
            self._serve_client_pipelined(conn, H, W)
            return

        ids: list[int] = []
        imgs: list[np.ndarray] = []
        odos: list[np.ndarray] = []
        conn.settimeout(self.flush_s)

        def flush():
            if not ids:
                return
            poses = self.system.process_chunk(imgs, odos)
            # SlamSystem returns a (k, 3) array; Localizer returns a
            # list with None where the frame is LOST — reported on the
            # wire as flags=0 with a zero pose, never dropped
            out = b"".join(
                _REPLY.pack(fid, 0.0, 0.0, 0.0, 0) if p is None else
                _REPLY.pack(fid, float(p[0]), float(p[1]), float(p[2]), 1)
                for fid, p in zip(ids, list(poses))
            )
            # the connection's 50 ms timeout is a RECV boundary poll; a
            # client slow to drain replies must get a real write
            # deadline, not the poll interval (sendall under the 50 ms
            # timeout drops a merely-slow client)
            conn.settimeout(10.0)
            try:
                conn.sendall(out)
            finally:
                conn.settimeout(self.flush_s)
            self.frames_served += len(ids)
            ids.clear(); imgs.clear(); odos.clear()

        while not self._stop.is_set():
            # poll ONE byte at the message boundary: a quiet feed flushes
            # the buffered frames (latency cap); once a message started,
            # _recv_exact waits out timeouts for the remainder
            try:
                first = conn.recv(1)
            except socket.timeout:
                flush()
                continue
            if not first:
                flush()
                return
            # mid-message deadline: a client that dies without FIN
            # (network partition, hard power-off) must not wedge the
            # single-client server in the timeout retry loop forever
            deadline = time.monotonic() + 10.0
            hdr = first + _recv_exact(
                conn, _FRAME_HDR.size - 1, self._stop, deadline=deadline
            )
            fid, x, y, th = _FRAME_HDR.unpack(hdr)
            if fid == _END_ID:
                flush()
                return
            img = np.frombuffer(
                _recv_exact(conn, n_px, self._stop, deadline=deadline),
                np.uint8,
            ).reshape(H, W)
            ids.append(fid)
            imgs.append(img)
            odos.append(np.asarray([x, y, th], np.float32))
            if len(ids) >= self.chunk:
                flush()
        # stop() during an active stream: reply to everything buffered —
        # the protocol promises one reply per frame (latency, not loss)
        flush()

    def _serve_client_pipelined(self, conn: socket.socket, H: int, W: int):
        """Depth-d pipelined serving: one `process_async` per received
        frame, replies drained from the estimator's trajectory as
        frames resolve — per-frame reply latency ~`pipeline` frames
        (+ the flush_ms quiet cap) instead of up to `chunk`."""
        n_px = H * W
        sys_ = self.system
        sys_.pipeline_depth = max(0, int(self.pipeline))
        # a previous client's abnormal exit (death mid-message, slow
        # drain, estimator error) can leave its frames in flight: they
        # must resolve BEFORE this client's trajectory baseline is
        # snapshotted, or every reply pairing below shifts
        sys_.flush_async()
        outstanding: deque[int] = deque()   # wire fids in feed order
        traj_base = len(sys_.trajectory)
        conn.settimeout(self.flush_s)

        def reply_resolved():
            nonlocal traj_base
            traj = sys_.trajectory
            out = bytearray()
            while traj_base < len(traj) and outstanding:
                ent = traj[traj_base]
                traj_base += 1
                fid = outstanding.popleft()
                p = ent[1]
                if p is None:
                    out += _REPLY.pack(fid, 0.0, 0.0, 0.0, 0)
                else:
                    out += _REPLY.pack(
                        fid, float(p[0]), float(p[1]), float(p[2]), 1
                    )
                self.frames_served += 1
            if out:
                conn.settimeout(10.0)
                try:
                    conn.sendall(bytes(out))
                finally:
                    conn.settimeout(self.flush_s)

        def flush_all():
            sys_.flush_async()
            reply_resolved()

        try:
            while not self._stop.is_set():
                try:
                    first = conn.recv(1)
                except socket.timeout:
                    # quiet feed: resolve in-flight frames (latency cap)
                    flush_all()
                    continue
                if not first:
                    flush_all()
                    return
                deadline = time.monotonic() + 10.0
                hdr = first + _recv_exact(
                    conn, _FRAME_HDR.size - 1, self._stop,
                    deadline=deadline
                )
                fid, x, y, th = _FRAME_HDR.unpack(hdr)
                if fid == _END_ID:
                    flush_all()
                    return
                img = np.frombuffer(
                    _recv_exact(conn, n_px, self._stop, deadline=deadline),
                    np.uint8,
                ).reshape(H, W)
                outstanding.append(fid)
                sys_.process_async(img, np.asarray([x, y, th], np.float32))
                reply_resolved()
            flush_all()
        finally:
            # abnormal exit (client died mid-message, send failed,
            # estimator error): the estimator must not carry this
            # client's unresolved frames into the next session
            sys_.flush_async()


class LiveClient:
    """Minimal feed client (the datapub/test_ros feed-loop analog,
    test/test_vn.cpp:43-55 over a socket instead of ROS topics)."""

    def __init__(self, address, height: int, width: int,
                 timeout_s: float = 120.0):
        self.h, self.w = height, width
        self._conn = socket.create_connection(address, timeout=timeout_s)
        self._conn.sendall(_HELLO.pack(_MAGIC, 1, height, width))
        magic, ver = _HELLO_ACK.unpack(
            _recv_exact(self._conn, _HELLO_ACK.size)
        )
        if magic != _MAGIC or ver != 1:
            raise ConnectionError("bad server hello")
        self._next_id = 0
        self._pending = 0

    def send_frame(self, img, odo) -> int:
        img = np.ascontiguousarray(np.asarray(img, np.uint8))
        assert img.shape == (self.h, self.w), img.shape
        fid = self._next_id
        self._next_id += 1
        self._conn.sendall(
            _FRAME_HDR.pack(fid, float(odo[0]), float(odo[1]),
                            float(odo[2]))
            + img.tobytes()
        )
        self._pending += 1
        return fid

    def recv_pose(self):
        """Blocking: (frame_id, (3,) pose, tracked) for the next reply."""
        fid, x, y, th, flags = _REPLY.unpack(
            _recv_exact(self._conn, _REPLY.size)
        )
        self._pending -= 1
        return fid, np.asarray([x, y, th], np.float32), bool(flags & 1)

    def drain(self):
        """Collect every outstanding reply (in order)."""
        out = []
        while self._pending > 0:
            out.append(self.recv_pose())
        return out

    def close(self):
        try:
            self._conn.sendall(_FRAME_HDR.pack(_END_ID, 0.0, 0.0, 0.0))
        except OSError:
            pass
        self._conn.close()
