"""System shell: the OdoSLAM-equivalent embedding API.

TPU-native re-derivation of the reference system object
(src/OdoSLAM.cpp:75-215): where the reference wires four detached threads
over a mutex-guarded map, this drives three jitted stages — tracking,
keyframe insertion + local BA, loop closing + global BA — from one host
loop over device-resident state. Sensor pairing (the reference's blocking
1-deep Sensors buffer, src/Sensors.cpp:24-64) becomes the synchronous
``process(img, odo)`` call; `receive_odo`/`receive_img` wrappers keep the
reference's split-feed API shape.
"""
from __future__ import annotations

import os
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from . import localmap, tracking
from .config import SystemConfig
from .frontend.orb import (
    OrbConfig, OrbFeatures, make_batch_extractor, make_extractor,
)
from .mapstate import MapState, empty_map
from .ops import se2
from .ops.camera import CameraModel, undistort_points
from .utils.chunking import pad_chunk
from .utils.prefetch import host_prefetch

__all__ = ["SlamSystem"]

# alias kept for back-compat with earlier imports; the helper lives in
# utils.prefetch (generic device plumbing, no SlamSystem dependency)
_host_prefetch = host_prefetch


def _np_se2_minus(pose, ref):
    """Host-side ``se2.minus``: ``pose`` expressed in ``ref``'s frame.
    One copy shared by every host-side anchor site — _np_se2_compose is
    its exact inverse, and retro-correction is exact only while the
    anchor record and its replay use inverse forms."""
    dx, dy = pose[0] - ref[0], pose[1] - ref[1]
    c, s = np.cos(ref[2]), np.sin(ref[2])
    dt = pose[2] - ref[2]
    return np.asarray(
        [c * dx + s * dy, -s * dx + c * dy,
         np.arctan2(np.sin(dt), np.cos(dt))],
        np.float32,
    )


def _np_se2_compose(a, rel):
    """Host-side ``se2.compose``: ``rel`` (in ``a``'s frame) applied to
    ``a`` — the inverse of _np_se2_minus."""
    c, s = np.cos(a[2]), np.sin(a[2])
    th = a[2] + rel[2]
    return np.asarray(
        [a[0] + c * rel[0] - s * rel[1],
         a[1] + s * rel[0] + c * rel[1],
         np.arctan2(np.sin(th), np.cos(th))],
        np.float32,
    )


class SlamSystem:
    """Monocular + wheel-odometry SE(2) SLAM engine.

    Usage (reference test_vn feed loop, test/test_vn.cpp:43-55)::

        slam = SlamSystem(cfg)
        for img, odo in dataset:
            slam.process(img, odo)        # or receive_odo + receive_img
        slam.save_kf_trajectory(path)
    """

    def __init__(self, cfg: SystemConfig, enable_loops: bool = True,
                 mesh=None, async_mapping: bool = True,
                 detect_loops: bool = True):
        """``mesh``: optional ``jax.sharding.Mesh``. With >1 device the
        global mapping stage runs distributed — pose-graph GlobalBA as
        edge-sharded matrix-free PCG, joint full-map GBA as map-block
        partitioned Schur-GN, loop detection over a KF-sharded BoW bank
        (parallel/{dist_posegraph,dist_ba,dist_loop}.py). Tracking and
        the local window stay single-device: they are latency-bound at
        window scale, and the map lives replicated for them either way.

        ``async_mapping``: overlap the loop-closing stage with tracking
        (the reference's Track ∥ GlobalMapper thread concurrency,
        src/OdoSLAM.cpp:142-150): per keyframe, detection is dispatched
        without waiting and its host pulls ride the NEXT frames'
        control pull; a verified closure applies retroactively (before
        the next keyframe insertion at the latest) and the live tracking
        gauge is re-based on the corrected reference pose — exactly the
        retro-correction the frame anchors already implement. The final
        map and corrected trajectory match the synchronous mode; only
        live poses in the closure→apply window stay in the pre-closure
        gauge (as they do in the reference, which never waits either).
        """
        self.cfg = cfg
        self.mesh = mesh
        self.async_mapping = async_mapping
        # deferred loop-stage machine: pending record from
        # LoopCloser.start_async/advance + its fetched-but-unconsumed
        # host values
        self._loop_pending = None
        self._loop_fetched = None
        self.orb_cfg = OrbConfig(
            height=cfg.height,
            width=cfg.width,
            n_features=cfg.cap.n_features,
            scale_factor=cfg.scale_factor,
            n_levels=cfg.max_level,
        )
        # frame feature capacity must match the map's feature axis
        assert self.orb_cfg.n_slots == cfg.cap.n_features, (
            self.orb_cfg.n_slots,
            cfg.cap.n_features,
        )
        self._extract = jax.jit(make_extractor(self.orb_cfg))
        self._extract_batch_fn = None
        self._cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
        self._undistort = any(abs(d) > 0 for d in cfg.dist)

        self.ms: MapState = empty_map(cfg.cap)
        self.ts = None
        self.frame_id = 0
        self.kf_frame_ids: list[int] = []
        self.trajectory: list[tuple[int, np.ndarray]] = []
        # (frame_id, ref_kf_slot, pose ⊖ ref_pose) per frame, for
        # retro-correcting the live trajectory after BA/loop closures
        self._frame_anchors: list[tuple[int, int, np.ndarray]] = []
        # host mirror of the tracking reference (slot + pose). The
        # authoritative copy lives on device; after a keyframe insertion
        # the fetch is DEFERRED (_mirror_pending) and rides the next
        # control-decision pull — one fewer ~30 ms tunnel sync per KF.
        # All readers go through the flushing properties below.
        self._mirror_pending = None
        self._ref_kf_host = 0
        self._ref_pose_host = np.zeros(3, np.float32)
        self.key = jax.random.PRNGKey(0)
        self.timings: dict[str, float] = {}
        self.prune_rounds = 2
        # capacity-pressure telemetry (surfaced, not silent):
        # compactions = successful relief events; at_capacity = True when
        # even forced pruning could not free a slot (mapping then pauses
        # and the system coasts on odometry until pressure clears)
        self.capacity_compactions = 0
        # anchors whose reference KF was compacted away and were rigidly
        # re-anchored onto a survivor (regression hook for tests)
        self.anchors_reanchored = 0
        self.at_capacity = False
        # map-point-side pressure telemetry (_relieve_mp_capacity)
        self.mp_compactions = 0
        self.mp_culled_weak = 0
        self.mp_slots_reclaimed = 0
        # in-run observability (off by default — see enable_viz)
        self._viz_dir: str | None = None
        self._viz_every = 5
        self._last_img = None
        self._ref_img = None
        self.log_ba = False
        self.ba_log: list[dict] = []
        self.enable_loops = enable_loops
        if enable_loops:
            from .loopclose import LoopCloser

            self._loop_closer = LoopCloser(
                cfg, mesh=mesh, detect_loops=detect_loops
            )
        else:
            # NOTE: the reference cannot turn its GlobalMapper off — the
            # faithful "no loop closing" ablation is
            # ``detect_loops=False`` (keeps feature-edge maintenance and
            # the feat-graph-renewal GlobalBA); ``enable_loops=False``
            # disables the whole global stage and exists for tests and
            # pure-tracking benchmarks
            self._loop_closer = None
        self._pending_odo = None
        self._pending_img = None
        self._resume_pending = False
        self._finished = False
        # pipelined per-frame feed (process_async): in-flight frames
        # whose tracking is dispatched speculatively and whose control
        # decisions resolve ``pipeline_depth`` frames later
        self._pipe = deque()
        # depth 4 = best min-of-sessions fps in the 47-65 fps band all
        # depths 2-8 land in (E2E_BENCH.json), at 4-frame pose latency
        self.pipeline_depth = 4
        # chunk-granularity pipeline (process_chunk_async): one chunk
        # in flight — its scan + decision copies overlap the previous
        # chunk's resolve
        self._chunk_pipe = deque()

    @classmethod
    def resume(cls, cfg: SystemConfig, map_path: str,
               enable_loops: bool = True, mesh=None) -> "SlamSystem":
        """Continue SLAM on a previously saved map (the reference's
        USE_PREV_MAP mode, src/OdoSLAM.cpp:112-115 + MapStorage::loadMap).

        The first processed frame relocalizes against the loaded map via
        BoW + RANSAC-verified 2D-3D matches to seed the track (the map
        gauge is the saved one, not the new session's start pose); frames
        before successful relocalization are reported at the origin.
        Requires the map to have been saved with its vocabulary.
        """
        from .io.mapstorage import load_map

        ms, vocab, info = load_map(map_path)
        if vocab is None:
            raise ValueError(
                "resume requires a map saved with its vocabulary "
                "(needed to relocalize the first frame)"
            )
        if (ms.K, ms.M, ms.N) != (
            cfg.cap.max_kfs, cfg.cap.max_mps, cfg.cap.n_features
        ):
            raise ValueError(
                f"config capacities {(cfg.cap.max_kfs, cfg.cap.max_mps, cfg.cap.n_features)} "
                f"do not match the saved map's {(ms.K, ms.M, ms.N)}"
            )
        if info["n_kf"] >= cfg.cap.max_kfs:
            raise ValueError(
                "saved map is at keyframe capacity; no slot for the "
                "relocalization seed — raise cap.max_kfs"
            )
        slam = cls(cfg, enable_loops=enable_loops, mesh=mesh)
        slam.ms = ms
        # kf_frame_ids must stay slot-indexed (index == slot); loaded
        # keyframes have no session frame id — prefill with -1 so the
        # relocalization seed and later insertions land at their slots
        slam.kf_frame_ids = [-1] * int(info["n_kf"])
        if slam._loop_closer is not None:
            # install the saved vocabulary + rebuild the BoW bank for the
            # loaded keyframes
            slam._loop_closer.adopt_vocab(vocab, ms)
        slam._resume_vocab = vocab
        slam._resume_pending = True
        # one Localizer for the whole relocalization phase — building it
        # per frame would rebuild the BoW bank each attempt
        from .localizer import Localizer

        slam._reloc_localizer = Localizer(
            cfg, ms, vocab, reloc_min_inliers=30
        )
        return slam

    def _try_resume_reloc(self, feats: OrbFeatures, odo) -> bool:
        """Relocalize the first post-resume frame; on success, insert it
        as a keyframe in the loaded map's gauge and start tracking."""
        loc = self._reloc_localizer
        pose = loc.process_features(feats, odo)
        if pose is None:
            return False
        # seed tracking: insert the current frame as a KF at the
        # relocalized pose (data association runs against the loaded map
        # via projection matching). The seed chains from the loaded
        # map's chain TAIL (whose pre_next slot is free — chaining from
        # any interior KF would overwrite a real loaded edge) with a
        # near-uninformative covariance: there is no real preintegration
        # across the session gap.
        ref_idx = int(jax.device_get(self.ms.n_kf)) - 1
        pose_j = jnp.asarray(pose, jnp.float32)
        rel = se2.minus(pose_j, self.ms.kf_pose[ref_idx])
        ts_seed = tracking.init_track_state(
            feats, pose_j, jnp.asarray(odo),
            ref_idx, jnp.zeros((self.orb_cfg.n_slots, 3), jnp.float32),
            jnp.zeros((self.orb_cfg.n_slots,), bool),
        )
        self.ts = ts_seed._replace(
            cur_pose=pose_j,
            pre_meas=rel,
            pre_cov=jnp.eye(3, dtype=jnp.float32) * 1e6,
        )
        self._insert_keyframe(feats, jnp.asarray(odo, jnp.float32))
        self._resume_pending = False
        # release the relocalization Localizer: it pins the ENTIRE
        # loaded MapState (tens of MB of kf_desc) plus a duplicate BoW
        # bank in device memory, and tracking owns the map from here
        self._reloc_localizer = None
        self._resume_vocab = None
        return True

    # -- reference-shaped split feed API (OdoSLAM::receiveOdoData/ImgData) --

    def receive_odo(self, x, y, theta):
        self._pending_odo = np.asarray([x, y, theta], np.float32)
        self._maybe_step()

    def receive_img(self, img):
        self._pending_img = img
        self._maybe_step()

    def _maybe_step(self):
        if self._pending_odo is not None and self._pending_img is not None:
            img, odo = self._pending_img, self._pending_odo
            self._pending_img = self._pending_odo = None
            self.process(img, odo)

    # -- main synchronous step --

    def extract(self, img) -> OrbFeatures:
        # ship the frame in its source dtype (uint8 BMPs at 1 byte/px)
        # and cast to f32 inside the jitted extractor — host-side f32
        # conversion would quadruple the host→device transfer
        feats = self._extract(jnp.asarray(img))
        if self._undistort:
            feats = feats._replace(
                xy=undistort_points(self._cam, feats.xy)
            )
        return feats

    def extract_batch(self, imgs) -> OrbFeatures:
        """Extract a stack of k frames in ONE transfer + ONE dispatch.

        The per-frame path pays one host→device image transfer and one
        extractor dispatch per frame plus a k-way stack of every feature
        leaf — measured at 340–580 ms per 16-frame chunk through the
        axon tunnel, 10× the tracking scan itself. Batching collapses
        that to a single contiguous transfer (device-side f32 cast, so
        uint8 frames ship at 1 byte/px) and one lax.map extraction
        dispatch. Compiled once per distinct k (process_chunk pads short
        chunks so feeds see one k)."""
        if self._extract_batch_fn is None:
            self._extract_batch_fn = make_batch_extractor(
                self.orb_cfg, self._cam, self._undistort
            )
        stack = self._take_prefetched(imgs)
        if stack is None:
            stack = jnp.asarray(np.stack([np.asarray(im) for im in imgs]))
        return self._extract_batch_fn(stack)

    def prefetch_chunk(self, imgs):
        """Start the host→device transfer of a FUTURE chunk's frames now.

        Through a remote tunnel the ~2.4 MB uint8 upload is ~24 ms of a
        ~65 ms no-keyframe chunk; issuing it while the previous chunk
        still computes hides it entirely (transfers overlap compute).
        The next `process_chunk`/`extract_batch` call presented with the
        SAME image objects consumes the resident copy; any other input
        falls back to a fresh transfer. `process_chunk(..., next_imgs=)`
        calls this at the right point automatically."""
        if not imgs:
            return
        key = tuple(id(im) for im in imgs)
        stack = jnp.asarray(np.stack([np.asarray(im) for im in imgs]))
        # hold references to the image objects themselves: the id() key
        # is only unique while they are alive (CPython reuses addresses
        # after GC — a dropped-and-reallocated chunk could otherwise
        # match the key and silently feed the previous chunk's pixels)
        self._prefetched = (key, list(imgs), stack)

    def _take_prefetched(self, imgs):
        pref = getattr(self, "_prefetched", None)
        if pref is None:
            return None
        key, _refs, stack = pref
        # one-shot either way: a mismatch means the promised "next
        # chunk" never arrived — drop the entry rather than hold the
        # stack (and the image refs) alive indefinitely
        self._prefetched = None
        if key != tuple(id(im) for im in imgs):
            return None
        return stack

    def enable_viz(self, out_dir: str, every_n_kf: int = 5,
                   log_ba: bool = True):
        """Turn on the in-run observability surface: every ``every_n_kf``
        keyframes, emit the composed frame-debug image (the FramePublish
        canvas, src/FramePublish.cpp:152-203) and a map plot (the
        MapPublish role, src/MapPublish.cpp:529-581 — cadence per-KF
        instead of FPS/3) into ``out_dir``; optionally record a per-BA
        chi2/edge-count log (the printOptInfo analog,
        src/LocalMapper.cpp:374-440) in ``self.ba_log``."""
        os.makedirs(out_dir, exist_ok=True)
        self._viz_dir = out_dir
        self._viz_every = max(1, every_n_kf)
        self.log_ba = log_ba

    def process(self, img, odo) -> np.ndarray:
        """Feed one (image, odometry) pair; returns current body pose (3,)."""
        if self._viz_dir is not None:
            self._last_img = np.asarray(img)
        return self.process_features(self.extract(img), odo)

    def process_features(self, feats: OrbFeatures, odo) -> np.ndarray:
        self._drain_pipe()
        cfg = self.cfg
        odo = jnp.asarray(odo, jnp.float32)

        if self.ts is None and self._resume_pending:
            # resumed session: relocalize against the loaded map first
            if self._try_resume_reloc(feats, odo):
                pose = np.asarray(
                    jax.device_get(self.ms.kf_pose[self._ref_kf_host])
                )
                # anchor the seed frame on its own keyframe so it
                # retro-corrects like every other KF frame
                self._frame_anchors.append(
                    (self.frame_id, self._ref_kf_host,
                     np.zeros(3, np.float32))
                )
            else:
                pose = np.zeros(3, np.float32)
            self.trajectory.append((self.frame_id, pose))
            self.frame_id += 1
            return pose

        if self.ts is None:
            # first frame → KF 0 at origin if enough keypoints
            # (Track::mCreateFrame needs >100, src/Track.cpp:105-120)
            if int(feats.n) > min(100, cfg.cap.n_features // 4):
                self.ms = localmap.insert_first_kf(
                    self.ms, feats, jnp.zeros(3, jnp.float32), odo
                )
                view_mp, obs_mask = localmap.kf_track_seed(self.ms, 0)
                self.ts = tracking.init_track_state(
                    feats, jnp.zeros(3, jnp.float32), odo, 0, view_mp, obs_mask
                )
                self.kf_frame_ids.append(self.frame_id)
            pose = np.zeros(3, np.float32)
            self.trajectory.append((self.frame_id, pose))
            self.frame_id += 1
            return pose

        self.key, sub = jax.random.split(self.key)
        t0 = time.perf_counter()
        self.ts, res = tracking.track_frame(self.ts, feats, odo, sub, cfg)
        # ONE host round-trip per frame for the control decisions + pose
        # (separate bool()/np.asarray() fetches each pay a device sync,
        # which dominates on remote-attached chips). n_kf rides along —
        # it was computed by the previous insert and is already resident
        # — and so does a pending reference-KF mirror from the previous
        # keyframe insertion.
        need_kf, pose, n_kf, n_mp = self._pull_with_mirror(
            res.need_kf, res.pose, self.ms.n_kf, self.ms.n_mp
        )
        self.timings["track"] = time.perf_counter() - t0

        return self._apply_frame_decisions(
            need_kf, pose, n_kf, n_mp, feats, odo
        )

    def _apply_frame_decisions(self, need_kf, pose, n_kf, n_mp,
                               feats: OrbFeatures, odo) -> np.ndarray:
        """Host-side per-frame control logic shared by the synchronous
        and pipelined feeds: anchor record, deferred-loop advance, KF
        decision with capacity pressure, trajectory append. Caller must
        have ``self.ts`` set to the tracking state AFTER this frame."""
        cfg = self.cfg
        # anchor record for retro-correction: this frame's pose relative
        # to its reference KF (whose estimate later BA/loop closures move).
        # Host-side bookkeeping only — no extra device syncs.
        self._frame_anchors.append(
            (self.frame_id, self._ref_kf_host, self._anchor_rel(pose))
        )
        # advance the deferred loop stage with the values that rode this
        # frame's pull (after the anchor: its rel must pair with the
        # mirror value tracking actually used for this frame's pose)
        self._advance_loop()

        if bool(need_kf):
            if int(n_kf) >= cfg.cap.max_kfs:
                # capacity pressure: force pruning at a stepwise-relaxed
                # redundancy bar, then compact slot holes (the reference
                # never frees memory; Map::pruneRedundantKF is the
                # machinery this extends, src/Map.cpp:146-283)
                self._relieve_capacity()
            else:
                self.at_capacity = False
            if int(n_mp) + cfg.cap.n_features > cfg.cap.max_mps:
                # MP-slot watermark: the insert below may mint up to N
                # points — reclaim holes / cull weakest first
                self._relieve_mp_capacity()
            if not self.at_capacity:
                self._insert_keyframe(feats, odo)
        self.trajectory.append((self.frame_id, pose))
        self.frame_id += 1
        return pose

    # ---- pipelined per-frame feed (depth-d speculative dispatch) ----

    def process_async(self, img, odo) -> np.ndarray | None:
        """Pipelined per-frame feed: dispatch this frame's tracking now,
        return the pose of the frame resolved ``pipeline_depth`` calls
        ago (or ``None`` while the pipeline fills; ``flush_async``
        drains the tail). Lowering ``pipeline_depth`` mid-stream
        resolves several frames in one call but returns only the newest
        resolved pose — the rest are recorded in ``trajectory``.

        Per-frame mode pays one ~RTT control pull per frame — a hard
        ~1/RTT fps ceiling on a remote-attached chip. Here the pull's
        device→host copy starts at dispatch (``_host_prefetch``) and is
        consumed ``pipeline_depth`` frames later, by which time it has
        long landed — tracking is dispatched speculatively against the
        no-keyframe assumption exactly like ``process_chunk``'s scan,
        and any resolve that mutates tracking state (keyframe insertion,
        loop-closure gauge re-base, capacity relief) replays the
        in-flight frames from the corrected state, so results match the
        synchronous path to numerical identity (tests/test_pipelined.py).
        The reference's pose consumer is asynchronous the same way:
        getCurrentVehiclePose reads whatever Track last published
        (src/OdoSLAM.cpp:60-73)."""
        if self._viz_dir is not None:
            self._last_img = np.asarray(img)
        return self.process_features_async(self.extract(img), odo)

    def process_features_async(self, feats: OrbFeatures,
                               odo) -> np.ndarray | None:
        while self._chunk_pipe:
            self._chunk_resolve_one()   # modes can't interleave
        if self.ts is None:
            # bootstrap / resume: no tracking state to speculate from —
            # these frames resolve synchronously (and immediately)
            assert not self._pipe
            return self.process_features(feats, odo)
        self._pipe_submit(feats, odo)
        pose = None
        while len(self._pipe) > max(0, int(self.pipeline_depth)):
            pose = self._pipe_resolve_one()
        return pose

    def flush_async(self) -> np.ndarray:
        """Resolve every in-flight frame; returns their (n, 3) poses."""
        out = []
        while self._pipe:
            out.append(self._pipe_resolve_one())
        return np.asarray(out, np.float32).reshape(-1, 3)

    def _drain_pipe(self):
        while self._chunk_pipe:
            self._chunk_resolve_one()
        while self._pipe:
            self._pipe_resolve_one()

    def _pipe_submit(self, feats: OrbFeatures, odo):
        odo = jnp.asarray(odo, jnp.float32)
        self.key, sub = jax.random.split(self.key)
        base = self._pipe[-1][3] if self._pipe else self.ts
        ts_new, res = tracking.track_frame(base, feats, odo, sub, self.cfg)
        pulls = (res.need_kf, res.pose, self.ms.n_kf, self.ms.n_mp)
        _host_prefetch(*pulls)
        img = self._last_img if self._viz_dir is not None else None
        self._pipe.append([feats, odo, sub, ts_new, pulls, img])

    def _pipe_resolve_one(self) -> np.ndarray:
        feats, odo, sub, ts_new, pulls, img = self._pipe.popleft()
        self.ts = ts_new
        if img is not None:
            self._last_img = img
        t0 = time.perf_counter()
        need_kf, pose, n_kf, n_mp = self._pull_with_mirror(*pulls)
        self.timings["track"] = time.perf_counter() - t0
        pose = self._apply_frame_decisions(
            need_kf, pose, n_kf, n_mp, feats, odo
        )
        if self._pipe and self.ts is not ts_new:
            # the resolve mutated tracking state (keyframe insertion,
            # gauge re-base, or capacity relief): the in-flight frames
            # speculated against a stale state — replay them from the
            # corrected one (the per-frame analog of process_chunk's
            # post-fire re-scan). Dispatch-only: ~ms each, no syncs.
            self._pipe_replay()
        return pose

    def _pipe_replay(self):
        entries = list(self._pipe)
        self._pipe.clear()
        base = self.ts
        for e in entries:
            feats, odo, sub = e[0], e[1], e[2]
            ts_new, res = tracking.track_frame(
                base, feats, odo, sub, self.cfg
            )
            pulls = (res.need_kf, res.pose, self.ms.n_kf, self.ms.n_mp)
            _host_prefetch(*pulls)
            self._pipe.append([feats, odo, sub, ts_new, pulls, e[5]])
            base = ts_new

    def _anchor_rel(self, pose: np.ndarray) -> np.ndarray:
        """This frame's SE(2) pose relative to the current reference KF's
        host-mirrored pose — the retro-correction anchor record shared by
        the per-frame and chunked paths."""
        return _np_se2_minus(pose, self._ref_pose_host)

    # ---- deferred reference-KF host mirror ----
    @property
    def _ref_kf_host(self):
        self._flush_mirror()
        return self._ref_kf_host_raw

    @_ref_kf_host.setter
    def _ref_kf_host(self, v):
        self._flush_mirror()   # a direct set supersedes a pending fetch,
        self._ref_kf_host_raw = v  # but its anchor fix must still land

    @property
    def _ref_pose_host(self):
        self._flush_mirror()
        return self._ref_pose_host_raw

    @_ref_pose_host.setter
    def _ref_pose_host(self, v):
        self._flush_mirror()
        self._ref_pose_host_raw = v

    def _flush_mirror(self):
        if getattr(self, "_mirror_pending", None) is not None:
            self._pull_with_mirror()

    def _pull_with_mirror(self, *arrays):
        """device_get ``arrays``, carrying any pending reference-KF
        mirror — and any pending loop-stage gate scalars (async_mapping)
        — along in the SAME pull (the deferred-fetch contract: neither a
        keyframe insertion nor the loop pipeline costs dedicated
        syncs)."""
        n = len(arrays)
        tail = arrays
        pend = getattr(self, "_mirror_pending", None)
        if pend is not None:
            k_dev, pose_dev, fix_idx, fid = pend
            tail = tail + (k_dev, pose_dev)
        n_mir = len(tail)
        lp = self._loop_pending
        fetch_loop = lp is not None and self._loop_fetched is None
        if fetch_loop:
            tail = tail + tuple(lp["want"])
        # start async copies before the blocking get: over the axon
        # tunnel the copy+get pattern measures ~half the sync-get RTT
        # even back-to-back, and is free when a _host_prefetch at the
        # value's creation already landed the bytes (DESIGN §18)
        _host_prefetch(*tail)
        out = jax.device_get(tail)
        if pend is not None:
            self._apply_mirror(
                int(out[n]), np.asarray(out[n + 1], np.float32),
                fix_idx, fid,
            )
        if fetch_loop:
            self._loop_fetched = tuple(out[n_mir:])
        return out[:n]

    def _apply_mirror(self, kf_slot: int, ref_pose: np.ndarray,
                      fix_idx, fid):
        """Install fetched mirror values + the fired frame's own anchor
        rewrite (it became the keyframe: anchor = (new slot, zero rel))."""
        self._mirror_pending = None
        self._ref_kf_host_raw = kf_slot
        self._ref_pose_host_raw = ref_pose
        if (
            fix_idx is not None
            and fix_idx < len(self._frame_anchors)
            and self._frame_anchors[fix_idx][0] == fid
        ):
            self._frame_anchors[fix_idx] = (
                fid, kf_slot, np.zeros(3, np.float32)
            )

    # ---- deferred loop-closing stage (async_mapping) ----

    def _advance_loop(self, block: bool = False):
        """Advance the pending loop-stage machine.

        Non-blocking (default): consume host values that already rode a
        control pull, run the next stage's host logic + dispatches, and
        leave the new stage's scalars to ride the NEXT pull — the loop
        pipeline then costs tracking zero dedicated syncs. ``block``
        forces completion (pulls directly; by then the device values
        have long been computed, so each pull costs ~RTT, not compute).
        """
        lc = self._loop_closer
        while self._loop_pending is not None:
            if self._loop_fetched is None:
                if not block:
                    return
                self._loop_fetched = lc._pull(self._loop_pending["want"])
            fetched = self._loop_fetched
            self._loop_fetched = None
            self.ms, self._loop_pending, closed = lc.advance(
                self.ms, self._loop_pending, fetched
            )
            if self._loop_pending is not None:
                _host_prefetch(*self._loop_pending["want"])
            if closed:
                self._rebase_gauge()
            if not block and self._loop_pending is not None:
                return

    def _finish_loop_pending(self):
        self._advance_loop(block=True)

    def _rebase_gauge(self):
        """A retroactive global correction moved the reference keyframe:
        re-base the live tracking gauge on its corrected pose (the
        reference's Track reads the shared map pose the same way after
        GlobalBA writes back, src/GlobalMapper.cpp:496-531). Everything
        else in TrackState is relative/ref-camera-frame and therefore
        gauge-free. The host pose mirror refreshes through the deferred-
        fetch path so no sync is spent here."""
        ts = self.ts
        if ts is None:
            return
        new_ref = self.ms.kf_pose[ts.ref_kf_idx]
        self.ts = ts._replace(
            ref_pose=new_ref,
            cur_pose=se2.compose(
                new_ref, se2.minus(ts.cur_pose, ts.ref_pose)
            ),
        )
        mir = getattr(self, "_mirror_pending", None)
        if mir is not None:
            # an unflushed mirror from this reference's insertion: keep
            # its anchor fix, refresh only the pose value
            self._mirror_pending = (mir[0], new_ref, mir[2], mir[3])
        else:
            self._mirror_pending = (ts.ref_kf_idx, new_ref, None, -1)
        _host_prefetch(self._mirror_pending[0], new_ref)

    def process_chunk(self, imgs, odos, next_imgs=None) -> np.ndarray:
        """Feed ``k`` (image, odometry) pairs with ONE keyframe-decision
        sync per segment instead of one per frame.

        Speculative chunked tracking: all k frames are scanned in one
        dispatch assuming no keyframe fires (tracking.track_chunk); the
        host fetches the k decisions together, and when one fired at
        frame j it recovers the exact state at j from the scan's own
        per-step snapshots (tracking.state_at_step), inserts the
        keyframe, and continues the chunk from j+1 against the new
        reference — so the
        result matches calling ``process`` per frame to numerical
        identity (the programs fuse differently, so agreement is
        allclose-tight, not bitwise; tests/test_chunked.py asserts it).
        On a remote-attached chip the per-frame decision round-trip is
        the end-to-end wall-clock bottleneck (~30 ms each through the
        axon tunnel); this amortizes it k-ways. Trades redundant device
        FLOPs on replayed frames for host round-trips. Returns the
        (k, 3) body poses.
        """
        k = len(imgs)
        assert len(odos) == k
        self._drain_pipe()
        poses_out: list[np.ndarray] = []
        idx = 0
        # bootstrap / resume paths stay per-frame until tracking exists
        while self.ts is None and idx < k:
            poses_out.append(self.process(imgs[idx], odos[idx]))
            idx += 1
        if idx == k:
            return np.asarray(poses_out, np.float32).reshape(-1, 3)

        cfg = self.cfg
        # padded key rows are dummies — only kk keys are CONSUMED from
        # the chain, preserving parity with kk per-frame split() calls
        kk, pad, imgs_fed, odos_fed = pad_chunk(self, imgs, odos, idx)
        feats_stack = self.extract_batch(imgs_fed)
        if next_imgs is not None:
            # overlap the NEXT chunk's image upload with this chunk's
            # extraction/tracking — the transfer is ~1/3 of a no-KF
            # chunk's wall time through the tunnel
            self.prefetch_chunk(next_imgs)
        odo_stack = jnp.asarray(np.asarray(odos_fed), jnp.float32)
        self.key, keys = tracking.split_chain(self.key, kk)
        if pad:
            keys = jnp.concatenate(
                [keys, jnp.tile(keys[-1:], (pad, 1))], axis=0
            )

        poses_out.extend(self._run_chunk_segments(
            feats_stack, odo_stack, keys, kk, imgs, idx
        ))
        return np.asarray(poses_out, np.float32).reshape(-1, 3)

    def process_chunk_async(self, imgs, odos) -> np.ndarray | None:
        """Chunk-granularity pipelined feed: dispatch this chunk's
        extraction + speculative scan now, return the PREVIOUS chunk's
        (k, 3) poses (``None`` on the first call; ``flush_chunk_async``
        drains the tail; bootstrap chunks resolve synchronously and
        return their own poses).

        Combines the two sync-amortization moves: ``process_chunk``'s
        k-way dispatch batching and ``process_async``'s overlap of the
        decision pull — chunk N's scan and async-copied decisions ride
        behind chunk N-1's resolve, so the per-segment ~RTT pull stall
        disappears. Results match ``process_chunk`` bitwise (same
        compiled scans, same inputs, same key chain;
        tests/test_chunked.py::test_chunk_async_*)."""
        k = len(imgs)
        assert len(odos) == k
        while self._pipe:
            self._pipe_resolve_one()    # modes can't interleave
        if self.ts is None:
            # bootstrap / resume: resolve anything pending, then run
            # this chunk synchronously (per-frame until tracking exists)
            out = []
            while self._chunk_pipe:
                out.append(self._chunk_resolve_one())
            out.append(self.process_chunk(imgs, odos))
            return np.concatenate(out, 0)
        self._chunk_submit(imgs, odos)
        if len(self._chunk_pipe) > 1:
            return self._chunk_resolve_one()
        return None

    def flush_chunk_async(self) -> np.ndarray:
        """Resolve every in-flight chunk; returns their stacked poses."""
        out = []
        while self._chunk_pipe:
            out.append(self._chunk_resolve_one())
        if not out:
            return np.zeros((0, 3), np.float32)
        return np.concatenate(out, 0)

    def _chunk_submit(self, imgs, odos):
        cfg = self.cfg
        kk, pad, imgs_fed, odos_fed = pad_chunk(self, imgs, odos, 0)
        feats_stack = self.extract_batch(imgs_fed)
        odo_stack = jnp.asarray(np.asarray(odos_fed), jnp.float32)
        self.key, keys = tracking.split_chain(self.key, kk)
        if pad:
            keys = jnp.concatenate(
                [keys, jnp.tile(keys[-1:], (pad, 1))], axis=0
            )
        base = self._chunk_pipe[-1]["ts_f"] if self._chunk_pipe else self.ts
        ts_f, needs, poses, steps = tracking.track_chunk(
            base, feats_stack, odo_stack, keys,
            jnp.asarray(0, jnp.int32), jnp.asarray(kk, jnp.int32), cfg,
        )
        pulls = (needs, poses, self.ms.n_kf, self.ms.n_mp)
        _host_prefetch(*pulls)
        self._chunk_pipe.append(dict(
            feats=feats_stack, odo=odo_stack, keys=keys, kk=kk,
            imgs=list(imgs), ts_f=ts_f, steps=steps, pulls=pulls,
        ))

    def _chunk_resolve_one(self) -> np.ndarray:
        e = self._chunk_pipe.popleft()
        poses_out = self._run_chunk_segments(
            e["feats"], e["odo"], e["keys"], e["kk"], e["imgs"], 0,
            first_seg=(e["ts_f"], e["steps"]) + e["pulls"],
        )
        if self._chunk_pipe and self.ts is not e["ts_f"]:
            # a keyframe / closure / capacity relief mutated tracking
            # state: re-dispatch the in-flight chunk's scan from the
            # corrected state (reusing its key rows — parity with the
            # sync path's key-chain consumption)
            self._chunk_replay()
        return np.asarray(poses_out, np.float32).reshape(-1, 3)

    def _chunk_replay(self):
        cfg = self.cfg
        entries = list(self._chunk_pipe)
        self._chunk_pipe.clear()
        base = self.ts
        for e in entries:
            ts_f, needs, poses, steps = tracking.track_chunk(
                base, e["feats"], e["odo"], e["keys"],
                jnp.asarray(0, jnp.int32), jnp.asarray(e["kk"], jnp.int32),
                cfg,
            )
            pulls = (needs, poses, self.ms.n_kf, self.ms.n_mp)
            _host_prefetch(*pulls)
            e.update(ts_f=ts_f, steps=steps, pulls=pulls)
            self._chunk_pipe.append(e)
            base = ts_f

    def _run_chunk_segments(self, feats_stack, odo_stack, keys, kk,
                            imgs, idx, first_seg=None):
        """The per-segment chunk loop shared by the synchronous and
        chunk-pipelined feeds. ``first_seg``, when given, is a
        pre-dispatched speculative full scan for segment 0 —
        ``(ts_f, steps, needs, poses, n_kf, n_mp)`` device values
        captured at submit time (valid because any state-mutating
        resolve replays in-flight chunks before they get here)."""
        cfg = self.cfg
        poses_out: list[np.ndarray] = []
        i = 0
        while i < kk:
            t0 = time.perf_counter()
            if i == 0 and first_seg is not None:
                ts_f, steps, needs, poses, n_kf_d, n_mp_d = first_seg
            else:
                ts_f, needs, poses, steps = tracking.track_chunk(
                    self.ts, feats_stack, odo_stack, keys,
                    jnp.asarray(i, jnp.int32), jnp.asarray(kk, jnp.int32),
                    cfg,
                )
                n_kf_d, n_mp_d = self.ms.n_kf, self.ms.n_mp
            # ONE host round-trip per segment: k decisions + poses (+ the
            # live KF count for the capacity check, already resident, +
            # a pending reference-KF mirror from the previous insertion)
            needs_h, poses_h, n_kf, n_mp = self._pull_with_mirror(
                needs, poses, n_kf_d, n_mp_d
            )
            self.timings["track"] = time.perf_counter() - t0
            fire = next((j for j in range(i, kk) if needs_h[j]), None)
            upto = kk if fire is None else fire + 1

            for j in range(i, upto):
                pose = np.asarray(poses_h[j], np.float32)
                # anchor record vs the CURRENT reference (pre-insert),
                # exactly as the per-frame path orders it
                self._frame_anchors.append(
                    (self.frame_id, self._ref_kf_host,
                     self._anchor_rel(pose))
                )
                if j == fire:
                    feats_j = jax.tree.map(lambda a: a[fire], feats_stack)
                    if fire == kk - 1:
                        # the fired frame is the segment's last active
                        # step: the speculative pass's final state IS
                        # the state at the fire
                        ts_j = ts_f
                    else:
                        # exact state at the fired frame, rebuilt from
                        # the scan's own per-step snapshots — the old
                        # stop=fire+1 recovery re-scan cost one full
                        # scan's device time per keyframe
                        ts_j = tracking.state_at_step(
                            self.ts, feats_j, steps, fire
                        )
                    self.ts = ts_j
                    # advance the deferred loop stage with the values
                    # that rode this segment's pull — AFTER self.ts is
                    # current (a closure re-bases the live gauge) and
                    # after the replay dispatch (which then overlaps any
                    # remaining blocking pull inside _insert_keyframe)
                    self._advance_loop()
                    if int(n_kf) >= cfg.cap.max_kfs:
                        self._relieve_capacity()
                    else:
                        self.at_capacity = False
                    if int(n_mp) + cfg.cap.n_features > cfg.cap.max_mps:
                        self._relieve_mp_capacity()
                    if not self.at_capacity:
                        if self._viz_dir is not None:
                            self._last_img = np.asarray(imgs[idx + fire])
                        self._insert_keyframe(feats_j, odo_stack[fire])
                self.trajectory.append((self.frame_id, pose))
                self.frame_id += 1
                poses_out.append(pose)

            if fire is None:
                self.ts = ts_f
                self._advance_loop()
                break
            i = fire + 1
        return poses_out

    def _relieve_capacity(self) -> bool:
        """Forced prune + compaction when the KF bank is full.

        Escalates the redundancy bar (0.8 → 0.6) until pruning frees
        slots, then renumbers the map (localmap.compact_map) and remaps
        every host-side slot reference. Sets ``at_capacity`` when even
        the relaxed bar frees nothing (the map is genuinely dense) —
        mapping pauses, tracking coasts on odometry, and the next
        pressure event retries."""
        # compaction remaps slots; a pending loop stage holds slot ids
        # and per-slot device arrays — land it first
        self._finish_loop_pending()
        cfg = self.cfg
        ref = jnp.asarray(self._ref_kf_host, jnp.int32)
        # low-water target: free ~1/8 of the bank per relief event so the
        # prune + compact + BoW-bank-rebuild cost amortizes over many
        # insertions — freeing a single slot would re-run the whole
        # pipeline on every keyframe once the bank first saturates
        target = cfg.cap.max_kfs - max(1, cfg.cap.max_kfs // 8)
        # live count, not the slot watermark: regular per-insert pruning
        # may have left holes, in which case compaction alone frees the
        # tail and the forced prune rounds below are skipped entirely
        n_valid = int(jnp.sum(self.ms.kf_valid))
        # escalation: relaxed redundancy bars, then marginalize-oldest
        # (min_ratio 0 admits any interior chain KF — its odometry edges
        # splice into one composed preintegration, so the constraint
        # information is kept even though the views are dropped)
        for ratio in (0.8, 0.7, 0.6, 0.0):
            while n_valid > target:
                for _ in range(3):
                    self.ms, _ = localmap.prune_redundant_kf(
                        self.ms, ref, protect=self._ref_kf_host,
                        cfg=cfg, min_ratio=ratio,
                    )
                # one sync per prune chunk (rare path)
                new_valid = int(jnp.sum(self.ms.kf_valid))
                if new_valid == n_valid:
                    break                 # no progress at this bar
                n_valid = new_valid
            if n_valid <= target:
                break
        self._compact_and_remap()
        freed = int(self.ms.n_kf) < cfg.cap.max_kfs
        if freed:
            self.capacity_compactions += 1
        self.at_capacity = not freed
        return freed

    def _compact_and_remap(self):
        """Renumber KF + MP slots (localmap.compact_map) and remap every
        host-side slot reference — shared by the KF- and MP-side
        capacity relief paths."""
        old_kf_pose, n_mp_before = jax.device_get(
            (self.ms.kf_pose, self.ms.n_mp)
        )
        self.ms, kf_perm, _mp_perm = localmap.compact_map(self.ms)
        kf_perm, n_mp_after = jax.device_get((kf_perm, self.ms.n_mp))
        # lifetime-mint accounting across compactions (n_mp resets to
        # the live count): total mints = n_mp + mp_slots_reclaimed
        self.mp_slots_reclaimed += int(n_mp_before) - int(n_mp_after)
        self._remap_slots(np.asarray(kf_perm), np.asarray(old_kf_pose))

    def _relieve_mp_capacity(self):
        """Map-point watermark response (the MP analog of
        _relieve_capacity; r3 VERDICT missing #3): when the next insert
        could overflow the MP bank, reclaim the holes that culling/
        merging/pruning left and — only if the map is GENUINELY dense —
        force-cull the weakest landmarks down to a low-water mark so
        relief amortizes over many insertions. Without this, n_mp is
        monotonic: a long landmark-churning run exhausts MP slots while
        KF slots remain and minting silently degrades to inherit-only.

        Runs as ONE fused device dispatch (localmap.relieve_mp_pressure)
        — MP slots have no host-side references, so unlike the KF-side
        relief there is no remap, no BoW-bank rebuild, and the only sync
        is a telemetry pull of the two counters."""
        self._finish_loop_pending()   # pending stage holds MP-table views
        cfg = self.cfg
        M = cfg.cap.max_mps
        # low-water target: at least one full insert's worth of slots
        # plus the 1/8 amortization margin; floored at M/4 so a bank
        # smaller than the feature capacity still keeps a live map
        target = max(M // 4, M - max(cfg.cap.n_features, M // 8))
        n_mp_before = self.ms.n_mp
        self.ms, n_culled = localmap.relieve_mp_pressure(
            self.ms, jnp.asarray(target, jnp.int32),
            jnp.asarray(self._ref_kf_host, jnp.int32),
        )
        culled, reclaimed = jax.device_get(
            (n_culled, n_mp_before - self.ms.n_mp)
        )
        self.mp_culled_weak += int(culled)
        self.mp_slots_reclaimed += int(reclaimed)
        self.mp_compactions += 1

    def _remap_slots(self, kf_perm: np.ndarray, old_kf_pose: np.ndarray):
        """Apply a compaction permutation to every host-side slot
        reference: the tracking reference, the per-KF frame-id list, the
        retro-correction anchors (anchors whose keyframe died are
        rigidly re-anchored onto the nearest surviving keyframe), the
        tracking state, and the loop closer's BoW bank."""
        new_ref = int(kf_perm[self._ref_kf_host])
        assert new_ref >= 0, "protected tracking reference was compacted away"
        self._ref_kf_host = new_ref
        if self.ts is not None:
            self.ts = self.ts._replace(
                ref_kf_idx=jnp.asarray(new_ref, jnp.int32)
            )
        # kf_frame_ids is slot-indexed (resume() prefills loaded slots
        # with -1 to keep index == slot): rebuild in new slot order
        new_ids = [-1] * int(self.ms.n_kf)
        for old_slot, fid in enumerate(self.kf_frame_ids):
            if old_slot < len(kf_perm) and kf_perm[old_slot] >= 0:
                ns = int(kf_perm[old_slot])
                if ns < len(new_ids):
                    new_ids[ns] = fid
        self.kf_frame_ids = new_ids
        alive_old = np.where(kf_perm >= 0)[0]
        anchors = []
        for fid, ref, rel in self._frame_anchors:
            if ref < len(kf_perm) and kf_perm[ref] >= 0:
                anchors.append((fid, int(kf_perm[ref]), rel))
            else:
                # anchor keyframe compacted away: re-anchor rigidly onto
                # the nearest surviving keyframe (insertion order), both
                # expressed at their pre-compaction estimates. Baking an
                # absolute pose instead would freeze the frame in the
                # pre-compaction gauge — every later BA/loop-closure
                # correction would miss it, leaving a discontinuity the
                # size of the correction in corrected_trajectory()
                s_old = int(alive_old[np.argmin(np.abs(alive_old - ref))])
                abs_pose = _np_se2_compose(old_kf_pose[ref], rel)
                anchors.append((
                    fid, int(kf_perm[s_old]),
                    _np_se2_minus(abs_pose, old_kf_pose[s_old]),
                ))
                self.anchors_reanchored += 1
        self._frame_anchors = anchors
        # per-BA chi2 log entries carry KF slot ids too (the one other
        # host-side slot reference): alive slots remap, dead slots → -1
        for recd in self.ba_log:
            old = recd.get("kf", -1)
            recd["kf"] = (
                int(kf_perm[old])
                if 0 <= old < len(kf_perm) and kf_perm[old] >= 0
                else -1
            )
        lc = self._loop_closer
        if lc is not None and lc.vocab is not None:
            # bank rows move with their keyframes; same vocabulary, so
            # the retrain schedule is untouched
            lc.rebuild_bank(self.ms)
        if lc is not None and lc.last_loop is not None:
            # the temporal loop throttle compares KF slot ids (slots are
            # insertion-ordered); stale pre-compaction ids would suppress
            # detection indefinitely under sustained capacity pressure
            def new_slot(old: int) -> int:
                if old < len(kf_perm) and kf_perm[old] >= 0:
                    return int(kf_perm[old])
                # compacted away: its rank among survivors preserves the
                # throttle's insertion-order semantics
                return int(np.sum(kf_perm[:old] >= 0))

            alive = all(
                o < len(kf_perm) and kf_perm[o] >= 0 for o in lc.last_loop
            )
            lc.last_loop = (
                new_slot(lc.last_loop[0]), new_slot(lc.last_loop[1])
            )
            if not alive:
                lc.last_loop_midx = None  # viz pane must not draw a
                # different keyframe's matches

    def _insert_keyframe(self, feats: OrbFeatures, odo):
        # the previous keyframe's loop stage must land before this one's
        # pose/map bake in (merge + GlobalBA rewrite the state the new
        # keyframe chains from); by now its device values are computed,
        # so any remaining pull costs ~RTT, overlapped with the replay
        # scan the chunked caller just dispatched. (Staged/mesh path
        # only — the fused path applies closures device-side in order.)
        self._finish_loop_pending()
        cfg, ts = self.cfg, self.ts
        # the whole insert→prune→local-BA stage is ONE compiled program
        # (localmap.insert_and_optimize): dispatched piecewise it was ~8
        # op launches of tunnel latency per keyframe (DESIGN §17).
        # protect: the OUTGOING tracking reference — recent frames'
        # retro-correction anchors point at it, and a pruned KF's pose
        # freezes out of future BA/loop corrections.
        t0 = time.perf_counter()
        self.ms, k, view_mp, obs_mask, ba_info = (
            localmap.insert_and_optimize(
                self.ms,
                feats,
                ts.cur_pose,
                odo,
                ts.ref_kf_idx,
                ts.match_idx,
                ts.local_mps,
                ts.local_mp_valid,
                ts.good_prl,
                ts.pre_meas,
                ts.pre_cov,
                jnp.asarray(self._ref_kf_host, jnp.int32),
                cfg,
                prune_rounds=self.prune_rounds,
            )
        )
        self.timings["insert"] = time.perf_counter() - t0
        if self.log_ba:
            # the printOptInfo analog (src/LocalMapper.cpp:374-440):
            # aggregate chi2 before/after + problem size, ONE device pull
            rec = jax.device_get(
                (k, ba_info["chi2_init"], ba_info["chi2"],
                 ba_info["lambda"], self.ms.n_kf,
                 jnp.sum(self.ms.mp_valid),
                 ba_info.get("iters", jnp.asarray(-1, jnp.int32)))
            )
            self.ba_log.append({
                "frame": self.frame_id, "kf": int(rec[0]),
                "chi2_init": float(rec[1]), "chi2": float(rec[2]),
                "lambda": float(rec[3]), "n_kf": int(rec[4]),
                "n_mp": int(rec[5]), "iters": int(rec[6]),
            })

        lc = self._loop_closer
        if self.enable_loops and lc is not None:
            t0 = time.perf_counter()
            if self.async_mapping and not lc._dist:
                # single-device default: the ENTIRE loop stage is one
                # device dispatch with the closure applied under
                # lax.cond — the host reads back nothing (counters
                # drain on later pulls). Track ∥ GlobalMapper overlap
                # (src/OdoSLAM.cpp:142-150) falls out for free: the
                # program chains behind tracking dispatches without a
                # sync point.
                self.ms = lc.on_new_kf_fused(self.ms, k)
                # the closure (if any) already landed: reseed below
                # reads post-closure state — same order as sync mode
                view_mp, obs_mask = localmap.kf_track_seed(self.ms, k)
            elif self.async_mapping:
                # mesh path: staged driver — shard_map solvers stay
                # outside lax.cond; stage scalars ride later pulls
                self._loop_pending = lc.start_async(self.ms, int(k))
                self._loop_fetched = None
                _host_prefetch(*self._loop_pending["want"])
            else:
                self.ms = lc.on_new_kf(self.ms, int(k))
                view_mp, obs_mask = localmap.kf_track_seed(self.ms, k)
            self.timings["loop"] = time.perf_counter() - t0

        # reset tracking against the (BA-refined) new reference KF
        # (Track::resetLocalTrack, src/Track.cpp:195-209); view_mp /
        # obs_mask come fused from insert_and_optimize unless a loop
        # stage re-wrote observations above
        new_ref_pose = self.ms.kf_pose[k]
        self.ts = tracking.init_track_state(
            feats,
            new_ref_pose,
            odo,
            k,
            view_mp,
            obs_mask,
        )
        self.kf_frame_ids.append(self.frame_id)
        # per-KF host mirror for the retro-correction anchors: DEFER the
        # fetch — it rides the next control-decision pull (process_chunk
        # / process_features merge it into their device_get), so a
        # keyframe costs no dedicated mirror sync. The fired frame's own
        # anchor rewrite (it became the KF: (new slot, zero rel)) is
        # recorded as a fix applied when the values land.
        fix_idx = None
        if self._frame_anchors and self._frame_anchors[-1][0] == self.frame_id:
            fix_idx = len(self._frame_anchors) - 1
        self._mirror_pending = (k, new_ref_pose, fix_idx, self.frame_id)
        _host_prefetch(k, new_ref_pose)

        # in-run observability cadence (enable_viz)
        if (
            self._viz_dir is not None
            and self._last_img is not None
            and len(self.kf_frame_ids) % self._viz_every == 0
        ):
            self._emit_viz(feats, ts)
        if self._viz_dir is not None:
            self._ref_img = self._last_img

    def _emit_viz(self, feats: OrbFeatures, old_ts):
        """Write the composed frame-debug image + map plot for the KF
        just inserted (host-side file IO; device pulls are viz-only)."""
        from . import viz

        fid = self.frame_id
        loop_xy = loop_match = None
        lc = self._loop_closer
        if (
            lc is not None
            and lc.last_loop is not None
            and getattr(lc, "last_loop_midx", None) is not None
            and lc.last_loop[1] == self._ref_kf_host
        ):
            loop_xy = np.asarray(self.ms.kf_xy[lc.last_loop[0]])
            loop_match = np.asarray(lc.last_loop_midx)
        viz.compose_debug_image(
            os.path.join(self._viz_dir, f"frame_{fid:05d}.png"),
            self._last_img,
            feats,
            match_idx=np.asarray(old_ts.match_idx),
            ref_img=self._ref_img,
            ref_xy=np.asarray(old_ts.ref_feats.xy),
            loop_xy=loop_xy,
            loop_match=loop_match,
            label=f"f{fid} kf{len(self.kf_frame_ids)}",
        )
        viz.plot_map(
            os.path.join(self._viz_dir, f"map_{fid:05d}.png"), self.ms,
            title=f"map @ frame {fid}",
        )

    # -- outputs (OdoSLAM::saveMap trajectory dump, src/OdoSLAM.cpp:199-214) --

    def current_pose(self) -> np.ndarray:
        self._drain_pipe()
        if self.trajectory:
            return self.trajectory[-1][1]
        return np.zeros(3, np.float32)

    def kf_trajectory(self) -> np.ndarray:
        """(nKF, 5) rows of [idKF, x, y, z, yaw] in the reference format."""
        self._drain_pipe()
        self._finish_loop_pending()
        n = int(self.ms.n_kf)
        poses = np.asarray(self.ms.kf_pose[:n])
        valid = np.asarray(self.ms.kf_valid[:n])
        rows = []
        for i in range(n):
            if not valid[i]:
                continue
            x, y, th = poses[i]
            rows.append([i, x, y, 0.0, th])
        return np.asarray(rows, np.float64).reshape(-1, 5)

    def save_kf_trajectory(self, path: str):
        rows = self.kf_trajectory()
        with open(path, "w") as f:
            for r in rows:
                f.write(
                    f"{int(r[0])} {r[1]:.6f} {r[2]:.6f} {r[3]:.6f} {r[4]:.6f}\n"
                )

    def corrected_trajectory(self) -> np.ndarray:
        """(n, 4) [frame_id, x, y, theta]: the per-frame trajectory with
        every pose re-anchored on its reference keyframe's CURRENT
        estimate — so past frames benefit retroactively from local BA and
        loop closures. (The live `trajectory` list keeps the poses as
        they were published; the reference offers only the final KF dump,
        src/OdoSLAM.cpp:199-214.)"""
        self._drain_pipe()
        self._finish_loop_pending()   # a deferred closure must land first
        self._flush_mirror()   # a pending anchor fix must land first
        kf_pose = np.asarray(self.ms.kf_pose)   # one device fetch
        anchors = {fid: (ref, rel) for fid, ref, rel in self._frame_anchors}
        out = []
        for fid, live in self.trajectory:
            if fid in anchors:
                ref, rel = anchors[fid]
                p = _np_se2_compose(kf_pose[ref], rel)
            else:
                p = live                  # first frame(s): origin gauge
            out.append([fid, p[0], p[1], p[2]])
        return np.asarray(out, np.float64)

    def save_frame_trajectory(self, path: str):
        """Per-frame CSV: frame_id, x, y, theta (the SLAM-mode analog of
        the Localizer's per-frame dump, src/Localizer.cpp:178-193)."""
        self._drain_pipe()
        with open(path, "w") as f:
            for fid, p in self.trajectory:
                f.write(f"{fid},{p[0]:.6f},{p[1]:.6f},{p[2]:.6f}\n")

    # -- reference-named compatibility surface (OdoSLAM public API,
    #    include/se2lam/OdoSLAM.h:27-59) --

    def receive_odo_data(self, x, y, theta, _timestamp=None):
        """OdoSLAM::receiveOdoData."""
        self.receive_odo(x, y, theta)

    def receive_img_data(self, img, _timestamp=None):
        """OdoSLAM::receiveImgData."""
        self.receive_img(img)

    def get_current_vehicle_pose(self) -> np.ndarray:
        """OdoSLAM::getCurrentVehiclePose — body pose (x, y, theta)."""
        return self.current_pose()

    def request_finish(self):
        """OdoSLAM::requestFinish — lands any deferred loop stage and
        marks the session done."""
        self._drain_pipe()
        self._finish_loop_pending()
        self._finished = True

    def wait_for_finish(self):
        """OdoSLAM::waitForFinish — drains the deferred loop stage (the
        only 'thread' the functional design has in flight)."""
        self._drain_pipe()
        self._finish_loop_pending()
        self._finished = True

    def save_map(self, path: str, with_vocab: bool = True):
        """OdoSLAM's shutdown save (SAVE_NEW_MAP + the KF-trajectory
        dump, src/OdoSLAM.cpp:192-215): map checkpoint + trajectory txt."""
        self._drain_pipe()
        self._finish_loop_pending()
        from .io.mapstorage import save_map as _save

        vocab = self._loop_closer.vocab if self._loop_closer else None
        if vocab is None and with_vocab and self.n_keyframes() >= 2:
            from .vocab import train_vocab

            K, N = self.ms.K, self.ms.N
            desc = self.ms.kf_desc.reshape(-1, 256)
            valid = (
                self.ms.kf_feat_valid & self.ms.kf_valid[:, None]
            ).reshape(-1)
            doc_ids = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
            vocab = train_vocab(
                desc, valid, n_words=512, iters=5,
                doc_ids=doc_ids, n_docs_cap=K,
            )
            if self._loop_closer is not None:
                # keep the in-session BoW state consistent with the
                # checkpoint: a later loop closure must score against the
                # same vocabulary the saved map will relocalize with
                self._loop_closer.adopt_vocab(vocab, self.ms)
        # with_vocab gates SAVING, not just training: a loops-enabled run
        # already holds a vocabulary, and writing it anyway would violate
        # the parameter's contract (vocab-free checkpoints are smaller)
        _save(path, self.ms, vocab if with_vocab else None)
        self.save_kf_trajectory(
            os.path.join(path, "se2lam_kf_trajectory.txt")
        )

    def n_keyframes(self) -> int:
        self._drain_pipe()
        return int(self.ms.n_kf)

    def n_map_points(self) -> int:
        self._drain_pipe()
        self._finish_loop_pending()   # a deferred merge changes the count
        return int(jnp.sum(self.ms.mp_valid))
