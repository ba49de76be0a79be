"""Localization-only mode against a previously built map.

TPU-native re-derivation of the reference Localizer thread
(src/Localizer.cpp:32-176), which replaces Track/LocalMapper/GlobalMapper
when LOCALIZATION_ONLY is set (src/OdoSLAM.cpp:120-132):

- tracked: pose predicted by odometry from the last estimate
  (UpdatePoseCurr, :614-619), map points projected and matched
  (MatchLocalMap, :211-230), pose-only BA on fixed points
  (DoLocalBA, :233-302)
- lost: BoW relocalization against the whole KF bank
  (DetectLoopClose, :337-392; best score > 0.05), descriptor match +
  RANSAC verification (VerifyLoopClose ≥45 inliers, :394-431), adopt the
  matched KF's pose and re-localize with two BA rounds
- per-frame trajectory recorded (WriteTrajFile, :178-193)

Projection matching runs against the FULL map-point bank in one batched
pass — the reference's covisibility-local-map bookkeeping exists to keep
CPU work bounded; on the MXU the full bank is cheaper than the
bookkeeping.
"""
from __future__ import annotations

from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import vocab as vocab_mod
from .config import SystemConfig
from .frontend.matcher import match_by_projection, mutual_match
from .frontend.pallas_match import match_by_projection_streamed
from .frontend.orb import (
    OrbConfig, OrbFeatures, make_batch_extractor, make_extractor,
)
from .frontend.ransac import ransac_fundamental
from .loopclose import kf_features
from .mapstate import MapState, kf_Tcw
from .ops import se2, se3
from .ops.camera import CameraModel, undistort_points
from .solver.poseonly import solve_pose_only
from .utils.chunking import pad_chunk
from .utils.prefetch import host_prefetch
from .vocab import Vocabulary

__all__ = ["Localizer"]


def _project_and_match(ms: MapState, feats: OrbFeatures, pose, cfg: SystemConfig):
    """Project all valid map points into the predicted view and match.

    On TPU the match against the FULL point bank streams through the
    Pallas kernel (frontend.pallas_match) — no (M, N) distance/gate
    intermediates in HBM; off-TPU the dense matcher runs (same accept
    semantics, equivalence-tested in tests/test_pallas_match.py)."""
    dtype = ms.kf_pose.dtype
    Tcb = jnp.asarray(cfg.Tcb_mat, dtype)
    Tcw = kf_Tcw(pose, Tcb)
    lc = se3.apply(Tcw, ms.mp_pos)
    z = lc[..., 2]
    u = cfg.fx * lc[..., 0] / jnp.where(z == 0, 1.0, z) + cfg.cx
    v = cfg.fy * lc[..., 1] / jnp.where(z == 0, 1.0, z) + cfg.cy
    cand = (
        ms.mp_valid
        & (z > 0)
        & (u >= 0) & (u < cfg.width) & (v >= 0) & (v < cfg.height)
    )
    matcher = (
        match_by_projection_streamed
        if jax.default_backend() == "tpu"
        else match_by_projection
    )
    feat_match, n = matcher(
        feats,
        jnp.stack([u, v], -1),
        ms.mp_main_octave,
        ms.mp_desc,
        cand,
        feats.valid,
        # the reference Localizer widens the octave gate to ±2
        # (MatchByProjection(..., 15, 2, ...), src/Localizer.cpp:217) —
        # localization revisits the map at different distances/scales
        level_offset=2,
    )
    return feat_match, n


@jax.jit
def _covis_kf_count(ms: MapState, feat_match):
    """Number of valid keyframes observing any matched map point — the
    Localizer's local covisible-KF set size, whose emptiness defines
    'lost' (Localizer::DetectIfLost, src/Localizer.cpp:304-313 via
    UpdateCovisKFCurr)."""
    sel = feat_match >= 0
    obs = ms.mp_obs_kf[jnp.clip(feat_match, 0)]        # (N, P)
    ok = sel[:, None] & (obs >= 0) & ms.kf_valid[jnp.clip(obs, 0)]
    seen = jnp.zeros((ms.K,), bool).at[
        jnp.where(ok, obs, ms.K)
    ].set(True, mode="drop")
    return jnp.sum(seen.astype(jnp.int32))


@partial(jax.jit, static_argnames=("cfg",))
def _localize_chunk(
    ms: MapState,
    pose0,
    last_odom0,
    feats_stack: OrbFeatures,   # leading chunk axis (k, ...)
    odo_stack,                  # (k, 3)
    start,                      # () int32 — first active step
    stop,                       # () int32 — one past the last active step
    min_matches,                # () int32 — the tracked gate
    cfg: SystemConfig,
):
    """Speculatively localize a chunk of frames in ONE dispatch.

    The serving analog of tracking.track_chunk for localization-only
    mode: the per-frame loop pays 2-3 host round-trips per frame (the
    match-count gate, the inlier/covisibility fetch, the returned pose);
    here the tracked-path accept decision — matches ≥ gate, pose-only
    inliers ≥ gate, covisible-KF set nonempty (DetectIfLost,
    src/Localizer.cpp:304-313) — is evaluated ON DEVICE per frame, and
    the host fetches k (pose, tracked) pairs at once. The scan carries
    (pose, last_odom, lost); once a frame fails the gates the carry
    freezes and subsequent steps skip (lax.cond), because the reference
    semantics switch to BoW relocalization, which stays a host decision.
    Steps outside [start, stop) skip likewise. Returns ((k, 3) poses,
    (k,) tracked flags)."""
    dtype = ms.kf_pose.dtype
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, dtype)
    k = odo_stack.shape[0]

    def body(carry, xs):
        pose, last_odom, lost = carry
        i, feats, odo = xs
        active = (i >= start) & (i < stop) & jnp.logical_not(lost)

        def live(args):
            p, lo = args
            pred = se2.compose(p, se2.minus(odo, lo))
            feat_match, n = _project_and_match(ms, feats, pred, cfg)
            m = jnp.clip(feat_match, 0)
            new_pose, _chi, n_in = solve_pose_only(
                pred, ms.mp_pos[m], feats.xy, feat_match >= 0,
                cam, Tcb, iters=30,
            )
            n_covis = _covis_kf_count(ms, feat_match)
            ok = (
                (n >= min_matches)
                & (n_in >= min_matches)
                & (n_covis > 0)
            )
            return new_pose, ok

        def skip(args):
            p, _ = args
            return p, jnp.asarray(False)

        new_pose, ok = jax.lax.cond(active, live, skip, (pose, last_odom))
        pose_out = jnp.where(ok, new_pose, pose)
        last_out = jnp.where(ok, odo, last_odom)
        lost_out = lost | (active & jnp.logical_not(ok))
        return (pose_out, last_out, lost_out), (pose_out, ok)

    carry0 = (
        jnp.asarray(pose0, dtype),
        jnp.asarray(last_odom0, dtype),
        jnp.asarray(False),
    )
    _, (poses, tracked) = jax.lax.scan(
        body, carry0, (jnp.arange(k), feats_stack, odo_stack)
    )
    return poses, tracked


@partial(jax.jit, static_argnames=("cfg",))
def _localize_step(ms: MapState, pose, last_odom, feats: OrbFeatures,
                   odo, min_matches, cfg: SystemConfig):
    """One tracked-path localization step with the accept decision ON
    DEVICE (the k=1 analog of _localize_chunk's body): odometry
    prediction, projection match, pose-only solve, and the tracked
    gates — matches ≥ gate, inliers ≥ gate, covisible-KF set nonempty
    (DetectIfLost, src/Localizer.cpp:304-313). Returns (pose_out, ok);
    ``pose_out`` falls back to the previous pose when not ok (the lost
    path is host-driven)."""
    dtype = ms.kf_pose.dtype
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, dtype)
    pred = se2.compose(
        jnp.asarray(pose, dtype), se2.minus(odo, jnp.asarray(last_odom, dtype))
    )
    feat_match, n = _project_and_match(ms, feats, pred, cfg)
    m = jnp.clip(feat_match, 0)
    new_pose, _chi, n_in = solve_pose_only(
        pred, ms.mp_pos[m], feats.xy, feat_match >= 0, cam, Tcb, iters=30,
    )
    n_covis = _covis_kf_count(ms, feat_match)
    ok = (n >= min_matches) & (n_in >= min_matches) & (n_covis > 0)
    return jnp.where(ok, new_pose, pred), ok


@partial(jax.jit, static_argnames=("n_trials",))
def _relocalize_verify(ms: MapState, cand, feats: OrbFeatures, key,
                       n_trials: int = 128):
    """Descriptor match + RANSAC inlier count vs a candidate keyframe
    (Localizer::VerifyLoopClose, src/Localizer.cpp:394-431).

    Returns (n_inliers, mp_idx, uv, pair_valid): direct 2D-3D
    correspondences — candidate-KF features with map points matched to
    current-frame pixels (the MatchLoopClose role, :433-454)."""
    f_kf = kf_features(ms, cand)
    wm = mutual_match(f_kf, feats, nn_ratio=0.9)
    midx = wm.idx2
    matched = midx >= 0
    fr = ransac_fundamental(
        key, f_kf.xy, feats.xy[jnp.clip(midx, 0)], matched,
        n_trials=n_trials, thresh_px=3.0, min_inliers=10,
    )
    # zero-baseline degeneracy: querying from (nearly) the mapped
    # viewpoint gives identical correspondences, which determine NO
    # fundamental matrix — RANSAC rightly fails. When the matched
    # displacements are tiny the view is near-identical and the
    # descriptor matches are trustworthy as-is; the pose-only solve's
    # chi2 inlier count downstream remains the final judge.
    disp = jnp.linalg.norm(
        feats.xy[jnp.clip(midx, 0)] - f_kf.xy, axis=-1
    )
    disp_sorted = jnp.sort(jnp.where(matched, disp, jnp.inf))
    n_matched = jnp.sum(matched.astype(jnp.int32))
    med = disp_sorted[jnp.clip(n_matched // 2, 0, disp.shape[0] - 1)]
    near_identical = (med < 2.0) & (n_matched >= 20)
    inliers = jnp.where(near_identical, matched, fr.inliers)
    n_in = jnp.where(near_identical, n_matched, fr.n_inliers)

    inl = jnp.where(inliers, midx, -1)
    mp = ms.kf_obs_mp[cand]
    pair = (inl >= 0) & (mp >= 0) & ms.mp_valid[jnp.clip(mp, 0)]
    uv = feats.xy[jnp.clip(inl, 0)]
    return n_in, jnp.clip(mp, 0), uv, pair


class Localizer:
    """Host-driven localization loop over a loaded map."""

    def __init__(
        self,
        cfg: SystemConfig,
        ms: MapState,
        vocab: Vocabulary | None = None,
        reloc_min_score: float = 0.05,
        reloc_min_inliers: int = 45,
        min_tracked_matches: int = 10,
    ):
        self.cfg = cfg
        self.ms = ms
        self.vocab = vocab
        self.reloc_min_score = reloc_min_score
        self.reloc_min_inliers = reloc_min_inliers
        self.min_tracked_matches = min_tracked_matches

        self.orb_cfg = OrbConfig(
            height=cfg.height, width=cfg.width,
            n_features=cfg.cap.n_features,
            scale_factor=cfg.scale_factor, n_levels=cfg.max_level,
        )
        self._extract = jax.jit(make_extractor(self.orb_cfg))
        self._extract_batch_fn = None
        self._cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
        self._undistort = any(abs(d) > 0 for d in cfg.dist)

        if vocab is not None:
            bank, _ = jax.vmap(
                lambda d, m: vocab_mod.bow_transform(vocab, d, m)
            )(ms.kf_desc, ms.kf_feat_valid & ms.kf_valid[:, None])
            self.bank = bank
        else:
            self.bank = None

        self.pose = None          # (3,) last estimate; None until localized
        self.last_odom = None
        self.lost = True
        self.frame_id = 0
        self.trajectory: list[tuple[int, np.ndarray, bool]] = []
        self.key = jax.random.PRNGKey(7)
        # pipelined per-frame serving (process_async): in-flight frames
        # with speculative tracked-path dispatches (see SlamSystem's
        # pipelined feed, DESIGN §18; depth trades pose latency for
        # overlap of the per-frame control pull)
        self._pipe = deque()
        self.pipeline_depth = 4
        self._in_resolve = False
        if vocab is None:
            # without a vocabulary there is no relocalization path, so a
            # cold start can never localize — require an explicit seed
            import warnings

            warnings.warn(
                "Localizer built without a vocabulary: call "
                "set_pose(pose, odo) to seed tracking, or pass the map's "
                "vocabulary to enable BoW relocalization.",
                stacklevel=2,
            )

    def set_pose(self, pose, odo):
        """Seed the tracked state directly (e.g. known start pose, or a
        map without a stored vocabulary)."""
        self.pose = np.asarray(pose, np.float32)
        self.last_odom = jnp.asarray(odo, jnp.float32)
        self.lost = False

    # -- public API --

    def process(self, img, odo) -> np.ndarray | None:
        # source dtype on the wire, f32 cast on device (uint8 = 1 byte/px)
        feats = self._extract(jnp.asarray(img))
        if self._undistort:
            feats = feats._replace(xy=undistort_points(self._cam, feats.xy))
        return self.process_features(feats, odo)

    # -- pipelined per-frame serving --

    def process_async(self, img, odo) -> np.ndarray | None:
        """Depth-d pipelined per-frame localization: dispatch this
        frame's tracked-path step now (decision scalars' host copy
        starts immediately), resolve the frame submitted
        ``pipeline_depth`` calls earlier. An accepted frame's pose IS
        its speculative dispatch's pose, so in-flight frames stay valid
        across accepts; only a lost transition (host-driven BoW reloc,
        src/Localizer.cpp:88-155) re-resolves the tail per-frame.
        Results match ``process`` to f32 tightness — the fused
        on-device step and the eager per-frame path are the same math
        under different XLA fusions, so agreement is allclose
        (atol 1e-3), not bitwise (tests/test_localizer.py).
        Returns the resolved frame's pose (None while the pipeline
        fills, or for a resolved frame that stayed lost); ``flush_async``
        drains the tail. Lowering ``pipeline_depth`` mid-stream resolves
        several frames in one call but returns only the newest resolved
        pose — the rest are recorded in ``trajectory``."""
        feats = self._extract(jnp.asarray(img))
        if self._undistort:
            feats = feats._replace(xy=undistort_points(self._cam, feats.xy))
        return self.process_features_async(feats, odo)

    def process_features_async(self, feats: OrbFeatures, odo):
        odo = jnp.asarray(odo, jnp.float32)
        if (self.lost or self.pose is None) and not self._pipe:
            # cold start / lost with nothing in flight: BoW reloc is
            # host-driven — run this frame synchronously
            return self.process_features(feats, odo)
        self._pipe_submit(feats, odo)
        out = None
        while len(self._pipe) > max(0, int(self.pipeline_depth)):
            out = self._pipe_resolve_one()
        return out

    def flush_async(self) -> list:
        """Resolve every in-flight frame; list of poses (None = lost)."""
        out = []
        while self._pipe:
            out.append(self._pipe_resolve_one())
        return out

    def _drain_pipe(self):
        while self._pipe:
            self._pipe_resolve_one()

    def _pipe_submit(self, feats: OrbFeatures, odo):
        # speculative base: the newest in-flight dispatch, else the live
        # tracked state. A lost tail (or a lost live state) cannot be
        # speculated through — those entries resolve via the host path.
        if self._pipe:
            prev = self._pipe[-1]
            base = (prev[2], prev[1]) if prev[2] is not None else None
        elif not self.lost and self.pose is not None:
            base = (jnp.asarray(self.pose), self.last_odom)
        else:
            base = None
        if base is None:
            self._pipe.append([feats, odo, None, None])
            return
        pose_dev, ok_dev = _localize_step(
            self.ms, base[0], base[1], feats, odo,
            jnp.asarray(self.min_tracked_matches, jnp.int32), self.cfg,
        )
        host_prefetch(pose_dev, ok_dev)
        self._pipe.append([feats, odo, pose_dev, ok_dev])

    def _pipe_resolve_one(self):
        feats, odo, pose_dev, ok_dev = self._pipe.popleft()
        if pose_dev is None:
            # unspeculated entry (queued behind a lost frame): full
            # host path — may relocalize, may re-enter tracking
            return self._resolve_host(feats, odo)
        pose_h, ok_h = jax.device_get((pose_dev, ok_dev))
        if bool(ok_h):
            # an accepted frame's pose IS its speculative dispatch's
            # pose — the in-flight tail stays valid, no replay needed
            self._accept(np.asarray(pose_h, np.float32), odo, tracked=True)
            return self.pose.copy()
        # tracked gates failed: mirror the synchronous fall-through
        # (mark lost, BoW reloc on the same frame)
        self.lost = True
        pose = self._relocalize(feats, odo)
        if pose is not None:
            self._accept(pose, odo, tracked=False)
            out = self.pose.copy()
        else:
            self.trajectory.append((self.frame_id, None, False))
            self.frame_id += 1
            self.last_odom = odo
            out = None
        if self._pipe:
            if not self.lost:
                self._pipe_replay()   # re-speculate from the reloc pose
            else:
                for e in self._pipe:  # still lost: host path, in order
                    e[2] = e[3] = None
        return out

    def _resolve_host(self, feats: OrbFeatures, odo):
        self._in_resolve = True
        try:
            return self.process_features(feats, odo)
        finally:
            self._in_resolve = False

    def _pipe_replay(self):
        entries = list(self._pipe)
        self._pipe.clear()
        base_pose, base_odo = jnp.asarray(self.pose), self.last_odom
        for e in entries:
            pose_dev, ok_dev = _localize_step(
                self.ms, base_pose, base_odo, e[0], e[1],
                jnp.asarray(self.min_tracked_matches, jnp.int32), self.cfg,
            )
            host_prefetch(pose_dev, ok_dev)
            self._pipe.append([e[0], e[1], pose_dev, ok_dev])
            base_pose, base_odo = pose_dev, e[1]

    def process_chunk(self, imgs, odos) -> list:
        """Localize ``k`` (image, odometry) pairs with ONE host sync per
        tracked run instead of 2-3 per frame (the serving shape: a robot
        fleet localizing against a frozen map). Tracked frames consume
        the speculative pass (_localize_chunk); the first lost frame
        falls back to the per-frame BoW relocalization path, then the
        chunk resumes. Returns a list of k poses (None where lost),
        matching ``process``'s per-frame outputs."""
        k = len(imgs)
        assert len(odos) == k
        self._drain_pipe()
        out: list = []
        idx = 0
        # cold start / lost state stays per-frame (BoW reloc is host-driven)
        while (self.lost or self.pose is None) and idx < k:
            out.append(self.process(imgs[idx], odos[idx]))
            idx += 1
        if idx == k:
            return out

        cfg = self.cfg
        kk, pad, imgs_fed, odos_fed = pad_chunk(self, imgs, odos, idx)
        if self._extract_batch_fn is None:
            self._extract_batch_fn = make_batch_extractor(
                self.orb_cfg, self._cam, self._undistort
            )
        feats_stack = self._extract_batch_fn(
            jnp.asarray(np.stack([np.asarray(im) for im in imgs_fed]))
        )
        odo_stack = jnp.asarray(np.asarray(odos_fed), jnp.float32)
        gate = jnp.asarray(self.min_tracked_matches, jnp.int32)

        i = 0
        while i < kk:
            if self.lost:
                # reloc (and its immediate-retry semantics) per frame
                feats_i = jax.tree.map(lambda a: a[i], feats_stack)
                out.append(self.process_features(feats_i, odo_stack[i]))
                i += 1
                continue
            poses, tracked = _localize_chunk(
                self.ms, self.pose, self.last_odom,
                feats_stack, odo_stack,
                jnp.asarray(i, jnp.int32), jnp.asarray(kk, jnp.int32),
                gate, cfg,
            )
            # ONE round-trip for the whole tracked run
            tr_h, poses_h = jax.device_get((tracked, poses))
            j = i
            while j < kk and tr_h[j]:
                self._accept(
                    np.asarray(poses_h[j], np.float32),
                    odo_stack[j], tracked=True,
                )
                out.append(self.pose.copy())
                j += 1
            if j == kk:
                break
            # frame j failed the tracked gates: mirror the per-frame
            # fall-through (mark lost, try BoW reloc on the same frame)
            self.lost = True
            i = j
        return out

    def process_features(self, feats: OrbFeatures, odo) -> np.ndarray | None:
        if self._pipe and not self._in_resolve:
            self._drain_pipe()   # a mixed-mode caller: keep frame order
        cfg = self.cfg
        odo = jnp.asarray(odo, jnp.float32)

        if not self.lost and self.pose is not None:
            # the WHOLE tracked path — odometry prediction
            # (UpdatePoseCurr, src/Localizer.cpp:614), projection match,
            # pose-only BA, and the DetectIfLost gates
            # (src/Localizer.cpp:304-313) — as ONE device program with
            # ONE control pull. The previous eager spelling paid 3
            # sequential sync round-trips per frame (match count, then
            # inlier/covis gates, then the pose), which capped per-frame
            # serving at 4-6 fps through a remote-attached chip
            # (round-4 LOC_BENCH); this is the same fused step the
            # pipelined and chunked feeds already ran.
            pose_dev, ok_dev = _localize_step(
                self.ms, jnp.asarray(self.pose), self.last_odom, feats,
                odo, jnp.asarray(self.min_tracked_matches, jnp.int32),
                cfg,
            )
            host_prefetch(pose_dev, ok_dev)
            pose_h, ok_h = jax.device_get((pose_dev, ok_dev))
            if bool(ok_h):
                self._accept(np.asarray(pose_h, np.float32), odo,
                             tracked=True)
                return self.pose.copy()
            self.lost = True

        # lost → BoW relocalization (src/Localizer.cpp:88-155)
        pose = self._relocalize(feats, odo)
        if pose is not None:
            self._accept(pose, odo, tracked=False)
            return np.asarray(pose)
        # stay lost; record a hole
        self.trajectory.append((self.frame_id, None, False))
        self.frame_id += 1
        self.last_odom = odo
        return None

    # -- internals --

    def _accept(self, pose, odo, tracked: bool):
        self.pose = np.asarray(pose)
        self.last_odom = odo
        self.lost = False
        self.trajectory.append((self.frame_id, self.pose.copy(), tracked))
        self.frame_id += 1

    def _relocalize(self, feats: OrbFeatures, odo):
        if self.bank is None:
            return None
        v, _ = vocab_mod.bow_transform(self.vocab, feats.desc_pm1, feats.valid)
        scores = jnp.where(
            self.ms.kf_valid, vocab_mod.bow_score(self.bank, v), -jnp.inf
        )
        # try the top-scoring candidates in order: the single best BoW hit
        # can be a sparse early keyframe with too few map points even when
        # a close runner-up verifies fine
        top_scores, top_cands = jax.lax.top_k(scores, min(3, scores.shape[0]))
        # one fetch for all candidates: element-wise int()/float() in the
        # loop would pay up to 6 tunnel round-trips per lost frame
        top_scores, top_cands = jax.device_get((top_scores, top_cands))
        for j in range(top_scores.shape[0]):
            cand = int(top_cands[j])
            if float(top_scores[j]) < self.reloc_min_score:
                break
            pose = self._relocalize_at(cand, feats)
            if pose is not None:
                return pose
        return None

    def _relocalize_at(self, cand: int, feats: OrbFeatures):
        self.key, sub = jax.random.split(self.key)
        n_in, mp_idx, uv, pair = _relocalize_verify(
            self.ms, cand, feats, sub,
            n_trials=self.cfg.cap.ransac_trials,
        )
        if int(n_in) < self.reloc_min_inliers:
            return None
        cam = self._cam
        Tcb = jnp.asarray(self.cfg.Tcb_mat, jnp.float32)
        # pose from the direct 2D-3D matches, seeded at the candidate's
        # pose, then projection-refinement rounds (src/Localizer.cpp:121-140)
        pose, chi, n_ok = solve_pose_only(
            self.ms.kf_pose[cand],
            self.ms.mp_pos[mp_idx],
            uv,
            pair,
            cam,
            Tcb,
            iters=30,
        )
        if int(n_ok) < self.min_tracked_matches:
            return None
        for _ in range(2):
            feat_match, n = _project_and_match(self.ms, feats, pose, self.cfg)
            if int(n) < self.min_tracked_matches:
                return None
            m = jnp.clip(feat_match, 0)
            pose, chi, n_ok = solve_pose_only(
                pose, self.ms.mp_pos[m], feats.xy, feat_match >= 0,
                cam, Tcb, iters=30,
            )
        if int(n_ok) < self.min_tracked_matches:
            return None
        return pose

    def save_trajectory(self, path: str):
        """Per-frame CSV: frame_id, x, y, theta, tracked
        (Localizer::WriteTrajFile, src/Localizer.cpp:178-193)."""
        self._drain_pipe()
        with open(path, "w") as f:
            for fid, p, tracked in self.trajectory:
                if p is None:
                    f.write(f"{fid},nan,nan,nan,0\n")
                else:
                    f.write(
                        f"{fid},{p[0]:.6f},{p[1]:.6f},{p[2]:.6f},{int(tracked)}\n"
                    )
