"""Per-frame tracking stage as one jitted function.

TPU-native re-derivation of the reference tracking thread (Track::run /
mTrack, src/Track.cpp:56-160): ORB match against the reference keyframe,
fundamental-matrix RANSAC gating, odometry-predicted pose ("vision never
moves the live pose", src/Track.cpp:162-167), SE2 preintegration,
per-match DLT triangulation with depth/parallax gates, and the
new-keyframe decision. The thread's mutable members become an explicit
``TrackState`` NamedTuple threaded through a pure step function; all
shapes are static (feature capacity N), so the step compiles once.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import factors
from .config import SystemConfig
from .frontend.matcher import match_by_window
from .frontend.orb import OrbFeatures
from .frontend.ransac import ransac_fundamental
from .ops import se2, se3
from .ops.camera import CameraModel
from .ops.triangulate import check_parallax, triangulate

__all__ = [
    "TrackState", "init_track_state", "track_frame", "TrackResult",
    "track_chunk", "split_chain", "ChunkSteps", "state_at_step",
]


class TrackState(NamedTuple):
    """The tracking thread's state between frames (Track.h members)."""

    ref_feats: OrbFeatures       # reference KF features (mRefFrame)
    ref_kf_idx: jnp.ndarray      # () int32 — map slot of the reference KF
    ref_pose: jnp.ndarray        # (3,) Twb of ref KF
    ref_odom: jnp.ndarray        # (3,) raw odometry at ref KF
    ref_obs_mask: jnp.ndarray    # (N,) bool — ref-KF features with an MP
    prev_matched: jnp.ndarray    # (N, 2) predicted positions (mPrevMatched)
    local_mps: jnp.ndarray       # (N, 3) ref-camera-frame estimates (mLocalMPs)
    local_mp_valid: jnp.ndarray  # (N,) bool
    good_prl: jnp.ndarray        # (N,) bool (mvbGoodPrl)
    n_good_prl: jnp.ndarray      # () int32 (mnGoodPrl)
    pre_meas: jnp.ndarray        # (3,) SE2 preintegration measurement
    pre_cov: jnp.ndarray         # (3, 3) its covariance
    last_odom: jnp.ndarray       # (3,)
    frames_since_kf: jnp.ndarray  # () int32
    # last processed frame (for KF promotion)
    cur_feats: OrbFeatures
    cur_pose: jnp.ndarray        # (3,) Twb odometry-predicted
    cur_odom: jnp.ndarray        # (3,)
    match_idx: jnp.ndarray       # (N,) int32 ref-feature → cur-feature


class TrackResult(NamedTuple):
    n_matched: jnp.ndarray       # () int32 — inlier matches this frame
    n_tracked_old: jnp.ndarray   # () int32 — matches onto existing MPs
    need_kf: jnp.ndarray         # () bool
    pose: jnp.ndarray            # (3,) current Twb


def init_track_state(
    feats: OrbFeatures, pose, odom, kf_idx, view_mp, obs_mask
) -> TrackState:
    """Reset after a KF insertion (Track::resetLocalTrack,
    src/Track.cpp:195-209): ref frame := current, mLocalMPs := KF view MPs,
    preintegration zeroed."""
    N = feats.xy.shape[0]
    dtype = feats.xy.dtype
    return TrackState(
        ref_feats=feats,
        ref_kf_idx=jnp.asarray(kf_idx, jnp.int32),
        ref_pose=jnp.asarray(pose, dtype),
        ref_odom=jnp.asarray(odom, dtype),
        ref_obs_mask=obs_mask,
        prev_matched=feats.xy,
        local_mps=view_mp,
        local_mp_valid=obs_mask,
        good_prl=jnp.zeros((N,), bool),
        n_good_prl=jnp.asarray(0, jnp.int32),
        pre_meas=jnp.zeros((3,), dtype),
        pre_cov=jnp.zeros((3, 3), dtype),
        last_odom=jnp.asarray(odom, dtype),
        frames_since_kf=jnp.asarray(0, jnp.int32),
        cur_feats=feats,
        cur_pose=jnp.asarray(pose, dtype),
        cur_odom=jnp.asarray(odom, dtype),
        match_idx=jnp.full((N,), -1, jnp.int32),
    )


@partial(jax.jit, static_argnames=("cfg",))
def track_frame(
    ts: TrackState,
    feats: OrbFeatures,
    odom,
    key,
    cfg: SystemConfig,
):
    """One tracking step. Returns (new TrackState, TrackResult)."""
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, ts.ref_pose.dtype)
    Tbc = jnp.asarray(cfg.Tbc_mat, ts.ref_pose.dtype)
    N = ts.prev_matched.shape[0]

    # --- 1. window match vs reference KF (src/Track.cpp:131-132,
    #        winSize=20) ---
    # Improvement over the reference: warp the previous positions by the
    # odometry-predicted camera rotation (infinite homography H = K R K⁻¹)
    # before the window search, so rotation-dominant motion stays inside
    # the 20 px window. The reference searches around the raw previous
    # positions and loses the frame under fast yaw.
    odom_in = jnp.asarray(odom, ts.ref_pose.dtype)
    d_step = se2.minus(odom_in, ts.last_odom)
    Rcc = (Tcb @ se2.to_se3(se2.inv(d_step)) @ Tbc)[:3, :3]
    Kmat = jnp.asarray(
        [[cfg.fx, 0.0, cfg.cx], [0.0, cfg.fy, cfg.cy], [0.0, 0.0, 1.0]],
        ts.ref_pose.dtype,
    )
    H = Kmat @ Rcc @ jnp.linalg.inv(Kmat)
    ones = jnp.ones((N, 1), ts.prev_matched.dtype)
    ph = jnp.concatenate([ts.prev_matched, ones], axis=1) @ H.T
    pred_xy = ph[:, :2] / jnp.maximum(ph[:, 2:3], 1e-6)

    wm = match_by_window(
        ts.ref_feats, feats, pred_xy, win_size=20.0, nn_ratio=0.9
    )
    midx = wm.idx2

    # --- 2. fundamental RANSAC outlier gate (removeOutliers,
    #        src/Track.cpp:308-344) ---
    matched = midx >= 0
    p1 = ts.ref_feats.xy
    p2 = feats.xy[jnp.clip(midx, 0)]
    fr = ransac_fundamental(
        key, p1, p2, matched,
        n_trials=cfg.cap.ransac_trials, thresh_px=3.0, min_inliers=10,
    )
    midx = jnp.where(fr.inliers, midx, -1)
    n_matched = fr.n_inliers

    # keep predicted positions fresh for the next window search
    prev_matched = jnp.where(
        (midx >= 0)[:, None], feats.xy[jnp.clip(midx, 0)], ts.prev_matched
    )

    # --- 3. odometry-predicted pose + SE2 preintegration
    #        (updateFramePose, src/Track.cpp:162-188) ---
    odom = jnp.asarray(odom, ts.ref_pose.dtype)
    pose = se2.compose(ts.ref_pose, se2.minus(odom, ts.ref_odom))
    d_odo = se2.minus(odom, ts.last_odom)
    odo_noise = jnp.asarray(
        [cfg.odo_x_noise, cfg.odo_y_noise, cfg.odo_t_noise], pose.dtype
    )
    pre_meas, pre_cov = factors.preintegrate_se2(
        ts.pre_meas, ts.pre_cov, d_odo, odo_noise
    )

    # --- 4. triangulation + parallax (doTriangulate,
    #        src/Track.cpp:378-419) ---
    # Tcr: ref-camera → current-camera, from odometry only
    d_ref = se2.minus(ts.ref_odom, odom)  # mpKF->odom - mFrame.odom
    Tcr = Tcb @ se2.to_se3(d_ref) @ Tbc
    K3 = cam.K
    P_ref = jnp.concatenate([K3, jnp.zeros((3, 1), K3.dtype)], axis=1)
    P_cur = K3 @ Tcr[:3, :]

    pt_ref = ts.ref_feats.xy
    pt_cur = feats.xy[jnp.clip(midx, 0)]
    pos = triangulate(pt_ref, pt_cur, P_ref[None], P_cur[None])  # (N, 3)
    depth_ok = cfg.accept_depth(pos[..., 2])

    o_cur = se3.inv(Tcr)[:3, 3]
    prl_ok = check_parallax(jnp.zeros(3, pos.dtype), o_cur, pos, 2)

    do_tri = ts.frames_since_kf + 1 >= cfg.min_frames_between_kf
    is_new = (midx >= 0) & (~ts.ref_obs_mask) & do_tri
    tracked_old = (midx >= 0) & ts.ref_obs_mask & do_tri

    local_mps = jnp.where((is_new & depth_ok)[:, None], pos, ts.local_mps)
    local_mp_valid = ts.local_mp_valid | (is_new & depth_ok)
    good_prl = jnp.where(is_new & depth_ok, prl_ok, ts.good_prl)
    # depth-gate failures drop the match (src/Track.cpp:414-416)
    midx = jnp.where(is_new & ~depth_ok, -1, midx)
    n_tracked_old = jnp.sum(tracked_old.astype(jnp.int32))
    # the KF gate counts THIS frame's good-parallax triangulations
    # (reference resets mnGoodPrl every frame, src/Track.cpp:386-388);
    # the per-feature flags stay latest-wins for minting at KF time
    n_good_prl = jnp.sum((is_new & depth_ok & prl_ok).astype(jnp.int32))

    # --- 5. new-KF decision (needNewKF, src/Track.cpp:346-376) ---
    frames = ts.frames_since_kf + 1
    n_old_kp = jnp.sum(ts.ref_obs_mask.astype(jnp.int32))
    c0 = frames > cfg.min_frames_between_kf
    c1 = n_tracked_old.astype(jnp.float32) <= 0.5 * n_old_kp.astype(jnp.float32)
    c2 = n_good_prl > 40
    c3 = frames > cfg.max_frames_between_kf
    c4 = (n_matched < 0.1 * cfg.max_feature_num) | (n_matched < 20)
    need = c0 & ((c1 & c2) | c3 | c4)

    d_kf = se2.minus(odom, ts.ref_odom)
    c5 = jnp.abs(d_kf[2]) >= 0.0349  # ≥ 2°
    cTc = Tcb @ se2.to_se3(d_kf) @ Tbc
    c6 = jnp.linalg.norm(cTc[:3, 3]) >= 0.0523 * cfg.upper_depth * 0.1
    need = need & (c5 | c6)

    new_ts = ts._replace(
        prev_matched=prev_matched,
        local_mps=local_mps,
        local_mp_valid=local_mp_valid,
        good_prl=good_prl,
        n_good_prl=n_good_prl,
        pre_meas=pre_meas,
        pre_cov=pre_cov,
        last_odom=odom,
        frames_since_kf=frames,
        cur_feats=feats,
        cur_pose=pose,
        cur_odom=odom,
        match_idx=midx,
    )
    return new_ts, TrackResult(
        n_matched=n_matched,
        n_tracked_old=n_tracked_old,
        need_kf=need,
        pose=pose,
    )


@partial(jax.jit, static_argnames=("n",))
def split_chain(key, n: int):
    """``n`` sequential PRNG splits in one dispatch: returns (new_key,
    (n, 2) subkeys) with values identical to ``n`` host-side
    ``key, sub = jax.random.split(key)`` iterations — chunked tracking
    must consume the same key sequence as the per-frame path so the two
    modes are bitwise-identical."""

    def body(k, _):
        k2, sub = jax.random.split(k)
        return k2, sub

    return jax.lax.scan(body, key, None, length=n)


class ChunkSteps(NamedTuple):
    """Per-step snapshots of TrackState's mutable fields, stacked along
    the chunk axis by ``track_chunk`` (~30 KB/step at N=1000 — small
    enough to emit always). ``state_at_step`` rebuilds the exact
    TrackState after any step from these, which replaces the stop=j+1
    recovery re-scan the chunked feed used to pay on every keyframe
    fire (one full scan's device time per KF)."""

    prev_matched: jnp.ndarray
    local_mps: jnp.ndarray
    local_mp_valid: jnp.ndarray
    good_prl: jnp.ndarray
    n_good_prl: jnp.ndarray
    pre_meas: jnp.ndarray
    pre_cov: jnp.ndarray
    last_odom: jnp.ndarray
    frames_since_kf: jnp.ndarray
    cur_pose: jnp.ndarray
    cur_odom: jnp.ndarray
    match_idx: jnp.ndarray


def _step_fields(ts: TrackState) -> ChunkSteps:
    return ChunkSteps(
        ts.prev_matched, ts.local_mps, ts.local_mp_valid, ts.good_prl,
        ts.n_good_prl, ts.pre_meas, ts.pre_cov, ts.last_odom,
        ts.frames_since_kf, ts.cur_pose, ts.cur_odom, ts.match_idx,
    )


def state_at_step(ts0: TrackState, cur_feats: OrbFeatures,
                  steps: ChunkSteps, j: int) -> TrackState:
    """The exact TrackState after chunk step ``j``, reconstructed from
    the speculative scan's stacked outputs. ``ts0`` supplies the fields
    that are constant within a segment (the ref-KF block — they only
    change at keyframe insertion, which ends the segment);
    ``cur_feats`` is the step's own features (``feats_stack[j]``).
    Values are the scan's own step-j outputs, so this matches the old
    recovery re-scan bitwise without its device cost."""
    sj = jax.tree.map(lambda a: a[j], steps)
    return ts0._replace(
        prev_matched=sj.prev_matched,
        local_mps=sj.local_mps,
        local_mp_valid=sj.local_mp_valid,
        good_prl=sj.good_prl,
        n_good_prl=sj.n_good_prl,
        pre_meas=sj.pre_meas,
        pre_cov=sj.pre_cov,
        last_odom=sj.last_odom,
        frames_since_kf=sj.frames_since_kf,
        cur_feats=cur_feats,
        cur_pose=sj.cur_pose,
        cur_odom=sj.cur_odom,
        match_idx=sj.match_idx,
    )


@partial(jax.jit, static_argnames=("cfg",))
def track_chunk(
    ts: TrackState,
    feats_stack: OrbFeatures,   # leading chunk axis (k, ...)
    odo_stack,                  # (k, 3)
    keys,                       # (k, 2) uint32
    start,                      # () int32 — first active step
    stop,                       # () int32 — one past the last active step
    cfg: SystemConfig,
):
    """Speculatively track a chunk of frames in ONE dispatch.

    Scans ``track_frame`` over the stacked frames; steps outside
    [start, stop) pass the carried state through unchanged (start/stop
    are traced values, so every window shape shares one compilation).
    Returns (final TrackState, (k,) need_kf flags, (k, 3) poses,
    ChunkSteps per-step snapshots) — inactive steps report
    need_kf=False.

    This is the sync-elimination half of the serving design: the
    per-frame loop pays one host round-trip per frame for the KF
    decision (which a remote-attached chip turns into the wall-clock
    bottleneck); here the host fetches k decisions at once and, when a
    keyframe fires mid-chunk at j, recovers the exact state at j from
    the returned ``ChunkSteps`` (``state_at_step``) — no recovery
    re-scan. Semantics match the sequential reference loop
    (src/Track.cpp:56-160) exactly: frames after a fired decision are
    REPLAYED against the new keyframe by the caller, never consumed
    from the speculative pass."""
    k = odo_stack.shape[0]

    def body(carry, xs):
        i, feats, odo, key = xs
        active = (i >= start) & (i < stop)

        def live(c):
            ts2, res = track_frame(c, feats, odo, key, cfg)
            return ts2, (res.need_kf, res.pose)

        def skip(c):
            # a REAL branch (lax.cond on a scalar predicate), not a
            # masked compute: segments re-entered after a mid-chunk
            # keyframe would otherwise pay the full k steps of tracking
            # math for their dead prefix — measured quadratic-in-k wall
            # blowup at k=16/24
            return c, (
                jnp.asarray(False),
                jnp.zeros(3, c.cur_pose.dtype),
            )

        ts_out, (need, pose) = jax.lax.cond(active, live, skip, carry)
        return ts_out, (need, pose, _step_fields(ts_out))

    ts_f, (needs, poses, steps) = jax.lax.scan(
        body, ts, (jnp.arange(k), feats_stack, odo_stack, keys)
    )
    return ts_f, needs, poses, steps
