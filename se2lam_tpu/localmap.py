"""Local mapping stage: keyframe insertion, data association, local BA.

TPU-native re-derivation of the reference LocalMapper thread + the Map's
local-graph machinery (src/LocalMapper.cpp, src/Map.cpp:285-331,891-1053).
Every operation is a pure function MapState → MapState over fixed-capacity
arrays, so the stage jits once and needs no locks:

- ``insert_first_kf`` / ``add_keyframe``   ⇔ Track::mCreateFrame +
  LocalMapper::addNewKF/findCorrespd (3-way data association: inherit
  tracked MPs, match-by-projection against the local map, mint new
  MapPoints from triangulations — src/LocalMapper.cpp:87-170)
- ``local_graph_masks``                    ⇔ Map::updateLocalGraph
  (multi-hop covisibility BFS → local KFs / fixed RefKFs / local MPs,
  src/Map.cpp:285-331)
- ``build_local_ba`` / ``run_local_ba``    ⇔ Map::loadLocalGraph +
  LocalMapper::localBA + Map::optimizeLocalGraph (the paper's SE2-XYZ
  factor graph with plane-motion-marginalized 2x2 observation info,
  src/Map.cpp:891-1053, src/LocalMapper.cpp:232-302)
- MP culling on failed parallax            ⇔ MapPoint::updateParallax
  kill rule (src/MapPoint.cpp:181-184)
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import factors
from .config import SystemConfig
from .frontend.matcher import match_by_projection
from .frontend.orb import OrbFeatures
from .mapstate import MapState, kf_Tcw
from .ops import linalg, se2, se3
from .ops.camera import CameraModel
from .ops.triangulate import check_parallax, triangulate
from .solver.ba import BAConfig, BAProblem, solve_local_ba

__all__ = [
    "insert_first_kf",
    "add_keyframe",
    "local_graph_masks",
    "build_local_ba",
    "run_local_ba",
    "remove_outlier_obs",
    "prune_redundant_kf",
    "kf_track_seed",
]


def _write_kf_record(ms: MapState, k, feats: OrbFeatures, pose, odom):
    return ms._replace(
        kf_pose=ms.kf_pose.at[k].set(pose),
        kf_odom=ms.kf_odom.at[k].set(odom),
        kf_valid=ms.kf_valid.at[k].set(True),
        kf_xy=ms.kf_xy.at[k].set(feats.xy),
        kf_octave=ms.kf_octave.at[k].set(feats.octave),
        kf_angle=ms.kf_angle.at[k].set(feats.angle),
        kf_feat_valid=ms.kf_feat_valid.at[k].set(feats.valid),
        kf_desc=ms.kf_desc.at[k].set(feats.desc_pm1),
    )


@jax.jit
def insert_first_kf(ms: MapState, feats: OrbFeatures, pose, odom) -> MapState:
    """First frame becomes KF 0 at the origin with no map points
    (Track::mCreateFrame, src/Track.cpp:105-120)."""
    k = ms.n_kf
    ms = _write_kf_record(ms, k, feats, pose, odom)
    return ms._replace(n_kf=ms.n_kf + 1)


@jax.jit
def kf_track_seed(ms: MapState, k):
    """(view_mp, obs_mask) of KF ``k`` for Track::resetLocalTrack.

    Masks by mp_valid so culled/merged points don't count as tracked."""
    obs = ms.kf_obs_mp[k]
    mask = (obs >= 0) & ms.mp_valid[jnp.clip(obs, 0)]
    return ms.kf_view_mp[k], mask


@partial(jax.jit, static_argnames=("cfg", "prune_rounds"))
def insert_and_optimize(
    ms: MapState,
    feats: OrbFeatures,
    pose,
    odom,
    ref_kf,
    match_idx,
    local_mps,
    local_mp_valid,
    good_prl,
    pre_meas,
    pre_cov,
    protect,
    cfg: SystemConfig,
    prune_rounds: int = 2,
):
    """The whole keyframe-insertion mapping stage as ONE compiled
    program: add_keyframe → bounded pruning rounds → local BA → the
    tracking reseed inputs (LocalMapper::addNewKF + run-loop order,
    src/LocalMapper.cpp:51-85,304-364 + Track::resetLocalTrack).

    Fusing matters on a remote-attached chip: dispatched separately,
    the stage is ~8 host→device op launches whose tunnel latency
    (~1.6 ms each, serialized in dispatch order) plus the next control
    pull's queue drain dominate the ~25 ms of actual device math
    (round-4 E2E profile: 54 pulls averaged 98 ms against ~40 ms of
    device work). One launch leaves one RTT.

    Returns (ms, k, view_mp, obs_mask, ba_info).
    """
    ms, k = add_keyframe(
        ms, feats, pose, odom, ref_kf, match_idx, local_mps,
        local_mp_valid, good_prl, pre_meas, pre_cov, cfg,
    )
    for _ in range(prune_rounds):
        ms, _kid = prune_redundant_kf(ms, k, protect=protect, cfg=cfg)
    ms, ba_info = run_local_ba(ms, k, cfg)
    view_mp, obs_mask = kf_track_seed(ms, k)
    return ms, k, view_mp, obs_mask, ba_info


def _append_obs(ms: MapState, mp_idx, kf, feat_idx, active):
    """Append observation (kf, feat) to each active map point (the
    functional MapPoint::addObservation, src/MapPoint.cpp:104-122).

    mp_idx/feat_idx: (N,) int32; active: (N,) bool. Each active row adds
    one observation; overflow past the fan-in capacity P is dropped.
    Returns (new MapState, (N,) bool mask of the appends that actually
    landed) — callers MUST mask their forward kf_obs_mp writes by the
    returned mask, or a full fan-in list leaves a dangling forward
    pointer (the invariant test_prune.check_consistency enforces).
    """
    P = ms.mp_obs_kf.shape[1]
    m = jnp.clip(mp_idx, 0)
    slot = ms.mp_n_obs[m]
    ok = active & (slot < P)
    row = jnp.where(ok, m, ms.M)           # out-of-range rows drop
    col = jnp.where(ok, slot, 0)
    kf_full = jnp.full_like(mp_idx, kf)
    return ms._replace(
        mp_obs_kf=ms.mp_obs_kf.at[row, col].set(kf_full, mode="drop"),
        mp_obs_feat=ms.mp_obs_feat.at[row, col].set(feat_idx, mode="drop"),
        mp_n_obs=ms.mp_n_obs.at[row].add(
            jnp.where(ok, 1, 0), mode="drop"
        ),
    ), ok


def _fw_mask_from_inverse(K, N, mp_obs_kf, mp_obs_feat, mp_mask):
    """(K, N) bool: forward-table entries whose map point is in
    ``mp_mask`` — equivalent to ``mp_mask[clip(kf_obs_mp, 0)] &
    (kf_obs_mp >= 0)`` but built by SCATTERING the bounded-fan-in inverse
    observation lists: the (K·N)-element random gather from an (M,)
    table measures ~0.7 ms on a v5e while the (M·P)-entry scatter is
    ~free (round-3 microbench). Exact when ``mp_mask ⊆ mp_valid``: the
    tables are bidirectionally consistent for VALID points
    (test_prune.check_consistency), but culling clears only the forward
    side, so an invalidated point's inverse row is stale — callers must
    not pass masks that include invalid points."""
    sel = (mp_obs_kf >= 0) & mp_mask[:, None]
    rows = jnp.where(sel, mp_obs_kf, K)
    cols = jnp.clip(mp_obs_feat, 0)
    return jnp.zeros((K, N), bool).at[rows, cols].set(True, mode="drop")


def _octave_dist_gates(octave, dist, scale_factor, n_levels):
    """min/max view-distance gates from the creation octave
    (MapPoint::updateMainKFandDescriptor, src/MapPoint.cpp:276-289)."""
    level_scale = scale_factor ** octave.astype(jnp.float32)
    max_d = dist * level_scale * scale_factor
    min_d = max_d / (scale_factor ** n_levels)
    return min_d, max_d


@partial(jax.jit, static_argnames=("cfg",))
def add_keyframe(
    ms: MapState,
    feats: OrbFeatures,
    pose,
    odom,
    ref_kf,
    match_idx,
    local_mps,
    local_mp_valid,
    good_prl,
    pre_meas,
    pre_cov,
    cfg: SystemConfig,
):
    """Insert the current frame as a keyframe with full data association.

    Reproduces LocalMapper::addNewKF/findCorrespd (src/LocalMapper.cpp:51-170):
    (a) inherit map points tracked from the reference KF, (b) mint new map
    points from this window's triangulations, (c) projection-match the rest
    of the map into the new KF, then covisibility + odometry-chain updates.

    match_idx: (N,) ref-feature → current-feature match (-1 none).
    local_mps: (N,) ref-camera-frame triangulated positions (mLocalMPs).
    Returns (new MapState, new KF slot index).
    """
    K, M, N = ms.K, ms.M, ms.N
    dtype = ms.kf_pose.dtype
    k = ms.n_kf
    ms_in = ms
    Tcb = jnp.asarray(cfg.Tcb_mat, dtype)
    k = jnp.minimum(k, K - 1)  # clamp writes while the guard below decides

    ms = _write_kf_record(ms, k, feats, pose, odom)

    ref_pose = ms.kf_pose[ref_kf]
    Tcw_new = kf_Tcw(pose, Tcb)
    Tcw_ref = kf_Tcw(ref_pose, Tcb)
    Twc_ref = se3.inv(Tcw_ref)
    cam_center_new = se3.inv(Tcw_new)[:3, 3]
    cam_center_ref = Twc_ref[:3, 3]

    j = jnp.clip(match_idx, 0)              # current-frame feature per ref feature
    m_ref = ms.kf_obs_mp[ref_kf]            # MP per ref feature (-1 none)

    # ---- (a) inherit tracked MPs (src/LocalMapper.cpp:94-115) ----
    inherit = (
        (match_idx >= 0) & (m_ref >= 0) & ms.mp_valid[jnp.clip(m_ref, 0)]
    )
    # inh_ok ⊆ inherit: appends dropped by a full fan-in list must not
    # leave a forward pointer in the new KF's row
    ms, inh_ok = _append_obs(ms, m_ref, k, j, inherit)

    # (parallax promotion of inherited no-parallax points happens in the
    #  updateParallax block below, AFTER all of this KF's observations
    #  are known — with a position re-triangulation, not a bare flag
    #  flip, matching MapPoint::updateParallax)

    # ---- (b) mint new MPs from triangulations (src/LocalMapper.cpp:148-166) --
    mint = (match_idx >= 0) & (m_ref < 0) & local_mp_valid & feats.valid[j]

    pos_w = se3.apply(Twc_ref, local_mps)
    view_dir = pos_w - cam_center_ref
    dist = jnp.linalg.norm(view_dir, axis=-1)
    normal = view_dir / jnp.maximum(dist, 1e-12)[..., None]
    ref_octave = ms.kf_octave[ref_kf]
    min_d, max_d = _octave_dist_gates(
        ref_octave, dist, cfg.scale_factor, cfg.max_level
    )

    rank = jnp.cumsum(mint.astype(jnp.int32)) - 1
    slot = ms.n_mp + rank
    ok = mint & (slot < M)
    srow = jnp.where(ok, slot, M)           # drop overflow

    ms = ms._replace(
        mp_pos=ms.mp_pos.at[srow].set(pos_w, mode="drop"),
        mp_valid=ms.mp_valid.at[srow].set(True, mode="drop"),
        mp_good_prl=ms.mp_good_prl.at[srow].set(good_prl, mode="drop"),
        mp_desc=ms.mp_desc.at[srow].set(feats.desc_pm1[j], mode="drop"),
        # bit votes start from the ref-KF observation; the blanket vote
        # update below adds the current frame's descriptor
        mp_desc_votes=ms.mp_desc_votes.at[srow].set(
            ms.kf_desc[ref_kf].astype(jnp.int16), mode="drop"
        ),
        mp_normal=ms.mp_normal.at[srow].set(normal, mode="drop"),
        mp_main_kf=ms.mp_main_kf.at[srow].set(ref_kf, mode="drop"),
        mp_main_feat=ms.mp_main_feat.at[srow].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop"
        ),
        mp_main_octave=ms.mp_main_octave.at[srow].set(ref_octave, mode="drop"),
        mp_min_dist=ms.mp_min_dist.at[srow].set(min_d, mode="drop"),
        mp_max_dist=ms.mp_max_dist.at[srow].set(max_d, mode="drop"),
        n_mp=ms.n_mp + jnp.sum(ok.astype(jnp.int32)),
    )
    # observations in both KFs (fresh points: fan-in 0 → always lands)
    ms, _ = _append_obs(ms, srow, ref_kf, jnp.arange(N, dtype=jnp.int32), ok)
    ms, _ = _append_obs(ms, srow, k, j, ok)
    # wire feature → MP in the ref-KF row; back-fill its camera-frame view
    # estimate + anisotropic info (the reference's mViewMPs/mViewMPsInfo
    # back-fill, src/MapPoint.cpp:150-170)
    info_ref_mint, _ = factors.se3_to_xyz_info(
        local_mps, Tcw_ref, Tcw_new, cfg.fx
    )
    ms = ms._replace(
        kf_obs_mp=ms.kf_obs_mp.at[ref_kf].set(
            jnp.where(ok, slot, ms.kf_obs_mp[ref_kf])
        ),
        kf_view_mp=ms.kf_view_mp.at[ref_kf].set(
            jnp.where(ok[:, None], local_mps, ms.kf_view_mp[ref_kf])
        ),
        kf_view_info=ms.kf_view_info.at[ref_kf].set(
            jnp.where(
                ok[:, None, None], info_ref_mint, ms.kf_view_info[ref_kf]
            )
        ),
    )
    # new-KF observation row: per current feature, MP from inherit or mint
    inh_row = jnp.full((N,), -1, jnp.int32).at[jnp.where(inh_ok, j, N)].set(
        jnp.where(inh_ok, m_ref, -1), mode="drop"
    )
    mint_row = jnp.full((N,), -1, jnp.int32).at[jnp.where(ok, j, N)].set(
        jnp.where(ok, slot, -1), mode="drop"
    )
    obs_row = jnp.where(mint_row >= 0, mint_row, inh_row)

    # ---- (c) projection-match local map into the new KF
    #      (MatchByProjection + acceptNewObserve, src/LocalMapper.cpp:117-147,
    #       src/MapPoint.cpp:202-209) ----
    already = jnp.zeros((M,), bool).at[
        jnp.where(obs_row >= 0, obs_row, M)
    ].set(True, mode="drop")
    lc = se3.apply(Tcw_new, ms.mp_pos)           # (M, 3) camera frame
    z = lc[..., 2]
    u = cfg.fx * lc[..., 0] / jnp.where(z == 0, 1.0, z) + cfg.cx
    v = cfg.fy * lc[..., 1] / jnp.where(z == 0, 1.0, z) + cfg.cy
    mp_dist = jnp.linalg.norm(ms.mp_pos - cam_center_new, axis=-1)
    vdir = (ms.mp_pos - cam_center_new) / jnp.maximum(mp_dist, 1e-12)[..., None]
    cos_view = jnp.sum(vdir * ms.mp_normal, -1)
    cand = (
        ms.mp_valid
        & ms.mp_good_prl        # no-parallax MPs have unreliable depth
        #                         (reference skips !isGoodPrl(),
        #                          src/ORBmatcher.cpp:392-394)
        & ~already
        & (z > 0)
        & (u >= 0) & (u < cfg.width) & (v >= 0) & (v < cfg.height)
        & (mp_dist >= 0.8 * ms.mp_min_dist)
        & (mp_dist <= 1.2 * ms.mp_max_dist)
        & (cos_view > jnp.cos(jnp.deg2rad(30.0)))
    )
    feat_free = feats.valid & (obs_row < 0)
    proj_match, _n_proj = match_by_projection(
        feats,
        jnp.stack([u, v], -1),
        ms.mp_main_octave,
        ms.mp_desc,
        cand,
        feat_free,
        level_offset=2,         # findCorrespd passes 2 (src/LocalMapper.cpp:118)
    )
    proj_ok = proj_match >= 0
    # fresh-triangulation acceptance gate (findCorrespd stage b,
    # src/LocalMapper.cpp:119-141): triangulate (main-KF measure,
    # new-KF keypoint) with the CURRENT pose estimates and accept only
    # if the result passes depth gates in both frames and lands inside
    # the point's octave distance band (MapPoint::acceptNewObserve,
    # src/MapPoint.cpp:202-209). Gating on the fresh geometry — not the
    # stored (possibly drifted) position — is what keeps a revisit from
    # stitching wrong constraints into the local BA.
    Kmat = jnp.asarray(
        [[cfg.fx, 0.0, cfg.cx], [0.0, cfg.fy, cfg.cy], [0.0, 0.0, 1.0]],
        dtype,
    )
    mm = jnp.clip(proj_match, 0)
    main_kf_b = jnp.clip(ms.mp_main_kf[mm], 0)
    main_ft_b = jnp.clip(ms.mp_main_feat[mm], 0)
    pt_main = ms.kf_xy[main_kf_b, main_ft_b]
    Tcw_main = jax.vmap(lambda p: kf_Tcw(p, Tcb))(ms.kf_pose[main_kf_b])
    x3d = triangulate(
        pt_main, feats.xy, Kmat @ Tcw_main[:, :3, :],
        (Kmat @ Tcw_new[:3, :])[None],
    )
    pos_new_c = se3.apply(Tcw_new, x3d)
    pos_main_c = se3.apply(Tcw_main, x3d)
    dist_new = jnp.linalg.norm(pos_new_c, axis=-1)
    tri_ok = (
        cfg.accept_depth(pos_new_c[..., 2])
        & cfg.accept_depth(pos_main_c[..., 2])
        & (dist_new >= ms.mp_min_dist[mm])
        & (dist_new <= ms.mp_max_dist[mm])
    )
    proj_ok = proj_ok & tri_ok
    ms, proj_ok = _append_obs(
        ms, proj_match, k, jnp.arange(N, dtype=jnp.int32), proj_ok
    )
    obs_row = jnp.where(proj_ok, proj_match, obs_row)

    # ---- updateParallax: re-triangulate not-yet-good-parallax points
    #      from their oldest recent observer using the CURRENT pose
    #      estimates; on ≥2° parallax REPLACE the position, promote, and
    #      back-fill every observer's view estimate
    #      (MapPoint::updateParallax, src/MapPoint.cpp:124-185 — runs on
    #      each addObservation once a point has >2 observations).
    #      A bare flag flip without the re-triangulation — what this
    #      block replaces — promotes tiny-baseline odometry-frame
    #      positions (meter-scale errors) straight into the BA, which
    #      then drags the pose chain (artifacts/drift_study_r5). ----
    m_act = jnp.clip(obs_row, 0)
    act = (
        (obs_row >= 0)
        & ms.mp_valid[m_act]
        & ~ms.mp_good_prl[m_act]
        & (ms.mp_n_obs[m_act] > 2)
    )
    obs_k_act = ms.mp_obs_kf[m_act]        # (N, P) observers per feature
    obs_f_act = ms.mp_obs_feat[m_act]
    recent = (obs_k_act >= 0) & (k - obs_k_act <= 6) & (obs_k_act != k)
    kf0 = jnp.min(jnp.where(recent, obs_k_act, K), axis=1)
    has0 = kf0 < K
    sel0 = recent & (obs_k_act == kf0[:, None])
    f0 = jnp.max(jnp.where(sel0, obs_f_act, -1), axis=1)
    kf0c = jnp.clip(kf0, 0, K - 1)
    pt0 = ms.kf_xy[kf0c, jnp.clip(f0, 0)]
    Tcw0 = jax.vmap(lambda p: kf_Tcw(p, Tcb))(ms.kf_pose[kf0c])
    posW = triangulate(
        pt0, feats.xy, Kmat @ Tcw0[:, :3, :],
        (Kmat @ Tcw_new[:3, :])[None],
    )
    pos0_c = se3.apply(Tcw0, posW)
    pos1_c = se3.apply(Tcw_new, posW)
    center0 = se3.inv(Tcw0)[:, :3, 3]
    prom = (
        act
        & has0
        & cfg.accept_depth(pos0_c[..., 2])
        & cfg.accept_depth(pos1_c[..., 2])
        & check_parallax(center0, cam_center_new, posW, 2)
    )
    rows_p = jnp.where(prom, m_act, M)
    ms = ms._replace(
        mp_pos=ms.mp_pos.at[rows_p].set(posW, mode="drop"),
        mp_good_prl=ms.mp_good_prl.at[rows_p].set(True, mode="drop"),
    )
    # observer view back-fill: the (pos0, Tcw0, Tcw_new) anisotropic
    # info rotated world-wise, then into each observer's camera frame
    # (src/MapPoint.cpp:158-177)
    info0, _info1 = factors.se3_to_xyz_info(pos0_c, Tcw0, Tcw_new, cfg.fx)
    R0 = Tcw0[:, :3, :3]
    infoW = jnp.einsum("nji,njm,nml->nil", R0, info0, R0)
    Tcw_all = jax.vmap(lambda p: kf_Tcw(p, Tcb))(ms.kf_pose)
    sel_obs = prom[:, None] & (obs_k_act >= 0)
    T_obs = Tcw_all[jnp.clip(obs_k_act, 0)]               # (N, P, 4, 4)
    view_obs = se3.apply(T_obs, posW[:, None, :])
    Rk_obs = T_obs[..., :3, :3]
    info_obs = jnp.einsum("npij,njm,nplm->npil", Rk_obs, infoW, Rk_obs)
    rk = jnp.where(sel_obs, obs_k_act, K)
    rf = jnp.clip(obs_f_act, 0)
    ms = ms._replace(
        kf_view_mp=ms.kf_view_mp.at[rk, rf].set(view_obs, mode="drop"),
        kf_view_info=ms.kf_view_info.at[rk, rf].set(info_obs, mode="drop"),
    )

    # ---- finalize the new KF's observation row + view estimates ----
    has_obs = obs_row >= 0
    mp_here = ms.mp_pos[jnp.clip(obs_row, 0)]
    view_c = se3.apply(Tcw_new, mp_here)
    info_new, _ = factors.se3_to_xyz_info(view_c, Tcw_new, Tcw_ref, cfg.fx)
    ms = ms._replace(
        kf_obs_mp=ms.kf_obs_mp.at[k].set(obs_row),
        kf_view_mp=ms.kf_view_mp.at[k].set(
            jnp.where(has_obs[:, None], view_c, 0.0)
        ),
        kf_view_info=ms.kf_view_info.at[k].set(
            jnp.where(has_obs[:, None, None], info_new, 0.0)
        ),
    )

    # ---- incremental map-point maintenance for every observation this
    #      KF adds: bit votes → majority descriptor, running-mean viewing
    #      normal (MapPoint::addObservation + updateMainKFandDescriptor,
    #      src/MapPoint.cpp:104-122, 228-292) ----
    vote_rows = jnp.where(has_obs, obs_row, M)
    votes = ms.mp_desc_votes.at[vote_rows].add(
        feats.desc_pm1.astype(jnp.int16), mode="drop"
    )
    touched = jnp.zeros((M,), bool).at[vote_rows].set(True, mode="drop")
    majority = jnp.where(votes >= 0, 1, -1).astype(jnp.int8)
    new_desc = jnp.where(touched[:, None], majority, ms.mp_desc)

    obs_dir = ms.mp_pos[jnp.clip(obs_row, 0)] - cam_center_new
    obs_dir = obs_dir / jnp.maximum(
        jnp.linalg.norm(obs_dir, axis=-1, keepdims=True), 1e-12
    )
    w_old = jnp.maximum(
        ms.mp_n_obs[jnp.clip(obs_row, 0)].astype(dtype) - 1.0, 1.0
    )
    blended = (
        ms.mp_normal[jnp.clip(obs_row, 0)] * w_old[:, None] + obs_dir
    )
    blended = blended / jnp.maximum(
        jnp.linalg.norm(blended, axis=-1, keepdims=True), 1e-12
    )
    new_normal = ms.mp_normal.at[vote_rows].set(blended, mode="drop")
    ms = ms._replace(
        mp_desc_votes=votes, mp_desc=new_desc, mp_normal=new_normal
    )

    # ---- covisibility (>30% shared MPs, Map::updateCovisibility,
    #      src/Map.cpp:785-799) ----
    seen_new = jnp.zeros((M,), bool).at[
        jnp.where(has_obs, obs_row, M)
    ].set(True, mode="drop")
    obs_all = ms.kf_obs_mp                         # (K, N)
    # per-KF count of forward entries at seen_new MPs, via the INVERSE
    # lists (a (K,N) gather from (M,) costs ~0.7 ms on TPU; this
    # (M·P,)-entry scatter-count is ~free, and equal by the table
    # consistency invariant — each (kf, feat) slot appears once)
    cnt_sel = (ms.mp_obs_kf >= 0) & seen_new[:, None]
    shared = jnp.zeros((K,), jnp.int32).at[
        jnp.where(cnt_sel, ms.mp_obs_kf, K).reshape(-1)
    ].add(1, mode="drop")                          # (K,)
    count_other = jnp.sum(obs_all >= 0, axis=1)
    count_new = jnp.sum(has_obs.astype(jnp.int32))
    ratio = shared.astype(dtype) / jnp.maximum(
        jnp.minimum(count_other, count_new), 1
    ).astype(dtype)
    covis_new = (
        (ratio > 0.3) & ms.kf_valid & (jnp.arange(K) != k) & (shared > 0)
    )
    ms = ms._replace(
        covis=ms.covis.at[k].set(covis_new).at[:, k].set(covis_new)
    )

    # ---- odometry chain with preintegration (KeyFrame::preOdomFromSelf,
    #      src/LocalMapper.cpp:70-76) ----
    ms = ms._replace(
        kf_pre_next=ms.kf_pre_next.at[ref_kf].set(k),
        kf_pre_meas=ms.kf_pre_meas.at[ref_kf].set(pre_meas),
        kf_pre_cov=ms.kf_pre_cov.at[ref_kf].set(pre_cov),
    )

    # ---- cull MPs with no parallax after 6 KFs
    #      (MapPoint::updateParallax kill rule, src/MapPoint.cpp:181-184) ----
    stale = (
        ms.mp_valid
        & ~ms.mp_good_prl
        & (k - ms.mp_main_kf > 6)
    )
    # unlink culled MPs from every keyframe's forward table so the
    # feature slots can mint replacements (MapPoint::setNull semantics)
    fw_stale = _fw_mask_from_inverse(
        K, N, ms.mp_obs_kf, ms.mp_obs_feat, stale
    )
    ms = ms._replace(
        mp_valid=ms.mp_valid & ~stale,
        kf_obs_mp=jnp.where(fw_stale, -1, ms.kf_obs_mp),
    )
    ms = ms._replace(n_kf=ms.n_kf + 1)

    # capacity guard: a full KF bank drops the insertion atomically rather
    # than silently corrupting slot reads (callers should prune/checkpoint
    # before this triggers)
    full = ms_in.n_kf >= K
    ms = jax.tree.map(
        lambda new, old: jnp.where(full, old, new), ms, ms_in
    )
    return ms, jnp.where(full, -1, k)


# ---------------------------------------------------------------------------
# Keyframe pruning
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def prune_redundant_kf(ms: MapState, cur_kf, protect=-1,
                       cfg: SystemConfig | None = None,
                       min_ratio=0.8):
    """Remove at most one redundant keyframe per call
    (Map::pruneRedundantKF, src/Map.cpp:146-283; the reference loops ≤5
    rounds, the system shell does the same).

    A KF is redundant when ≥``min_ratio`` (default 80%, src/Map.cpp:206)
    of its observed map points are seen by at least 2 other keyframes.
    The pruned KF's two odometry edges are spliced into one composed
    preintegration; its observations are removed from every map point's
    list. ``min_ratio`` may be lowered under capacity pressure (the
    system shell's forced-prune response).

    When ``cfg`` is given, map points anchored on the pruned KF also get
    their scale statistics (mp_main_octave, mp_min/max_dist) recomputed
    from the new main observation, so projection-matching distance/level
    gates don't keep the dead anchor's values
    (MapPoint::updateMainKFandDescriptor, src/MapPoint.cpp:276-289).
    """
    K, M, N = ms.K, ms.M, ms.N
    P = ms.mp_obs_kf.shape[1]

    # per-KF redundancy score: count of observations whose MP has ≥3
    # total observers (≥2 others + itself). Counted from the INVERSE
    # lists — equal to the forward-table count by the consistency
    # invariant, and the (M·P,)-entry scatter-count is ~free where the
    # (K,N)-from-(M,) gather costs ~0.7 ms on TPU (round-3 microbench)
    obs = ms.kf_obs_mp                               # (K, N)
    has = obs >= 0
    n_mp_kf = jnp.sum(has, axis=1)
    # the mp_valid mask is REQUIRED for forward/inverse equivalence:
    # culling (add_keyframe's parallax kill, merge_loop_mps) invalidates
    # a point and clears its FORWARD pointers but leaves the inverse row
    # stale — without the mask those stale entries inflate well_count
    # (ratio can exceed 1) and over-prune
    ws_sel = (
        (ms.mp_obs_kf >= 0)
        & (ms.mp_valid & (ms.mp_n_obs >= 3))[:, None]
    )
    well_count = jnp.zeros((K,), jnp.int32).at[
        jnp.where(ws_sel, ms.mp_obs_kf, K).reshape(-1)
    ].add(1, mode="drop")
    ratio = well_count / jnp.maximum(n_mp_kf, 1)

    # must be interior to the odometry chain and not the current/first KF
    has_next = ms.kf_pre_next >= 0
    prev_of = jnp.full((K,), -1, jnp.int32).at[
        jnp.clip(ms.kf_pre_next, 0)
    ].set(jnp.where(has_next, jnp.arange(K, dtype=jnp.int32), -1),
          mode="drop")
    # endpoints of verified loop/feature constraints are not redundancy-
    # prunable (reference parity: pruneRedundantKF skips KFs with feature
    # edges, `!bHasFeatEdge`, src/Map.cpp:205-208) — unlike odometry
    # edges (spliced via composed preintegration below), a ftr edge has
    # no re-targeting machinery. The capacity escape hatch (min_ratio <=
    # 0) OVERRIDES the protection: when the bank is full, sacrificing a
    # loop constraint beats refusing to map — the ftr_valid clearing
    # below drops the orphaned edge (its only live path).
    ftr_endpoint = (
        jnp.zeros((K,), bool)
        .at[jnp.where(ms.ftr_valid, ms.ftr_i, K)].set(True, mode="drop")
        .at[jnp.where(ms.ftr_valid, ms.ftr_j, K)].set(True, mode="drop")
    )
    candidate = (
        ms.kf_valid
        & (ratio >= min_ratio)
        # min_ratio <= 0 is the marginalize-oldest escape hatch (capacity
        # pressure): ANY interior chain KF qualifies, observations or not
        & ((n_mp_kf > 0) | (min_ratio <= 0.0))
        & has_next
        & (prev_of >= 0)
        & (~ftr_endpoint | (min_ratio <= 0.0))
        # reference protects the first TWO keyframes (`thisKF->mIdKF <=
        # 1`, src/Map.cpp:171) — KF1 is interior to the chain once KF2
        # exists but anchors the gauge region. Slot index == insertion
        # id until a capacity compaction (which the reference never
        # does); the capacity escape hatch overrides, as for ftr edges
        & ((jnp.arange(K) > 1) | (min_ratio <= 0.0))
        & (jnp.arange(K) != cur_kf)
        & (jnp.arange(K) != protect)   # e.g. the live tracking reference
    )
    any_cand = jnp.any(candidate)
    # lowest-id candidate (reference scans in id order, src/Map.cpp:151)
    kid = jnp.argmax(
        jnp.where(candidate, jnp.arange(K, 0, -1), 0)
    )
    kid_c = jnp.where(any_cand, kid, 0)

    prev = jnp.clip(prev_of[kid_c], 0)
    nxt = jnp.clip(ms.kf_pre_next[kid_c], 0)

    # splice the odometry chain with composed preintegration
    new_meas, new_cov = factors.compose_preintegration(
        ms.kf_pre_meas[prev], ms.kf_pre_cov[prev],
        ms.kf_pre_meas[kid_c], ms.kf_pre_cov[kid_c],
    )
    pre_next = ms.kf_pre_next.at[prev].set(nxt)
    pre_meas = ms.kf_pre_meas.at[prev].set(new_meas)
    pre_cov = ms.kf_pre_cov.at[prev].set(new_cov)
    pre_next = pre_next.at[kid_c].set(-1)

    # remove the KF's observations from MP lists: compact each list with
    # entries of kid pushed out (stable within the fixed fan-in P)
    hit = ms.mp_obs_kf == kid_c                       # (M, P)
    keep = (~hit) & (ms.mp_obs_kf >= 0)
    order = jnp.argsort(
        jnp.where(keep, 0, 1)
        * P + jax.lax.broadcasted_iota(jnp.int32, (M, P), 1), axis=1
    )
    take = jnp.take_along_axis
    obs_kf_new = jnp.where(keep, ms.mp_obs_kf, -1)
    obs_kf_new = take(obs_kf_new, order, axis=1)
    obs_ft_new = jnp.where(keep, ms.mp_obs_feat, -1)
    obs_ft_new = take(obs_ft_new, order, axis=1)
    n_obs_new = jnp.sum(obs_kf_new >= 0, axis=1).astype(jnp.int32)

    # main-KF reassignment for MPs anchored at the pruned KF: the first
    # remaining observer becomes main (MapPoint::setNull analog)
    was_main = ms.mp_main_kf == kid_c
    new_main_kf = jnp.where(was_main, obs_kf_new[:, 0], ms.mp_main_kf)
    new_main_ft = jnp.where(was_main, obs_ft_new[:, 0], ms.mp_main_feat)
    alive = n_obs_new >= 2

    # refresh the re-anchored points' scale statistics from the new main
    # observation (stale gates would mis-gate projection matching)
    main_oct_new = ms.mp_main_octave
    min_d_new, max_d_new = ms.mp_min_dist, ms.mp_max_dist
    if cfg is not None:
        mk = jnp.clip(new_main_kf, 0)
        mf = jnp.clip(new_main_ft, 0)
        oct_at_new = ms.kf_octave[mk, mf]
        Tcb = jnp.asarray(cfg.Tcb_mat, ms.kf_pose.dtype)
        centers = jax.vmap(
            lambda p: se3.inv(kf_Tcw(p, Tcb))[:3, 3]
        )(ms.kf_pose)                                   # (K, 3)
        dist = jnp.linalg.norm(ms.mp_pos - centers[mk], axis=-1)
        md, xd = _octave_dist_gates(
            oct_at_new, dist, cfg.scale_factor, cfg.max_level
        )
        refresh = was_main & (new_main_kf >= 0) & (new_main_ft >= 0)
        main_oct_new = jnp.where(refresh, oct_at_new, main_oct_new)
        min_d_new = jnp.where(refresh, md, min_d_new)
        max_d_new = jnp.where(refresh, xd, max_d_new)

    # clear surviving keyframes' forward pointers at dead MPs
    # (the reference's MapPoint::setNull unlinks bidirectionally,
    # src/MapPoint.cpp; without this the dead slot blocks re-minting).
    # A dead MP's remaining forward entries are exactly its compacted
    # inverse list (the pruned KF's entry is already out of it, and that
    # row is wiped below) — scatter those instead of gathering (K,N)
    mp_valid_new = ms.mp_valid & alive
    newly_dead = ms.mp_valid & ~alive
    dead_fw = _fw_mask_from_inverse(
        K, N, obs_kf_new, obs_ft_new, newly_dead
    )
    kf_obs_clean = jnp.where(dead_fw, -1, ms.kf_obs_mp)

    pruned = MapState(
        kf_pose=ms.kf_pose,
        kf_odom=ms.kf_odom,
        kf_valid=ms.kf_valid.at[kid_c].set(False),
        kf_xy=ms.kf_xy,
        kf_octave=ms.kf_octave,
        kf_angle=ms.kf_angle,
        kf_feat_valid=ms.kf_feat_valid.at[kid_c].set(False),
        kf_desc=ms.kf_desc,
        kf_obs_mp=kf_obs_clean.at[kid_c].set(
            jnp.full((N,), -1, jnp.int32)
        ),
        kf_view_mp=ms.kf_view_mp,
        kf_view_info=ms.kf_view_info,
        kf_pre_next=pre_next,
        kf_pre_meas=pre_meas,
        kf_pre_cov=pre_cov,
        covis=ms.covis.at[kid_c].set(False).at[:, kid_c].set(False),
        ftr_i=ms.ftr_i,
        ftr_j=ms.ftr_j,
        ftr_meas=ms.ftr_meas,
        ftr_info=ms.ftr_info,
        # reachable only via the capacity escape hatch (min_ratio <= 0):
        # redundancy pruning never selects a ftr endpoint, but a
        # capacity-forced prune drops the orphaned edge here
        ftr_valid=ms.ftr_valid
        & (ms.ftr_i != kid_c)
        & (ms.ftr_j != kid_c),
        mp_pos=ms.mp_pos,
        mp_valid=mp_valid_new,
        mp_good_prl=ms.mp_good_prl,
        mp_desc=ms.mp_desc,
        mp_desc_votes=ms.mp_desc_votes,
        mp_normal=ms.mp_normal,
        mp_main_kf=new_main_kf,
        mp_main_feat=new_main_ft,
        mp_main_octave=main_oct_new,
        mp_min_dist=min_d_new,
        mp_max_dist=max_d_new,
        mp_obs_kf=obs_kf_new,
        mp_obs_feat=obs_ft_new,
        mp_n_obs=n_obs_new,
        n_kf=ms.n_kf,
        n_mp=ms.n_mp,
    )
    out = jax.tree.map(
        lambda a, b: jnp.where(any_cand, a, b), pruned, ms
    )
    return out, jnp.where(any_cand, kid_c, -1)


@jax.jit
def recompute_covis(ms: MapState) -> MapState:
    """Rebuild the WHOLE covisibility matrix from the inverse observation
    tables (>30% shared map points, the add_keyframe criterion applied
    pairwise). Insertion maintains covisibility incrementally; this full
    recompute is for operations that rewire observations wholesale —
    cross-map merging, where fused landmarks create seam covisibility no
    insertion ever recorded. shared = OᵀO over the (M, K) observer
    one-hot — one matmul, no per-pair loop.

    Counts come from the INVERSE observation table, whose fan-in is
    bounded (Capacity.max_obs_per_mp): a point seen by more keyframes
    than that undercounts here, making the ratio denominator slightly
    small and the rebuilt graph marginally over-inclusive vs the
    insertion-time forward-table counts — benign for a BFS seed graph."""
    K, M = ms.K, ms.M
    dtype = ms.kf_pose.dtype
    obs_ok = (ms.mp_obs_kf >= 0) & ms.mp_valid[:, None]
    # (M, K) observer one-hot via scatter (bounded fan-in P)
    O = jnp.zeros((M, K), dtype).at[
        jnp.arange(M)[:, None], jnp.clip(ms.mp_obs_kf, 0)
    ].add(obs_ok.astype(dtype), mode="drop")
    O = jnp.minimum(O, 1.0)
    shared = jax.lax.dot_general(
        O, O, (((0,), (0,)), ((), ()))
    )                                               # (K, K)
    counts = jnp.diagonal(shared)
    min_c = jnp.minimum(counts[:, None], counts[None, :])
    ratio = shared / jnp.maximum(min_c, 1.0)
    covis = (
        (ratio > 0.3) & (shared > 0)
        & ms.kf_valid[:, None] & ms.kf_valid[None, :]
        & ~jnp.eye(K, dtype=bool)
    )
    return ms._replace(covis=covis)


@jax.jit
def cull_weak_mps(ms: MapState, n_keep, protect_kf):
    """Invalidate the weakest valid map points until ≤ ``n_keep`` live —
    the map-point side of the capacity-pressure response (the KF side is
    the system shell's forced prune; the reference never frees memory,
    src/Map.cpp:146-283 is the machinery this extends).

    Weakness order: fewest observers first, bad-parallax before good
    (the reference's own cull criterion, MapPoint::updateParallax kills
    no-parallax points, src/MapPoint.cpp:181-184), oldest slot first
    among ties (slot indices are insertion-ordered, so long-unpromoted
    points go before freshly minted ones). Points observed by
    ``protect_kf`` (the live tracking reference) are never culled —
    inherit-based association reads its observation row next insert.

    Clears both observation tables for culled points (the forward/
    inverse consistency invariant, tests/test_prune.check_consistency).
    Returns (MapState, n_culled).
    """
    M = ms.M
    f32 = jnp.float32
    obs_by_ref = jnp.zeros((M,), bool).at[
        jnp.where(ms.kf_obs_mp[protect_kf] >= 0,
                  jnp.clip(ms.kf_obs_mp[protect_kf], 0), M)
    ].set(True, mode="drop")
    score = (
        ms.mp_n_obs.astype(f32)
        + 16.0 * ms.mp_good_prl.astype(f32)
        + 1e6 * obs_by_ref.astype(f32)
    )
    score = jnp.where(ms.mp_valid, score, jnp.inf)
    n_valid = jnp.sum(ms.mp_valid.astype(jnp.int32))
    n_cull = jnp.maximum(n_valid - jnp.asarray(n_keep, jnp.int32), 0)
    order = jnp.argsort(score, stable=True)          # weakest first
    cull = jnp.zeros((M,), bool).at[order].set(
        jnp.arange(M) < n_cull
    )
    cull = cull & ms.mp_valid & ~obs_by_ref
    kf_obs = jnp.where(
        (ms.kf_obs_mp >= 0) & cull[jnp.clip(ms.kf_obs_mp, 0)],
        -1, ms.kf_obs_mp,
    )
    mp_obs_kf = jnp.where(cull[:, None], -1, ms.mp_obs_kf)
    mp_obs_ft = jnp.where(cull[:, None], -1, ms.mp_obs_feat)
    return ms._replace(
        mp_valid=ms.mp_valid & ~cull,
        kf_obs_mp=kf_obs,
        mp_obs_kf=mp_obs_kf,
        mp_obs_feat=mp_obs_ft,
        mp_n_obs=jnp.where(cull, 0, ms.mp_n_obs),
    ), jnp.sum(cull.astype(jnp.int32))


@jax.jit
def compact_mps(ms: MapState):
    """Renumber ONLY the map-point slots (keyframes untouched).

    Unlike full compact_map, no host-side structure ever holds MP slot
    ids (anchors, the tracking reference, and the BoW bank are all
    KF-indexed), so an MP-only compaction is a pure device op: no host
    remap, no bank rebuild, no sync — the cheap half of the MP-pressure
    response. Returns the compacted MapState."""
    M = ms.M
    i32 = jnp.int32
    mp_new = jnp.where(
        ms.mp_valid, jnp.cumsum(ms.mp_valid) - 1, -1
    ).astype(i32)
    n_mp_new = jnp.sum(ms.mp_valid).astype(i32)
    mp_old = jnp.full((M,), 0, i32).at[
        jnp.where(ms.mp_valid, mp_new, M)
    ].set(jnp.arange(M, dtype=i32), mode="drop")
    mp_live = jnp.arange(M) < n_mp_new

    def remap_mp_ref(x):
        return jnp.where(x >= 0, mp_new[jnp.clip(x, 0)], -1)

    def gather_mp(x, dead_fill=0):
        g = x[mp_old]
        fill = jnp.asarray(dead_fill, x.dtype)
        mask_shape = (M,) + (1,) * (x.ndim - 1)
        return jnp.where(mp_live.reshape(mask_shape), g, fill)

    out = ms._replace(
        kf_obs_mp=remap_mp_ref(ms.kf_obs_mp),
        mp_pos=gather_mp(ms.mp_pos),
        mp_valid=mp_live,
        mp_good_prl=gather_mp(ms.mp_good_prl, False),
        mp_desc=gather_mp(ms.mp_desc),
        mp_desc_votes=gather_mp(ms.mp_desc_votes),
        mp_normal=gather_mp(ms.mp_normal),
        mp_main_kf=gather_mp(ms.mp_main_kf, -1),
        mp_main_feat=gather_mp(ms.mp_main_feat, -1),
        mp_main_octave=gather_mp(ms.mp_main_octave),
        mp_min_dist=gather_mp(ms.mp_min_dist),
        mp_max_dist=gather_mp(ms.mp_max_dist, jnp.inf),
        mp_obs_kf=gather_mp(ms.mp_obs_kf, -1),
        mp_obs_feat=gather_mp(ms.mp_obs_feat, -1),
        mp_n_obs=gather_mp(ms.mp_n_obs),
        n_mp=n_mp_new,
    )
    obs_ok = out.mp_obs_kf >= 0
    return out._replace(
        mp_obs_feat=jnp.where(obs_ok, out.mp_obs_feat, -1),
        mp_n_obs=jnp.sum(obs_ok, axis=1).astype(jnp.int32),
    )


@jax.jit
def relieve_mp_pressure(ms: MapState, target, protect_kf):
    """Fused MP-pressure response: force-cull the weakest landmarks to
    ≤ ``target`` live (a no-op when holes alone suffice — n_cull clamps
    to 0) and compact MP slots so the freed tail is mintable again. One
    device dispatch, zero host syncs. Returns (MapState, n_culled)."""
    ms, n_culled = cull_weak_mps(ms, target, protect_kf)
    return compact_mps(ms), n_culled


@jax.jit
def compact_map(ms: MapState):
    """Renumber keyframe and map-point slots so all valid entries are
    contiguous from 0, freeing the tail for new insertions.

    Slots are allocated monotonically (n_kf/n_mp never decrease), so
    pruning and culling leave permanent holes — without compaction the
    capacities are LIFETIME insert budgets, not live-size budgets. This
    is the live-map form of the reference's save-time renumbering
    (MapStorage::saveMap compacts ids, src/MapStorage.cpp:77-118), and
    the system shell's capacity-pressure response runs it after forced
    pruning.

    Returns (compacted MapState, kf_new_of_old (K,), mp_new_of_old (M,))
    — the permutations (-1 for dead slots) so hosts can remap any slot
    references they hold (tracking reference, trajectory anchors).
    """
    K, M, N = ms.K, ms.M, ms.N
    i32 = jnp.int32

    kf_new = jnp.where(
        ms.kf_valid, jnp.cumsum(ms.kf_valid) - 1, -1
    ).astype(i32)
    n_kf_new = jnp.sum(ms.kf_valid).astype(i32)
    kf_old = jnp.full((K,), 0, i32).at[
        jnp.where(ms.kf_valid, kf_new, K)
    ].set(jnp.arange(K, dtype=i32), mode="drop")
    kf_live = jnp.arange(K) < n_kf_new

    mp_new = jnp.where(
        ms.mp_valid, jnp.cumsum(ms.mp_valid) - 1, -1
    ).astype(i32)
    n_mp_new = jnp.sum(ms.mp_valid).astype(i32)
    mp_old = jnp.full((M,), 0, i32).at[
        jnp.where(ms.mp_valid, mp_new, M)
    ].set(jnp.arange(M, dtype=i32), mode="drop")
    mp_live = jnp.arange(M) < n_mp_new

    def remap_kf_ref(x):
        """Remap values that are KF slots (-1 stays -1; dead refs die)."""
        return jnp.where(x >= 0, kf_new[jnp.clip(x, 0)], -1)

    def remap_mp_ref(x):
        return jnp.where(x >= 0, mp_new[jnp.clip(x, 0)], -1)

    def gather_kf(x, dead_fill=0):
        g = x[kf_old]
        fill = jnp.asarray(dead_fill, x.dtype)
        mask_shape = (K,) + (1,) * (x.ndim - 1)
        return jnp.where(kf_live.reshape(mask_shape), g, fill)

    def gather_mp(x, dead_fill=0):
        g = x[mp_old]
        fill = jnp.asarray(dead_fill, x.dtype)
        mask_shape = (M,) + (1,) * (x.ndim - 1)
        return jnp.where(mp_live.reshape(mask_shape), g, fill)

    covis = ms.covis[kf_old][:, kf_old]
    covis = covis & kf_live[:, None] & kf_live[None, :]

    out = MapState(
        kf_pose=gather_kf(ms.kf_pose),
        kf_odom=gather_kf(ms.kf_odom),
        kf_valid=kf_live,
        kf_xy=gather_kf(ms.kf_xy),
        kf_octave=gather_kf(ms.kf_octave),
        kf_angle=gather_kf(ms.kf_angle),
        kf_feat_valid=gather_kf(ms.kf_feat_valid, False),
        kf_desc=gather_kf(ms.kf_desc),
        kf_obs_mp=remap_mp_ref(gather_kf(ms.kf_obs_mp, -1)),
        kf_view_mp=gather_kf(ms.kf_view_mp),
        kf_view_info=gather_kf(ms.kf_view_info),
        kf_pre_next=remap_kf_ref(gather_kf(ms.kf_pre_next, -1)),
        kf_pre_meas=gather_kf(ms.kf_pre_meas),
        kf_pre_cov=gather_kf(ms.kf_pre_cov),
        covis=covis,
        ftr_i=remap_kf_ref(jnp.where(ms.ftr_valid, ms.ftr_i, -1)),
        ftr_j=remap_kf_ref(jnp.where(ms.ftr_valid, ms.ftr_j, -1)),
        ftr_meas=ms.ftr_meas,
        ftr_info=ms.ftr_info,
        ftr_valid=(
            ms.ftr_valid
            & (remap_kf_ref(ms.ftr_i) >= 0)
            & (remap_kf_ref(ms.ftr_j) >= 0)
        ),
        mp_pos=gather_mp(ms.mp_pos),
        mp_valid=mp_live,
        mp_good_prl=gather_mp(ms.mp_good_prl, False),
        mp_desc=gather_mp(ms.mp_desc),
        mp_desc_votes=gather_mp(ms.mp_desc_votes),
        mp_normal=gather_mp(ms.mp_normal),
        mp_main_kf=remap_kf_ref(gather_mp(ms.mp_main_kf, -1)),
        mp_main_feat=gather_mp(ms.mp_main_feat, -1),
        mp_main_octave=gather_mp(ms.mp_main_octave),
        mp_min_dist=gather_mp(ms.mp_min_dist),
        mp_max_dist=gather_mp(ms.mp_max_dist, jnp.inf),
        mp_obs_kf=remap_kf_ref(gather_mp(ms.mp_obs_kf, -1)),
        mp_obs_feat=gather_mp(ms.mp_obs_feat, -1),
        mp_n_obs=gather_mp(ms.mp_n_obs),
        n_kf=n_kf_new,
        n_mp=n_mp_new,
    )
    # dead observation entries (KF side) must also clear the feat side
    obs_ok = out.mp_obs_kf >= 0
    out = out._replace(
        mp_obs_feat=jnp.where(obs_ok, out.mp_obs_feat, -1),
        mp_n_obs=jnp.sum(obs_ok, axis=1).astype(i32),
    )
    return out, kf_new, mp_new


# ---------------------------------------------------------------------------
# Local graph selection
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("hops",))
def local_graph_masks(ms: MapState, cur_kf, hops: int = 3):
    """Multi-hop covisibility BFS from the current KF
    (Map::updateLocalGraph, src/Map.cpp:285-331; ``hops`` matches the
    reference's ``searchLevel = 3``, src/Map.cpp:299-308 — each BFS
    round is one adjacency expansion of the local-KF set. Rounds 4-2
    change which KFs survive ``build_local_ba``'s newest-first window
    truncation only when the 2-hop set is smaller than
    ``cap.local_kfs``; r5 A/B on the 3-lap drift study measured 3 hops
    ≤ 2 hops on ATE, so parity costs nothing).

    Returns (local_kf_mask, ref_kf_mask, local_mp_mask):
    - local KFs: reachable within ``hops`` covisibility/odometry hops
    - local MPs: observed by any local KF
    - ref KFs: other observers of local MPs (the fixed frontier)
    """
    K = ms.K
    adj = ms.covis
    # odometry chain links keep the graph connected before covisibility forms
    nxt = ms.kf_pre_next
    has_nxt = nxt >= 0
    rows = jnp.arange(K)
    adj = adj.at[rows, jnp.clip(nxt, 0)].max(has_nxt)
    adj = adj.at[jnp.clip(nxt, 0), rows].max(has_nxt)

    v = jnp.zeros((K,), bool).at[cur_kf].set(True)
    for _ in range(hops):
        v = v | jnp.any(adj & v[None, :], axis=1)
    local_kfs = v & ms.kf_valid

    obs = ms.mp_obs_kf                              # (M, P)
    obs_ok = obs >= 0
    local_mps = (
        jnp.any(local_kfs[jnp.clip(obs, 0)] & obs_ok, axis=1) & ms.mp_valid
    )

    observer = jnp.zeros((K,), bool).at[jnp.clip(obs, 0)].max(
        local_mps[:, None] & obs_ok, mode="drop"
    )
    ref_kfs = observer & ~local_kfs & ms.kf_valid
    return local_kfs, ref_kfs, local_mps


# ---------------------------------------------------------------------------
# Local BA assembly + write-back
# ---------------------------------------------------------------------------

def obs_sigma_info(p_o, x_o, Tcw_o, octave_o, obs_valid, cfg, cam):
    """Per-observation 2x2 information from the plane-motion-marginalized
    measurement covariance (src/Map.cpp:1024-1049): pyramid-level pixel
    sigma plus the marginalized x-rotation/z-translation prior terms.
    Behind-camera or invalid observations get identity Sigma and are
    masked out of the returned validity."""
    dtype = p_o.dtype
    lc_o = jax.vmap(se3.apply)(Tcw_o, x_o)
    sigma2_uv = jnp.asarray(cfg.level_sigma2, dtype)[
        jnp.clip(octave_o, 0, cfg.max_level - 1)
    ]
    Sigma = jax.vmap(
        lambda pp, xx, ll, tt, ss: factors.se2xyz_sigma(
            pp, xx, ll, cam, tt, ss,
            # ONE sigma for both marginalized rotation directions: the
            # reference's own formula uses only PLANEMOTION_XROT_INFO
            # (src/Map.cpp:1043, `Sigma_rotxy = 1./XROT_INFO`) and never
            # reads YROT_INFO here — kept config-identical, not "fixed"
            1.0 / cfg.plane_motion_xrot_info,
            1.0 / cfg.plane_motion_z_info,
        )
    )(p_o, x_o, lc_o, Tcw_o, sigma2_uv)
    safe = obs_valid & (lc_o[..., 2] > 1e-3)
    Sigma = jnp.where(
        safe[:, None, None], Sigma, jnp.eye(2, dtype=dtype)[None]
    )
    return linalg.inv2x2(Sigma), safe


class LocalWindow(NamedTuple):
    prob: BAProblem
    win_kf: jnp.ndarray    # (W,) map KF slot per window slot (garbage if invalid)
    win_mp: jnp.ndarray    # (Mw,) map MP slot per window point slot
    kf_sel: jnp.ndarray    # (W,) bool
    mp_sel: jnp.ndarray    # (Mw,) bool


@partial(jax.jit, static_argnames=("cfg",))
def build_local_ba(ms: MapState, cur_kf, cfg: SystemConfig) -> LocalWindow:
    """Assemble the SE2-XYZ local window problem (Map::loadLocalGraph,
    src/Map.cpp:891-1053): newest local KFs + fixed RefKFs, good-parallax
    local MPs, reprojection edges with marginalized plane-motion 2x2 info,
    preintegrated odometry edges along the KF chain."""
    K, M, N = ms.K, ms.M, ms.N
    dtype = ms.kf_pose.dtype
    # clamp window capacities to the map's actual sizes (a config with
    # local windows larger than the map would otherwise break top_k)
    Wl = min(cfg.cap.local_kfs, K)
    Wr = min(cfg.cap.local_ref_kfs, K)
    Mw = min(cfg.cap.local_mps, M)
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, dtype)

    local_kfs, ref_kfs, local_mps = local_graph_masks(ms, cur_kf)

    # newest local KFs first (sliding window); lowest-id ref KFs.
    # Local KFs beyond the Wl budget are DROPPED, not demoted to the
    # fixed frontier: an r5 A/B tried demotion (the reference's
    # unbounded local graph keeps every covisible KF as a vertex,
    # src/Map.cpp:299-331, so truncation semantics are ours to choose)
    # and it measurably HURT (seed-3 slam_pg corrected 0.059 → 0.132) —
    # pinning recent, still-drifted keyframes as fixed anchors stiffens
    # the window against exactly the corrections GlobalBA applies.
    idxf = jnp.arange(K, dtype=dtype)
    _, loc_ids = jax.lax.top_k(jnp.where(local_kfs, idxf, -jnp.inf), Wl)
    loc_sel = local_kfs[loc_ids]
    _, ref_ids = jax.lax.top_k(jnp.where(ref_kfs, -idxf, -jnp.inf), Wr)
    ref_sel = ref_kfs[ref_ids]

    win_kf = jnp.concatenate([loc_ids, ref_ids])           # (W,)
    kf_sel = jnp.concatenate([loc_sel, ref_sel])
    W = Wl + Wr
    is_ref = jnp.concatenate(
        [jnp.zeros((Wl,), bool), jnp.ones((Wr,), bool)]
    )

    # gauge: fix RefKFs + the oldest (min-id) local KF (src/Map.cpp:914-925)
    min_local = jnp.min(jnp.where(loc_sel, loc_ids, K))
    fixed = is_ref | (win_kf == min_local)

    kf2win = jnp.full((K + 1,), -1, jnp.int32).at[
        jnp.where(kf_sel, win_kf, K)
    ].set(jnp.arange(W, dtype=jnp.int32), mode="drop")[:K]

    # ALL local MPs participate — the reference's local graph collects
    # observations WITHOUT the parallax filter (getAllObsMPs(checkPrl=
    # false), src/Map.cpp:313-316 + src/KeyFrame.cpp:146-158): a
    # 2-observation low-parallax point is a free variable whose initial
    # depth error cannot poison the solve, while its reprojection pair
    # still carries epipolar bearing information between its observers.
    # Restricting to good-parallax points (what this line did through
    # round 4) starved the window down to ~15-20 anchors whose ~0.5-1 m
    # position errors set the pose-anchor noise floor
    # (artifacts/drift_study_r5).
    ba_mps = local_mps
    mp_score = jnp.where(
        ba_mps, ms.mp_n_obs.astype(dtype), -jnp.inf
    )
    _, win_mp = jax.lax.top_k(mp_score, Mw)
    mp_sel = ba_mps[win_mp]
    mp2win = jnp.full((M + 1,), -1, jnp.int32).at[
        jnp.where(mp_sel, win_mp, M)
    ].set(jnp.arange(Mw, dtype=jnp.int32), mode="drop")[:M]

    poses = ms.kf_pose[win_kf]
    points = ms.mp_pos[win_mp]

    # --- observations: all (window KF, feature) pairs, compacted to the
    #     fixed budget cap.local_obs (top_k keeps valid entries first in
    #     deterministic order) — every downstream per-observation op then
    #     costs O instead of W·N ---
    obs_mp_raw = ms.kf_obs_mp[win_kf]                      # (W, N)
    obs_mpw = mp2win[jnp.clip(obs_mp_raw, 0)]              # (W, N) window idx
    struct_valid = (
        kf_sel[:, None]
        & (obs_mp_raw >= 0)
        & (obs_mpw >= 0)
        & ms.kf_feat_valid[win_kf]
    ).reshape(-1)
    O = min(cfg.cap.local_obs, W * N)
    _, sel = jax.lax.top_k(struct_valid.astype(jnp.float32), O)
    obs_valid = struct_valid[sel]

    obs_kf_idx = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, N)
    ).reshape(-1)[sel]
    obs_mp_idx = jnp.clip(obs_mpw, 0).reshape(-1)[sel]
    obs_uv = ms.kf_xy[win_kf].reshape(-1, 2)[sel]
    octave_o = ms.kf_octave[win_kf].reshape(-1)[sel]

    # marginalized plane-motion measurement info (src/Map.cpp:1024-1049)
    Tcw_w = jax.vmap(lambda p: kf_Tcw(p, Tcb))(poses)      # (W, 4, 4)
    obs_info, obs_valid = obs_sigma_info(
        poses[obs_kf_idx], points[obs_mp_idx], Tcw_w[obs_kf_idx],
        octave_o, obs_valid, cfg, cam,
    )

    # --- odometry edges along the preintegration chain ---
    nxt = ms.kf_pre_next[win_kf]                           # (W,)
    e_j = kf2win[jnp.clip(nxt, 0)]
    e_valid = kf_sel & (nxt >= 0) & (e_j >= 0)
    cov = ms.kf_pre_cov[win_kf]
    cov_safe = jnp.where(
        e_valid[:, None, None],
        cov + 1e-10 * jnp.eye(3, dtype=dtype)[None],
        jnp.eye(3, dtype=dtype)[None],
    )
    edge_info = linalg.inv3x3(cov_safe)

    prob = BAProblem(
        poses=poses,
        points=points,
        pose_valid=kf_sel,
        pose_fixed=fixed,
        point_valid=mp_sel,
        obs_kf=obs_kf_idx,
        obs_mp=obs_mp_idx,
        obs_uv=obs_uv,
        obs_info=obs_info,
        obs_valid=obs_valid,
        edge_i=jnp.arange(W, dtype=jnp.int32),
        edge_j=jnp.clip(e_j, 0),
        edge_meas=ms.kf_pre_meas[win_kf],
        edge_info=edge_info,
        edge_valid=e_valid,
    )
    return LocalWindow(prob, win_kf, win_mp, kf_sel, mp_sel)


@partial(jax.jit, static_argnames=("cfg",))
def remove_outlier_obs(ms: MapState, cur_kf, cfg: SystemConfig):
    """Demote local-window observations with reprojection chi2 above the
    gate, and kill map points left with <2 observations.

    Re-derivation of LocalMapper::removeOutlierChi2 + Map::
    removeLocalOutlierMP (src/LocalMapper.cpp:172-230, src/Map.cpp:700-752).
    NOTE: the reference ships this but comments it out of the run loop
    (src/LocalMapper.cpp:329); it is provided here with the same status —
    available, not wired into the default pipeline.
    """
    K, M, N = ms.K, ms.M, ms.N
    P = ms.mp_obs_kf.shape[1]
    dtype = ms.kf_pose.dtype
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, dtype)

    local_kfs, _, _ = local_graph_masks(ms, cur_kf)

    # chi2 of every (KF, feature) observation (unweighted pixel chi2, the
    # reference uses the edge chi2 against th_huber2)
    m = ms.kf_obs_mp                                  # (K, N)
    has = (m >= 0) & local_kfs[:, None]
    pts = ms.mp_pos[jnp.clip(m, 0)]                   # (K, N, 3)
    poses = jnp.broadcast_to(ms.kf_pose[:, None, :], (K, N, 3))
    r = jax.vmap(
        jax.vmap(
            lambda p, x, u: factors.se2xyz_residual(p, x, u, cam, Tcb)
        )
    )(poses, pts, ms.kf_xy)
    chi2 = jnp.sum(r * r, axis=-1)
    bad = has & (chi2 > cfg.th_huber2)

    new_obs = jnp.where(bad, -1, ms.kf_obs_mp)
    ms = ms._replace(kf_obs_mp=new_obs)

    # rebuild the inverse observation lists for affected MPs: compact
    # mp_obs entries whose forward pointer no longer matches
    fwd_ok = (
        new_obs[jnp.clip(ms.mp_obs_kf, 0), jnp.clip(ms.mp_obs_feat, 0)]
        == jnp.arange(M)[:, None]
    ) & (ms.mp_obs_kf >= 0)
    order = jnp.argsort(
        jnp.where(fwd_ok, 0, 1) * P
        + jax.lax.broadcasted_iota(jnp.int32, (M, P), 1),
        axis=1,
    )
    obs_kf = jnp.take_along_axis(
        jnp.where(fwd_ok, ms.mp_obs_kf, -1), order, axis=1
    )
    obs_ft = jnp.take_along_axis(
        jnp.where(fwd_ok, ms.mp_obs_feat, -1), order, axis=1
    )
    n_obs = jnp.sum(obs_kf >= 0, axis=1).astype(jnp.int32)
    new_valid = ms.mp_valid & (n_obs >= 2)
    # killing a point (<2 obs) must also clear the SURVIVING keyframes'
    # forward pointers to it, or their feature slots stay blocked and
    # the forward→inverse invariant breaks (same cleanup
    # prune_redundant_kf performs; Map::removeLocalOutlierMP erases the
    # observations on both sides, src/Map.cpp:700-752)
    fwd = ms.kf_obs_mp
    fwd = jnp.where(
        (fwd >= 0) & ~new_valid[jnp.clip(fwd, 0)], -1, fwd
    )
    return ms._replace(
        kf_obs_mp=fwd,
        mp_obs_kf=obs_kf,
        mp_obs_feat=obs_ft,
        mp_n_obs=n_obs,
        mp_valid=new_valid,
    ), jnp.sum(bad.astype(jnp.int32))


@partial(jax.jit, static_argnames=("cfg",))
def run_local_ba(ms: MapState, cur_kf, cfg: SystemConfig):
    """Local BA + write-back (LocalMapper::localBA +
    Map::optimizeLocalGraph, src/LocalMapper.cpp:232-302,
    src/Map.cpp:754-783). Returns (MapState, info)."""
    dtype = ms.kf_pose.dtype
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, dtype)
    win = build_local_ba(ms, cur_kf, cfg)
    ba_cfg = BAConfig(
        iters=cfg.local_iter,
        huber_delta=float(cfg.th_huber2) ** 0.5,
    )
    poses, points, info = solve_local_ba(win.prob, cam, Tcb, ba_cfg)

    free = win.kf_sel & ~win.prob.pose_fixed
    K, M = ms.K, ms.M
    new_kf_pose = ms.kf_pose.at[jnp.where(free, win.win_kf, K)].set(
        poses, mode="drop"
    )
    new_mp_pos = ms.mp_pos.at[jnp.where(win.mp_sel, win.win_mp, M)].set(
        points, mode="drop"
    )
    return ms._replace(kf_pose=new_kf_pose, mp_pos=new_mp_pos), info
