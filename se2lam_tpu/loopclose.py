"""Loop closing + global mapping stage.

TPU-native re-derivation of the reference GlobalMapper thread
(src/GlobalMapper.cpp): on each new keyframe — BoW scoring against the
whole KF bank (DetectLoopClose, :201-254), descriptor verification with
RANSAC and MP-match gates (VerifyLoopClose, :256-326), constraint
sparsification via the 2-KF mini-BA + Schur marginalization
(CreateFeatEdge/OptKFPairMatch, :781-1032), map-point fusion
(Map::mergeLoopClose, src/Map.cpp:333-352), and a global pose-graph BA
with MP re-anchoring (GlobalBA, :328-535).

Control flow is host-driven (the natural analog of the reference's
thread loop — detection is cheap, the expensive verified path is rare);
every compute block is a fixed-shape jitted function.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import vocab as vocab_mod
from .config import SystemConfig
from .frontend.matcher import mutual_match
from .frontend.orb import OrbFeatures
from .frontend.ransac import ransac_fundamental
from .mapstate import MAX_FTR_EDGES, MapState, kf_Tcw
from .ops import linalg, se2, se3
from .ops.camera import CameraModel
from . import factors
from .solver.ba import BAConfig, BAProblem, obs_chi2, solve_local_ba
from .solver.posegraph import PoseGraphProblem, solve_pose_graph
from .solver.poseonly import solve_pose_only
from .solver.sparsifier import marginalize_pair_constraint

__all__ = [
    "LoopCloser", "kf_features", "run_global_ba", "run_global_ba_dist",
    "build_global_ba", "build_pose_graph", "run_global_ba_joint",
    "run_global_ba_joint_dist",
]


def kf_features(ms: MapState, k) -> OrbFeatures:
    """View a stored keyframe's features as an OrbFeatures record."""
    return OrbFeatures(
        xy=ms.kf_xy[k],
        angle=ms.kf_angle[k],
        octave=ms.kf_octave[k],
        response=jnp.ones((ms.N,), ms.kf_xy.dtype),
        valid=ms.kf_feat_valid[k],
        desc_bits=jnp.zeros((ms.N, 8), jnp.uint32),
        desc_pm1=ms.kf_desc[k],
    )


@partial(jax.jit, static_argnames=("n_trials",))
def verify_loop(ms: MapState, k, cand, key, n_trials: int = 128):
    """SearchByBoW-equivalent mutual matching + fundamental RANSAC +
    MP-pair extraction (VerifyLoopClose, src/GlobalMapper.cpp:256-326).

    Returns (match_idx loop→cur, n_kp, n_mp, n_cur_mp)."""
    f_loop = kf_features(ms, cand)
    f_cur = kf_features(ms, k)
    wm = mutual_match(f_loop, f_cur, nn_ratio=0.9)
    midx = wm.idx2

    matched = midx >= 0
    fr = ransac_fundamental(
        key,
        f_loop.xy,
        f_cur.xy[jnp.clip(midx, 0)],
        matched,
        n_trials=n_trials,
        thresh_px=3.0,
        min_inliers=10,
    )
    # zero-baseline degeneracy (same fallback as the Localizer's
    # relocalization verify): revisiting the mapped viewpoint exactly
    # gives correspondences that determine NO fundamental matrix, so
    # RANSAC rightly finds nothing — when the median displacement is
    # tiny the views are near-identical and the mutual descriptor
    # matches stand on their own (the chi2 gate downstream still judges)
    disp = jnp.linalg.norm(
        f_cur.xy[jnp.clip(midx, 0)] - f_loop.xy, axis=-1
    )
    disp_sorted = jnp.sort(jnp.where(matched, disp, jnp.inf))
    n_matched = jnp.sum(matched.astype(jnp.int32))
    med = disp_sorted[jnp.clip(n_matched // 2, 0, disp.shape[0] - 1)]
    near_identical = (med < 2.0) & (n_matched >= 20)
    inliers = jnp.where(near_identical, matched, fr.inliers)
    midx = jnp.where(inliers, midx, -1)
    n_kp = jnp.where(near_identical, n_matched, fr.n_inliers)

    m_loop = ms.kf_obs_mp[cand]
    m_cur = ms.kf_obs_mp[k][jnp.clip(midx, 0)]
    mp_pair = (
        (midx >= 0)
        & (m_loop >= 0)
        & (m_cur >= 0)
        & ms.mp_valid[jnp.clip(m_loop, 0)]
        & ms.mp_valid[jnp.clip(m_cur, 0)]
    )
    n_mp = jnp.sum(mp_pair.astype(jnp.int32))
    n_cur_mp = jnp.sum((ms.kf_obs_mp[k] >= 0).astype(jnp.int32))
    return midx, n_kp, n_mp, n_cur_mp


@partial(jax.jit, static_argnames=("cfg",))
def build_loop_constraint_ba(
    ms: MapState, k, cand, match_idx, cfg: SystemConfig
):
    """2-KF mini-BA + Schur sparsification → one relative SE2 constraint
    (CreateFeatEdge/OptKFPairMatch + Sparsifier,
    src/GlobalMapper.cpp:781-1032, src/sparsifier.cpp:105-274).

    NOTE: with both the pose and the points free and only two views, the
    translation scale is a near-gauge direction (2-view reconstruction is
    scale-free; only the points' initial positions pin it through LM
    damping). ``build_loop_constraint`` below is the default: it anchors
    the estimate metrically on the FIXED map points."""
    N = ms.N
    dtype = ms.kf_pose.dtype
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, dtype)

    j = jnp.clip(match_idx, 0)
    m_loop = ms.kf_obs_mp[cand]
    pair = (
        (match_idx >= 0)
        & (m_loop >= 0)
        & ms.mp_valid[jnp.clip(m_loop, 0)]
    )
    points = ms.mp_pos[jnp.clip(m_loop, 0)]
    uv_loop = ms.kf_xy[cand]
    uv_cur = ms.kf_xy[k][j]

    # anisotropic pixel information from the stored per-view 3x3 point
    # info (the mViewMPsInfo role in the reference's OptKFPairMatch /
    # Sparsifier measurements, src/GlobalMapper.cpp:929-1032): project
    # the point covariance through the camera Jacobian at the stored
    # camera-frame view, Σ_uv = J Σ₃ Jᵀ + I, and invert. Features whose
    # info was never filled fall back to identity.
    def _pixel_info(view, info3):
        from . import factors as F
        from .ops import linalg

        has = jnp.trace(info3, axis1=-2, axis2=-1) > 1e-9
        Sigma3 = linalg.inv3x3(
            info3 + 1e-9 * jnp.eye(3, dtype=dtype)
        )
        J = F.pixel_jacobian(view, cam)
        Sigma_uv = J @ Sigma3 @ jnp.swapaxes(J, -1, -2) + jnp.eye(
            2, dtype=dtype
        )
        info2 = linalg.inv2x2(Sigma_uv)
        return jnp.where(
            has[..., None, None], info2, jnp.eye(2, dtype=dtype)
        )

    info_loop = _pixel_info(ms.kf_view_mp[cand], ms.kf_view_info[cand])
    info_cur = _pixel_info(ms.kf_view_mp[k][j], ms.kf_view_info[k][j])

    # mini-BA: pose_loop fixed, pose_cur + points free
    poses = jnp.stack([ms.kf_pose[cand], ms.kf_pose[k]])
    prob = BAProblem(
        poses=poses,
        points=points,
        pose_valid=jnp.ones((2,), bool),
        pose_fixed=jnp.asarray([True, False]),
        point_valid=pair,
        obs_kf=jnp.concatenate(
            [jnp.zeros((N,), jnp.int32), jnp.ones((N,), jnp.int32)]
        ),
        obs_mp=jnp.concatenate(
            [jnp.arange(N, dtype=jnp.int32)] * 2
        ),
        obs_uv=jnp.concatenate([uv_loop, uv_cur]),
        obs_info=jnp.concatenate([info_loop, info_cur]),
        obs_valid=jnp.concatenate([pair, pair]),
        edge_i=jnp.zeros((1,), jnp.int32),
        edge_j=jnp.zeros((1,), jnp.int32),
        edge_meas=jnp.zeros((1, 3), dtype),
        edge_info=jnp.zeros((1, 3, 3), dtype),
        edge_valid=jnp.zeros((1,), bool),
    )
    ba_cfg = BAConfig(iters=10, huber_delta=float(cfg.th_huber2) ** 0.5)
    opt_poses, opt_points, info = solve_local_ba(prob, cam, Tcb, ba_cfg)

    # chi2 gate per edge (OptKFPairMatch chi2>5 outliers,
    # src/GlobalMapper.cpp:1006-1022): drop pairs with bad reprojection
    def reproj_chi2(pose, x, uv):
        r = factors.se2xyz_residual(pose, x, uv, cam, Tcb)
        return jnp.sum(r * r, axis=-1)

    chi_cur = jax.vmap(lambda x, u: reproj_chi2(opt_poses[1], x, u))(
        opt_points, uv_cur
    )
    chi_loop = jax.vmap(lambda x, u: reproj_chi2(opt_poses[0], x, u))(
        opt_points, uv_loop
    )
    good = pair & (chi_cur < 25.0) & (chi_loop < 25.0)

    meas, cinfo = marginalize_pair_constraint(
        opt_poses[0], opt_poses[1], opt_points, uv_loop, uv_cur, good,
        cam, Tcb,
    )
    return meas, cinfo, jnp.sum(good.astype(jnp.int32)), good


@partial(jax.jit, static_argnames=("cfg",))
def build_loop_constraint(ms: MapState, k, cand, match_idx, cfg: SystemConfig):
    """Relative SE2 loop constraint from a pose-only solve against FIXED
    map points.

    The map's scale is already pinned by the odometry history, so
    estimating only the current pose against the loop keyframe's map
    points (the Localizer's DoLocalBA shape, src/Localizer.cpp:233-302)
    is metrically anchored — unlike a 2-view free-point mini-BA whose
    translation scale is a near-gauge direction. The constraint's
    information is the pose-only Gauss-Newton Hessian at the optimum,
    transported onto the relative measurement and eigenvalue-clamped
    (the Sparsifier's role, src/sparsifier.cpp:219-274).
    """
    dtype = ms.kf_pose.dtype
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, dtype)

    j = jnp.clip(match_idx, 0)
    m_loop = ms.kf_obs_mp[cand]
    pair = (
        (match_idx >= 0)
        & (m_loop >= 0)
        & ms.mp_valid[jnp.clip(m_loop, 0)]
    )
    points = ms.mp_pos[jnp.clip(m_loop, 0)]
    uv_cur = ms.kf_xy[k][j]

    pose_opt, chi, n_in = solve_pose_only(
        ms.kf_pose[k], points, uv_cur, pair, cam, Tcb,
        iters=20, huber_delta=float(cfg.th_huber2) ** 0.5,
    )

    # chi2 gate per correspondence (OptKFPairMatch chi2>5 outliers,
    # src/GlobalMapper.cpp:1006-1022)
    r = jax.vmap(
        lambda x, u: factors.se2xyz_residual(pose_opt, x, u, cam, Tcb)
    )(points, uv_cur)
    chi2 = jnp.sum(r * r, axis=-1)
    good = pair & (chi2 < cfg.th_huber2)

    # pose information at the optimum from the good correspondences
    _, Jp, _ = jax.vmap(
        lambda x, u: factors.se2xyz_residual_jac(pose_opt, x, u, cam, Tcb)
    )(points, uv_cur)
    w = jnp.where(good, 1.0, 0.0)
    H = jnp.einsum("mai,m,maj->ij", Jp, w, Jp)

    # transport onto the relative measurement ξ = pose_k ⊖ pose_cand
    pose_loop = ms.kf_pose[cand]
    meas = se2.minus(pose_opt, pose_loop)
    _, _, Jj = factors.pre_se2_residual_jac(pose_loop, pose_opt, meas)
    Jj_inv = jnp.linalg.inv(Jj)
    info = Jj_inv.T @ H @ Jj_inv
    info = 0.5 * (info + info.T)
    evals, evecs = jnp.linalg.eigh(info)
    evals = jnp.clip(evals, 1e-6, cfg.gm_loop_info_ceil)
    info = (evecs * evals[None, :]) @ evecs.T
    return meas, info, jnp.sum(good.astype(jnp.int32)), good


@partial(jax.jit, static_argnames=("cfg", "n_trials"))
def verify_and_build_batch(
    ms: MapState, k, cands, keys, cfg: SystemConfig, n_trials: int
):
    """Vmapped verify + constraint build over a fixed-size candidate
    vector — ONE dispatch and ONE gate pull for all feature-edge
    candidates (and, shared by the caller, the loop candidate), instead
    of one ~30 ms tunnel round-trip per candidate
    (Map::UpdateFeatGraph loops host-side, src/Map.cpp:857-889; the
    semantics per pair are identical, only the sync count changes).

    Returns (midx (C,N), n_kp (C,), n_mp (C,), n_cur (C,), meas (C,3),
    info (C,3,3), n_good (C,)). Candidates must be pre-clipped to valid
    slot range; the caller gates invalid slots host-side."""

    def one(cand, key):
        midx, n_kp, n_mp, n_cur = verify_loop(
            ms, k, cand, key, n_trials=n_trials
        )
        meas, info, n_good, _ = build_loop_constraint(
            ms, k, cand, midx, cfg
        )
        return midx, n_kp, n_mp, n_cur, meas, info, n_good

    return jax.vmap(one)(cands, keys)


@partial(jax.jit, static_argnames=("hops", "max_cands"))
def select_feat_pairs(ms: MapState, k, hops: int = 5, max_cands: int = 4):
    """Feature-edge partner selection by BFS hop distance
    (Map::SelectKFPairFeat, src/Map.cpp:826-854 +
    GlobalMapper::GetAllConnectedKFs_nLayers, src/GlobalMapper.cpp:1310-1335):

    candidates are keyframes covisible with ``k`` but more than ``hops``
    hops away in the odometry+feature edge graph. Selection is greedy in
    id order, and — matching the reference — each selected keyframe is
    treated as adjacent to every node in subsequent BFS rounds (so a
    candidate within ``hops-1`` of an already-selected one is excluded).

    Runs entirely device-side (boolean matrix-vector BFS like
    local_graph_masks); returns (max_cands,) int32 slots, -1-padded.
    """
    K = ms.K
    # adjacency: odometry chain + existing feature/loop edges
    rows = jnp.arange(K)
    nxt = ms.kf_pre_next
    has_nxt = nxt >= 0
    adj = jnp.zeros((K, K), bool)
    adj = adj.at[rows, jnp.clip(nxt, 0)].max(has_nxt)
    adj = adj.at[jnp.clip(nxt, 0), rows].max(has_nxt)
    fi = jnp.where(ms.ftr_valid, ms.ftr_i, K)
    fj = jnp.where(ms.ftr_valid, ms.ftr_j, K)
    adj = adj.at[fi, jnp.clip(fj, 0)].max(True, mode="drop")
    adj = adj | adj.T

    covis_k = ms.covis[k] & ms.kf_valid & (jnp.arange(K) != k)
    out = jnp.full((max_cands,), -1, jnp.int32)
    sel = jnp.zeros((K,), bool)
    for c in range(max_cands):
        # BFS from k; selected KFs join the reach at layer 1 (the
        # reference inserts _sKFSelected into every adjacency query),
        # then the closure expands monotonically
        v = jnp.zeros((K,), bool).at[k].set(True)
        reach = jnp.any(adj & v[None, :], axis=1) | sel
        for _ in range(hops - 1):
            reach = reach | jnp.any(adj & reach[None, :], axis=1)
        cand_mask = covis_k & ~reach & ~sel
        any_c = jnp.any(cand_mask)
        cand = jnp.argmax(
            jnp.where(cand_mask, jnp.arange(K, 0, -1), 0)
        )  # lowest-id candidate
        out = out.at[c].set(jnp.where(any_c, cand, -1))
        sel = sel.at[jnp.where(any_c, cand, K)].set(True, mode="drop")
    return out


@partial(jax.jit, static_argnames=("evict_if_full",))
def add_ftr_edge(ms: MapState, i, j, meas, info, evict_if_full=False,
                 active=True):
    """Record a sparsified feature/loop constraint (the SE2 analog of
    KeyFrame::addFtrMeasureFrom, include/se2lam/KeyFrame.h:101-108).

    ``evict_if_full``: a full bank evicts its lowest-information edge
    rather than dropping the new one. Verified loop closures pass True —
    prune_redundant_kf protects edge endpoints, so without eviction a
    full bank would reject every later closure for the rest of the run.
    Covisibility densification edges keep the default (drop): evicting
    for a nice-to-have edge would churn the bank at capacity.

    ``active`` may be a traced bool: False makes the write a no-op
    (the fused device loop stage applies candidate edges by mask
    instead of host control flow)."""
    F = ms.ftr_valid.shape[0]
    slot = jnp.argmin(ms.ftr_valid)          # first free slot
    if evict_if_full:
        weakest = jnp.argmin(
            jnp.trace(ms.ftr_info, axis1=-2, axis2=-1)
        )
        slot = jnp.where(ms.ftr_valid[slot], weakest, slot)
    else:
        slot = jnp.where(ms.ftr_valid[slot], F, slot)  # full → drop
    slot = jnp.where(active, slot, F)        # inactive → drop the write
    return ms._replace(
        ftr_i=ms.ftr_i.at[slot].set(i, mode="drop"),
        ftr_j=ms.ftr_j.at[slot].set(j, mode="drop"),
        ftr_meas=ms.ftr_meas.at[slot].set(meas, mode="drop"),
        ftr_info=ms.ftr_info.at[slot].set(info, mode="drop"),
        ftr_valid=ms.ftr_valid.at[slot].set(True, mode="drop"),
    )


@jax.jit
def merge_loop_mps(ms: MapState, k, cand, match_idx):
    """Fuse current-KF map points into their matched loop-KF map points
    (Map::mergeLoopClose, src/Map.cpp:333-352; MapPoint::mergedInto,
    src/MapPoint.cpp:314-324). The younger (current) point dies; every
    feature slot pointing at it is remapped to the older survivor."""
    M = ms.M
    P = ms.mp_obs_kf.shape[1]
    j = jnp.clip(match_idx, 0)
    m_loop = ms.kf_obs_mp[cand]
    m_cur = ms.kf_obs_mp[k][j]
    active = (
        (match_idx >= 0)
        & (m_loop >= 0)
        & (m_cur >= 0)
        & (m_loop != m_cur)
        & ms.mp_valid[jnp.clip(m_loop, 0)]
        & ms.mp_valid[jnp.clip(m_cur, 0)]
    )
    # drop merge chains: if a pair's survivor is itself killed by another
    # pair, features would be remapped into a dead slot — filter those
    # pairs (rare; the next loop closure re-finds them)
    dying = jnp.zeros((M,), bool).at[
        jnp.where(active, m_cur, M)
    ].set(True, mode="drop")
    active = active & ~dying[jnp.clip(m_loop, 0)]
    dead = jnp.where(active, m_cur, M)
    keep = jnp.where(active, m_loop, M)

    remap = jnp.arange(M, dtype=jnp.int32).at[dead].set(
        jnp.where(active, m_loop, -1), mode="drop"
    )
    new_obs = jnp.where(
        ms.kf_obs_mp >= 0, remap[jnp.clip(ms.kf_obs_mp, 0)], -1
    )
    mp_valid = ms.mp_valid.at[dead].set(False, mode="drop")
    good = ms.mp_good_prl.at[keep].max(
        ms.mp_good_prl[jnp.clip(dead, 0, M - 1)], mode="drop"
    )
    # merge descriptor bit votes; survivor's majority descriptor refreshes
    votes = ms.mp_desc_votes.at[keep].add(
        ms.mp_desc_votes[jnp.clip(dead, 0, M - 1)], mode="drop"
    )
    touched = jnp.zeros((M,), bool).at[keep].set(True, mode="drop")
    desc = jnp.where(
        touched[:, None],
        jnp.where(votes >= 0, 1, -1).astype(jnp.int8),
        ms.mp_desc,
    )
    # fold the dead point's viewing normal into the survivor's running
    # mean, weighted by observation counts (the transferred observations
    # below inflate mp_n_obs, so later running-mean updates assume the
    # normal already reflects them)
    dead_c2 = jnp.clip(dead, 0, M - 1)
    w_keep = ms.mp_n_obs[jnp.clip(keep, 0, M - 1)].astype(
        ms.mp_normal.dtype
    )[:, None]
    w_dead = ms.mp_n_obs[dead_c2].astype(ms.mp_normal.dtype)[:, None]
    blended = (
        ms.mp_normal[jnp.clip(keep, 0, M - 1)] * w_keep
        + ms.mp_normal[dead_c2] * w_dead
    )
    blended = blended / jnp.maximum(
        jnp.linalg.norm(blended, axis=-1, keepdims=True), 1e-12
    )
    normals = ms.mp_normal.at[keep].set(blended, mode="drop")
    ms = ms._replace(
        kf_obs_mp=new_obs,
        mp_valid=mp_valid,
        mp_good_prl=good,
        mp_desc_votes=votes,
        mp_desc=desc,
        mp_normal=normals,
    )

    # transfer the dead points' observation lists to the survivors;
    # skip entries whose KF already observes the survivor (both points
    # seen by one KF at different features) — a duplicate would inflate
    # mp_n_obs, which consumers read as an observer count (e.g. the
    # prune redundancy score and local-graph observer masks)
    dead_c = jnp.clip(dead, 0, M - 1)
    for p in range(P):
        src_kf = ms.mp_obs_kf[dead_c, p]
        src_live = active & (p < ms.mp_n_obs[dead_c])
        dup = jnp.any(
            ms.mp_obs_kf[jnp.clip(keep, 0, M - 1)] == src_kf[:, None],
            axis=1,
        )
        src_ok = src_live & ~dup
        slot = ms.mp_n_obs[jnp.clip(keep, 0, M - 1)]
        ok = src_ok & (slot < P)
        row = jnp.where(ok, keep, M)
        col = jnp.where(ok, slot, 0)
        # every live entry's FORWARD pointer was remapped dead→keep in
        # new_obs above; an entry we do NOT transfer (duplicate-KF skip
        # or survivor-list overflow) must have that forward pointer
        # cleared, or kf_obs_mp claims an observation the survivor's
        # inverse list doesn't record (table-consistency invariant) and
        # the feature slot is consumed forever
        dangling = src_live & ~ok
        fr = jnp.where(dangling, jnp.clip(src_kf, 0), ms.K)
        fc = jnp.where(dangling, ms.mp_obs_feat[dead_c, p], 0)
        ms = ms._replace(
            kf_obs_mp=ms.kf_obs_mp.at[fr, fc].set(-1, mode="drop"),
            mp_obs_kf=ms.mp_obs_kf.at[row, col].set(
                ms.mp_obs_kf[dead_c, p], mode="drop"
            ),
            mp_obs_feat=ms.mp_obs_feat.at[row, col].set(
                ms.mp_obs_feat[dead_c, p], mode="drop"
            ),
            mp_n_obs=ms.mp_n_obs.at[row].add(
                jnp.where(ok, 1, 0), mode="drop"
            ),
        )
    return ms


def _global_edge_graph(ms: MapState):
    """SE2 edge graph over the whole map: the odometry preintegration
    chain (info = inverted preintegrated covariance) plus the accumulated
    loop/feature constraints, and the KF0 gauge fix
    (src/GlobalMapper.cpp:374). Shared by the pose-graph GlobalBA and the
    joint full-map BA so both solvers optimize the same graph.

    Returns (edge_i, edge_j, edge_meas, edge_info, edge_valid, fixed).
    """
    K = ms.K
    dtype = ms.kf_pose.dtype
    nxt = ms.kf_pre_next
    chain_valid = ms.kf_valid & (nxt >= 0)
    cov = jnp.where(
        chain_valid[:, None, None],
        ms.kf_pre_cov + 1e-10 * jnp.eye(3, dtype=dtype)[None],
        jnp.eye(3, dtype=dtype)[None],
    )
    chain_info = linalg.inv3x3(cov)

    edge_i = jnp.concatenate([jnp.arange(K, dtype=jnp.int32), ms.ftr_i])
    edge_j = jnp.concatenate([jnp.clip(nxt, 0), ms.ftr_j])
    edge_meas = jnp.concatenate([ms.kf_pre_meas, ms.ftr_meas])
    edge_info = jnp.concatenate([chain_info, ms.ftr_info])
    edge_valid = jnp.concatenate([chain_valid, ms.ftr_valid])
    edge_i = jnp.clip(edge_i, 0)
    edge_j = jnp.clip(edge_j, 0)

    first_kf = jnp.argmax(ms.kf_valid)       # KF0 gauge
    fixed = jnp.zeros((K,), bool).at[first_kf].set(True)
    return edge_i, edge_j, edge_meas, edge_info, edge_valid, fixed


# Huber on the graph edges: accumulated loop/feature constraints carry
# estimation error from their mini-BAs; robustifying keeps a few bad
# or over-confident edges from dragging a well-odometered trajectory
POSE_GRAPH_HUBER = 3.0


@jax.jit
def build_pose_graph(ms: MapState) -> PoseGraphProblem:
    """The GlobalBA pose-graph problem over the whole map — shared by
    the single-device dense solver and the edge-sharded distributed
    solver (parallel/dist_posegraph.py), so both optimize the identical
    graph."""
    edge_i, edge_j, edge_meas, edge_info, edge_valid, fixed = (
        _global_edge_graph(ms)
    )
    return PoseGraphProblem(
        poses=ms.kf_pose,
        pose_valid=ms.kf_valid,
        pose_fixed=fixed,
        edge_i=edge_i,
        edge_j=edge_j,
        edge_meas=edge_meas,
        edge_info=edge_info,
        edge_valid=edge_valid,
    )


@jax.jit
def apply_pose_graph_result(ms: MapState, new_poses) -> MapState:
    """Write back corrected poses + re-anchor every MP rigidly with its
    main KF's pose correction (the reference re-derives positions from
    mainKF mViewMPs, src/GlobalMapper.cpp:506-531 — same transform)."""
    old_poses = ms.kf_pose
    mk = jnp.clip(ms.mp_main_kf, 0)
    T_delta = jax.vmap(
        lambda n, o: se2.to_se3(n) @ se3.inv(se2.to_se3(o))
    )(new_poses[mk], old_poses[mk])
    new_mp = jax.vmap(se3.apply)(T_delta, ms.mp_pos)
    new_mp = jnp.where(
        (ms.mp_valid & (ms.mp_main_kf >= 0))[:, None], new_mp, ms.mp_pos
    )
    return ms._replace(kf_pose=new_poses, mp_pos=new_mp)


@partial(jax.jit, static_argnames=("iters",))
def run_global_ba(ms: MapState, iters: int = 15,
                  huber: float = POSE_GRAPH_HUBER):
    """Global pose-graph BA over all KFs + MP re-anchoring
    (GlobalMapper::GlobalBA, src/GlobalMapper.cpp:328-535)."""
    prob = build_pose_graph(ms)
    new_poses, info = solve_pose_graph(prob, iters=iters, huber_delta=huber)
    return apply_pose_graph_result(ms, new_poses), info


def run_global_ba_dist(ms: MapState, mesh, iters: int = 15,
                       cg_iters: int | None = None,
                       huber: float = POSE_GRAPH_HUBER):
    """Distributed GlobalBA: the same pose graph solved with edges
    sharded over ``mesh`` (matrix-free PCG, parallel/dist_posegraph.py)
    instead of the dense replicated factorization. Chain-dominated
    graphs want cg_iters ≈ K to match the dense solve (see the
    dist_posegraph docstring); the default uses the bank capacity."""
    from .parallel.dist_posegraph import dist_solve_pose_graph

    prob = build_pose_graph(ms)
    if cg_iters is None:
        cg_iters = int(ms.K)
    new_poses, info = dist_solve_pose_graph(
        prob, mesh, iters=iters, cg_iters=cg_iters,
        huber_delta=float(huber), axis=mesh.axis_names[0],
    )
    return apply_pose_graph_result(ms, new_poses), info


@partial(jax.jit, static_argnames=("cfg",))
def build_global_ba(ms: MapState, cfg: SystemConfig) -> BAProblem:
    """Assemble the FULL-map joint SE2-XYZ problem: every valid keyframe,
    every good-parallax map point, every live observation (enumerated
    from the bounded inverse tables — O = M·P slots, no compaction
    needed), the odometry preintegration chain, and the accumulated
    loop/feature SE2 constraints.

    This goes beyond the reference's GlobalBA (src/GlobalMapper.cpp:
    328-535), which optimizes poses only and re-anchors points rigidly;
    a joint pose+point refinement is the batch MAP solution the pose
    graph approximates. On TPU the Schur elimination routes through the
    Pallas kernel at bank scale (solver/pallas_schur.py)."""
    M = ms.M
    P = ms.mp_obs_kf.shape[1]
    dtype = ms.kf_pose.dtype
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, dtype)
    from .localmap import obs_sigma_info

    kf_sel = ms.kf_valid
    mp_sel = ms.mp_valid & ms.mp_good_prl

    # observations straight off the inverse tables (consistent with the
    # forward table by invariant; see tests/test_prune.check_consistency)
    obs_mp = jnp.repeat(jnp.arange(M, dtype=jnp.int32), P)     # (M*P,)
    obs_kf_r = ms.mp_obs_kf.reshape(-1)
    obs_ft_r = ms.mp_obs_feat.reshape(-1)
    live = (
        jax.lax.broadcasted_iota(jnp.int32, (M, P), 1)
        < ms.mp_n_obs[:, None]
    ).reshape(-1)
    okf = jnp.clip(obs_kf_r, 0)
    oft = jnp.clip(obs_ft_r, 0)
    obs_valid = live & (obs_kf_r >= 0) & mp_sel[obs_mp] & kf_sel[okf]

    poses = ms.kf_pose
    points = ms.mp_pos
    Tcw_k = jax.vmap(lambda p: kf_Tcw(p, Tcb))(poses)          # (K, 4, 4)
    obs_info, obs_valid = obs_sigma_info(
        poses[okf], points[obs_mp], Tcw_k[okf],
        ms.kf_octave[okf, oft], obs_valid, cfg, cam,
    )

    # odometry chain + loop/feature SE2 edges: the exact graph
    # run_global_ba feeds the pose-graph solver
    edge_i, edge_j, edge_meas, edge_info, edge_valid, fixed = (
        _global_edge_graph(ms)
    )

    return BAProblem(
        poses=poses,
        points=points,
        pose_valid=kf_sel,
        pose_fixed=fixed,
        point_valid=mp_sel,
        obs_kf=okf,
        obs_mp=obs_mp,
        obs_uv=ms.kf_xy[okf, oft],
        obs_info=obs_info,
        obs_valid=obs_valid,
        edge_i=edge_i,
        edge_j=edge_j,
        edge_meas=edge_meas,
        edge_info=edge_info,
        edge_valid=edge_valid,
    )


@partial(jax.jit, static_argnames=("cfg",))
def _joint_problem(ms: MapState, cfg: SystemConfig) -> BAProblem:
    """build_global_ba + the pre-solve chi2 demotion gate — shared by
    the single-device and distributed joint GBA paths.

    Observations already inconsistent at the pose-graph-corrected input
    state are demoted (the removeOutlierChi2 gate,
    src/LocalMapper.cpp:172-230, applied where the reference never
    needed it: its GlobalBA has no reprojection edges, ours optimizes
    against ALL accumulated observations — stale associations and
    loop-merge transfers would otherwise bias the joint objective away
    from the true trajectory)."""
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, ms.kf_pose.dtype)
    prob = build_global_ba(ms, cfg)
    chi_in = obs_chi2(prob, cam, Tcb)
    return prob._replace(
        obs_valid=prob.obs_valid & (chi_in < cfg.th_huber2)
    )


@jax.jit
def _joint_apply(ms: MapState, prob: BAProblem, poses, points) -> MapState:
    """Write the joint solution back into the map state."""
    free = prob.pose_valid & ~prob.pose_fixed
    new_kf_pose = jnp.where(free[:, None], poses, ms.kf_pose)
    # points outside the joint solve (bad parallax, excluded via
    # point_valid) still ride their main KF rigidly — same re-anchor
    # run_global_ba applies after moving poses, else a large polish
    # would leave them with stale positions that remove_outlier_obs
    # later culls as spurious outliers
    mk = jnp.clip(ms.mp_main_kf, 0)
    T_delta = jax.vmap(
        lambda n, o: se2.to_se3(n) @ se3.inv(se2.to_se3(o))
    )(new_kf_pose[mk], ms.kf_pose[mk])
    anchored = jax.vmap(se3.apply)(T_delta, ms.mp_pos)
    ride = ms.mp_valid & ~prob.point_valid & (ms.mp_main_kf >= 0)
    new_mp_pos = jnp.where(
        prob.point_valid[:, None],
        points,
        jnp.where(ride[:, None], anchored, ms.mp_pos),
    )
    return ms._replace(kf_pose=new_kf_pose, mp_pos=new_mp_pos)


def _joint_ba_cfg(ms: MapState, cfg: SystemConfig, iters: int,
                  grid: bool) -> BAConfig:
    return BAConfig(
        iters=iters,
        huber_delta=float(cfg.th_huber2) ** 0.5,
        # build_global_ba enumerates observations as the M×P grid of the
        # inverse tables — let the single-device assembly reshape-sum the
        # point blocks (the distributed partition re-buckets observations
        # by owning block, destroying the grid layout, so it accumulates
        # generically)
        obs_grid_p=int(ms.mp_obs_kf.shape[1]) if grid else 0,
        # full-map problems start from an outlier-contaminated state
        # where the barely-damped GN step overshoots; starting at 1e-4
        # burns most of a short iteration budget on rejected steps
        # before lambda grows large enough (measured: 3 of 6 closures
        # rejected all 5 steps at 1e-4)
        lm_init_lambda=1e-2,
    )


@partial(jax.jit, static_argnames=("cfg", "iters"))
def run_global_ba_joint(ms: MapState, cfg: SystemConfig, iters: int = 5):
    """Joint full-map pose+point LM refinement after a loop closure.

    Runs on the pose-graph-corrected, merge-fused map: the pose graph
    (run_global_ba) spreads the loop correction along the trajectory,
    then this polishes poses AND points against the reprojection
    evidence (the loop's merged points are co-observed by both ends of
    the loop, so the closure is held by image measurements, not just the
    single marginalized SE2 edge). Returns (MapState, info)."""
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, ms.kf_pose.dtype)
    prob = _joint_problem(ms, cfg)
    poses, points, info = solve_local_ba(
        prob, cam, Tcb, _joint_ba_cfg(ms, cfg, iters, grid=True)
    )
    return _joint_apply(ms, prob, poses, points), info


def run_global_ba_joint_dist(
    ms: MapState, cfg: SystemConfig, mesh, iters: int = 5
):
    """Distributed joint full-map GBA: the identical problem solved with
    the map-point axis partitioned over ``mesh`` (points, observations,
    and the pose–point coupling blocks never replicated; one psum of
    Schur-reduced camera systems per LM iteration —
    parallel/dist_ba.py). Returns (MapState, info)."""
    from .parallel.dist_ba import sharded_solve_local_ba

    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, ms.kf_pose.dtype)
    prob = _joint_problem(ms, cfg)
    poses, points, info = sharded_solve_local_ba(
        prob, cam, Tcb, _joint_ba_cfg(ms, cfg, iters, grid=False), mesh,
        axis=mesh.axis_names[0],
    )
    return _joint_apply(ms, prob, poses, points), info


@partial(jax.jit, static_argnames=(
    "cfg", "n_trials", "gba_iters", "joint_iters", "min_between",
    "have_vocab",
))
def loop_stage(
    ms: MapState, k, bank, vocab, last_loop, gba_cooldown, key,
    cfg: SystemConfig,
    n_trials: int, gba_iters: int, joint_iters: int, min_between: int,
    have_vocab: bool = True,
):
    """The ENTIRE per-keyframe global-mapping stage as ONE compiled
    program: feat-edge candidate selection, BoW detect over the bank,
    batched verification + constraint builds, gate decisions, feature-
    edge writes, and — under a ``lax.cond`` so the heavy branch only
    executes when a closure actually fires — merge + pose-graph GlobalBA
    + joint GBA. The host dispatches it and reads back NOTHING on the
    hot path; the returned scalars (fired?, partner, eviction flag) ride
    a later control pull for bookkeeping only.

    This is the round-4 E2E finding applied (DESIGN §14/§17): the loop
    stage's math is ~10-130 ms of device time, but staged host driving
    cost ~25 op launches and ~2 pulls per keyframe through the tunnel —
    the pulls alone averaged 98 ms. All decision logic the staged driver
    ran on host (detect accept src/GlobalMapper.cpp:201-254, VerifyLoop
    gates :256-326, the temporal throttle) is traced here instead;
    ``last_loop`` is carried as device state (2,) int32 [cand, k].

    Returns (ms, bank, outs) — outs carries fired/cand/k/evicted/
    n_feat_edges/midx device values.
    """
    K = ms.K
    i32 = jnp.int32
    k = jnp.asarray(k, i32)
    cands = select_feat_pairs(ms, k)                      # (4,)
    if have_vocab:
        from .parallel.dist_loop import sharded_bow_detect

        v, _ = vocab_mod.bow_transform(
            vocab, ms.kf_desc[k], ms.kf_feat_valid[k]
        )
        bank = bank.at[k].set(v)
        ids = jnp.arange(K)
        eligible = ms.kf_valid & (ids <= k - cfg.gm_dcl_min_kfid_offset)
        best_i, best_s = sharded_bow_detect(bank, v, eligible)
        throttled = (last_loop[1] >= 0) & (
            k - last_loop[1] < min_between
        )
        loop_ok = (~throttled) & (best_s >= cfg.gm_dcl_min_score_best)
        loop_cand = jnp.where(loop_ok, best_i.astype(i32), -1)
    else:
        loop_cand = jnp.asarray(-1, i32)

    vec = jnp.concatenate([cands, loop_cand[None]])       # (5,)
    keys = jax.random.split(key, vec.shape[0])
    midx_b, n_kp_b, n_mp_b, n_cur_b, meas_b, info_b, n_good_b = (
        verify_and_build_batch(
            ms, k, jnp.clip(vec, 0), keys, cfg, n_trials=n_trials
        )
    )

    # sparsified feature edges, applied by mask (UpdateFeatGraph,
    # src/Map.cpp:857-889)
    n_feat = jnp.asarray(0, i32)
    for c in range(int(cands.shape[0])):
        ok_c = (vec[c] >= 0) & (n_mp_b[c] >= 10) & (n_good_b[c] >= 10)
        ms = add_ftr_edge(
            ms, jnp.clip(vec[c], 0), k, meas_b[c], info_b[c],
            active=ok_c,
        )
        n_feat = n_feat + ok_c.astype(i32)

    n_kp, n_mp = n_kp_b[-1], n_mp_b[-1]
    n_cur, n_good = n_cur_b[-1], n_good_b[-1]
    fire = (
        (loop_cand >= 0)
        & (n_mp >= cfg.gm_vcl_num_min_match_mp)
        & (n_kp >= cfg.gm_vcl_num_min_match_kp)
        & (n_mp.astype(jnp.float32)
           >= cfg.gm_vcl_ratio_min_match_mp
           * jnp.maximum(n_cur, 1).astype(jnp.float32))
        & (n_good >= cfg.gm_vcl_num_min_match_mp)
    )
    evicted = fire & jnp.all(ms.ftr_valid)
    cand_c = jnp.clip(loop_cand, 0)
    midx = midx_b[-1]

    # feat-graph-renewal GlobalBA trigger (src/GlobalMapper.cpp:87-147:
    # `!mbGlobalBALastLoop && (bIfLoopCloseVerified ||
    # bIfFeatGraphRenewed)`): a new sparsified feature edge — typically
    # a drifted revisit that became covisible without a BoW-verified
    # closure — is a global constraint and the reference corrects the
    # whole trajectory on it immediately. The cooldown scalar carries
    # mbGlobalBALastLoop's suppress-right-after-one-ran semantics as
    # device state.
    renew_fire = (~fire) & (n_feat > 0) & ~jnp.asarray(gba_cooldown)
    any_gba = fire | renew_fire

    def do_correct(m):
        def close(mm):
            mm = add_ftr_edge(
                mm, cand_c, k, meas_b[-1], info_b[-1], evict_if_full=True
            )
            return merge_loop_mps(mm, k, cand_c, midx)

        # merge + joint polish only on a verified closure; the
        # pose-graph GlobalBA program is SHARED between both triggers
        # (one compilation, reference parity: GlobalBA() is the same
        # call for both, src/GlobalMapper.cpp:144)
        m = jax.lax.cond(fire, close, lambda mm: mm, m)
        m, _ = run_global_ba(m, iters=gba_iters, huber=cfg.gm_pg_huber)
        if joint_iters > 0:
            m = jax.lax.cond(
                fire,
                lambda mm: run_global_ba_joint(mm, cfg, iters=joint_iters)[0],
                lambda mm: mm,
                m,
            )
        return m

    ms = jax.lax.cond(any_gba, do_correct, lambda m: m, ms)
    new_last = jnp.where(
        fire, jnp.stack([cand_c, k]), jnp.asarray(last_loop, i32)
    )
    outs = {
        "fired": fire,
        "cand": loop_cand,
        "k": k,
        "evicted": evicted,
        "n_feat_edges": n_feat,
        "midx": midx,
        "last_loop": new_last,
        "renewal_gba": renew_fire,
        "cooldown": any_gba,
    }
    return ms, bank, outs


class LoopCloser:
    """Host-driven loop-closing controller (the GlobalMapper thread's
    role). Holds the trained vocabulary and the per-KF BoW bank."""

    def __init__(
        self,
        cfg: SystemConfig,
        n_words: int | None = None,
        min_kfs_to_train: int = 2,
        retrain_factor: float = 2.0,
        global_ba_iters: int | None = None,
        mesh=None,
        detect_loops: bool = True,
    ):
        """``detect_loops=False`` disables BoW loop detection/verify/
        merge but keeps the rest of the GlobalMapper: feature-edge
        maintenance AND the feat-graph-renewal GlobalBA trigger. The
        reference has no switch that turns its GlobalMapper off — its
        "no loop closing" still runs `bIfFeatGraphRenewed → GlobalBA`
        (src/GlobalMapper.cpp:87-147) — so this, not a null closer, is
        the faithful loop-ablated configuration."""
        self.cfg = cfg
        self.detect_loops = detect_loops
        # flat-vocabulary size scales with the keyframe capacity: the
        # L1 score separation between a true revisit and the best
        # impostor collapses when many keyframes share words — measured
        # in artifacts/vocab_scale_r4 (at K=1024, W=1024 drops to 91.7%
        # top-1 with NEGATIVE worst-case separation; W≈4K holds 100%
        # with mean separation ≥0.3). W is a matmul width here, so
        # scaling it is cheap (DBoW2 scales the tree the same way: ~1M
        # leaves for city-scale maps, TemplatedVocabulary.h).
        if n_words is None:
            n_words = int(min(max(1024, 4 * cfg.cap.max_kfs), 16384))
        # capacity invariant (artifacts/vocab_scale_r4): separation
        # scales ~W/K, reliable detection needs W ≳ 4·max_kfs, and W is
        # capped at 16384 (a wider flat bank stops paying for itself as
        # a matmul width) — so maps past ~4096 KFs re-enter the
        # collapse regime. DBoW2's hierarchical ~1M-leaf tree
        # (TemplatedVocabulary.h:1090-1232) is the structure that keeps
        # separating beyond that; until a two-level bank exists, raising
        # max_kfs past W/4 must be a loud, visible decision.
        if n_words < 4 * cfg.cap.max_kfs:
            import warnings

            warnings.warn(
                f"flat vocabulary width W={n_words} < 4*max_kfs="
                f"{4 * cfg.cap.max_kfs}: loop-detection score separation "
                "collapses as the map fills (artifacts/vocab_scale_r4). "
                "Keep max_kfs <= W/4 or expect missed/false loop "
                "closures at scale.",
                stacklevel=2,
            )
        self.n_words = n_words
        # optional jax.sharding.Mesh: with >1 device the global solvers
        # and the BoW bank run sharded (BASELINE north-star config 5 —
        # the distributed SLAM engine, not just shelf solvers):
        #   GlobalBA        → edge-sharded matrix-free PCG
        #   joint full-map  → map-block partitioned Schur-GN
        #   DetectLoopClose → KF-bank-sharded L1 scoring
        self.mesh = mesh
        self._dist = mesh is not None and mesh.devices.size > 1
        # vocabulary lifecycle: bootstrap as soon as min_kfs_to_train
        # keyframes exist (so loops among the FIRST keyframes of a fresh
        # run can close), then retrain whenever the map grows by
        # retrain_factor so words keep covering the live environment —
        # the self-training replacement for DBoW2's pretrained 45 MB file
        # (TemplatedVocabulary.h:1478). O(log K) retrainings total.
        self.min_kfs_to_train = min_kfs_to_train
        self.retrain_factor = retrain_factor
        # retrain bookkeeping counts keyframe INSERTIONS (monotonic),
        # not live slots: capacity compaction reuses slots and caps the
        # live count below max_kfs, which would otherwise make the
        # grow-by-retrain_factor trigger unreachable forever
        self._n_inserts = 0
        self._trained_at_nkf = 0
        self.global_ba_iters = (
            cfg.global_iter if global_ba_iters is None else global_ba_iters
        )
        self.min_kfs_between_loops = 5
        self.vocab = None
        self.bank = None          # (Kmax, W) BoW vectors
        self.key = jax.random.PRNGKey(42)
        self._n_loops_closed = 0
        self._n_ftr_evicted = 0    # bank-full closures that evicted an edge
        # feat-graph-renewal GlobalBA bookkeeping: the reference runs a
        # global correction on EITHER a verified closure OR a renewed
        # feature graph, suppressed right after one ran
        # (mbGlobalBALastLoop, src/GlobalMapper.cpp:142-155)
        self._gba_cooldown = False
        self._cooldown_dev = jnp.asarray(False)   # fused-path mirror
        self.n_vocab_trainings = 0
        self._n_renewal_gbas = 0
        self._last_loop_host: tuple[int, int] | None = None
        self.last_loop_midx = None          # (N,) loop→cur feature matches
        self.last_global_ba_info: dict | None = None
        # device mirror of the temporal-throttle state for the fused
        # single-dispatch path (loop_stage): [cand, k] of the last
        # closure, [-1, -1] if none
        self._last_loop_dev = jnp.asarray([-1, -1], jnp.int32)
        # fused-path result records not yet read back (host counters
        # ride a later pull; see _drain_outs)
        self._outs_pending: list[dict] = []
        # host-sync accounting: device_get count of the most recent
        # on_new_kf call (the per-KF sync budget: ≤2 for the staged
        # driver, 0 for the fused single-dispatch path)
        self.last_kf_pulls = 0

    def _pull(self, x):
        self.last_kf_pulls += 1
        return jax.device_get(x)

    # ---- host bookkeeping mirrors (drain fused-path results on read) --
    def _drain_outs(self):
        if not self._outs_pending:
            return
        outs, self._outs_pending = self._outs_pending, []
        vals = jax.device_get(
            [(o["fired"], o["cand"], o["k"], o["evicted"],
              o.get("renewal_gba", False)) for o in outs]
        )
        for (fired, cand, kk, ev, ren), o in zip(vals, outs):
            if bool(fired):
                self._n_loops_closed += 1
                self._last_loop_host = (int(cand), int(kk))
                self._last_loop_dev = o["last_loop"]
                self.last_loop_midx = o["midx"]
            self._n_renewal_gbas += int(bool(ren))
            self._n_ftr_evicted += int(ev)

    @property
    def n_loops_closed(self) -> int:
        self._drain_outs()
        return self._n_loops_closed

    @property
    def n_ftr_evicted(self) -> int:
        self._drain_outs()
        return self._n_ftr_evicted

    @property
    def n_renewal_gbas(self) -> int:
        self._drain_outs()
        return self._n_renewal_gbas

    @property
    def last_loop(self) -> tuple[int, int] | None:
        self._drain_outs()
        return self._last_loop_host

    @last_loop.setter
    def last_loop(self, v):
        # compaction remaps slot ids (system._remap_slots) — keep the
        # device throttle mirror consistent with the host value
        self._last_loop_host = v
        self._last_loop_dev = jnp.asarray(
            [-1, -1] if v is None else [v[0], v[1]], jnp.int32
        )

    def on_new_kf_fused(self, ms: MapState, k) -> MapState:
        """Single-dispatch per-KF global-mapping stage (loop_stage): the
        entire detect→verify→gate→close pipeline runs on device,
        including the closure itself under lax.cond — the host reads
        back NOTHING here (counters drain on a later pull). ``k`` may
        stay a device scalar. Single-device path; the mesh path keeps
        the staged driver (shard_map solvers inside cond are not worth
        the trace complexity)."""
        self.last_kf_pulls = 0
        self._n_inserts += 1
        have_vocab = self.detect_loops and self._ensure_vocab(
            ms, n_inserts=self._n_inserts
        )
        self.key, sub = jax.random.split(self.key)
        ms, bank, outs = loop_stage(
            ms, k, self.bank if have_vocab else jnp.zeros((1, 1)),
            self.vocab, self._last_loop_dev, self._cooldown_dev, sub,
            self.cfg,
            n_trials=self.cfg.cap.ransac_trials,
            gba_iters=self.global_ba_iters,
            joint_iters=self.cfg.gm_joint_ba_iters,
            min_between=self.min_kfs_between_loops,
            have_vocab=have_vocab,
        )
        if have_vocab:
            self.bank = bank
        self._last_loop_dev = outs["last_loop"]
        self._cooldown_dev = outs["cooldown"]
        self._outs_pending.append(outs)
        return ms

    def adopt_vocab(self, vocab, ms: MapState):
        """Install a vocabulary and backfill the BoW bank for every
        existing keyframe (used at training time and when an externally
        trained vocabulary — e.g. one saved with a map checkpoint — must
        stay consistent with the in-session bank)."""
        self.vocab = vocab
        self.rebuild_bank(ms)
        # an externally adopted vocabulary counts as trained now
        # (prevents an immediate retrain on resume); seed the insertion
        # counter from the map so a resumed session schedules its next
        # retrain relative to the loaded map's size
        self._n_inserts = max(self._n_inserts, int(ms.n_kf))
        self._trained_at_nkf = max(self._trained_at_nkf, self._n_inserts)

    def rebuild_bank(self, ms: MapState):
        """Recompute every keyframe's BoW vector under the CURRENT
        vocabulary — for slot remaps (capacity compaction), where the
        vocabulary is unchanged and the retrain schedule must NOT be
        touched (bumping _trained_at_nkf on every compaction would push
        the retrain trigger out forever under sustained pressure)."""
        v, _ = jax.vmap(
            lambda d, m: vocab_mod.bow_transform(self.vocab, d, m)
        )(ms.kf_desc, ms.kf_feat_valid & ms.kf_valid[:, None])
        self.bank = self._place_bank(v)

    def _place_bank(self, bank):
        """Under a mesh, keep the (K, W) BoW bank sharded along the KF
        axis (parallel/dist_loop.shard_bank) so DetectLoopClose scales
        with devices; per-row updates preserve the sharding."""
        if self._dist and bank.shape[0] % self.mesh.devices.size == 0:
            from .parallel.dist_loop import shard_bank

            return shard_bank(bank, self.mesh, axis=self.mesh.axis_names[0])
        return bank

    def _ensure_vocab(self, ms: MapState, n_inserts: int):
        fresh_enough = (
            self.vocab is not None
            and n_inserts < self._trained_at_nkf * self.retrain_factor
        )
        if fresh_enough:
            return True
        if n_inserts < self.min_kfs_to_train:
            return self.vocab is not None
        # (re)train on all live keyframes; document idf per DBoW2
        # (one descriptor row block per keyframe = one document)
        K, N = ms.K, ms.N
        desc = ms.kf_desc.reshape(-1, 256)
        valid = (ms.kf_feat_valid & ms.kf_valid[:, None]).reshape(-1)
        doc_ids = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
        self.key, sub = jax.random.split(self.key)
        self.adopt_vocab(
            vocab_mod.train_vocab(
                desc, valid, n_words=self.n_words, key=sub,
                doc_ids=doc_ids, n_docs_cap=K,
            ),
            ms,
        )   # adopt re-scores the whole bank under the new vocabulary
        self._trained_at_nkf = n_inserts
        self.n_vocab_trainings += 1
        return True

    def start_async(self, ms: MapState, k) -> dict:
        """Stage A of the per-KF loop pipeline: vocabulary lifecycle,
        feat-edge candidate selection, and the BoW detect — DISPATCH
        ONLY, no host sync. Returns a pending record whose ``want``
        device scalars the caller fetches at its own convenience (riding
        an existing control pull) before calling ``advance``.

        This is the TPU-native analog of the reference's thread overlap
        (GlobalMapper::run works while Track keeps tracking,
        src/OdoSLAM.cpp:142-150): tracking dispatches never wait for the
        loop stage, whose results land retroactively."""
        k = int(k)
        self.last_kf_pulls = 0
        self._n_inserts += 1
        have_vocab = self.detect_loops and self._ensure_vocab(
            ms, n_inserts=self._n_inserts
        )
        # dispatch the feat-edge candidate selection AND the BoW detect
        # together, so both come back in ONE pull.
        # select_feat_pairs reads the pre-feat-edge graph and the detect
        # reads only (bank, desc), so the order change is behavior-free.
        cands_dev = select_feat_pairs(ms, k)
        cfg = self.cfg
        if have_vocab:
            from .parallel.dist_loop import sharded_bow_detect

            v, _ = vocab_mod.bow_transform(
                self.vocab, ms.kf_desc[k], ms.kf_feat_valid[k]
            )
            self.bank = self.bank.at[k].set(v)
            ids = jnp.arange(ms.K)
            eligible = (
                ms.kf_valid
                & (ids <= k - cfg.gm_dcl_min_kfid_offset)
            )
            # DetectLoopClose over the (possibly KF-sharded) bank: XLA
            # partitions the L1 reduction + argmax along the bank's
            # sharding (parallel/dist_loop.py)
            best_i, best_s = sharded_bow_detect(self.bank, v, eligible)
            want = (cands_dev, best_i, best_s)
        else:
            want = (cands_dev,)
        return {"stage": "detect", "k": k, "have_vocab": have_vocab,
                "want": want}

    def advance(self, ms: MapState, pending: dict, fetched):
        """Consume the host values fetched for ``pending["want"]`` and
        run the next pipeline stage. Returns (ms, next_pending | None,
        closed: bool) — ``closed`` tells the caller a global correction
        moved keyframe poses (its tracking gauge must be re-based)."""
        cfg = self.cfg
        k = pending["k"]
        if pending["stage"] == "detect":
            if pending["have_vocab"]:
                cands, cand, best = fetched
            else:
                (cands,) = fetched
                cand = best = None

            # loop-candidate eligibility decided host-side BEFORE
            # dispatch: the temporal throttle (consecutive keyframes
            # revisiting the same place would close near-duplicate loops
            # whose correlated errors pile up in the pose graph) and the
            # BoW score gate (DetectLoopClose accept,
            # src/GlobalMapper.cpp:206-254)
            throttled = (
                self.last_loop is not None
                and k - self.last_loop[1] < self.min_kfs_between_loops
            )
            loop_cand = -1
            if (
                pending["have_vocab"]
                and not throttled
                and float(best) >= cfg.gm_dcl_min_score_best
            ):
                loop_cand = int(cand)

            # ONE batched verify + constraint-build dispatch for ALL
            # feature-edge candidates (Map::UpdateFeatGraph,
            # src/Map.cpp:857-889) plus the loop candidate in the last
            # slot, and ONE pull for every gate scalar — per-KF host
            # syncs stay ≤2 even when candidates fire
            feat_cands = [int(c) for c in cands if int(c) >= 0]
            if loop_cand < 0 and not feat_cands:
                self._gba_cooldown = False   # src/GlobalMapper.cpp:151-155
                return ms, None, False
            # two compiled widths only: 1 (the common loop-candidate-
            # only case — padding to 5 would 5× the verify compute per
            # eligible KF) and max_cands+1 (feat candidates present)
            C = 1 if not feat_cands else len(cands) + 1
            vec = np.full((C,), -1, np.int64)
            vec[: len(feat_cands)] = feat_cands
            vec[-1] = loop_cand
            self.key, sub = jax.random.split(self.key)
            keys = jax.random.split(sub, C)
            midx_b, n_kp_b, n_mp_b, n_cur_b, meas_b, info_b, n_good_b = (
                verify_and_build_batch(
                    ms, k, jnp.asarray(np.clip(vec, 0, None), jnp.int32),
                    keys, cfg, n_trials=cfg.cap.ransac_trials,
                )
            )
            return ms, {
                "stage": "gates", "k": k,
                "feat_cands": feat_cands, "loop_cand": loop_cand,
                "midx_b": midx_b, "meas_b": meas_b, "info_b": info_b,
                "want": (n_kp_b, n_mp_b, n_cur_b, n_good_b,
                         jnp.all(ms.ftr_valid)),
            }, False

        assert pending["stage"] == "gates"
        feat_cands = pending["feat_cands"]
        loop_cand = pending["loop_cand"]
        meas_b, info_b = pending["meas_b"], pending["info_b"]
        n_kp_h, n_mp_h, n_cur_h, n_good_h, bank_full = fetched

        # sparsified feature edges (one per passing candidate; the
        # verify/chi2 gates play CreateFeatEdge's failure path)
        feat_renewed = False
        for c, cand_c in enumerate(feat_cands):
            if int(n_mp_h[c]) < 10 or int(n_good_h[c]) < 10:
                continue
            ms = add_ftr_edge(
                ms, jnp.asarray(cand_c), jnp.asarray(k),
                meas_b[c], info_b[c],
            )
            feat_renewed = True
        def renewal_or_clear(ms):
            # feat-graph-renewal GlobalBA (src/GlobalMapper.cpp:142-147:
            # `!mbGlobalBALastLoop && (verified || RENEWED)`): a new
            # sparsified feature edge — typically a drifted revisit that
            # became covisible without a BoW-verified closure — is a
            # global constraint, and the reference corrects the whole
            # trajectory on it immediately. This is the online
            # correction path that exists WITHOUT loop closing; it also
            # runs when a detected loop fails verification.
            if feat_renewed and not self._gba_cooldown:
                if self._dist:
                    ms, gba_info = run_global_ba_dist(
                        ms, self.mesh, iters=self.global_ba_iters,
                        huber=cfg.gm_pg_huber,
                    )
                else:
                    ms, gba_info = run_global_ba(
                        ms, iters=self.global_ba_iters,
                        huber=cfg.gm_pg_huber,
                    )
                self._gba_cooldown = True
                self._n_renewal_gbas += 1
                self.last_global_ba_info = gba_info
                return ms, True
            # no GBA this KF -> clear (the reference's else branch,
            # src/GlobalMapper.cpp:151-155)
            self._gba_cooldown = False
            return ms, False

        if loop_cand < 0:
            ms, corrected = renewal_or_clear(ms)
            return ms, None, corrected

        n_kp, n_mp, n_cur, n_good = (
            int(n_kp_h[-1]), int(n_mp_h[-1]),
            int(n_cur_h[-1]), int(n_good_h[-1]),
        )
        if (
            n_mp < cfg.gm_vcl_num_min_match_mp
            or n_kp < cfg.gm_vcl_num_min_match_kp
            or n_mp < cfg.gm_vcl_ratio_min_match_mp * max(n_cur, 1)
            or n_good < cfg.gm_vcl_num_min_match_mp
        ):
            ms, corrected = renewal_or_clear(ms)
            return ms, None, corrected

        if bool(bank_full):
            # constraint bank full: add_ftr_edge evicts its lowest-
            # information edge so the verified closure still lands —
            # count the eviction (callers can raise MAX_FTR_EDGES)
            self._n_ftr_evicted += 1
        cand = loop_cand
        midx = pending["midx_b"][-1]
        ms = add_ftr_edge(
            ms, jnp.asarray(cand), jnp.asarray(k), meas_b[-1], info_b[-1],
            evict_if_full=True,
        )
        ms = merge_loop_mps(ms, k, cand, midx)
        if self._dist:
            ms, gba_info = run_global_ba_dist(
                ms, self.mesh, iters=self.global_ba_iters,
                huber=cfg.gm_pg_huber,
            )
        else:
            ms, gba_info = run_global_ba(
                ms, iters=self.global_ba_iters, huber=cfg.gm_pg_huber
            )
        if cfg.gm_joint_ba_iters > 0:
            # polish poses AND points against the reprojection evidence
            # (the pose graph only spreads the single loop edge)
            if self._dist:
                ms, joint_info = run_global_ba_joint_dist(
                    ms, cfg, self.mesh, iters=cfg.gm_joint_ba_iters
                )
            else:
                ms, joint_info = run_global_ba_joint(
                    ms, cfg, iters=cfg.gm_joint_ba_iters
                )
            gba_info = {**gba_info, "joint": joint_info}
        self._n_loops_closed += 1
        self._gba_cooldown = True
        self.last_loop = (cand, k)          # setter syncs the dev mirror
        self.last_loop_midx = midx          # for the debug-image loop pane
        self.last_global_ba_info = gba_info
        return ms, None, True

    def on_new_kf(self, ms: MapState, k) -> MapState:
        """Synchronous driver: run the staged pipeline to completion
        (the behavior every stage-level test pins down; the async path
        in SlamSystem runs the identical stages, only the fetch timing
        differs)."""
        pending = self.start_async(ms, k)
        while pending is not None:
            fetched = self._pull(pending["want"])
            ms, pending, _closed = self.advance(ms, pending, fetched)
        return ms
