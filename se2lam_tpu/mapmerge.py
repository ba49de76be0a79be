"""Cross-map merging: align and fuse two independently-built maps.

No reference analog — MapStorage saves and loads exactly ONE map
(/root/reference/src/MapStorage.cpp) and the system has no notion of a
second session. This module closes the fleet story the reference never
had: robots map disjoint parts of an environment independently
(``parallel.fleet``), the maps merge into one, and the fleet then
serves against the union (``parallel.make_fleet_localizer``).

Pipeline (``merge_maps``):

1. compact both maps (contiguous slots — ``localmap.compact_map``);
2. cross-map place recognition: one vocabulary trained on the union of
   descriptors, every B-keyframe BoW-scored against A's bank (the
   DetectLoopClose statistic, across maps);
3. alignment: B's best keyframe relocalizes against A — mutual
   descriptor match + RANSAC (``localizer._relocalize_verify``) and a
   pose-only solve on A's FIXED map points, seeded at A's candidate
   pose (metrically anchored: both maps carry odometry scale);
4. rigid SE(2) transform of map B into A's world frame;
5. slot concatenation with index remapping (observation tables,
   odometry chain, covisibility, feature edges);
6. the standard in-map loop machinery welds the seam: verify →
   pose-only constraint → feature edge → duplicate map-point fusion →
   global pose-graph BA (``loopclose``).

All steps are pure functions over MapState; ``merge_maps`` is the host
orchestrator (merging is a rare offline operation — one per rendezvous,
not per frame).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import vocab as vocab_mod
from .config import SystemConfig
from .localmap import compact_map, recompute_covis
from .loopclose import (
    add_ftr_edge,
    build_loop_constraint,
    kf_features,
    merge_loop_mps,
    run_global_ba,
    run_global_ba_joint,
    verify_loop,
)
from .mapstate import MapState
from .ops import se2
from .ops.camera import CameraModel
from .solver.poseonly import solve_pose_only

__all__ = ["find_cross_pair", "align_transform", "transform_map",
           "concat_maps", "merge_maps", "merge_many"]


def _check_layouts(ms_a: MapState, ms_b: MapState):
    """Friendly error when the two maps' static layouts differ (feature
    slots N, obs fan-in P, descriptor width) — a mismatch would
    otherwise die as a cryptic broadcast/scatter shape error deep in
    vocab training or concatenation."""
    probes = (
        ("features per KF (Capacity.n_features)", ms_a.N, ms_b.N),
        ("obs fan-in (Capacity.max_obs_per_mp)",
         ms_a.mp_obs_kf.shape[1], ms_b.mp_obs_kf.shape[1]),
        ("descriptor width", ms_a.kf_desc.shape[-1], ms_b.kf_desc.shape[-1]),
    )
    for name, a, b in probes:
        if a != b:
            raise ValueError(
                f"map layouts differ in {name}: {a} vs {b} — both maps "
                "must be built with the same Capacity feature layout"
            )


def _kf_bank(vocab, ms: MapState):
    v, _ = jax.vmap(
        lambda d, m: vocab_mod.bow_transform(vocab, d, m)
    )(ms.kf_desc, ms.kf_feat_valid & ms.kf_valid[:, None])
    return v


def find_cross_pair(ms_a: MapState, ms_b: MapState, vocab=None,
                    n_words: int = 512, key=None, top_k: int = 5):
    """Top cross-map keyframe pairs by BoW score.

    Returns (pairs, vocab) with ``pairs`` a score-descending list of
    (ka, kb, score) — candidates, not certainties: the best-scoring
    pair can fail geometric verification while a runner-up passes (the
    Localizer's top-3 relocalization pattern, src/Localizer.cpp:337-392),
    so callers try them in order. A shared vocabulary is trained on the
    union of both maps' descriptors when none is given (words must
    cover BOTH environments or the scores are meaningless).
    """
    _check_layouts(ms_a, ms_b)
    if key is None:
        key = jax.random.PRNGKey(0)
    if vocab is None:
        Ka, Kb, N = ms_a.K, ms_b.K, ms_a.N
        desc = jnp.concatenate(
            [ms_a.kf_desc.reshape(-1, 256), ms_b.kf_desc.reshape(-1, 256)]
        )
        valid = jnp.concatenate([
            (ms_a.kf_feat_valid & ms_a.kf_valid[:, None]).reshape(-1),
            (ms_b.kf_feat_valid & ms_b.kf_valid[:, None]).reshape(-1),
        ])
        doc_ids = jnp.concatenate([
            jnp.repeat(jnp.arange(Ka, dtype=jnp.int32), N),
            jnp.repeat(jnp.arange(Kb, dtype=jnp.int32), N) + Ka,
        ])
        vocab = vocab_mod.train_vocab(
            desc, valid, n_words=n_words, key=key,
            doc_ids=doc_ids, n_docs_cap=Ka + Kb,
        )
    bank_a = _kf_bank(vocab, ms_a)                       # (Ka, W)
    bank_b = _kf_bank(vocab, ms_b)                       # (Kb, W)
    # bow_score carries the all-zero-vector guard (an unmasked empty
    # row scores 0.5 against ANY query — above every gate)
    scores = jax.vmap(lambda v: vocab_mod.bow_score(bank_a, v))(bank_b)
    scores = jnp.where(
        ms_b.kf_valid[:, None] & ms_a.kf_valid[None, :], scores, -jnp.inf
    )
    top_s, top_i = jax.lax.top_k(scores.reshape(-1), top_k)
    Ka = scores.shape[1]
    pairs = [
        (int(i) % Ka, int(i) // Ka, float(s))
        for s, i in zip(top_s, top_i) if jnp.isfinite(s)
    ]
    return pairs, vocab


def align_transform(ms_a: MapState, ka: int, ms_b: MapState, kb: int,
                    cfg: SystemConfig, key=None,
                    min_inliers: int = 15):
    """SE(2) transform T with ``compose(T, pose_b)`` in A's world frame.

    B's keyframe ``kb`` relocalizes against A's keyframe ``ka``
    (the Localizer's BoW-relocalization shape): descriptor match +
    RANSAC for 2D-3D correspondences, then a pose-only solve on A's
    fixed map points seeded at A's candidate pose. Returns
    (T (3,), n_inliers) or (None, n) when verification fails.
    """
    from .localizer import _relocalize_verify

    if key is None:
        key = jax.random.PRNGKey(1)
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    Tcb = jnp.asarray(cfg.Tcb_mat, ms_a.kf_pose.dtype)

    feats_b = kf_features(ms_b, kb)
    n_in, mp_idx, uv, pair = _relocalize_verify(
        ms_a, jnp.asarray(ka), feats_b, key,
        n_trials=cfg.cap.ransac_trials,
    )
    if int(n_in) < min_inliers:
        return None, int(n_in)
    pose_in_a, _chi, n_solve = solve_pose_only(
        ms_a.kf_pose[ka], ms_a.mp_pos[mp_idx], uv, pair, cam, Tcb,
        iters=30, huber_delta=float(cfg.th_huber2) ** 0.5,
    )
    if int(n_solve) < min_inliers:
        return None, int(n_solve)
    T = se2.compose(pose_in_a, se2.inv(ms_b.kf_pose[kb]))
    return jnp.asarray(T), int(n_solve)


@jax.jit
def transform_map(ms: MapState, T) -> MapState:
    """Rigid SE(2) transform of a whole map: keyframe poses composed
    with T; map-point xy rotated+translated (z is height, unchanged);
    viewing normals rotated. Relative quantities (preintegration,
    feature-edge measurements, camera-frame view estimates, raw
    odometry readings) are frame-internal and untouched."""
    R = se2.rot2(T[2])
    new_pose = jax.vmap(lambda p: se2.compose(T, p))(ms.kf_pose)
    new_pose = jnp.where(ms.kf_valid[:, None], new_pose, ms.kf_pose)
    xy = ms.mp_pos[:, :2] @ R.T + T[:2]
    new_mp = jnp.concatenate([xy, ms.mp_pos[:, 2:]], axis=-1)
    new_mp = jnp.where(ms.mp_valid[:, None], new_mp, ms.mp_pos)
    nxy = ms.mp_normal[:, :2] @ R.T
    new_nrm = jnp.concatenate([nxy, ms.mp_normal[:, 2:]], axis=-1)
    return ms._replace(kf_pose=new_pose, mp_pos=new_mp, mp_normal=new_nrm)


def concat_maps(ms_a: MapState, ms_b: MapState) -> MapState:
    """Concatenate two COMPACTED maps into A's capacity layout.

    B's keyframes land in slots [n_kf_a, n_kf_a + n_kf_b), its map
    points in [n_mp_a, n_mp_a + n_mp_b); every cross-table index
    (observation tables, odometry chain, main-KF anchors, covisibility,
    feature edges) is offset accordingly. Raises ValueError when the
    union exceeds A's capacities (raise ``Capacity`` and rebuild, or
    prune first)."""
    _check_layouts(ms_a, ms_b)
    na, nb = int(ms_a.n_kf), int(ms_b.n_kf)
    ma, mb = int(ms_a.n_mp), int(ms_b.n_mp)
    K, M = ms_a.K, ms_a.M
    if na + nb > K or ma + mb > M:
        raise ValueError(
            f"concat_maps: union ({na}+{nb} KFs, {ma}+{mb} MPs) exceeds "
            f"capacity (K={K}, M={M}); prune or enlarge Capacity"
        )
    F = ms_a.ftr_i.shape[0]
    i32 = jnp.int32

    def cat_kf(xa, xb):
        """Rows [na, na+nb) of the output take B's rows [0, nb)."""
        idx = jnp.arange(K)
        src = jnp.clip(idx - na, 0, ms_b.K - 1)
        from_b = (idx >= na) & (idx < na + nb)
        shape = (K,) + (1,) * (xa.ndim - 1)
        return jnp.where(from_b.reshape(shape), xb[src], xa)

    def cat_mp(xa, xb):
        idx = jnp.arange(M)
        src = jnp.clip(idx - ma, 0, ms_b.M - 1)
        from_b = (idx >= ma) & (idx < ma + mb)
        shape = (M,) + (1,) * (xa.ndim - 1)
        return jnp.where(from_b.reshape(shape), xb[src], xa)

    def off_kf(x):      # B values that are KF slots
        return jnp.where(x >= 0, x + na, -1)

    def off_mp(x):      # B values that are MP slots
        return jnp.where(x >= 0, x + ma, -1)

    # covisibility: block diagonal
    covis = ms_a.covis
    idx = jnp.arange(K)
    src = jnp.clip(idx - na, 0, ms_b.K - 1)
    from_b = (idx >= na) & (idx < na + nb)
    covis_b_full = ms_b.covis[src][:, src] & from_b[:, None] & from_b[None, :]
    covis = covis | covis_b_full

    # feature edges: A's valid rows first, B's (offset) appended
    fa = int(jnp.sum(ms_a.ftr_valid))
    fb = int(jnp.sum(ms_b.ftr_valid))
    if fa + fb > F:
        raise ValueError("concat_maps: feature-edge table overflow")
    import numpy as np

    ftr_i = np.full(F, -1, np.int32)
    ftr_j = np.full(F, -1, np.int32)
    ftr_meas = np.zeros((F, 3), np.float32)
    ftr_info = np.zeros((F, 3, 3), np.float32)
    ftr_valid = np.zeros(F, bool)
    row = 0
    for src_ms, off in ((ms_a, 0), (ms_b, na)):
        # ONE host fetch per table (per-element int()/asarray() would be
        # a device round-trip each — ~30 ms over a remote tunnel)
        vi, si, sj, sm, sf = jax.device_get((
            src_ms.ftr_valid, src_ms.ftr_i, src_ms.ftr_j,
            src_ms.ftr_meas, src_ms.ftr_info,
        ))
        for s_ in np.nonzero(vi)[0]:
            ftr_i[row] = si[s_] + off
            ftr_j[row] = sj[s_] + off
            ftr_meas[row] = sm[s_]
            ftr_info[row] = sf[s_]
            ftr_valid[row] = True
            row += 1

    out = ms_a._replace(
        kf_pose=cat_kf(ms_a.kf_pose, ms_b.kf_pose),
        kf_odom=cat_kf(ms_a.kf_odom, ms_b.kf_odom),
        kf_valid=cat_kf(ms_a.kf_valid, ms_b.kf_valid),
        kf_xy=cat_kf(ms_a.kf_xy, ms_b.kf_xy),
        kf_octave=cat_kf(ms_a.kf_octave, ms_b.kf_octave),
        kf_angle=cat_kf(ms_a.kf_angle, ms_b.kf_angle),
        kf_feat_valid=cat_kf(ms_a.kf_feat_valid, ms_b.kf_feat_valid),
        kf_desc=cat_kf(ms_a.kf_desc, ms_b.kf_desc),
        kf_obs_mp=cat_kf(ms_a.kf_obs_mp, off_mp(ms_b.kf_obs_mp)),
        kf_view_mp=cat_kf(ms_a.kf_view_mp, ms_b.kf_view_mp),
        kf_view_info=cat_kf(ms_a.kf_view_info, ms_b.kf_view_info),
        kf_pre_next=cat_kf(ms_a.kf_pre_next, off_kf(ms_b.kf_pre_next)),
        kf_pre_meas=cat_kf(ms_a.kf_pre_meas, ms_b.kf_pre_meas),
        kf_pre_cov=cat_kf(ms_a.kf_pre_cov, ms_b.kf_pre_cov),
        covis=covis,
        ftr_i=jnp.asarray(ftr_i),
        ftr_j=jnp.asarray(ftr_j),
        ftr_meas=jnp.asarray(ftr_meas),
        ftr_info=jnp.asarray(ftr_info),
        ftr_valid=jnp.asarray(ftr_valid),
        mp_pos=cat_mp(ms_a.mp_pos, ms_b.mp_pos),
        mp_valid=cat_mp(ms_a.mp_valid, ms_b.mp_valid),
        mp_good_prl=cat_mp(ms_a.mp_good_prl, ms_b.mp_good_prl),
        mp_desc=cat_mp(ms_a.mp_desc, ms_b.mp_desc),
        mp_desc_votes=cat_mp(ms_a.mp_desc_votes, ms_b.mp_desc_votes),
        mp_normal=cat_mp(ms_a.mp_normal, ms_b.mp_normal),
        mp_main_kf=cat_mp(ms_a.mp_main_kf, off_kf(ms_b.mp_main_kf)),
        mp_main_feat=cat_mp(ms_a.mp_main_feat, ms_b.mp_main_feat),
        mp_main_octave=cat_mp(ms_a.mp_main_octave, ms_b.mp_main_octave),
        mp_min_dist=cat_mp(ms_a.mp_min_dist, ms_b.mp_min_dist),
        mp_max_dist=cat_mp(ms_a.mp_max_dist, ms_b.mp_max_dist),
        mp_obs_kf=cat_mp(ms_a.mp_obs_kf, off_kf(ms_b.mp_obs_kf)),
        mp_obs_feat=cat_mp(ms_a.mp_obs_feat, ms_b.mp_obs_feat),
        mp_n_obs=cat_mp(ms_a.mp_n_obs, ms_b.mp_n_obs),
        n_kf=jnp.asarray(na + nb, i32),
        n_mp=jnp.asarray(ma + mb, i32),
    )
    return out


def merge_maps(ms_a: MapState, ms_b: MapState, cfg: SystemConfig,
               key=None, vocab=None, run_gba: bool = True):
    """Merge map B into map A's frame and capacity layout.

    Returns (merged MapState, info dict) — info carries the chosen
    keyframe pair, BoW score, alignment inliers, seam-edge residual,
    duplicate map points fused, and the shared vocabulary (for a
    subsequent Localizer / LoopCloser over the merged map). Raises
    ValueError when no cross-map correspondence verifies (the maps may
    not overlap).
    """
    if key is None:
        key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)

    ms_a, _, _ = compact_map(ms_a)
    ms_b, _, _ = compact_map(ms_b)

    pairs, vocab = find_cross_pair(ms_a, ms_b, vocab, key=k1)
    pairs = [p for p in pairs if p[2] >= cfg.gm_dcl_min_score_best]
    if not pairs:
        raise ValueError(
            "merge_maps: no cross-map BoW score reaches the acceptance "
            f"gate {cfg.gm_dcl_min_score_best} — no overlap?"
        )

    # Candidates are tried in score order; each must pass BOTH the
    # alignment solve AND the LoopCloser's full verification gates
    # (gm_vcl_*) on the concatenated map BEFORE anything is mutated —
    # an unverified seam would fuse physically distinct landmarks and
    # bake the error in with a global BA.
    na = int(ms_a.n_kf)
    tried = []
    for ka, kb, score in pairs:
        T, n_align = align_transform(
            ms_a, ka, ms_b, kb, cfg,
            key=jax.random.fold_in(k2, ka * 131 + kb),
        )
        if T is None:
            tried.append((ka, kb, f"{n_align} align inliers"))
            continue
        ms = concat_maps(ms_a, transform_map(ms_b, T))
        kb_m = kb + na                  # B's seam keyframe, merged slots

        match_idx, n_kp, n_mp_pairs, n_cur = verify_loop(
            ms, jnp.asarray(kb_m), jnp.asarray(ka), k3,
            n_trials=cfg.cap.ransac_trials,
        )
        n_kp, n_mp_pairs, n_cur = map(
            int, jax.device_get((n_kp, n_mp_pairs, n_cur))
        )
        if (
            n_mp_pairs < cfg.gm_vcl_num_min_match_mp
            or n_kp < cfg.gm_vcl_num_min_match_kp
            or n_mp_pairs < cfg.gm_vcl_ratio_min_match_mp * max(n_cur, 1)
        ):
            tried.append(
                (ka, kb, f"verify {n_kp} kp / {n_mp_pairs} mp")
            )
            continue
        meas, cinfo, n_good, _good = build_loop_constraint(
            ms, jnp.asarray(kb_m), jnp.asarray(ka), match_idx, cfg
        )
        n_good = int(n_good)
        if n_good < cfg.gm_vcl_num_min_match_mp:
            tried.append((ka, kb, f"constraint {n_good} good"))
            continue

        # all gates passed: commit the weld — edge direction per
        # ftr_meas's "j in i's frame" (build_loop_constraint's meas is
        # "k in cand's frame" → i=cand, j=k, the LoopCloser's ordering)
        ms = add_ftr_edge(
            ms, jnp.asarray(ka), jnp.asarray(kb_m), meas, cinfo,
            evict_if_full=True,  # the seam IS a verified closure
        )
        n_before = int(jnp.sum(ms.mp_valid))
        ms = merge_loop_mps(
            ms, jnp.asarray(kb_m), jnp.asarray(ka), match_idx
        )
        # fused landmarks create seam covisibility that no insertion
        # ever recorded: rebuild the matrix from the observation tables
        # so local-graph BFS and localization see across the seam
        ms = recompute_covis(ms)
        info = {
            "pair": (ka, kb), "bow_score": score,
            "align_inliers": n_align, "n_kp": n_kp,
            "n_mp_pairs": n_mp_pairs, "vocab": vocab,
            "mps_fused": n_before - int(jnp.sum(ms.mp_valid)),
            "seam_edge_inliers": n_good,
        }
        if run_gba:
            ms, gba_info = run_global_ba(ms, iters=cfg.global_iter)
            info["gba_chi2"] = float(gba_info["chi2"])
            if cfg.gm_joint_ba_iters > 0:
                # the joint reprojection polish every in-map closure
                # gets (the pose graph only spreads the single seam
                # edge; the fused co-observations hold the seam)
                ms, joint_info = run_global_ba_joint(
                    ms, cfg, iters=cfg.gm_joint_ba_iters
                )
                info["joint_chi2"] = float(joint_info["chi2"])
        return ms, info

    raise ValueError(
        "merge_maps: every cross-map candidate failed verification "
        f"(pair, reason): {tried}"
    )


def merge_many(maps, cfg: SystemConfig, key=None):
    """Left-fold ``merge_maps`` over a list of maps (N-robot rendezvous).

    Each step retrains the union vocabulary, so later maps score against
    words covering everything merged so far. Returns (merged, infos) —
    one info dict per fold step. Order matters only for the gauge (the
    first map's frame wins); a map with no overlap against the running
    union raises, identifying its position.
    """
    if len(maps) < 2:
        raise ValueError("merge_many needs at least two maps")
    if key is None:
        key = jax.random.PRNGKey(7)
    ms, infos = maps[0], []
    for i, nxt in enumerate(maps[1:], start=1):
        key, sub = jax.random.split(key)
        try:
            ms, info = merge_maps(ms, nxt, cfg, key=sub)
        except ValueError as e:
            raise ValueError(f"merge_many: map #{i} failed: {e}") from e
        if i < len(maps) - 1:
            info.pop("vocab", None)   # only the final union vocab is kept
        infos.append(info)
    return ms, infos
