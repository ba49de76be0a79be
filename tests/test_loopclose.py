"""Loop-closure stack tests: vocabulary scoring, the sparsified pair
constraint, and full-loop detection + global correction on a drifted
circular trajectory (the GlobalMapper role)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se2lam_tpu import loopclose, vocab as vocab_mod
from se2lam_tpu.ops import se2
from se2lam_tpu.ops.camera import CameraModel
from se2lam_tpu.solver.sparsifier import marginalize_pair_constraint

from synth_utils import TCB, feats_at, make_cfg, make_scene


# ---------------------------------------------------------------------------
# vocabulary
# ---------------------------------------------------------------------------

def test_vocab_same_scene_scores_higher(rng):
    D = 512
    descs = (1 - 2 * (rng.random((3, D, 256)) < 0.5)).astype(np.int8)
    valid = jnp.ones((D,), bool)
    # frame B shares 60% of frame A's descriptors; frame C is independent
    shared = int(D * 0.6)
    descs[1, :shared] = descs[0, :shared]
    train = jnp.asarray(descs.reshape(-1, 256))
    voc = vocab_mod.train_vocab(
        train, jnp.ones((3 * D,), bool), n_words=128, iters=4
    )
    va, _ = vocab_mod.bow_transform(voc, jnp.asarray(descs[0]), valid)
    vb, _ = vocab_mod.bow_transform(voc, jnp.asarray(descs[1]), valid)
    vc, _ = vocab_mod.bow_transform(voc, jnp.asarray(descs[2]), valid)
    bank = jnp.stack([va, vb, vc])
    s = np.asarray(vocab_mod.bow_score(bank, va))
    assert s[0] == pytest.approx(1.0, abs=1e-5)  # self-score = 1
    assert s[1] > s[2] + 0.05                    # overlap ranks higher
    # an all-zero QUERY (frame with no valid descriptors) scores 0.5
    # against every nonzero row under the raw L1 formula — above every
    # detection gate — so it must score -inf everywhere instead
    s0 = np.asarray(vocab_mod.bow_score(bank, jnp.zeros_like(va)))
    assert np.all(np.isneginf(s0))


# ---------------------------------------------------------------------------
# sparsifier
# ---------------------------------------------------------------------------

def test_pair_constraint_info_spd_and_scales(rng):
    cam = CameraModel.create(420.0, 420.0, 320.0, 240.0)
    Tcb = jnp.asarray(TCB, jnp.float32)
    pose_i = jnp.asarray([0.0, 0.0, 0.0])
    pose_j = jnp.asarray([0.5, 0.1, 0.05])
    M = 40
    pts = jnp.asarray(
        np.stack(
            [rng.uniform(3, 6, M), rng.uniform(-2, 2, M), rng.uniform(-1, 1, M)],
            -1,
        ),
        jnp.float32,
    )

    def uv_of(pose):
        from se2lam_tpu import factors

        return jax.vmap(
            lambda x: factors.se2xyz_residual(pose, x, jnp.zeros(2), cam, Tcb)
        )(pts)

    uv_i, uv_j = uv_of(pose_i), uv_of(pose_j)
    many = jnp.ones((M,), bool)
    few = jnp.arange(M) < 8

    meas, info_many = marginalize_pair_constraint(
        pose_i, pose_j, pts, uv_i, uv_j, many, cam, Tcb
    )
    _, info_few = marginalize_pair_constraint(
        pose_i, pose_j, pts, uv_i, uv_j, few, cam, Tcb
    )
    np.testing.assert_allclose(
        np.asarray(meas), np.asarray(se2.minus(pose_j, pose_i)), atol=1e-6
    )
    ev_many = np.linalg.eigvalsh(np.asarray(info_many))
    ev_few = np.linalg.eigvalsh(np.asarray(info_few))
    assert (ev_many > 0).all() and (ev_few > 0).all()
    assert (ev_many <= 1e4 + 1).all()
    # more observations → more information
    assert np.trace(np.asarray(info_many)) > np.trace(np.asarray(info_few))


# ---------------------------------------------------------------------------
# end-to-end loop closure on a drifted circle
# ---------------------------------------------------------------------------

def circle_poses(n, radius=2.0):
    ts = np.linspace(0, 2 * np.pi, n)
    th = np.arctan2(np.sin(ts + np.pi / 2), np.cos(ts + np.pi / 2))
    return np.stack(
        [radius * np.cos(ts), radius * np.sin(ts), th], -1
    ).astype(np.float32)


def test_full_loop_closure_reduces_drift(rng):
    """Drive a full circle with drifting odometry; when the rover returns
    to the start the LoopCloser must fire and global BA must pull the
    final pose back toward ground truth."""
    from se2lam_tpu import localmap, tracking
    from se2lam_tpu.mapstate import empty_map

    n_feats = 96
    cfg = make_cfg(
        n_feats,
        gm_dcl_min_kfid_offset=8,
        gm_vcl_num_min_match_mp=10,
        gm_vcl_num_min_match_kp=15,
        min_frames_between_kf=1,
        max_frames_between_kf=3,
    )
    # landmarks all around the circle (room walls)
    pts = np.stack(
        [
            rng.uniform(-6, 6, n_feats),
            rng.uniform(-6, 6, n_feats),
            rng.uniform(-0.5, 1.5, n_feats),
        ],
        -1,
    )
    # push them outside the circle so they're visible from the rim
    r = np.linalg.norm(pts[:, :2], axis=1)
    pts[:, :2] *= (5.0 / np.maximum(r, 1e-6))[:, None]
    bits = (rng.random((n_feats, 256)) < 0.5).astype(np.uint8)

    n = 90
    gt = circle_poses(n, radius=2.0)
    # drifted odometry
    nrng = np.random.default_rng(5)
    odo = [gt[0]]
    for i in range(1, n):
        d = np.asarray(se2.minus(jnp.asarray(gt[i]), jnp.asarray(gt[i - 1])))
        d = d + np.asarray([0.002, 0.001, 0.0015]) + nrng.normal(
            0, [0.001, 0.001, 0.001]
        ).astype(np.float32)
        odo.append(
            np.asarray(
                se2.compose(jnp.asarray(odo[-1]), jnp.asarray(d, jnp.float32)),
                np.float32,
            )
        )
    odo = np.stack(odo)

    closer = loopclose.LoopCloser(
        cfg, n_words=64, min_kfs_to_train=10, global_ba_iters=10
    )
    ms = empty_map(cfg.cap)
    f0 = feats_at(cfg, gt[0], pts, bits)
    ms = localmap.insert_first_kf(ms, f0, jnp.asarray(odo[0]), jnp.asarray(odo[0]))
    view, mask = localmap.kf_track_seed(ms, 0)
    ts = tracking.init_track_state(
        f0, jnp.asarray(odo[0]), jnp.asarray(odo[0]), 0, view, mask
    )
    kfs = [0]
    kf_gt = {0: gt[0]}
    for i in range(1, n):
        f = feats_at(cfg, gt[i], pts, bits)
        ts, res = tracking.track_frame(
            ts, f, jnp.asarray(odo[i]), jax.random.PRNGKey(i), cfg
        )
        if bool(res.need_kf):
            ms, k = localmap.add_keyframe(
                ms, f, ts.cur_pose, jnp.asarray(odo[i]), ts.ref_kf_idx,
                ts.match_idx, ts.local_mps, ts.local_mp_valid, ts.good_prl,
                ts.pre_meas, ts.pre_cov, cfg,
            )
            k = int(k)
            kfs.append(k)
            kf_gt[k] = gt[i]
            ms, _ = localmap.run_local_ba(ms, jnp.asarray(k), cfg)
            ms = closer.on_new_kf(ms, k)
            # per-KF host-sync budget: ≤2 device pulls even when loop
            # and/or feature-edge candidates fire (the batched verify)
            assert closer.last_kf_pulls <= 2, closer.last_kf_pulls
            view, mask = localmap.kf_track_seed(ms, k)
            ts = tracking.init_track_state(
                f, ms.kf_pose[k], jnp.asarray(odo[i]), k, view, mask
            )

    assert closer.n_loops_closed >= 1, "no loop detected on a closed circle"
    # after closure, KF poses must be closer to gt than raw odometry was
    last_k = kfs[-1]
    est = np.asarray(ms.kf_pose[last_k][:2])
    gt_last = kf_gt[last_k][:2]
    odo_err = np.linalg.norm(odo[-1][:2] - gt[-1][:2])
    slam_err = np.linalg.norm(est - gt_last)
    assert slam_err < odo_err, (slam_err, odo_err)


# ---------------------------------------------------------------------------
# Feature-edge partner selection by graph distance (Map::SelectKFPairFeat)
# ---------------------------------------------------------------------------

def _chain_map(K=12, links=None, n_kf=None):
    import jax.numpy as jnp

    from se2lam_tpu.config import Capacity
    from se2lam_tpu.mapstate import empty_map

    cap = Capacity(n_features=16, max_kfs=K, max_mps=32)
    ms = empty_map(cap)
    links = links if links is not None else [(i, i + 1) for i in range(K - 1)]
    valid = jnp.zeros((K,), bool)
    nxt = jnp.full((K,), -1, jnp.int32)
    for a, b in links:
        nxt = nxt.at[a].set(b)
        valid = valid.at[a].set(True).at[b].set(True)
    return ms._replace(
        kf_valid=valid, kf_pre_next=nxt,
        n_kf=jnp.asarray(n_kf if n_kf is not None else K, jnp.int32),
    )


def test_select_feat_pairs_graph_distant():
    """Covisible + >5 hops along the chain → selected."""
    import jax.numpy as jnp

    from se2lam_tpu.loopclose import select_feat_pairs

    ms = _chain_map(10)
    ms = ms._replace(covis=ms.covis.at[9, 0].set(True).at[0, 9].set(True))
    out = np.asarray(select_feat_pairs(ms, 9))
    assert out[0] == 0 and (out[1:] == -1).all()


def test_select_feat_pairs_respects_feature_edges():
    """An existing feature edge shortcuts the graph: the same covisible
    pair becomes ≤5 hops and must NOT be re-selected (slot-id distance
    would wrongly pick it)."""
    import jax.numpy as jnp

    from se2lam_tpu.loopclose import select_feat_pairs

    ms = _chain_map(10)
    ms = ms._replace(
        covis=ms.covis.at[9, 0].set(True).at[0, 9].set(True),
        ftr_i=ms.ftr_i.at[0].set(2),
        ftr_j=ms.ftr_j.at[0].set(8),
        ftr_valid=ms.ftr_valid.at[0].set(True),
    )
    # 9 → 8 → (ftr) 2 → 1 → 0: four hops
    out = np.asarray(select_feat_pairs(ms, 9))
    assert (out == -1).all()


def test_select_feat_pairs_pruned_map_uses_hops_not_slots():
    """After pruning, the chain runs over even slots only: slot distance
    8 is just 4 hops — must be excluded (the round-1 |i−j| heuristic
    would select it)."""
    from se2lam_tpu.loopclose import select_feat_pairs

    ms = _chain_map(10, links=[(0, 2), (2, 4), (4, 6), (6, 8)])
    ms = ms._replace(covis=ms.covis.at[8, 0].set(True).at[0, 8].set(True))
    out = np.asarray(select_feat_pairs(ms, 8))
    assert (out == -1).all()


def test_select_feat_pairs_greedy_selection_blocks_neighbors():
    """Once a partner is selected it becomes adjacent to everything
    (reference GetAllConnectedKFs inserts the selected set), so a second
    candidate next to it falls inside the hop radius and is skipped."""
    from se2lam_tpu.loopclose import select_feat_pairs

    ms = _chain_map(12)
    covis = ms.covis
    for j in (0, 1):
        covis = covis.at[11, j].set(True).at[j, 11].set(True)
    ms = ms._replace(covis=covis)
    out = np.asarray(select_feat_pairs(ms, 11))
    assert out[0] == 0 and (out[1:] == -1).all()


def test_document_idf_matches_dbow2_definition():
    """idf is per-DOCUMENT: ln(N_docs / N_docs_containing_word), counted
    at most once per document regardless of how many descriptors of that
    document hit the word (TemplatedVocabulary::setNodeWeights)."""
    from se2lam_tpu.vocab import document_idf

    W = 8
    # word 0: many descriptors but all in doc 0 → Ni = 1
    # word 1: one descriptor in each of docs 0..2 → Ni = 3 (all docs)
    # word 2: docs 0 and 1 → Ni = 2
    word_ids = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 2, 2], jnp.int32)
    doc_ids = jnp.asarray([0, 0, 0, 0, 0, 1, 2, 0, 1], jnp.int32)
    valid = jnp.ones((9,), bool)
    idf = np.asarray(document_idf(word_ids, valid, doc_ids, 4, W))
    assert idf[0] == pytest.approx(np.log(3.0 / 1.0))
    assert idf[1] == pytest.approx(np.log(3.0 / 3.0))   # ubiquitous → 0
    assert idf[2] == pytest.approx(np.log(3.0 / 2.0))
    assert (idf[3:] == 0).all()                          # unused words

    # degenerate corpus: every used word in every doc → TF fallback (1.0)
    word_ids = jnp.asarray([0, 0, 1, 1], jnp.int32)
    doc_ids = jnp.asarray([0, 1, 0, 1], jnp.int32)
    idf = np.asarray(
        document_idf(word_ids, jnp.ones((4,), bool), doc_ids, 4, W)
    )
    assert idf[0] == 1.0 and idf[1] == 1.0 and (idf[2:] == 0).all()


def test_zero_bank_rows_never_win():
    """All-zero BoW rows (empty/pruned keyframes) must score -inf, not
    the raw formula's 0.5 (which would beat every real non-match)."""
    v = jnp.asarray([0.5, 0.5, 0.0, 0.0], jnp.float32)
    bank = jnp.stack([jnp.zeros(4), jnp.asarray([0.0, 0.0, 0.5, 0.5])])
    s = np.asarray(vocab_mod.bow_score(bank, v))
    assert s[0] == -np.inf
    assert s[1] == pytest.approx(0.0)


def test_loop_closes_before_kf12_with_bootstrap_vocab(rng):
    """With the bootstrap vocabulary (trained at 2 KFs, refreshed as the
    map grows) a revisit among the first dozen keyframes must close —
    round 1 could not close any loop before KF 12 because the vocabulary
    did not exist yet."""
    from se2lam_tpu import localmap, tracking
    from se2lam_tpu.mapstate import empty_map

    n_feats = 192        # 360-deg landmark spread, ~74-deg FOV → ~40 visible
    cfg = make_cfg(
        n_feats,
        gm_dcl_min_kfid_offset=5,
        gm_vcl_num_min_match_mp=8,
        gm_vcl_num_min_match_kp=12,
        min_frames_between_kf=1,
        max_frames_between_kf=2,
    )
    pts = np.stack(
        [
            rng.uniform(-6, 6, n_feats),
            rng.uniform(-6, 6, n_feats),
            rng.uniform(-0.5, 1.5, n_feats),
        ],
        -1,
    )
    r = np.linalg.norm(pts[:, :2], axis=1)
    # near walls: enough parallax across short baselines that map points
    # pass the good-parallax gate before the 6-KF culling rule fires
    pts[:, :2] *= (3.0 / np.maximum(r, 1e-6))[:, None]
    bits = (rng.random((n_feats, 256)) < 0.5).astype(np.uint8)

    n = 21
    gt = circle_poses(n, radius=1.0)
    nrng = np.random.default_rng(5)
    odo = [gt[0]]
    for i in range(1, n):
        d = np.asarray(se2.minus(jnp.asarray(gt[i]), jnp.asarray(gt[i - 1])))
        d = d + nrng.normal(0, [0.002, 0.001, 0.001]).astype(np.float32)
        odo.append(
            np.asarray(
                se2.compose(jnp.asarray(odo[-1]), jnp.asarray(d, jnp.float32)),
                np.float32,
            )
        )
    odo = np.stack(odo)

    closer = loopclose.LoopCloser(cfg, n_words=64, global_ba_iters=10)
    ms = empty_map(cfg.cap)
    f0 = feats_at(cfg, gt[0], pts, bits)
    ms = localmap.insert_first_kf(
        ms, f0, jnp.asarray(odo[0]), jnp.asarray(odo[0])
    )
    view, mask = localmap.kf_track_seed(ms, 0)
    ts = tracking.init_track_state(
        f0, jnp.asarray(odo[0]), jnp.asarray(odo[0]), 0, view, mask
    )
    for i in range(1, n):
        f = feats_at(cfg, gt[i], pts, bits)
        ts, res = tracking.track_frame(
            ts, f, jnp.asarray(odo[i]), jax.random.PRNGKey(i), cfg
        )
        if bool(res.need_kf):
            ms, k = localmap.add_keyframe(
                ms, f, ts.cur_pose, jnp.asarray(odo[i]), ts.ref_kf_idx,
                ts.match_idx, ts.local_mps, ts.local_mp_valid, ts.good_prl,
                ts.pre_meas, ts.pre_cov, cfg,
            )
            k = int(k)
            ms, _ = localmap.run_local_ba(ms, jnp.asarray(k), cfg)
            ms = closer.on_new_kf(ms, k)
            # per-KF host-sync budget: ≤2 device pulls even when loop
            # and/or feature-edge candidates fire (the batched verify)
            assert closer.last_kf_pulls <= 2, closer.last_kf_pulls
            view, mask = localmap.kf_track_seed(ms, k)
            ts = tracking.init_track_state(
                f, ms.kf_pose[k], jnp.asarray(odo[i]), k, view, mask
            )
    assert closer.n_loops_closed >= 1, "no loop closed"
    assert closer.last_loop[1] < 12, (
        f"loop closed only at KF {closer.last_loop[1]}"
    )


def test_feat_renewal_triggers_global_ba_with_cooldown(monkeypatch):
    """The reference runs GlobalBA when the feature graph renews even
    without a verified closure, suppressed right after one ran
    (src/GlobalMapper.cpp:87-155). Drive the staged LoopCloser with a
    detection-free config and a faked verify batch: the first renewal
    must run a pose-graph GBA and report closed=True (gauge re-base),
    the next must be suppressed by the cooldown, and a renewal after a
    quiet keyframe must fire again."""
    import jax.numpy as jnp

    from se2lam_tpu import loopclose as lcm
    from se2lam_tpu.loopclose import LoopCloser

    K = 24
    ms = _chain_map(K)
    # consistent chain geometry so the pose-graph GBA is a well-posed
    # near-no-op: poses along x, preintegration measures the true step
    poses = jnp.stack(
        [jnp.arange(K, dtype=jnp.float32),
         jnp.zeros(K), jnp.zeros(K)], -1)
    ms = ms._replace(
        kf_pose=poses,
        kf_pre_meas=jnp.where(
            (ms.kf_pre_next >= 0)[:, None],
            jnp.asarray([[1.0, 0.0, 0.0]]), 0.0),
        kf_pre_cov=jnp.broadcast_to(
            1e-4 * jnp.eye(3), (K, 3, 3)),
        covis=ms.covis.at[23, 0].set(True).at[0, 23].set(True),
    )

    def fake_verify(ms_, k_, vec, keys, cfg_, n_trials):
        C = vec.shape[0]
        N = ms_.N
        return (
            jnp.full((C, N), -1, jnp.int32),        # midx
            jnp.full((C,), 50, jnp.int32),          # n_kp
            jnp.full((C,), 30, jnp.int32),          # n_mp >= 10
            jnp.full((C,), 60, jnp.int32),          # n_cur
            jnp.broadcast_to(jnp.zeros(3), (C, 3)),             # meas
            jnp.broadcast_to(10.0 * jnp.eye(3), (C, 3, 3)),     # info
            jnp.full((C,), 30, jnp.int32),          # n_good >= 10
        )

    monkeypatch.setattr(lcm, "verify_and_build_batch", fake_verify)

    from synth_utils import make_cfg

    lc = LoopCloser(make_cfg(16), detect_loops=False)

    def drive(ms_, k):
        pending = lc.start_async(ms_, k)
        closed_any = False
        while pending is not None:
            fetched = lc._pull(pending["want"])
            ms_, pending, closed = lc.advance(ms_, pending, fetched)
            closed_any = closed_any or closed
        return ms_, closed_any

    # KF 23 is covisible with KF 0 at 23 hops -> feat candidate ->
    # edge + renewal GBA
    ms1, closed1 = drive(ms, 23)
    assert closed1
    assert lc.n_renewal_gbas == 1
    assert int(jnp.sum(ms1.ftr_valid)) == 1
    assert np.isfinite(np.asarray(ms1.kf_pose)).all()

    # cooldown: an immediately following renewal is suppressed (the
    # 22<->11 pair stays >5 hops even through the new 23<->0 edge)
    ms1 = ms1._replace(
        covis=ms1.covis.at[22, 11].set(True).at[11, 22].set(True))
    ms2, closed2 = drive(ms1, 22)
    assert not closed2
    assert lc.n_renewal_gbas == 1
    # the suppressed candidate did NOT add its edge either (the
    # reference's UpdateFeatGraph still adds it; here the edge landed -
    # only the GBA was suppressed)
    assert int(jnp.sum(ms2.ftr_valid)) == 2

    # a quiet keyframe (no candidates) clears the cooldown...
    ms2 = ms2._replace(covis=jnp.zeros_like(ms2.covis))
    ms3, closed3 = drive(ms2, 21)
    assert not closed3
    # ...so the next renewal fires again (16<->3 stays >5 hops even
    # through both existing feature edges: direct 13, via 23-0 edge 11,
    # via 22-11 edge 15)
    ms3 = ms3._replace(
        covis=ms3.covis.at[16, 3].set(True).at[3, 16].set(True))
    _, closed4 = drive(ms3, 16)
    assert closed4
    assert lc.n_renewal_gbas == 2
