"""Batched Levenberg–Marquardt bundle adjustment with Schur elimination.

TPU-native replacement for the reference's g2o stack (BlockSolverX +
LinearSolverCholmod + OptimizationAlgorithmLevenberg,
include/se2lam/optimizer.h:30-34) solving the paper's SE2-XYZ factor graph
(Map::loadLocalGraph, src/Map.cpp:891-1053):

  - VertexSE2 per keyframe, VertexSBAXYZ per map point
  - PreEdgeSE2 odometry edges between consecutive KFs
  - EdgeSE2XYZ reprojection edges with plane-motion-marginalized 2x2 info
  - Huber robustifier (Config::TH_HUBER) and chi2 outlier masks

Design: instead of an irregular sparse graph + Cholmod, everything is a
fixed-shape dense-block computation. Poses/points live in padded arrays
with validity masks; residual/Jacobian blocks are built with ``vmap``;
the point blocks are eliminated with a *dense* Schur complement
(S = Hpp − Hpx Hxx⁻¹ Hpxᵀ, the same reduction the reference hand-rolls in
its Sparsifier, src/sparsifier.cpp:105-177) and the reduced camera system
is solved with a dense Cholesky — a shape XLA tiles straight onto the MXU.
Invalid (padded) entries contribute exactly zero to every Hessian block.

The LM loop is a bounded ``lax.while_loop`` with a stalled-gain early
exit (the functional analog of the
reference's abortable iteration budget, src/LocalMapper.cpp:232-302).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import factors
from ..ops import linalg
from ..ops.camera import CameraModel

__all__ = [
    "BAProblem", "BAConfig", "solve_local_ba", "ba_chi2", "obs_chi2",
    "synthetic_grid_ba",
]


def synthetic_grid_ba(rng, K, M, P, cam, Tcb, step=(0.02, 0.005),
                      theta_step=(0.002, 0.001)):
    """Synthetic SE2-XYZ problem with the M×P observation grid
    (o = m·P + p, build_global_ba's enumeration): exact projections as
    measurements, perturbed initial estimates, landmarks anchored near
    their observers so depth stays healthy at any K. One construction
    shared by tests, the PCG-preconditioner study, and the driver dryrun
    (the synthetic_pose_graph pattern). ``rng`` is a numpy Generator.
    Returns (BAProblem, true_poses)."""
    import numpy as np

    from ..ops import se2

    O = M * P
    steps = rng.normal(step[0], step[1], (K, 3)).astype(np.float32)
    steps[:, 2] = rng.normal(theta_step[0], theta_step[1], K)
    poses = np.cumsum(steps, 0)
    anchor = rng.integers(0, K, M)
    points = np.stack(
        [
            poses[anchor, 0] + rng.uniform(4, 10, M),
            poses[anchor, 1] + rng.uniform(-3, 3, M),
            rng.uniform(-1, 1, M),
        ],
        -1,
    ).astype(np.float32)
    obs_mp = np.repeat(np.arange(M, dtype=np.int32), P)
    obs_kf = np.clip(
        anchor[obs_mp] + rng.integers(-6, 7, O), 0, K - 1
    ).astype(np.int32)

    pj = jnp.asarray(poses)[obs_kf]
    xj = jnp.asarray(points)[obs_mp]
    Tcw = Tcb @ jax.vmap(lambda p: jnp.linalg.inv(se2.to_se3(p)))(pj)
    lc = jnp.einsum("oij,oj->oi", Tcw[:, :3, :3], xj) + Tcw[:, :3, 3]
    z_ok = lc[:, 2] > 1.0
    uv = jnp.stack(
        [
            cam.fx * lc[:, 0] / jnp.maximum(lc[:, 2], 1e-3) + cam.cx,
            cam.fy * lc[:, 1] / jnp.maximum(lc[:, 2], 1e-3) + cam.cy,
        ],
        -1,
    )
    prob = BAProblem(
        poses=jnp.asarray(
            poses + rng.normal(0, 0.005, (K, 3)).astype(np.float32)
            * np.asarray([1, 1, 0.3], np.float32)
        ),
        points=jnp.asarray(
            points + rng.normal(0, 0.01, (M, 3)).astype(np.float32)
        ),
        pose_valid=jnp.ones(K, bool),
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        point_valid=jnp.ones(M, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_mp=jnp.asarray(obs_mp),
        obs_uv=uv,
        obs_info=jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (O, 2, 2)),
        obs_valid=z_ok,
        edge_i=jnp.arange(K - 1, dtype=jnp.int32),
        edge_j=jnp.arange(1, K, dtype=jnp.int32),
        edge_meas=jax.vmap(se2.minus)(
            jnp.asarray(poses)[1:], jnp.asarray(poses)[:-1]
        ),
        edge_info=jnp.broadcast_to(
            2000.0 * jnp.eye(3, dtype=jnp.float32), (K - 1, 3, 3)
        ),
        edge_valid=jnp.ones(K - 1, bool),
    )
    return prob, jnp.asarray(poses)


class BAProblem(NamedTuple):
    """Fixed-capacity SE2-XYZ bundle-adjustment problem.

    K = max keyframes, M = max points, O = max observations, E = max odo edges.
    """

    poses: jnp.ndarray        # (K, 3) SE2 (x, y, theta)
    points: jnp.ndarray       # (M, 3) world XYZ
    pose_valid: jnp.ndarray   # (K,) bool
    pose_fixed: jnp.ndarray   # (K,) bool — fixed vertices (min-id KF + RefKFs)
    point_valid: jnp.ndarray  # (M,) bool

    obs_kf: jnp.ndarray       # (O,) int32 — observing KF index
    obs_mp: jnp.ndarray       # (O,) int32 — observed point index
    obs_uv: jnp.ndarray       # (O, 2) undistorted pixel measurement
    obs_info: jnp.ndarray     # (O, 2, 2) information (Σ⁻¹ from se2xyz_sigma)
    obs_valid: jnp.ndarray    # (O,) bool

    edge_i: jnp.ndarray       # (E,) int32 — from-KF index
    edge_j: jnp.ndarray       # (E,) int32 — to-KF index
    edge_meas: jnp.ndarray    # (E, 3) preintegrated SE2 measurement
    edge_info: jnp.ndarray    # (E, 3, 3) information (preintegration cov⁻¹)
    edge_valid: jnp.ndarray   # (E,) bool


class BAConfig(NamedTuple):
    iters: int = 10            # Config::LOCAL_ITER analog
    huber_delta: float = 5.0   # Config::TH_HUBER = sqrt(th_huber2=25)
    #                            (src/Config.cpp:155)
    lm_init_lambda: float = 1e-4
    lm_up: float = 10.0
    lm_down: float = 0.5
    eps: float = 1e-9
    # static layout hint: >0 promises the observation axis is the M×P
    # grid o = m*P + p (build_global_ba's enumeration of the inverse
    # observation tables), letting the assembly reshape-sum the point
    # blocks instead of materializing an (O, M) one-hot
    obs_grid_p: int = 0
    # OPTIONAL convergence early-exit: stop the LM loop once an
    # ACCEPTED step improves the robust chi2 by less than term_rel
    # (relative) — the analog of installing a g2o terminate action.
    # Default 0 = run the full iteration budget, which is what the
    # reference actually does (it installs no terminate action;
    # optimize(LOCAL_ITER) runs LOCAL_ITER rounds, src/LocalMapper.cpp:
    # 260) — and measured production windows use their whole budget at
    # tol 1e-6 anyway. A latency-capped embedder can set e.g. 1e-4.
    term_rel: float = 0.0
    # Hessian accumulation lowering when obs_grid_p == 0:
    #   "auto"    — one-hot on TPU, scatter elsewhere (the measured-best
    #               lowering per backend; see _assemble)
    #   "onehot"  — force the one-hot MXU path (lets the CPU test suite
    #               cover the exact path production local BA takes on the
    #               chip)
    #   "scatter" — force .at[].add scatter-adds
    accum: str = "auto"


def _obs_blocks(prob: BAProblem, cam: CameraModel, Tcb, huber_delta):
    """Residuals + weighted Jacobian blocks for all reprojection edges."""
    p = prob.poses[prob.obs_kf]
    x = prob.points[prob.obs_mp]
    # depth computed inside the same vmap body as the Jacobians so XLA
    # CSEs the shared camera-frame transform (a separate _obs_depth_ok
    # pass re-gathered poses/points per iteration)
    r, Jp, Jx, z = jax.vmap(
        lambda pp, xx, uu: (
            *factors.se2xyz_residual_jac(pp, xx, uu, cam, Tcb),
            factors.se2xyz_depth(pp, xx, Tcb),
        )
    )(p, x, prob.obs_uv)

    # chi2 with the edge's own information
    chi2 = jnp.einsum("oi,oij,oj->o", r, prob.obs_info, r)
    # Huber: w = delta / sqrt(chi2) above the kink (g2o RobustKernelHuber)
    sqrt_chi = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_huber = jnp.where(sqrt_chi > huber_delta, huber_delta / sqrt_chi, 1.0)
    # zero-weight observations whose point sits at/behind the camera AT
    # THE CURRENT STATE (obs_valid is fixed at build time, but LM steps
    # move poses/points): _safe_z clamps such depths to ±1e-4, whose
    # ~fx/z² Jacobians would otherwise swamp the f32 Hessian rows
    w = jnp.where(prob.obs_valid & (z > 1e-3), w_huber, 0.0)
    W = prob.obs_info * w[:, None, None]
    return r, Jp, Jx, W, chi2


# chi2 ceiling for the accept cost: observations the step cannot act on
# (behind-camera, zero-weighted in _obs_blocks) are pinned AT the ceiling
# so they cancel between the last/new accept sums instead of deciding
# them — and an in-front observation's cost saturates at the same value,
# so a step gains nothing by shoving a degenerate point across z=0
_CHI2_CAP = 1e6


def _obs_residual_depth(prob: BAProblem, cam: CameraModel, Tcb):
    """(residual, depth) per observation — the Jacobian-free evaluation
    for chi2/accept tests (the Jacobian path costs ~3.5x as much device
    time per LM iteration; round-3 microbench)."""
    return jax.vmap(
        lambda pp, xx, uu: (
            factors.se2xyz_residual(pp, xx, uu, cam, Tcb),
            factors.se2xyz_depth(pp, xx, Tcb),
        )
    )(prob.poses[prob.obs_kf], prob.points[prob.obs_mp], prob.obs_uv)


def _edge_blocks(prob: BAProblem):
    r, Ji, Jj = jax.vmap(factors.pre_se2_residual_jac)(
        prob.poses[prob.edge_i], prob.poses[prob.edge_j], prob.edge_meas
    )
    W = jnp.where(
        prob.edge_valid[:, None, None], prob.edge_info, 0.0
    )
    chi2 = jnp.einsum("ei,eij,ej->e", r, prob.edge_info, r)
    return r, Ji, Jj, W, chi2


def obs_chi2(prob: BAProblem, cam: CameraModel, Tcb):
    """Per-observation chi2 at the problem's current state — the
    removeOutlierChi2 statistic (src/LocalMapper.cpp:172-230), used to
    demote stale/mismatched observations before a full-map joint solve."""
    r_o, _ = _obs_residual_depth(prob, cam, Tcb)
    return jnp.einsum("oi,oij,oj->o", r_o, prob.obs_info, r_o)


def ba_chi2(prob: BAProblem, cam: CameraModel, Tcb, huber_delta=jnp.inf):
    """Total masked cost of the problem (diagnostic + LM accept test).

    With a finite ``huber_delta`` the observation terms use the Huber
    rho (2δ√χ² − δ² above the kink) so the LM accept decision optimizes
    the SAME robust objective the weighted steps descend — with the raw
    chi2 a single gross outlier could veto every step (g2o accepts on
    the robustified active chi2 too). Behind-camera observations carry
    zero weight in the step (_obs_blocks), so here their chi2 is pinned
    at _CHI2_CAP: a state-independent term that cancels in the accept
    comparison rather than vetoing steps the solver cannot descend.

    Jacobian-free: this runs once per LM iteration as the accept test,
    and the Jacobian evaluation is ~3.5x the residual's device cost."""
    r_o, z_o = _obs_residual_depth(prob, cam, Tcb)
    chi_o = jnp.einsum("oi,oij,oj->o", r_o, prob.obs_info, r_o)
    r_e = jax.vmap(factors.pre_se2_residual)(
        prob.poses[prob.edge_i], prob.poses[prob.edge_j], prob.edge_meas
    )
    chi_e = jnp.einsum("ei,eij,ej->e", r_e, prob.edge_info, r_e)
    chi_c = jnp.where(
        z_o > 1e-3, jnp.minimum(chi_o, _CHI2_CAP), _CHI2_CAP
    )
    rho = factors.huber_rho(chi_c, huber_delta)
    return (
        jnp.sum(jnp.where(prob.obs_valid, rho, 0.0))
        + jnp.sum(jnp.where(prob.edge_valid, chi_e, 0.0))
    )


def accumulate_obs(K, M, obs_kf, obs_mp, Hpp_o, Hxx_o, Hpx_o, bp_o, bx_o,
                   accum: str = "auto"):
    """Segment-sum the per-observation weighted blocks into the dense
    structures: (Hpp (K,K,3,3) — obs terms touch only its diagonal
    blocks, bp (K,3), Hxx (M,3,3), bx (M,3), Hpx (K,3,M,3)).

    Two lowerings, routed at trace time (``accum``: "auto" | "onehot" |
    "scatter"): TPU uses one-hot MXU matmuls — scatter-add lowers to a
    serialized sorted-segment op there (measured 1.87 ms of scatters vs
    0.3 ms of matmuls at K=48/M=2048/O=8192, DESIGN §9); CPU keeps the
    scatters (the matmuls do O·(9K+9M) redundant FLOPs there). Invalid
    observations must carry zero W blocks — their (clipped, in-range)
    indices then contribute exact zeros on either path. Shared by the
    single-device assembly and the per-device accumulation of the
    distributed solver (parallel/dist_ba.py)."""
    dtype = Hpp_o.dtype
    # HIGH (3-pass bf16) keeps the f32 operands out of the MXU's default
    # single-pass bf16 truncation — DEFAULT diverged from the scatter
    # sums by ~2e-3 relative; HIGH measures 6.5e-6 at 4.5x the speed of
    # HIGHEST (1.17 → 0.26 ms for the dominant Hpx einsum at
    # K=48/M=2048/O=8192, round-3 sweep)
    hi = jax.lax.Precision.HIGH
    diag_idx = jnp.arange(K)
    if accum == "onehot" or (
        accum == "auto" and jax.default_backend() == "tpu"
    ):
        A = (jnp.arange(K)[:, None] == obs_kf[None, :]).astype(dtype)
        Bm = (obs_mp[:, None] == jnp.arange(M)[None, :]).astype(dtype)
        Hxx = jnp.einsum("om,oab->mab", Bm, Hxx_o, precision=hi)
        bx = jnp.einsum("om,oa->ma", Bm, bx_o, precision=hi)
        Hpp_diag = jnp.einsum("ko,oab->kab", A, Hpp_o, precision=hi)
        Hpp = jnp.zeros((K, K, 3, 3), dtype)
        Hpp = Hpp.at[diag_idx, diag_idx].add(Hpp_diag)
        bp = jnp.einsum("ko,oa->ka", A, bp_o, precision=hi)
        # pose-point coupling in (K, 3, M, 3) layout — [k,a],[m,b] — so
        # the Pallas Schur kernel's (3K, 3M) view is a FREE reshape (the
        # (K,M,3,3) layout needs a strided transpose that costs more
        # than the whole reduction; measured 7 ms vs 0.16 ms at bank
        # scale)
        Hpx = jnp.einsum("ko,oab,om->kamb", A, Hpx_o, Bm, precision=hi)
    else:
        Hxx = jnp.zeros((M, 3, 3), dtype).at[obs_mp].add(Hxx_o)
        bx = jnp.zeros((M, 3), dtype).at[obs_mp].add(bx_o)
        Hpp = jnp.zeros((K, K, 3, 3), dtype)
        Hpp = Hpp.at[obs_kf, obs_kf].add(Hpp_o)
        bp = jnp.zeros((K, 3), dtype).at[obs_kf].add(bp_o)
        Hpx = jnp.zeros((K, 3, M, 3), dtype).at[
            obs_kf, :, obs_mp, :
        ].add(Hpx_o)
    return Hpp, bp, Hxx, bx, Hpx


def _assemble(prob: BAProblem, cam: CameraModel, Tcb, cfg: BAConfig):
    """Build the dense reduced system pieces.

    Returns (Hpp (3K,3K), bp (3K,), Hxx (M,3,3), bx (M,3),
             Hpx (K,M,3,3), chi2_total).
    """
    K = prob.poses.shape[0]
    M = prob.points.shape[0]

    r_o, Jp, Jx, Wo, chi_o = _obs_blocks(prob, cam, Tcb, cfg.huber_delta)
    r_e, Ji, Jj, We, chi_e = _edge_blocks(prob)

    # --- per-observation weighted blocks: JᵀW then JᵀWJ ---
    JpW = jnp.einsum("oab,oac->obc", Jp, Wo)        # (O, 3, 2) = Jpᵀ W
    JxW = jnp.einsum("oab,oac->obc", Jx, Wo)        # (O, 3, 2) = Jxᵀ W
    Hpp_o = JpW @ Jp                                 # (O, 3, 3)
    Hxx_o = JxW @ Jx                                 # (O, 3, 3)
    Hpx_o = JpW @ Jx                                 # (O, 3, 3)
    bp_o = -jnp.einsum("oab,ob->oa", JpW, r_o)      # (O, 3)
    bx_o = -jnp.einsum("oab,ob->oa", JxW, r_o)      # (O, 3)

    # --- accumulate into dense structures. Two lowerings, routed at
    #     trace time: TPU uses one-hot MXU matmuls (segment-sum as
    #     einsum — scatter-add lowers to a serialized sorted-segment op
    #     on TPU; measured 1.87 ms of scatters vs 0.3 ms of matmuls for
    #     the whole accumulation at K=48/M=2048/O=8192), CPU keeps the
    #     scatters (the matmuls do O·(9K+9M) redundant FLOPs there). ---
    dtype = prob.poses.dtype
    # HIGH, not HIGHEST — same rationale as accumulate_obs
    hi = jax.lax.Precision.HIGH
    diag_idx = jnp.arange(K)
    if cfg.obs_grid_p > 0:
        # grid layout (all backends, so CPU tests drive the same path
        # the TPU joint GBA runs): point accumulation is a free
        # reshape-sum; pose accumulation one-hots only over K — the
        # (O, M) one-hot the generic TPU path builds would be O(M²P)
        # bytes at full-map scale (3.2 GB at M=8192, P=12)
        P = cfg.obs_grid_p
        Hxx = jnp.sum(Hxx_o.reshape(M, P, 3, 3), axis=1)
        bx = jnp.sum(bx_o.reshape(M, P, 3), axis=1)
        A2 = (
            prob.obs_kf.reshape(M, P)[:, :, None]
            == jnp.arange(K)[None, None, :]
        ).astype(dtype)
        Hpp_diag = jnp.einsum(
            "mpk,mpab->kab", A2, Hpp_o.reshape(M, P, 3, 3), precision=hi
        )
        Hpp = jnp.zeros((K, K, 3, 3), dtype)
        Hpp = Hpp.at[diag_idx, diag_idx].add(Hpp_diag)
        bp = jnp.einsum(
            "mpk,mpa->ka", A2, bp_o.reshape(M, P, 3), precision=hi
        )
        Hpx = jnp.einsum(
            "mpk,mpab->kamb", A2, Hpx_o.reshape(M, P, 3, 3), precision=hi
        )
    else:
        # invalid observations carry W=0 blocks, so their (clipped,
        # in-range) indices contribute exact zeros on either lowering
        Hpp, bp, Hxx, bx, Hpx = accumulate_obs(
            K, M, prob.obs_kf, prob.obs_mp,
            Hpp_o, Hxx_o, Hpx_o, bp_o, bx_o, cfg.accum,
        )

    # --- odometry edges ---
    JiW = jnp.einsum("eab,eac->ebc", Ji, We)        # (E, 3, 3) Jiᵀ W
    JjW = jnp.einsum("eab,eac->ebc", Jj, We)
    Hpp = Hpp.at[prob.edge_i, prob.edge_i].add(JiW @ Ji)
    Hpp = Hpp.at[prob.edge_i, prob.edge_j].add(JiW @ Jj)
    Hpp = Hpp.at[prob.edge_j, prob.edge_i].add(JjW @ Ji)
    Hpp = Hpp.at[prob.edge_j, prob.edge_j].add(JjW @ Jj)
    bp = bp.at[prob.edge_i].add(-jnp.einsum("eab,eb->ea", JiW, r_e))
    bp = bp.at[prob.edge_j].add(-jnp.einsum("eab,eb->ea", JjW, r_e))

    chi2_total = jnp.sum(jnp.where(prob.obs_valid, chi_o, 0.0)) + jnp.sum(
        jnp.where(prob.edge_valid, chi_e, 0.0)
    )
    return Hpp, bp, Hxx, bx, Hpx, chi2_total


# Below this many point blocks the einsum pair is faster than the fused
# Pallas kernel (measured on v5e, examples/bench_schur.py — the T
# intermediate is small enough to stay cheap); above it the kernel wins
# by skipping the HBM roundtrip of T.
PALLAS_SCHUR_MIN_M = 2048
# VMEM ceiling of the kernel: the (3K, Tc) row panel and the f32 (3K, 3K)
# accumulator must fit together (pallas_schur.py header). Beyond this K
# the einsum pair is the only correct lowering.
PALLAS_SCHUR_MAX_K = 341


def schur_reduce(Hpp, bp, Hpx, Hxx_inv, bx):
    """Point-block elimination: S = Hpp − Hpx·Hxx⁻¹·Hpxᵀ and the reduced
    rhs b = bp − Hpx·Hxx⁻¹·bx. ``Hpx`` is (K, 3, M, 3) — [k,a],[m,b].

    Routes at trace time: bank-scale problems on TPU go through the
    fused Pallas kernel (solver/pallas_schur.py — the T = Hpx·Hxx⁻¹
    intermediate never touches HBM); window-scale problems — and pose
    counts past the kernel's VMEM ceiling — use the einsum pair, which
    XLA maps straight onto the MXU."""
    K, M = Hpx.shape[0], Hpx.shape[2]
    if (
        M >= PALLAS_SCHUR_MIN_M
        and K <= PALLAS_SCHUR_MAX_K
        and jax.default_backend() == "tpu"
    ):
        from .pallas_schur import schur_reduce_pallas

        S_red = schur_reduce_pallas(Hpx, Hxx_inv)
        y = jnp.einsum("mab,mb->ma", Hxx_inv, bx)
        return Hpp - S_red, bp - jnp.einsum("kamb,mb->ka", Hpx, y)
    T = jnp.einsum("kamb,mbc->kamc", Hpx, Hxx_inv)          # (K,3,M,3)
    S_red = jnp.einsum("kamb,lcmb->klac", T, Hpx)           # (K,K,3,3)
    return Hpp - S_red, bp - jnp.einsum("kamb,mb->ka", T, bx)


def _fix_gauge(Hpp_d, bp_d, free3):
    """Fix variables by zeroing their rows/cols and unit diagonal.

    free3: (3K,) 1.0 for free coordinates, 0.0 for fixed.
    """
    Hpp_d = Hpp_d * free3[:, None] * free3[None, :]
    Hpp_d = Hpp_d + jnp.diag(1.0 - free3)
    bp_d = bp_d * free3
    return Hpp_d, bp_d


def _solve_inner(prob, cam, Tcb, cfg, lam):
    """One damped GN step; returns (dpose, dpoint, chi2_before)."""
    K = prob.poses.shape[0]
    M = prob.points.shape[0]
    dtype = prob.poses.dtype

    Hpp, bp, Hxx, bx, Hpx, chi2 = _assemble(prob, cam, Tcb, cfg)

    # LM damping on block diagonals — Marquardt (λ·diag(H)), NOT
    # additive λI: the SE2-XYZ system's curvature spans ~11 decades
    # (pose-θ rows ~1e6 from hundreds of f=260 reprojections, weak
    # point-depth rows ~1) so a shared additive λ either crushes the
    # sloppy directions or leaves the stiff ones untouched — observed
    # as mid-run LM stalls (chi2 stuck, λ→1e2, steps rejected) that
    # dragged the whole KF chain (artifacts/drift_study_r5). Same fix
    # the distributed PCG already carries (parallel/dist_ba.py).
    eyeK = jnp.eye(3, dtype=dtype)
    diag_idx = jnp.arange(K)
    # Per-direction floors are BLOCK-relative: a 2-observation
    # zero-parallax point has ~zero curvature along its depth direction,
    # and λ·d with d≈0 damps nothing there — the GN step explodes along
    # the null direction, chi2 rises, every step is rejected and the
    # window stalls at λ≈1e2. Flooring each direction at 1e-3 of its
    # block's stiffest direction keeps the damped step bounded in every
    # direction without touching well-conditioned blocks.
    dpp = jnp.diagonal(
        Hpp[diag_idx, diag_idx], axis1=-2, axis2=-1
    )                                                   # (K, 3)
    dpp = jnp.maximum(
        dpp, 1e-3 * jnp.max(dpp, axis=-1, keepdims=True) + 1e-6
    )
    Hpp = Hpp.at[diag_idx, diag_idx].add(
        lam * dpp[..., None] * eyeK[None]
    )
    dxx = jnp.diagonal(Hxx, axis1=-2, axis2=-1)         # (M, 3)
    dxx = jnp.maximum(
        dxx, 1e-3 * jnp.max(dxx, axis=-1, keepdims=True) + 1e-6
    )
    Hxx = Hxx + lam * dxx[..., None] * eyeK[None]

    # regularize + invert point blocks; invalid points get identity (their
    # rows of Hpx are zero so they contribute nothing to S)
    Hxx_safe = jnp.where(
        prob.point_valid[:, None, None],
        Hxx + cfg.eps * eyeK[None],
        eyeK[None],
    )
    Hxx_inv = linalg.inv3x3(Hxx_safe)

    S, b_red = schur_reduce(Hpp, bp, Hpx, Hxx_inv, bx)

    # to dense (3K, 3K)
    S_d = S.transpose(0, 2, 1, 3).reshape(3 * K, 3 * K)
    b_d = b_red.reshape(3 * K)

    free = prob.pose_valid & (~prob.pose_fixed)
    free3 = jnp.repeat(free.astype(dtype), 3)
    S_d, b_d = _fix_gauge(S_d, b_d, free3)

    # dense solve: pivoted LU — at this size (3K=144) the Cholesky +
    # cho_solve pair is a latency-bound custom-call chain measuring
    # 0.80 ms on a v5e vs 0.22 ms for jnp.linalg.solve (round-3
    # microbench); the system is symmetric PD either way
    dp = jnp.linalg.solve(
        S_d + cfg.eps * jnp.eye(3 * K, dtype=dtype), b_d
    )
    dp = (dp * free3).reshape(K, 3)

    # back-substitute points: dx = Hxx⁻¹ (bx − Hpxᵀ dp)
    rhs_x = bx - jnp.einsum("kamb,ka->mb", Hpx, dp)
    dx = jnp.einsum("mab,mb->ma", Hxx_inv, rhs_x)
    dx = jnp.where(prob.point_valid[:, None], dx, 0.0)
    return dp, dx, chi2


def solve_local_ba(
    prob: BAProblem, cam: CameraModel, Tcb, cfg: BAConfig = BAConfig()
):
    """Run the bounded LM loop; returns (poses, points, info dict).

    g2o's VertexSE2 oplus is plain additive in (x, y, theta) with angle
    normalization — we update identically so convergence behavior matches.
    """
    from ..ops import se2

    def body(state):
        i, prob_k, lam, last_chi2, _ = state
        dp, dx, _ = _solve_inner(prob_k, cam, Tcb, cfg, lam)
        new_poses = prob_k.poses + dp
        new_poses = new_poses.at[..., 2].set(
            se2.normalize_angle(new_poses[..., 2])
        )
        new_points = prob_k.points + dx
        cand = prob_k._replace(poses=new_poses, points=new_points)
        new_chi2 = ba_chi2(cand, cam, Tcb, cfg.huber_delta)
        # accept on the SAME robust objective, carried across iterations
        # (comparing against _assemble's raw chi2 would bias toward
        # accepting steps that increase the robust cost: raw >= robust
        # always, grossly so when outliers are present)
        accept = new_chi2 < last_chi2
        out = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, prob_k
        )
        lam = jnp.where(accept, lam * cfg.lm_down, lam * cfg.lm_up)
        # converged: an ACCEPTED step improved chi2 by < term_rel
        # relative (only when the opt-in early exit is enabled).
        # Rejected steps never converge (they raise lambda and retry).
        done = accept & (
            last_chi2 - new_chi2 <= cfg.term_rel * last_chi2
        ) if cfg.term_rel > 0 else jnp.asarray(False)
        return (i + 1, out, lam,
                jnp.where(accept, new_chi2, last_chi2), done)

    def cond(state):
        i, _, _, _, done = state
        return (i < cfg.iters) & ~done

    lam0 = jnp.asarray(cfg.lm_init_lambda, prob.poses.dtype)
    chi0 = ba_chi2(prob, cam, Tcb, cfg.huber_delta)
    n_it, final, lam, chi, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), prob, lam0, chi0, jnp.asarray(False)),
    )
    return final.poses, final.points, {
        "chi2": chi, "chi2_init": chi0, "lambda": lam, "iters": n_it,
    }


# NOTE: the removeOutlierChi2 gate (src/LocalMapper.cpp:172-230) lives in
# localmap.remove_outlier_obs, which operates on MapState directly — the
# same provided-but-unwired status as the reference's commented-out call
# site (src/LocalMapper.cpp:329).
