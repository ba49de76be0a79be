"""Fixed-capacity, struct-of-arrays SLAM map state.

TPU-native replacement for the reference's mutex-guarded pointer graph
(Map/KeyFrame/MapPoint, src/Map.cpp, src/KeyFrame.cpp, src/MapPoint.cpp).
Instead of shared_ptr webs and four mutexes (include/se2lam/Map.h:124-127),
the whole map is one immutable NamedTuple of padded device arrays with
validity masks; every mutation is a pure function returning a new state,
so the pipeline needs no locks and shards along the KF/MP axes.

Correspondence to the reference data model:

- ``kf_*``      ⇔ KeyFrame fields (pose, keypoints, descriptors,
                  mViewMPs/mViewMPsInfo, observation map, preintegration)
- ``mp_*``      ⇔ MapPoint fields (pos, main descriptor/KF, normal,
                  good-parallax flag, observation map)
- ``kf_obs_mp`` ⇔ KeyFrame::mDualObservations (feature → MP)
- ``mp_obs_*``  ⇔ MapPoint::mObservations (MP → (KF, feature))
- ``covis``     ⇔ covisibility sets (KeyFrame::mspCovisibleKFs)
- ``ftr_*``     ⇔ sparsified feature/loop SE2 constraints (the analog of
                  KeyFrame::mFtrMeasureFrom with SE3 replaced by SE2 —
                  exact for planar motion, see docs/DESIGN.md)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .config import Capacity
from .ops import se2, se3

__all__ = ["MapState", "empty_map", "kf_Tcw", "MAX_FTR_EDGES"]

MAX_FTR_EDGES = 256  # feature/loop constraint slots (≈ one per KF slot)


class MapState(NamedTuple):
    # --- keyframes (capacity K, features-per-KF N) ---
    kf_pose: jnp.ndarray       # (K, 3) Twb SE2
    kf_odom: jnp.ndarray       # (K, 3) raw odometry reading at KF time
    kf_valid: jnp.ndarray      # (K,) bool
    kf_xy: jnp.ndarray         # (K, N, 2) undistorted level-0 keypoint px
    kf_octave: jnp.ndarray     # (K, N) int32
    kf_angle: jnp.ndarray      # (K, N) float32
    kf_feat_valid: jnp.ndarray  # (K, N) bool
    kf_desc: jnp.ndarray       # (K, N, 256) int8 ±1 descriptors
    kf_obs_mp: jnp.ndarray     # (K, N) int32 — MP index per feature, -1 none
    kf_view_mp: jnp.ndarray    # (K, N, 3) camera-frame point estimate
    kf_view_info: jnp.ndarray  # (K, N, 3, 3) its 3x3 information

    # odometry chain with SE2 preintegration (KeyFrame::preOdomFromSelf)
    kf_pre_next: jnp.ndarray   # (K,) int32 — next KF in odo chain, -1 none
    kf_pre_meas: jnp.ndarray   # (K, 3) preintegrated SE2 measurement to next
    kf_pre_cov: jnp.ndarray    # (K, 3, 3) its covariance

    covis: jnp.ndarray         # (K, K) bool symmetric covisibility

    # sparsified feature / loop-closure SE2 constraints
    ftr_i: jnp.ndarray         # (F,) int32 from-KF
    ftr_j: jnp.ndarray         # (F,) int32 to-KF
    ftr_meas: jnp.ndarray      # (F, 3) relative SE2 (j in i frame)
    ftr_info: jnp.ndarray      # (F, 3, 3)
    ftr_valid: jnp.ndarray     # (F,) bool

    # --- map points (capacity M, obs fan-in P) ---
    mp_pos: jnp.ndarray        # (M, 3) world position
    mp_valid: jnp.ndarray      # (M,) bool
    mp_good_prl: jnp.ndarray   # (M,) bool — parallax gate for BA
    mp_desc: jnp.ndarray       # (M, 256) int8 ±1 main descriptor
    mp_desc_votes: jnp.ndarray  # (M, 256) int16 running ±1 bit votes —
    #   sign(votes) is the bitwise-majority descriptor, the minimizer of
    #   total Hamming distance to all observations (the role of
    #   MapPoint::updateMainKFandDescriptor's min-median selection,
    #   src/MapPoint.cpp:228-292, in O(1) incremental form)
    mp_normal: jnp.ndarray     # (M, 3) mean viewing direction
    mp_main_kf: jnp.ndarray    # (M,) int32
    mp_main_feat: jnp.ndarray  # (M,) int32
    mp_main_octave: jnp.ndarray  # (M,) int32
    mp_min_dist: jnp.ndarray   # (M,) view-distance gates
    mp_max_dist: jnp.ndarray   # (M,)
    mp_obs_kf: jnp.ndarray     # (M, P) int32, -1 empty
    mp_obs_feat: jnp.ndarray   # (M, P) int32
    mp_n_obs: jnp.ndarray      # (M,) int32

    n_kf: jnp.ndarray          # () int32
    n_mp: jnp.ndarray          # () int32

    @property
    def K(self):
        return self.kf_pose.shape[0]

    @property
    def M(self):
        return self.mp_pos.shape[0]

    @property
    def N(self):
        return self.kf_xy.shape[1]


def empty_map(cap: Capacity, dtype=jnp.float32) -> MapState:
    K, M, N, P = cap.max_kfs, cap.max_mps, cap.n_features, cap.max_obs_per_mp
    F = MAX_FTR_EDGES
    i32 = jnp.int32
    return MapState(
        kf_pose=jnp.zeros((K, 3), dtype),
        kf_odom=jnp.zeros((K, 3), dtype),
        kf_valid=jnp.zeros((K,), bool),
        kf_xy=jnp.zeros((K, N, 2), dtype),
        kf_octave=jnp.zeros((K, N), i32),
        kf_angle=jnp.zeros((K, N), dtype),
        kf_feat_valid=jnp.zeros((K, N), bool),
        kf_desc=jnp.zeros((K, N, 256), jnp.int8),
        kf_obs_mp=jnp.full((K, N), -1, i32),
        kf_view_mp=jnp.zeros((K, N, 3), dtype),
        kf_view_info=jnp.zeros((K, N, 3, 3), dtype),
        kf_pre_next=jnp.full((K,), -1, i32),
        kf_pre_meas=jnp.zeros((K, 3), dtype),
        kf_pre_cov=jnp.zeros((K, 3, 3), dtype),
        covis=jnp.zeros((K, K), bool),
        ftr_i=jnp.full((F,), -1, i32),
        ftr_j=jnp.full((F,), -1, i32),
        ftr_meas=jnp.zeros((F, 3), dtype),
        ftr_info=jnp.zeros((F, 3, 3), dtype),
        ftr_valid=jnp.zeros((F,), bool),
        mp_pos=jnp.zeros((M, 3), dtype),
        mp_valid=jnp.zeros((M,), bool),
        mp_good_prl=jnp.zeros((M,), bool),
        mp_desc=jnp.zeros((M, 256), jnp.int8),
        mp_desc_votes=jnp.zeros((M, 256), jnp.int16),
        mp_normal=jnp.zeros((M, 3), dtype),
        mp_main_kf=jnp.full((M,), -1, i32),
        mp_main_feat=jnp.full((M,), -1, i32),
        mp_main_octave=jnp.zeros((M,), i32),
        mp_min_dist=jnp.zeros((M,), dtype),
        mp_max_dist=jnp.full((M,), jnp.inf, dtype),
        mp_obs_kf=jnp.full((M, P), -1, i32),
        mp_obs_feat=jnp.full((M, P), -1, i32),
        mp_n_obs=jnp.zeros((M,), i32),
        n_kf=jnp.asarray(0, i32),
        n_mp=jnp.asarray(0, i32),
    )


def kf_Tcw(pose_se2, Tcb):
    """World→camera 4x4 from a body SE2 pose: Tcw = Tcb · (Twb)⁻¹
    (reference KeyFrame::setPose keeps Tcw/Twb consistent via bTc,
    src/KeyFrame.cpp:183-193)."""
    return Tcb @ se3.inv(se2.to_se3(pose_se2))
