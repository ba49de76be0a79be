"""ORB feature extraction as a single fused-array program.

TPU-native re-derivation of the reference extractor
(src/ORBextractor.cpp:463-833). Same observable behavior — image pyramid,
per-cell FAST with high→low threshold fallback, per-cell quotas with
surplus redistribution, intensity-centroid orientation, Gaussian blur,
256-bit steered BRIEF — but expressed as dense batched ops:

- per-cell FAST → one dense score map + reshape into cells + ``top_k``
- quota redistribution loop (src/ORBextractor.cpp:653-679) → one
  two-phase priority ``top_k`` (in-quota candidates outrank surplus)
- IC_Angle per keypoint (src/ORBextractor.cpp:130-157) → a constant
  disc-moment weight vector contracted against the per-keypoint patch
  (already extracted for BRIEF) — one tiny MXU matvec, no image-wide
  moment maps and no random gathers
- the 7x7 Gaussian blur (src/ORBextractor.cpp:769) → folded INTO the
  BRIEF pattern bank: each ±1 comparison weight becomes a ±(7x7
  Gaussian) stamp, so the descriptor compares blurred intensities
  without ever materializing a blurred image
- per-keypoint descriptor loop → one batched one-hot patch extraction
  (MXU matmuls, no gathers) + one constant pattern-bank matmul over all
  32 orientation bins

Outputs are fixed-capacity padded arrays: every frame yields exactly
``n_slots`` keypoint records with a validity mask, so downstream stages
compile once.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .fast import fast_score_pair, nms3x3
from .pattern import HALF_PATCH, N_BITS, PATTERN_X, PATTERN_Y

__all__ = ["OrbConfig", "OrbFeatures", "make_extractor",
           "make_batch_extractor", "pack_bits"]


class OrbConfig(NamedTuple):
    """Static extractor configuration (Settings.yml: max_feature_num,
    scale_facotr [sic], max_level — src/Config.cpp:137-139)."""

    height: int
    width: int
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 5
    fast_high: float = 20.0   # reference fastTh default
    fast_low: float = 7.0     # fallback threshold (src/ORBextractor.cpp:621)
    min_high_corners: int = 3  # "<=3 → retry at low th"
    edge: int = 16            # EDGE_THRESHOLD border exclusion
    features_per_cell: int = 3  # grid density (reference uses ~5/cell; a
    #                             finer grid pairs with per-cell argmax)
    use_harris: bool = False  # rescore responses with Harris (the
    #                           reference's optional HarrisResponses,
    #                           src/ORBextractor.cpp:85-126; selection
    #                           stays FAST-ordered either way)
    # FAST+NMS lowering: None = the fused Pallas kernel on TPU, the XLA
    # spelling elsewhere (frontend/pallas_fast.py — band-resident VMEM
    # compute instead of (16, H, W) HBM round-trips); True/False force
    use_pallas_fast: bool | None = None

    @property
    def scales(self):
        return [self.scale_factor ** l for l in range(self.n_levels)]

    @property
    def level_sigma2(self):
        return np.asarray([s * s for s in self.scales], np.float32)

    @property
    def level_quotas(self) -> Sequence[int]:
        """Geometric per-level feature budget (src/ORBextractor.cpp:484-494)."""
        f = 1.0 / self.scale_factor
        n0 = self.n_features * (1 - f) / (1 - f ** self.n_levels)
        quotas = [int(round(n0 * (f ** l))) for l in range(self.n_levels - 1)]
        quotas.append(max(self.n_features - sum(quotas), 0))
        return quotas

    @property
    def n_slots(self) -> int:
        return sum(self.level_quotas)


class OrbFeatures(NamedTuple):
    """Fixed-capacity keypoint + descriptor record for one frame."""

    xy: jnp.ndarray        # (N, 2) level-0 pixel coords (x, y)
    angle: jnp.ndarray     # (N,) radians
    octave: jnp.ndarray    # (N,) int32
    response: jnp.ndarray  # (N,) float32
    valid: jnp.ndarray     # (N,) bool
    desc_bits: jnp.ndarray  # (N, 8) uint32 packed 256-bit descriptor
    desc_pm1: jnp.ndarray   # (N, 256) int8 ±1 view for MXU matching

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def _gauss_kernel7(sigma=2.0):
    x = np.arange(-3, 4, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


_GAUSS7 = _gauss_kernel7()


# per-row half-width of the radius-15 disc (the umax table the reference
# builds at src/ORBextractor.cpp:476-492)
_DISC_U = [
    int(math.floor(math.sqrt(HALF_PATCH * HALF_PATCH - dy * dy)))
    for dy in range(-HALF_PATCH, HALF_PATCH + 1)
]


# ---------------------------------------------------------------------------
# Steered BRIEF + IC_Angle over one shared per-keypoint patch
# ---------------------------------------------------------------------------
#
# The natural formulation — gather 512 rotated pattern samples per keypoint
# from a blurred image, plus the 31x31 disc moments for IC_Angle — is a pile
# of random gathers, which TPUs execute serially (~10 ms/frame). Instead:
#   1. extract ONE (Q, S, S) raw-image patch per keypoint with two one-hot
#      matmuls (row-select then column-select — MXU work, no gather);
#   2. IC_Angle's m10/m01 are constant disc-weight contractions of that
#      patch (exactly the reference's Σ x·I / Σ y·I over the radius-15
#      disc, src/ORBextractor.cpp:130-157);
#   3. quantize the orientation to 32 bins (the classic ORB 360/32≈11°
#      stepping; keypoint coords are integers, so rounded rotated offsets
#      per bin are exactly the per-keypoint rounded offsets);
#   4. per bin the 256 comparisons are one constant matrix over the
#      flattened patch, with the reference's 7x7/σ2 Gaussian pre-blur
#      FOLDED IN: bits = (patch · W_bin) > 0 where column (b,j) carries a
#      +Gaussian stamp at the q sample and a −Gaussian stamp at the p
#      sample — evaluated for ALL bins in one (Q, S²) x (S², 32·256)
#      matmul, then the keypoint's bin is selected with a one-hot
#      contraction (no take_along_axis gather).
#
# Patch radius: pattern points have 2-norm ≤ 13 (pattern.py clamps the
# radius), rotation preserves the norm, and rounding adds ≤ 1 → rotated
# samples live in [−14, 14]; the folded blur stamp adds 3 → R = 17. The
# radius-15 IC_Angle disc also fits. Keypoints sit ≥ edge(16) px from the
# image border, so only the blur skirt (reach 17) can cross it — patch
# extraction clamps to the border row/col there (vs. the reference's
# OpenCV reflected border), a sub-quantization difference on a handful
# of border-adjacent bits.

N_ANGLE_BINS = 32
PATCH_R = 17
PATCH_S = 2 * PATCH_R + 1


def _pattern_bank():
    """(S², B·256) weights: column (b·256+j) compares pattern pair j under
    bin-b rotation, through the folded 7x7 Gaussian blur."""
    B, S, R = N_ANGLE_BINS, PATCH_S, PATCH_R
    W = np.zeros((S * S, B, N_BITS), np.float32)
    px = np.asarray(PATTERN_X, np.float64)
    py = np.asarray(PATTERN_Y, np.float64)
    g2 = np.outer(_GAUSS7, _GAUSS7).astype(np.float64)   # (7, 7)
    signs = np.where(np.arange(2 * N_BITS) % 2 == 0, -1.0, 1.0)  # p, q, p, q…
    bits = np.arange(2 * N_BITS) // 2
    for b in range(B):
        th = 2.0 * np.pi * b / B
        c, s = np.cos(th), np.sin(th)
        rx = np.round(px * c - py * s).astype(np.int64) + R
        ry = np.round(px * s + py * c).astype(np.int64) + R
        # keep the whole blur stamp inside the patch
        rx = np.clip(rx, 3, S - 4)
        ry = np.clip(ry, 3, S - 4)
        for iy in range(7):
            for ix in range(7):
                flat = (ry + iy - 3) * S + (rx + ix - 3)
                np.add.at(W, (flat, b, bits), signs * g2[iy, ix])
    return W.reshape(S * S, B * N_BITS).astype(np.float32)


_PATTERN_BANK = _pattern_bank()


def _moment_weights():
    """(S², 2) constant [x, y] disc weights for IC_Angle: contracting a
    flattened keypoint patch against this gives (m10, m01) exactly as the
    reference's disc sums (src/ORBextractor.cpp:130-157)."""
    w = np.zeros((PATCH_S, PATCH_S, 2), np.float32)
    for i, dy in enumerate(range(-HALF_PATCH, HALF_PATCH + 1)):
        u = _DISC_U[i]
        for dx in range(-u, u + 1):
            w[PATCH_R + dy, PATCH_R + dx, 0] = dx
            w[PATCH_R + dy, PATCH_R + dx, 1] = dy
    return w.reshape(PATCH_S * PATCH_S, 2)


_MOMENT_W = _moment_weights()


def _harris_response(img, ys, xs, k: float = 0.04, block: int = 7):
    """Harris corner response at keypoint positions (the reference's
    optional HarrisResponses rescoring, src/ORBextractor.cpp:85-126).

    Dense central-difference gradients, a separable ``block``-wide box
    sum of the second-moment products (static shifted adds — same trick
    as the folded blur), then a gather at the keypoints."""
    H, W = img.shape
    gx = jnp.zeros_like(img).at[:, 1:-1].set(
        0.5 * (img[:, 2:] - img[:, :-2])
    )
    gy = jnp.zeros_like(img).at[1:-1, :].set(
        0.5 * (img[2:, :] - img[:-2, :])
    )

    r = block // 2

    def box(x):
        ph = jnp.pad(x, ((0, 0), (r, r)))
        s = sum(ph[:, i : i + W] for i in range(block))
        pv = jnp.pad(s, ((r, r), (0, 0)))
        return sum(pv[i : i + H] for i in range(block))

    scale = 1.0 / (4.0 * block * 255.0)   # the reference's 1/(4·blockSize·255)
    a = box(gx * gx) * (scale * scale)
    b = box(gy * gy) * (scale * scale)
    c = box(gx * gy) * (scale * scale)
    R = (a * b - c * c) - k * (a + b) * (a + b)
    return R[ys, xs]


def _extract_patches(img, ys, xs):
    """(Q, S, S) patches at integer centers via two one-hot matmuls.

    Runs in bf16: one-hot selection accumulates exactly one nonzero term
    per output, so the only loss is the bf16 rounding of the pixel
    VALUES — exact for level 0's 8-bit integers, ≤0.5 gray for the
    interpolated upper levels (no worse than the reference's uint8
    pyramid quantization); bf16 runs ~4x faster on the MXU.
    """
    H, W = img.shape
    S, R = PATCH_S, PATCH_R
    dy = jnp.arange(-R, R + 1)
    rows = jnp.clip(ys[:, None] + dy[None, :], 0, H - 1)      # (Q, S)
    cols = jnp.clip(xs[:, None] + dy[None, :], 0, W - 1)      # (Q, S)
    imgb = img.astype(jnp.bfloat16)
    row_sel = (
        rows[:, :, None] == jnp.arange(H)[None, None, :]
    ).astype(jnp.bfloat16)                                     # (Q, S, H)
    strip = jax.lax.dot_general(
        row_sel.reshape(-1, H), imgb,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16,
    ).reshape(row_sel.shape[0], S, W)                          # (Q, S, W)
    col_sel = (
        cols[:, :, None] == jnp.arange(W)[None, None, :]
    ).astype(jnp.bfloat16)                                     # (Q, S, W)
    return jnp.einsum(
        "qsw,qtw->qst", strip, col_sel,
        preferred_element_type=jnp.bfloat16,
    )                                                          # (Q, S, S)


def _gather3x3(mapv, ys, xs):
    """(Q, 3, 3) neighborhoods of a dense map at integer centers via the
    same one-hot-matmul trick as ``_extract_patches`` — random point
    gathers lower to serial loops on TPU, two tiny matmuls do not."""
    H, W = mapv.shape
    d = jnp.arange(-1, 2)
    rows = jnp.clip(ys[:, None] + d[None, :], 0, H - 1)       # (Q, 3)
    cols = jnp.clip(xs[:, None] + d[None, :], 0, W - 1)
    # HIGHEST: the gathered values feed a second-difference (parabola
    # curvature) that cancels nearly-equal numbers — bf16 truncation of
    # the operands would reduce the subpixel offsets to rounding noise
    hi = jax.lax.Precision.HIGHEST
    row_sel = (
        rows[:, :, None] == jnp.arange(H)[None, None, :]
    ).astype(mapv.dtype)                                       # (Q, 3, H)
    strip = jnp.einsum(
        "qrh,hw->qrw", row_sel, mapv, precision=hi
    )                                                          # (Q, 3, W)
    col_sel = (
        cols[:, :, None] == jnp.arange(W)[None, None, :]
    ).astype(mapv.dtype)                                       # (Q, 3, W)
    return jnp.einsum(
        "qrw,qcw->qrc", strip, col_sel, precision=hi
    )                                                          # (Q, 3, 3)


def _moments_and_bits(level_img, ys, xs):
    """One shared patch per keypoint → (angle, brief bits).

    IC_Angle from the raw patch (the reference computes moments on the
    unblurred level image); BRIEF through the blur-folded pattern bank.
    """
    Q = ys.shape[0]
    patches = _extract_patches(level_img, ys, xs).reshape(
        Q, PATCH_S * PATCH_S
    )
    # disc moments: bf16 pixels x small-int weights (exact), f32
    # accumulation — exact at level 0 (integer pixels); upper levels
    # carry the patch's ≤0.5-gray bf16 rounding into the moments, a
    # sub-quantization perturbation of the orientation
    mom = jax.lax.dot_general(
        patches,
        jnp.asarray(_MOMENT_W, jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # (Q, 2)
    angle = jnp.arctan2(mom[:, 1], mom[:, 0])

    bank = jnp.asarray(_PATTERN_BANK, jnp.bfloat16)
    resp = jax.lax.dot_general(
        patches, bank,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(Q, N_ANGLE_BINS, N_BITS)
    binf = angle / (2.0 * jnp.pi) * N_ANGLE_BINS
    bin_idx = jnp.round(binf).astype(jnp.int32) % N_ANGLE_BINS
    onehot = (
        bin_idx[:, None] == jnp.arange(N_ANGLE_BINS)[None, :]
    ).astype(jnp.float32)                                      # (Q, B)
    sel = jnp.einsum("qbn,qb->qn", resp, onehot)
    bits = (sel > 0).astype(jnp.uint8)
    return angle, bits


def pack_bits(bits):
    """(N, 256) {0,1} → (N, 8) uint32 little-endian within each word."""
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def _resize_matrix(n_out: int, n_in: int):
    """(n_out, n_in) antialiased-linear resampling weights (the triangle
    kernel widened by the downscale factor — the same family
    jax.image.resize uses). Precomputed as a constant so each pyramid
    level is two plain MXU matmuls instead of a resize op."""
    s = n_in / n_out
    support = max(1.0, s)
    R = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        c = (i + 0.5) * s - 0.5
        lo = int(math.floor(c - support))
        hi = int(math.ceil(c + support))
        for j in range(lo, hi + 1):
            w = max(0.0, 1.0 - abs(j - c) / support)
            R[i, min(max(j, 0), n_in - 1)] += w
    R /= R.sum(axis=1, keepdims=True)
    return R.astype(np.float32)


def _level_grid(cfg: OrbConfig, H: int, W: int, quota: int):
    """Static cell layout for one pyramid level (the analog of
    levelCols/levelRows at src/ORBextractor.cpp:542-556)."""
    Hv, Wv = H - 2 * cfg.edge, W - 2 * cfg.edge
    ncx = max(1, int(round(math.sqrt(quota * Wv / (cfg.features_per_cell * max(Hv, 1))))))
    ncy = max(1, int(round(ncx * Hv / max(Wv, 1))))
    cell_h = -(-Hv // ncy)
    cell_w = -(-Wv // ncx)
    return ncy, ncx, cell_h, cell_w


def _select_level_keypoints(cfg: OrbConfig, s_high, s_low, s_low_raw,
                            quota: int):
    """Cell quotas + redistribution over precomputed FAST score maps.

    s_high/s_low: NMS'd score maps at the two thresholds; s_low_raw: the
    raw (pre-NMS) low-threshold map for subpixel refinement. Returns
    (ys, xs, ys_f, xs_f, response, valid) each (quota,) in level pixels.
    """
    H, W = s_high.shape

    # border mask
    border = jnp.zeros((H, W), bool).at[
        cfg.edge : H - cfg.edge, cfg.edge : W - cfg.edge
    ].set(True)
    s_high = jnp.where(border, s_high, 0.0)
    s_low = jnp.where(border, s_low, 0.0)

    ncy, ncx, ch, cw = _level_grid(cfg, H, W, quota)

    def to_cells(s):
        pad_h = ncy * ch - (H - 2 * cfg.edge)
        pad_w = ncx * cw - (W - 2 * cfg.edge)
        v = s[cfg.edge : H - cfg.edge, cfg.edge : W - cfg.edge]
        v = jnp.pad(v, ((0, pad_h), (0, pad_w)))
        return v.reshape(ncy, ch, ncx, cw).transpose(0, 2, 1, 3).reshape(
            ncy * ncx, ch * cw
        )

    cells_high = to_cells(s_high)
    cells_low = to_cells(s_low)

    # per-cell high→low threshold fallback (src/ORBextractor.cpp:618-622)
    n_high = jnp.sum(cells_high > 0, axis=1)
    use_high = (n_high > cfg.min_high_corners)[:, None]
    cells = jnp.where(use_high, cells_high, cells_low)

    n_cells = ncy * ncx
    # Per-cell candidates via ONE lax.top_k over each cell's pixels. The
    # reference's surplus-redistribution loop (src/ORBextractor.cpp:653-679)
    # becomes a two-phase priority: each cell's best candidate outranks
    # every cell's k-th candidate, and the global top-k fills the quota.
    # History: round 2 measured per-cell top_k LOSING to a repeated
    # masked-argmax loop (~1.5 ms) and this ran argmax+take_along_axis
    # for two rounds; the round-5 A/B on the CURRENT code
    # (examples/bench_select.py) flips it — the k_cell=6 loop's
    # take_along_axis gathers and mask rewrites cost more than one
    # fused sort (extract 1.24 → 0.91 ms/frame, identical outputs).
    k_cell = max(2, min(6, -(-2 * quota // n_cells)))
    top_scores, top_idx = jax.lax.top_k(cells, k_cell)    # (n_cells, k)
    rank = jax.lax.broadcasted_iota(jnp.int32, top_scores.shape, 1)
    nonzero = top_scores > 0.0
    # rank-major priority with the score as tie-breaker WITHIN a tier.
    # The tier stride must keep the score's f32 mantissa: FAST scores are
    # bounded by 16·255 ≈ 4e3, so tier·8192 + clipped score stays < 2^16
    # and f32-exact to ~1e-3 (a 1e9 stride would round the score away
    # entirely and degrade tie-breaking to flat-index order).
    tier = (k_cell - rank).astype(top_scores.dtype) * 8192.0
    priority = jnp.where(
        nonzero, tier + jnp.minimum(top_scores, 8191.0), -jnp.inf
    )

    sel_p, sel = jax.lax.top_k(priority.reshape(-1), quota)
    valid = sel_p > 0.0
    # arithmetic unpacking instead of value gathers: the flat layout is
    # idx = cell·k + rank and priority = (k−rank)·8192 + score with
    # FAST scores bounded by 16·255 = 4080 < 8192, so cell id, rank and
    # score all recover from the selected key itself — no
    # `flat_scores[sel]` / `cell_ids[sel]` point-gathers (small serial
    # gathers carry a fixed per-op cost on TPU; the r5 A/B measured
    # −0.16 ms/frame for this + keeping the one unavoidable gather
    # below). The recovered response carries the priority's f32
    # rounding (~4e-3 at tier scale) — `response` has no numeric
    # consumer (Harris rescoring recomputes it densely).
    r_sel = sel % k_cell
    cid = sel // k_cell
    resp = jnp.where(
        valid, sel_p - (k_cell - r_sel).astype(sel_p.dtype) * 8192.0, 0.0
    )
    within = top_idx.reshape(-1)[sel]      # the one gather left
    cy, cx = cid // ncx, cid % ncx
    wy, wx = within // cw, within % cw
    ys = cfg.edge + cy * ch + wy
    xs = cfg.edge + cx * cw + wx

    # subpixel refinement: 1D parabola through the raw FAST score at the
    # corner and its 4-neighbors (reported coordinates only — descriptor
    # sampling stays on the integer grid). The reference reports integer
    # FAST corners; the ±0.5 px quantization is a measurable floor on
    # pose accuracy, so this is a deliberate improvement. The 3x3
    # neighborhood comes from one one-hot-matmul extraction — five point
    # gathers from an (H, W) map lower to serial loops on TPU.
    nb = _gather3x3(s_low_raw, ys, xs)   # defined wherever either th fires
    s_c = nb[:, 1, 1]
    s_l, s_r = nb[:, 1, 0], nb[:, 1, 2]
    s_u, s_d = nb[:, 0, 1], nb[:, 2, 1]
    denom_x = s_l - 2.0 * s_c + s_r
    denom_y = s_u - 2.0 * s_c + s_d
    dx_sub = jnp.where(
        jnp.abs(denom_x) > 1e-6, 0.5 * (s_l - s_r) / denom_x, 0.0
    )
    dy_sub = jnp.where(
        jnp.abs(denom_y) > 1e-6, 0.5 * (s_u - s_d) / denom_y, 0.0
    )
    xs_f = xs.astype(jnp.float32) + jnp.clip(dx_sub, -0.5, 0.5)
    ys_f = ys.astype(jnp.float32) + jnp.clip(dy_sub, -0.5, 0.5)
    return ys, xs, ys_f, xs_f, resp, valid


def make_extractor(cfg: OrbConfig):
    """Build the jittable extractor fn: (H, W) float32 image → OrbFeatures."""

    level_shapes = []
    for l, s in enumerate(cfg.scales):
        level_shapes.append(
            (int(round(cfg.height / s)), int(round(cfg.width / s)))
        )
    resize_mats = [
        (
            jnp.asarray(_resize_matrix(Hl, cfg.height)),
            jnp.asarray(_resize_matrix(Wl, cfg.width)),
        )
        for (Hl, Wl) in level_shapes[1:]
    ]

    def extract(img):
        img = img.astype(jnp.float32)
        outs = []
        level_img = img
        for l in range(cfg.n_levels):
            H, W = level_shapes[l]
            if l > 0:
                Rh, Rw = resize_mats[l - 1]
                # HIGHEST: the MXU's default bf16 truncation would put
                # ~1 gray of noise on every resampled pixel (the
                # replaced jax.image.resize also ran at HIGHEST); these
                # matmuls are tiny, the precision is free
                hi = jax.lax.Precision.HIGHEST
                level_img = jnp.matmul(
                    jnp.matmul(Rh, img, precision=hi), Rw.T, precision=hi
                )
            quota = cfg.level_quotas[l]
            if quota <= 0:
                continue
            use_pallas = cfg.use_pallas_fast
            if use_pallas is None:
                use_pallas = jax.default_backend() == "tpu"
            if use_pallas:
                from .pallas_fast import fast_nms_pallas

                nms_hi, nms_lo, sl_raw = fast_nms_pallas(
                    level_img, cfg.fast_high, cfg.fast_low
                )
            else:
                sh_raw, sl_raw = fast_score_pair(
                    level_img, cfg.fast_high, cfg.fast_low
                )
                nms_hi, nms_lo = nms3x3(sh_raw), nms3x3(sl_raw)
            ys, xs, ys_f, xs_f, resp, valid = _select_level_keypoints(
                cfg, nms_hi, nms_lo, sl_raw, quota
            )

            # IC_Angle + blur-folded steered BRIEF from one shared patch
            angle, bits = _moments_and_bits(level_img, ys, xs)

            if cfg.use_harris:
                resp = _harris_response(level_img, ys, xs)

            scale = cfg.scales[l]
            outs.append(
                dict(
                    xy=jnp.stack([xs_f, ys_f], -1) * scale,
                    angle=angle,
                    octave=jnp.full(quota, l, jnp.int32),
                    response=resp,
                    valid=valid,
                    bits=bits,
                )
            )

        xy = jnp.concatenate([o["xy"] for o in outs])
        angle = jnp.concatenate([o["angle"] for o in outs])
        octave = jnp.concatenate([o["octave"] for o in outs])
        response = jnp.concatenate([o["response"] for o in outs])
        valid = jnp.concatenate([o["valid"] for o in outs])
        bits = jnp.concatenate([o["bits"] for o in outs])

        desc_bits = pack_bits(bits)
        desc_pm1 = (1 - 2 * bits.astype(jnp.int8)).astype(jnp.int8)
        # zero out invalid slots so matchers can rely on masks alone
        desc_pm1 = jnp.where(valid[:, None], desc_pm1, 0)
        return OrbFeatures(
            xy=xy,
            angle=angle,
            octave=octave,
            response=response,
            valid=valid,
            desc_bits=desc_bits,
            desc_pm1=desc_pm1,
        )

    return extract


def make_batch_extractor(cfg: OrbConfig, cam=None, undistort: bool = False):
    """Jitted (k, H, W) image stack → OrbFeatures with a leading k axis.

    One host→device transfer and ONE dispatch for a whole frame chunk
    (the per-frame transfer + dispatch + k-way feature stacking was the
    measured bottleneck of chunked feeds, DESIGN §12). Frames are cast
    to f32 on device, so uint8 camera feeds ship at 1 byte/px.

    Sequential ``lax.map``, NOT vmap: the extractor's one-hot
    patch-gather intermediates are per-frame large, and a vmapped batch
    multiplies that peak by k (observed TPU worker OOM-crash at k=24);
    map keeps single-frame peak memory in one dispatch. With
    ``undistort``, keypoints are undistorted through ``cam`` exactly as
    the per-frame path does."""
    extract_raw = make_extractor(cfg)
    if undistort:
        from ..ops.camera import undistort_points

    def one(im):
        feats = extract_raw(im.astype(jnp.float32))
        if undistort:
            feats = feats._replace(xy=undistort_points(cam, feats.xy))
        return feats

    return jax.jit(lambda img_stack: jax.lax.map(one, img_stack))
