"""ORB feature extraction as a single fused-array program.

TPU-native re-derivation of the reference extractor
(src/ORBextractor.cpp:463-833). Same observable behavior — image pyramid,
per-cell FAST with high→low threshold fallback, per-cell quotas with
surplus redistribution, intensity-centroid orientation, Gaussian blur,
256-bit steered BRIEF — but expressed as dense batched ops:

- per-cell FAST → one dense score map + reshape into cells + ``top_k``
- quota redistribution loop (src/ORBextractor.cpp:653-679) → one
  two-phase priority ``top_k`` (in-quota candidates outrank surplus)
- IC_Angle per keypoint (src/ORBextractor.cpp:130-157) → one 31x31
  moment convolution per level (MXU) + gather at keypoints
- per-keypoint descriptor loop → one batched rotate+gather

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

from .fast import fast_score, nms3x3
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


def _blur7(img):
    """Separable 7x7 Gaussian, sigma 2 (src/ORBextractor.cpp:769).

    Written as 14 static shifted multiply-adds: XLA lowers single-channel
    spatial convolutions to a pathological tiled form on TPU (~3 ms/frame
    across the pyramid for two 7-tap passes), while shifted slices fuse
    into a handful of VPU ops.
    """
    H, W = img.shape
    k = _GAUSS7
    ph = jnp.pad(img, ((0, 0), (3, 3)))
    h = sum(float(k[i]) * ph[:, i : i + W] for i in range(7))
    pv = jnp.pad(h, ((3, 3), (0, 0)))
    return sum(float(k[i]) * pv[i : i + H] for i in range(7))


# per-row half-width of the radius-15 disc (the umax table the reference
# builds at src/ORBextractor.cpp:476-492)
_DISC_U = [
    int(math.floor(math.sqrt(HALF_PATCH * HALF_PATCH - dy * dy)))
    for dy in range(-HALF_PATCH, HALF_PATCH + 1)
]


def _orientation_maps(img):
    """(2, H, W): disc-masked first moments m10/m01 for IC_Angle
    (src/ORBextractor.cpp:130-157).

    A naive 31x31 single-channel convolution lowers to ~961 shifted
    multiply-adds on the VPU (~50 ms/frame on TPU). Instead: row prefix
    sums once, then per disc row a windowed sum is two STATIC shifted
    slices — ~60 cheap vector ops total, numerically identical to the
    masked convolution. Values within EDGE border may be garbage; the
    extractor never reads them (EDGE_THRESHOLD=16 > patch radius 15).
    """
    H, W = img.shape
    R = HALF_PATCH
    dtype = img.dtype
    x = jnp.arange(W, dtype=dtype)

    zrow = jnp.zeros((H, 1), dtype)
    Z = jnp.concatenate([zrow, jnp.cumsum(img, axis=1)], axis=1)
    Zx = jnp.concatenate(
        [zrow, jnp.cumsum(img * x[None, :], axis=1)], axis=1
    )
    # pad: rows by R for vertical shifts, cols by R+1 so every window
    # slice is static
    P = R + 1
    Zp = jnp.pad(Z, ((R, R), (P, P)))
    Zxp = jnp.pad(Zx, ((R, R), (P, P)))

    m10 = jnp.zeros((H, W), dtype)
    m01 = jnp.zeros((H, W), dtype)
    for i, dy in enumerate(range(-R, R + 1)):
        u = _DISC_U[i]
        r0 = R + dy
        rZ = Zp[r0 : r0 + H]
        rZx = Zxp[r0 : r0 + H]
        # windowed sum over columns [x-u, x+u]: prefix[x+u+1] - prefix[x-u]
        hi = P + u + 1
        lo = P - u
        rs = rZ[:, hi : hi + W] - rZ[:, lo : lo + W]
        rxs = rZx[:, hi : hi + W] - rZx[:, lo : lo + W]
        m01 = m01 + dy * rs
        m10 = m10 + (rxs - x[None, :] * rs)
    return jnp.stack([m10, m01])


# ---------------------------------------------------------------------------
# Steered BRIEF as matmuls
# ---------------------------------------------------------------------------
#
# The natural formulation — gather 512 rotated pattern samples per keypoint
# from the blurred image — is a (Q, 512) random gather, which TPUs execute
# serially (~10 ms/frame). Instead:
#   1. extract a (Q, S, S) patch per keypoint with two one-hot matmuls
#      (row-select then column-select — MXU work, no gather);
#   2. quantize the orientation to 32 bins (the classic ORB 360/32≈11°
#      stepping; keypoint coords are integers, so rounded rotated offsets
#      per bin are exactly the per-keypoint rounded offsets);
#   3. per bin the 256 comparisons are one constant ±1 matrix over the
#      flattened patch: bits = (patch · W_bin) > 0 with +1 at the q
#      sample and −1 at the p sample — evaluated for ALL bins in one
#      (Q, S²) x (S², 32·256) matmul, then the keypoint's bin is selected.

N_ANGLE_BINS = 32
PATCH_R = 19          # covers the rotated pattern radius (13·√2 ≈ 18.4)
PATCH_S = 2 * PATCH_R + 1


def _pattern_bank():
    """(S², B·256) ±1 weights: column (b·256+j) compares pattern pair j
    under bin-b rotation."""
    B, S, R = N_ANGLE_BINS, PATCH_S, PATCH_R
    W = np.zeros((S * S, B, N_BITS), np.float32)
    px = np.asarray(PATTERN_X, np.float64)
    py = np.asarray(PATTERN_Y, np.float64)
    for b in range(B):
        th = 2.0 * np.pi * b / B
        c, s = np.cos(th), np.sin(th)
        rx = np.round(px * c - py * s).astype(np.int64) + R
        ry = np.round(px * s + py * c).astype(np.int64) + R
        rx = np.clip(rx, 0, S - 1)
        ry = np.clip(ry, 0, S - 1)
        flat = ry * S + rx
        for j in range(N_BITS):
            W[flat[2 * j], b, j] += -1.0      # p sample
            W[flat[2 * j + 1], b, j] += 1.0   # q sample
    return W.reshape(S * S, B * N_BITS)


_PATTERN_BANK = _pattern_bank()


def _harris_response(img, ys, xs, k: float = 0.04, block: int = 7):
    """Harris corner response at keypoint positions (the reference's
    optional HarrisResponses rescoring, src/ORBextractor.cpp:85-126).

    Dense central-difference gradients, a separable ``block``-wide box
    sum of the second-moment products (static shifted adds — same trick
    as the blur), then a gather at the keypoints."""
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
    per output, so only the pixel values round (≤0.5 gray) — and the
    consumer (`_brief_bits`) casts to bf16 anyway, so this is lossless
    for the descriptor bits while running ~4x faster on the MXU.
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


def _brief_bits(blur, ys, xs, angle):
    """(Q, 256) {0,1} steered BRIEF via the pattern bank."""
    Q = ys.shape[0]
    patches = _extract_patches(blur, ys, xs).reshape(Q, PATCH_S * PATCH_S)
    bank = jnp.asarray(_PATTERN_BANK, jnp.bfloat16)
    resp = jax.lax.dot_general(
        patches.astype(jnp.bfloat16),
        bank,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(Q, N_ANGLE_BINS, N_BITS)
    binf = angle / (2.0 * jnp.pi) * N_ANGLE_BINS
    bin_idx = jnp.round(binf).astype(jnp.int32) % N_ANGLE_BINS
    sel = jnp.take_along_axis(resp, bin_idx[:, None, None], axis=1)[:, 0]
    return (sel > 0).astype(jnp.uint8)


def pack_bits(bits):
    """(N, 256) {0,1} → (N, 8) uint32 little-endian within each word."""
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def _level_grid(cfg: OrbConfig, H: int, W: int, quota: int):
    """Static cell layout for one pyramid level (the analog of
    levelCols/levelRows at src/ORBextractor.cpp:542-556)."""
    Hv, Wv = H - 2 * cfg.edge, W - 2 * cfg.edge
    ncx = max(1, int(round(math.sqrt(quota * Wv / (cfg.features_per_cell * max(Hv, 1))))))
    ncy = max(1, int(round(ncx * Hv / max(Wv, 1))))
    cell_h = -(-Hv // ncy)
    cell_w = -(-Wv // ncx)
    return ncy, ncx, cell_h, cell_w


def _select_level_keypoints(cfg: OrbConfig, img, quota: int):
    """FAST + cell quotas + redistribution for one level.

    Returns (ys, xs, response, valid) each (quota,) in level pixels.
    """
    H, W = img.shape
    s_high_raw = fast_score(img, cfg.fast_high)
    s_low_raw = fast_score(img, cfg.fast_low)
    s_high = nms3x3(s_high_raw)
    s_low = nms3x3(s_low_raw)

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
    # Per-cell candidates via repeated masked argmax (max-reductions are
    # VPU-native; a per-cell top_k would sort every cell's pixels). The
    # reference's surplus-redistribution loop (src/ORBextractor.cpp:653-679)
    # becomes a two-phase priority: each cell's best candidate outranks
    # every cell's k-th candidate, and the global top-k fills the quota.
    k_cell = max(2, min(6, -(-2 * quota // n_cells)))
    cands_s, cands_i = [], []
    cur = cells
    col_iota = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 1)
    for r in range(k_cell):
        idx = jnp.argmax(cur, axis=1)                     # (n_cells,)
        sc = jnp.take_along_axis(cur, idx[:, None], axis=1)[:, 0]
        cands_s.append(sc)
        cands_i.append(idx)
        if r + 1 < k_cell:
            cur = jnp.where(col_iota == idx[:, None], -jnp.inf, cur)

    top_scores = jnp.stack(cands_s, axis=1)               # (n_cells, k)
    top_idx = jnp.stack(cands_i, axis=1)
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

    flat_priority = priority.reshape(-1)
    flat_scores = top_scores.reshape(-1)
    cell_ids = jax.lax.broadcasted_iota(
        jnp.int32, top_scores.shape, 0
    ).reshape(-1)
    flat_idx = top_idx.reshape(-1)

    sel_p, sel = jax.lax.top_k(flat_priority, quota)
    valid = sel_p > 0.0
    resp = flat_scores[sel]
    cid = cell_ids[sel]
    within = flat_idx[sel]
    cy, cx = cid // ncx, cid % ncx
    wy, wx = within // cw, within % cw
    ys = cfg.edge + cy * ch + wy
    xs = cfg.edge + cx * cw + wx

    # subpixel refinement: 1D parabola through the raw FAST score at the
    # corner and its 4-neighbors (reported coordinates only — descriptor
    # sampling stays on the integer grid). The reference reports integer
    # FAST corners; the ±0.5 px quantization is a measurable floor on
    # pose accuracy, so this is a deliberate improvement.
    score_for_sub = s_low_raw   # defined wherever either threshold fires
    s_c = score_for_sub[ys, xs]
    s_l = score_for_sub[ys, jnp.clip(xs - 1, 0)]
    s_r = score_for_sub[ys, jnp.clip(xs + 1, 0, W - 1)]
    s_u = score_for_sub[jnp.clip(ys - 1, 0), xs]
    s_d = score_for_sub[jnp.clip(ys + 1, 0, H - 1), xs]
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

    def extract(img):
        img = img.astype(jnp.float32)
        outs = []
        level_img = img
        for l in range(cfg.n_levels):
            H, W = level_shapes[l]
            if l > 0:
                level_img = jax.image.resize(img, (H, W), "linear")
            quota = cfg.level_quotas[l]
            if quota <= 0:
                continue
            ys, xs, ys_f, xs_f, resp, valid = _select_level_keypoints(
                cfg, level_img, quota
            )

            # orientation from moment maps (IC_Angle)
            moments = _orientation_maps(level_img)
            m10 = moments[0][ys, xs]
            m01 = moments[1][ys, xs]
            angle = jnp.arctan2(m01, m10)

            if cfg.use_harris:
                resp = _harris_response(level_img, ys, xs)

            # steered BRIEF on the blurred level image (matmul
            # formulation — see _brief_bits)
            blur = _blur7(level_img)
            bits = _brief_bits(blur, ys, xs, angle)  # (quota, 256)

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
