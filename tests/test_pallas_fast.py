"""Parity of the fused FAST+NMS Pallas kernel vs the XLA reference path.

Interpreter mode runs the kernel's exact program on CPU. Parity is
asserted away from the 16-px border (EDGE_THRESHOLD) — inside it the
kernel's clamped band halos and both implementations' horizontal
wrap-around differ by design and are masked by keypoint selection.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from se2lam_tpu.frontend.fast import fast_score_pair, nms3x3
from se2lam_tpu.frontend.pallas_fast import fast_nms_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("shape", [(240, 320), (200, 266), (120, 128)])
def test_fast_nms_pallas_matches_xla(rng, shape):
    H, W = shape
    img = jnp.asarray(
        rng.uniform(0, 255, (H, W)).astype(np.float32)
    )
    # sprinkle some strong corners so both corner/non-corner paths run
    for _ in range(30):
        y, x = rng.integers(20, H - 20), rng.integers(20, W - 20)
        img = img.at[y - 1: y + 2, x - 1: x + 2].set(250.0)

    sh_raw, sl_raw = fast_score_pair(img, 20.0, 7.0)
    ref_hi, ref_lo = nms3x3(sh_raw), nms3x3(sl_raw)

    hi, lo, raw = fast_nms_pallas(img, 20.0, 7.0, interpret=True)

    e = 16
    sl = np.s_[e: H - e, e: W - e]
    np.testing.assert_array_equal(np.asarray(hi)[sl],
                                  np.asarray(ref_hi)[sl])
    np.testing.assert_array_equal(np.asarray(lo)[sl],
                                  np.asarray(ref_lo)[sl])
    np.testing.assert_array_equal(np.asarray(raw)[sl],
                                  np.asarray(sl_raw)[sl])


def test_band_seams_are_exact(rng):
    """Rows at interior band boundaries (multiples of BAND) must match
    exactly — the halo assembly is the easiest thing to get wrong."""
    from se2lam_tpu.frontend.pallas_fast import BAND

    H, W = 4 * BAND, 256
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    sh_raw, sl_raw = fast_score_pair(img, 20.0, 7.0)
    ref_lo = nms3x3(sl_raw)
    _, lo, _ = fast_nms_pallas(img, 20.0, 7.0, interpret=True)
    for b in (1, 2, 3):
        r0 = b * BAND
        np.testing.assert_array_equal(
            np.asarray(lo)[r0 - 2: r0 + 2, 16: W - 16],
            np.asarray(ref_lo)[r0 - 2: r0 + 2, 16: W - 16],
        )
