"""ORB frontend tests: extraction invariants + matching on shifted images
(the descriptor/match parity strategy from SURVEY.md §7 step 3, adapted to
a self-consistent pipeline: matching a translated copy of a textured image
must recover the translation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se2lam_tpu.frontend import (
    OrbConfig,
    hamming_matrix,
    make_extractor,
    match_by_window,
    mutual_match,
)


def textured_image(rng, H=240, W=320):
    """Blobby random texture with strong corners."""
    img = rng.uniform(0, 50, (-(-H // 8), -(-W // 8)))
    img = np.kron(img, np.ones((8, 8)))[:H, :W]  # blocky → corner-rich
    img += rng.uniform(0, 10, (H, W))
    return img.astype(np.float32)


@pytest.fixture(scope="module")
def cfg():
    return OrbConfig(height=240, width=320, n_features=300, n_levels=3)


@pytest.fixture(scope="module")
def extractor(cfg):
    return jax.jit(make_extractor(cfg))


class TestExtractor:
    def test_basic_extraction(self, cfg, extractor):
        rng = np.random.default_rng(1)
        img = textured_image(rng)
        f = extractor(jnp.asarray(img))
        n = int(f.n)
        assert n > 100, n
        assert f.xy.shape == (cfg.n_slots, 2)
        xy = np.asarray(f.xy)[np.asarray(f.valid)]
        assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320
        assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 240
        # valid descriptors are ±1, invalid are zeroed
        pm1 = np.asarray(f.desc_pm1)
        assert set(np.unique(pm1[np.asarray(f.valid)])) <= {-1, 1}
        if (~np.asarray(f.valid)).any():
            assert np.all(pm1[~np.asarray(f.valid)] == 0)

    def test_blank_image_no_features(self, cfg, extractor):
        f = extractor(jnp.full((240, 320), 128.0, jnp.float32))
        assert int(f.n) == 0

    def test_deterministic(self, cfg, extractor):
        rng = np.random.default_rng(2)
        img = jnp.asarray(textured_image(rng))
        f1, f2 = extractor(img), extractor(img)
        np.testing.assert_array_equal(np.asarray(f1.xy), np.asarray(f2.xy))
        np.testing.assert_array_equal(
            np.asarray(f1.desc_bits), np.asarray(f2.desc_bits)
        )

    def test_multi_level_spread(self, cfg, extractor):
        rng = np.random.default_rng(3)
        f = extractor(jnp.asarray(textured_image(rng)))
        octs = np.asarray(f.octave)[np.asarray(f.valid)]
        assert len(np.unique(octs)) >= 2  # features found beyond level 0


class TestHamming:
    def test_matches_popcount(self, rng):
        a_bits = rng.integers(0, 2, (16, 256)).astype(np.int8)
        b_bits = rng.integers(0, 2, (24, 256)).astype(np.int8)
        a = (1 - 2 * a_bits).astype(np.int8)
        b = (1 - 2 * b_bits).astype(np.int8)
        D = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = (a_bits[:, None, :] != b_bits[None, :, :]).sum(-1)
        np.testing.assert_array_equal(D.astype(np.int32), ref)


class TestMatching:
    def test_shifted_image_matching(self, cfg, extractor):
        """Features of a translated image must match back with the shift."""
        rng = np.random.default_rng(4)
        base = textured_image(rng, 260, 340)
        shift = (6, 9)  # (dy, dx)
        img1 = base[10 : 10 + 240, 10 : 10 + 320]
        img2 = base[10 - shift[0] : 10 - shift[0] + 240, 10 - shift[1] : 10 - shift[1] + 320]
        f1 = extractor(jnp.asarray(img1))
        f2 = extractor(jnp.asarray(img2))
        m = match_by_window(f1, f2, f1.xy, win_size=20.0)
        n = int(m.n)
        assert n > 30, n
        idx2 = np.asarray(m.idx2)
        sel = idx2 >= 0
        d = np.asarray(f2.xy)[idx2[sel]] - np.asarray(f1.xy)[sel]
        med = np.median(d, axis=0)
        np.testing.assert_allclose(med, [shift[1], shift[0]], atol=1.0)

    def test_mutual_match_injective(self, cfg, extractor):
        rng = np.random.default_rng(5)
        img = textured_image(rng)
        f1 = extractor(jnp.asarray(img))
        f2 = extractor(jnp.asarray(np.roll(img, 3, axis=1)))
        m = mutual_match(f1, f2)
        idx2 = np.asarray(m.idx2)
        matched = idx2[idx2 >= 0]
        assert len(matched) == len(np.unique(matched))  # injective

    def test_self_match_identity(self, cfg, extractor):
        rng = np.random.default_rng(6)
        f = extractor(jnp.asarray(textured_image(rng)))
        m = mutual_match(f, f)
        idx2 = np.asarray(m.idx2)
        valid = np.asarray(f.valid)
        sel = idx2 >= 0
        assert sel.sum() > 0.9 * valid.sum()
        ids = np.arange(len(idx2))
        assert (idx2[sel] == ids[sel]).mean() > 0.95
