"""Native C++ dataset loader tests: decode parity with PIL, prefetch
ordering, and DatasetRoom integration."""
import numpy as np
import pytest

from se2lam_tpu.io import DatasetRoom
from se2lam_tpu.io.native_loader import (
    NativePrefetcher, decode_bmp, native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no native toolchain"
)


@pytest.fixture(scope="module")
def bmp_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ds") / "DatasetRoom"
    (root / "image").mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 6
    odo = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    with open(root / "odo_raw.txt", "w") as f:
        for r in odo:
            f.write(f"{r[0]} {r[1]} {r[2]}\n")
    imgs = []
    for i in range(n):
        if i % 2 == 0:
            img = rng.integers(0, 255, (37, 53)).astype(np.uint8)  # odd dims
            Image.fromarray(img, mode="L").save(root / "image" / f"{i}.bmp")
        else:
            rgb = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
            Image.fromarray(rgb, mode="RGB").save(root / "image" / f"{i}.bmp")
            img = np.asarray(
                Image.open(root / "image" / f"{i}.bmp").convert("L")
            )
        imgs.append(np.asarray(
            Image.open(root / "image" / f"{i}.bmp").convert("L"), np.float32
        ))
    return root, imgs, odo


def test_decode_matches_pil(bmp_dataset):
    root, imgs, _ = bmp_dataset
    for i, ref in enumerate(imgs):
        got = decode_bmp(str(root / "image" / f"{i}.bmp"))
        assert got is not None
        assert got.shape == ref.shape
        # PIL's L conversion uses the same ITU-R 601 luma; allow 1 gray
        # level of rounding difference on RGB inputs
        assert np.abs(got - ref).max() <= 1.0 + 1e-4


def test_prefetcher_order_and_completion(bmp_dataset):
    root, imgs, _ = bmp_dataset
    pf = NativePrefetcher(str(root / "image"), 0, len(imgs), threads=3)
    got = list(pf)
    assert len(got) == len(imgs)
    for g, ref in zip(got, imgs):
        assert g.shape == ref.shape
        assert np.abs(g - ref).max() <= 1.0 + 1e-4


def test_dataset_room_native_path(bmp_dataset):
    root, imgs, odo = bmp_dataset
    ds = DatasetRoom(str(root), use_native=True)
    out = list(ds)
    assert len(out) == len(imgs)
    for (img, o), ref, oref in zip(out, imgs, odo):
        assert np.abs(img - ref).max() <= 1.0 + 1e-4
        np.testing.assert_allclose(o, oref)
