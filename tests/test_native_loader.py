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


def test_malformed_bmp_fails_cleanly(tmp_path):
    """Hostile headers must fail decode, not abort the process: giant
    declared dimensions (bad_alloc path) and a truncated palette with
    out-of-range pixel indices (heap OOB path)."""
    import struct

    # 2^30 x 2^30 declared dimensions
    giant = tmp_path / "giant.bmp"
    info = struct.pack("<IiiHHIIiiII", 40, 1 << 30, 1 << 30, 1, 24,
                       0, 0, 0, 0, 0, 0)
    header = struct.pack("<HIHHI", 0x4D42, 54, 0, 0, 54)
    giant.write_bytes(header + info + b"\x00" * 64)
    assert decode_bmp(str(giant)) is None

    # 8-bit with clr_used=4 but pixel values up to 255
    trunc = tmp_path / "trunc.bmp"
    w = h = 8
    stride = (w + 3) & ~3
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, 0, 0, 0, 4, 0)
    pal = struct.pack("<4B", 10, 10, 10, 0) * 4
    off = 14 + 40 + len(pal)
    header = struct.pack("<HIHHI", 0x4D42, off + stride * h, 0, 0, off)
    rows = bytes([255, 200, 3, 0, 1, 2, 3, 2]) * h
    # pad rows to stride
    body = b"".join(
        rows[r * w : (r + 1) * w] + b"\x00" * (stride - w) for r in range(h)
    )
    trunc.write_bytes(header + info + pal + body)
    img = decode_bmp(str(trunc))
    # decodes without crashing; out-of-palette indices read as 0 (black)
    assert img is not None and img.shape == (h, w)
    assert np.isfinite(img).all()
    assert img.max() <= 255.0


def test_decode_failure_falls_back_to_pil(bmp_dataset, tmp_path):
    """A frame the native decoder rejects must be served by PIL, not
    abort the dataset stream."""
    import shutil
    from PIL import Image

    root_src, imgs, odo = bmp_dataset
    root = tmp_path / "DatasetRoom"
    shutil.copytree(root_src, root)
    # overwrite frame 2 with an RLE8-compressed BMP (unsupported natively)
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, imgs[2].shape).astype(np.uint8)
    # PIL can't write RLE; emulate an unsupported variant with a 4-bit BMP
    Image.fromarray(arr, mode="L").convert("P").quantize(colors=16).save(
        root / "image" / "2.bmp", bits=4
    )
    ref2 = np.asarray(
        Image.open(root / "image" / "2.bmp").convert("L"), np.float32
    )
    ds = DatasetRoom(str(root), use_native=True)
    out = list(ds)
    assert len(out) == len(imgs)
    np.testing.assert_allclose(out[2][0], ref2)


def test_dataset_room_native_path(bmp_dataset):
    root, imgs, odo = bmp_dataset
    ds = DatasetRoom(str(root), use_native=True)
    out = list(ds)
    assert len(out) == len(imgs)
    for (img, o), ref, oref in zip(out, imgs, odo):
        assert np.abs(img - ref).max() <= 1.0 + 1e-4
        np.testing.assert_allclose(o, oref)
