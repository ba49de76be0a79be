"""DatasetRoom-format loader.

Reads the reference demo dataset layout (test/test_vn.cpp:33-55):
``<root>/image/<i>.bmp`` grayscale frames plus ``<root>/odo_raw.txt`` with
one ``x y theta`` line per frame, fed in lock-step at Config::FPS. No ROS:
this is a plain Python iterator.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["DatasetRoom"]


class DatasetRoom:
    """Iterator over (gray_image float32 (H,W), odo (3,) float32) pairs.

    By default frames are decoded by the native C++ worker pool
    (``io.native_loader``) — decode and file IO run off the Python thread
    while the device pipeline consumes — falling back to PIL when no
    toolchain is available.
    """

    def __init__(self, root: str, start: int = 0, count: int | None = None,
                 use_native: bool | None = None):
        self.root = root
        odo_path = os.path.join(root, "odo_raw.txt")
        rows = []
        with open(odo_path) as f:
            for ln in f:
                parts = ln.split()
                if len(parts) >= 3:
                    rows.append([float(p) for p in parts[:3]])
        self.odo = np.asarray(rows, np.float32)
        n = len(self.odo) - start
        self.start = start
        self.count = n if count is None else min(count, n)
        if use_native is None:
            from .native_loader import native_available

            use_native = native_available()
        self.use_native = use_native

    def __len__(self):
        return self.count

    def image_path(self, i: int) -> str:
        return os.path.join(self.root, "image", f"{i}.bmp")

    def _iter_native(self):
        from .native_loader import NativeDecodeError, NativePrefetcher

        pf = NativePrefetcher(
            os.path.join(self.root, "image"), self.start, self.count
        )
        try:
            for i in range(self.start, self.start + self.count):
                try:
                    img = next(pf)
                except NativeDecodeError:
                    # BMP variant the native decoder doesn't handle (RLE,
                    # 1/4/16-bit): PIL decodes just this frame
                    from PIL import Image

                    img = np.asarray(
                        Image.open(self.image_path(i)).convert("L"),
                        np.float32,
                    )
                except StopIteration:
                    return
                yield img, self.odo[i]
        finally:
            pf.close()

    def __iter__(self):
        if self.use_native:
            yield from self._iter_native()
            return
        from PIL import Image

        for i in range(self.start, self.start + self.count):
            img = Image.open(self.image_path(i)).convert("L")
            yield (
                np.asarray(img, np.float32),
                self.odo[i],
            )
