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
    """Iterator over (gray_image float32 (H,W), odo (3,) float32) pairs."""

    def __init__(self, root: str, start: int = 0, count: int | None = None):
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

    def __len__(self):
        return self.count

    def image_path(self, i: int) -> str:
        return os.path.join(self.root, "image", f"{i}.bmp")

    def __iter__(self):
        from PIL import Image

        for i in range(self.start, self.start + self.count):
            img = Image.open(self.image_path(i)).convert("L")
            yield (
                np.asarray(img, np.float32),
                self.odo[i],
            )
