"""ctypes bindings for the native (C++) dataset loader.

The reference's feed path is C++ (test_vn's imread loop,
test/test_vn.cpp:43-55); here image decode + file IO run in a native
worker pool off the Python thread (``se2lam_tpu/native/se2lam_native.cpp``), so the
host loop only pops finished uint8 frames while the device pipeline
runs. The library is compiled on demand with g++ and cached; callers
fall back to the PIL path when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

__all__ = [
    "native_available", "NativePrefetcher", "NativeDecodeError", "decode_bmp",
]


class NativeDecodeError(RuntimeError):
    """One frame failed native decode (e.g. an RLE/1-bit BMP variant the
    native decoder doesn't handle); carries the frame index so callers
    can fall back to PIL for that file and continue the stream."""

    def __init__(self, index: int):
        super().__init__(f"native BMP decode failed for frame {index}")
        self.index = index

_LIB = None
_TRIED = False


def _pkg_root() -> str:
    return os.path.dirname(os.path.dirname(__file__))


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    # the source ships as package data (pyproject [tool.setuptools.
    # package-data]), so this path works both in-repo and pip-installed
    src = os.path.join(_pkg_root(), "native", "se2lam_native.cpp")
    if not os.path.exists(src):
        return None
    # per-user cache (0700) — a world-shared /tmp path would let another
    # local user plant a library; compile to a temp name + atomic replace
    # so concurrent processes never load a half-written .so
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    cache = os.path.join(base, "se2lam_native")
    os.makedirs(cache, mode=0o700, exist_ok=True)
    # makedirs doesn't enforce the mode on a pre-existing directory:
    # refuse a foreign-owned cache dir and strip group/other bits, so
    # another local user can't plant a .so that we then dlopen
    st = os.stat(cache)
    if st.st_uid != os.getuid():
        return None
    if st.st_mode & 0o077:
        os.chmod(cache, 0o700)
    lib_path = os.path.join(cache, "libse2lam_native.so")
    if not os.path.exists(lib_path) or (
        os.path.getmtime(lib_path) < os.path.getmtime(src)
    ):
        try:
            fd, tmp_path = tempfile.mkstemp(
                suffix=".so", dir=cache
            )
            os.close(fd)
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp_path, src, "-lpthread"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_path, lib_path)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.dl_open.restype = ctypes.c_void_p
    lib.dl_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.dl_next.restype = ctypes.c_int64
    lib.dl_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.dl_close.argtypes = [ctypes.c_void_p]
    lib.dl_decode_bmp.restype = ctypes.c_int64
    lib.dl_decode_bmp.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _build_and_load() is not None


_DECODE_BUF: np.ndarray | None = None


def decode_bmp(path: str, max_pixels: int = 1 << 24) -> np.ndarray | None:
    """Synchronous native BMP decode → uint8 grayscale, or None.

    uint8 keeps the frame at 1 byte/px on the host→device wire (the f32
    cast happens on-device in the extractor); a float feed quadruples
    the transfer, which is the e2e bottleneck on remote-attached chips.

    Reuses one module-level scratch buffer (a fresh 64 MB allocation per
    call would dominate small-frame decodes). Not thread-safe; the
    threaded path is NativePrefetcher, which owns its buffer."""
    lib = _build_and_load()
    if lib is None:
        return None
    global _DECODE_BUF
    if _DECODE_BUF is None or _DECODE_BUF.size < max_pixels:
        _DECODE_BUF = np.empty(max_pixels, np.uint8)
    buf = _DECODE_BUF
    hw = lib.dl_decode_bmp(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size,
    )
    if hw <= 0:
        return None
    h, w = int(hw >> 32), int(hw & 0xFFFFFFFF)
    return buf[: h * w].reshape(h, w).copy()


class NativePrefetcher:
    """Iterator over <dir>/<i>.bmp frames decoded by a native worker pool.

    Frames arrive in order (uint8 grayscale); a bounded ring keeps
    ``ring_cap`` frames decoded ahead of the consumer.
    """

    def __init__(self, image_dir: str, start: int, count: int,
                 threads: int = 2, ring_cap: int = 8,
                 max_pixels: int = 1 << 24):
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self._lib = lib
        self._h = lib.dl_open(
            image_dir.encode(), start, count, threads, ring_cap
        )
        self._buf = np.empty(max_pixels, np.uint8)
        self._max = max_pixels
        self._closed = False
        self._next_index = start

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._closed:
            raise StopIteration
        hw = self._lib.dl_next(
            self._h,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._max,
        )
        if hw == -1:
            self.close()
            raise StopIteration
        idx = self._next_index
        self._next_index += 1
        if hw == 0:
            # this frame failed; the ring continues with the next one
            raise NativeDecodeError(idx)
        h, w = int(hw >> 32), int(hw & 0xFFFFFFFF)
        return self._buf[: h * w].reshape(h, w).copy()

    def close(self):
        if not self._closed:
            self._lib.dl_close(self._h)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
