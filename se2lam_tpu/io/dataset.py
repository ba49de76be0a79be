"""DatasetRoom-format loader + writer.

Reads the reference demo dataset layout (test/test_vn.cpp:33-55):
``<root>/image/<i>.bmp`` grayscale frames plus ``<root>/odo_raw.txt`` with
one ``x y theta`` line per frame, fed in lock-step at Config::FPS. No ROS:
this is a plain Python iterator. ``write_dataset_room`` produces the same
on-disk layout (plus the two OpenCV-YAML config files the reference reads,
src/Config.cpp:83-186) so rendered sequences exercise the full
disk→decode→YAML→SLAM pipeline end to end.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["DatasetRoom", "write_dataset_room"]


def _cv_yaml_matrix(name: str, arr: np.ndarray) -> str:
    a = np.asarray(arr, np.float64)
    rows, cols = (a.shape + (1,))[:2] if a.ndim > 1 else (a.size, 1)
    flat = ", ".join(f"{v:.10g}" for v in a.ravel())
    return (
        f"{name}: !!opencv-matrix\n   rows: {rows}\n   cols: {cols}\n"
        f"   dt: d\n   data: [ {flat} ]\n"
    )


def write_dataset_room(
    parent: str,
    frames,
    odo: np.ndarray,
    cfg,
    dataset_name: str = "DatasetRoom",
    gt: np.ndarray | None = None,
) -> str:
    """Write a DatasetRoom-format dataset to disk.

    Layout (what test_vn + Config::readConfig expect,
    test/test_vn.cpp:33-55, src/Config.cpp:83-186):

        <parent>/CamConfig.yml          intrinsics/distortion/extrinsic
        <parent>/Settings.yml           runtime settings (reference keys,
                                        incl. the load-bearing
                                        'scale_facotr' [sic] typo)
        <parent>/<name>/image/<i>.bmp   8-bit grayscale frames
        <parent>/<name>/odo_raw.txt     one 'x y theta' line per frame

    ``frames`` is an iterable of (H, W) arrays; ``odo`` is (n, 3).
    ``gt`` (optional, (n, 3)) writes a ground-truth trajectory to
    <root>/gt.txt — an extension over the reference layout so disk runs
    can report ATE. Returns the dataset root (<parent>/<name>).
    """
    from PIL import Image

    root = os.path.join(parent, dataset_name)
    img_dir = os.path.join(root, "image")
    os.makedirs(img_dir, exist_ok=True)

    n = 0
    for i, frame in enumerate(frames):
        arr = np.clip(np.asarray(frame), 0, 255).astype(np.uint8)
        Image.fromarray(arr, mode="L").save(
            os.path.join(img_dir, f"{i}.bmp"), format="BMP"
        )
        n += 1
    odo = np.asarray(odo, np.float64)
    with open(os.path.join(root, "odo_raw.txt"), "w") as f:
        for i in range(min(n, len(odo))):
            f.write(f"{odo[i, 0]:.6f} {odo[i, 1]:.6f} {odo[i, 2]:.6f}\n")
    if gt is not None:
        gt = np.asarray(gt, np.float64)
        with open(os.path.join(root, "gt.txt"), "w") as f:
            for i in range(min(n, len(gt))):
                f.write(f"{gt[i, 0]:.6f} {gt[i, 1]:.6f} {gt[i, 2]:.6f}\n")

    K = np.array(
        [[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]], np.float64
    )
    D = np.asarray(cfg.dist, np.float64)
    # extrinsic back to Rodrigues rvec + tvec (inverse of from_yaml)
    Tbc = np.asarray(cfg.Tbc_mat, np.float64)
    R = Tbc[:3, :3]
    cos_t = (np.trace(R) - 1.0) / 2.0
    theta = float(np.arccos(np.clip(cos_t, -1.0, 1.0)))
    if theta < 1e-12:
        rvec = np.zeros(3)
    elif theta > np.pi - 1e-6:
        # near-pi rotation: the off-diagonal formula divides by
        # 2 sin(theta) ~ 0; recover |axis| from the diagonal of
        # R = 2 a a^T - I and the signs from the off-diagonals
        axis = np.sqrt(np.maximum((np.diag(R) + 1.0) / 2.0, 0.0))
        i = int(np.argmax(axis))                 # largest, sign-anchor
        for j in range(3):
            if j != i and axis[j] > 0:
                axis[j] *= np.sign(R[i, j] + R[j, i]) or 1.0
        axis /= max(np.linalg.norm(axis), 1e-12)
        rvec = axis * theta
    else:
        axis = np.array(
            [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
        ) / (2.0 * np.sin(theta))
        rvec = axis * theta
    tvec = Tbc[:3, 3]

    with open(os.path.join(parent, "CamConfig.yml"), "w") as f:
        f.write("%YAML:1.0\n---\n")
        f.write(f"image_width: {cfg.width}\n")
        f.write(f"image_height: {cfg.height}\n")
        f.write(_cv_yaml_matrix("camera_matrix", K))
        f.write(_cv_yaml_matrix("distortion_coefficients", D))
        f.write(_cv_yaml_matrix("rvec_b_c", rvec))
        f.write(_cv_yaml_matrix("tvec_b_c", tvec))

    with open(os.path.join(parent, "Settings.yml"), "w") as f:
        f.write("%YAML:1.0\n---\n")
        for key, val in (
            ("fps", cfg.fps),
            ("upper_depth", cfg.upper_depth),
            ("lower_depth", cfg.lower_depth),
            ("odo_x_uncertain", cfg.odo_x_uncertain),
            ("odo_y_uncertain", cfg.odo_y_uncertain),
            ("odo_theta_uncertain", cfg.odo_t_uncertain),
            ("odo_x_steady_noise", cfg.odo_x_noise),
            ("odo_y_steady_noise", cfg.odo_y_noise),
            ("odo_theta_steady_noise", cfg.odo_t_noise),
            ("plane_motion_xrot_info", cfg.plane_motion_xrot_info),
            ("plane_motion_yrot_info", cfg.plane_motion_yrot_info),
            ("plane_motion_z_info", cfg.plane_motion_z_info),
            ("th_huber2", cfg.th_huber2),
            ("local_iter", cfg.local_iter),
            ("global_iter", cfg.global_iter),
            ("max_feature_num", cfg.max_feature_num),
            ("scale_facotr", cfg.scale_factor),   # [sic] Config.cpp:137
            ("max_level", cfg.max_level),
        ):
            f.write(f"{key}: {val}\n")
    return root


class DatasetRoom:
    """Iterator over (gray_image uint8 (H,W), odo (3,) float32) pairs.

    By default frames are decoded by the native C++ worker pool
    (``io.native_loader``) — decode and file IO run off the Python thread
    while the device pipeline consumes — falling back to PIL when no
    toolchain is available. Frames stay **uint8**: they ship to the
    device at 1 byte/px (the e2e bottleneck on remote-attached chips is
    the host→device transfer, DESIGN §12) and the extractor casts to f32
    on-device. Iteration length is the lock-step minimum of odometry
    rows and contiguous on-disk frames, so a truncated dataset ends the
    stream cleanly instead of crashing mid-run.
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
        # lock-step feed: images and odometry advance together, so the
        # usable length is bounded by the contiguous frames on disk (a
        # truncated copy must end the stream, not crash mid-iteration)
        n_img = 0
        while n_img < n and os.path.exists(
            os.path.join(root, "image", f"{start + n_img}.bmp")
        ):
            n_img += 1
        n = min(n, n_img)
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

                    try:
                        img = np.asarray(
                            Image.open(self.image_path(i)).convert("L"),
                            np.uint8,
                        )
                    except FileNotFoundError:
                        return      # frame vanished mid-run: end cleanly
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
            try:
                img = Image.open(self.image_path(i)).convert("L")
            except FileNotFoundError:
                return              # frame vanished mid-run: end cleanly
            yield (
                np.asarray(img, np.uint8),
                self.odo[i],
            )
