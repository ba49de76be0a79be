"""Offline visualization dumps.

Replaces the reference's ROS-based observability surface — rviz markers
from MapPublish (KF frusta, map points, covisibility/feature/odometry
graph edges, src/MapPublish.cpp:207-456) and the FramePublish debug image
(current frame + matches, src/FramePublish.cpp:152-203) — with static
matplotlib/PIL renderings written to files, since the TPU framework has
no ROS and runs headless.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "plot_trajectories", "plot_map", "draw_frame_debug",
    "compose_debug_image",
]


def plot_trajectories(path: str, named_xy: dict, title: str = "trajectories"):
    """Top-view overlay of named (n, 2)+ arrays (e.g. gt / odometry / slam)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    for name, xy in named_xy.items():
        xy = np.asarray(xy)
        ax.plot(xy[:, 0], xy[:, 1], label=name, lw=1.2)
        ax.plot(xy[0, 0], xy[0, 1], "o", ms=4)
    ax.set_aspect("equal")
    ax.grid(True, alpha=0.3)
    ax.legend()
    ax.set_title(title)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_map(path: str, ms, title: str = "map"):
    """Top view of the map: valid map points, KF poses with heading ticks,
    covisibility edges (the MapPublish marker set, flattened to 2D)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mp = np.asarray(ms.mp_pos)
    mv = np.asarray(ms.mp_valid)
    kf = np.asarray(ms.kf_pose)
    kv = np.asarray(ms.kf_valid)
    covis = np.asarray(ms.covis)

    fig, ax = plt.subplots(figsize=(8, 8))
    if mv.any():
        ax.scatter(mp[mv, 0], mp[mv, 1], s=2, c="gray", alpha=0.5,
                   label=f"map points ({mv.sum()})")
    ks = np.nonzero(kv)[0]
    for i in ks:
        for j in ks[ks > i]:
            if covis[i, j]:
                ax.plot([kf[i, 0], kf[j, 0]], [kf[i, 1], kf[j, 1]],
                        c="lightblue", lw=0.5, zorder=1)
    if len(ks):
        ax.plot(kf[ks, 0], kf[ks, 1], "b.-", ms=5, lw=1,
                label=f"keyframes ({len(ks)})", zorder=2)
        # heading ticks
        d = 0.3
        ax.quiver(kf[ks, 0], kf[ks, 1],
                  d * np.cos(kf[ks, 2]), d * np.sin(kf[ks, 2]),
                  color="red", width=0.003, zorder=3)
    ftr_valid = np.asarray(ms.ftr_valid)
    fi, fj = np.asarray(ms.ftr_i), np.asarray(ms.ftr_j)
    for e in np.nonzero(ftr_valid)[0]:
        ax.plot([kf[fi[e], 0], kf[fj[e], 0]], [kf[fi[e], 1], kf[fj[e], 1]],
                c="green", lw=1.5, zorder=2,
                label="loop/feature edge" if e == np.nonzero(ftr_valid)[0][0]
                else None)
    ax.set_aspect("equal")
    ax.grid(True, alpha=0.3)
    ax.legend(loc="best")
    ax.set_title(title)
    # bound the view to the trajectory extent: a handful of bad-geometry
    # map points (awaiting culling) would otherwise stretch the autoscale
    # by orders of magnitude
    if len(ks):
        x0, x1 = kf[ks, 0].min(), kf[ks, 0].max()
        y0, y1 = kf[ks, 1].min(), kf[ks, 1].max()
        mx = max(x1 - x0, y1 - y0, 1.0)
        ax.set_xlim(x0 - 0.6 * mx, x1 + 0.6 * mx)
        ax.set_ylim(y0 - 0.6 * mx, y1 + 0.6 * mx)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def compose_debug_image(
    path: str,
    img_cur,
    feats_cur,
    match_idx=None,
    ref_img=None,
    ref_xy=None,
    loop_xy=None,
    loop_match=None,
    label: str = "",
):
    """FramePublish-style composed debug canvas
    (src/FramePublish.cpp:152-203): a 2×2 grid of

        [ current frame + match lines | reference keyframe ]
        [ loop-match panel            | (reserved)          ]

    The loop panel draws the loop keyframe's keypoints and the verified
    correspondences from stored geometry (the map keeps keypoints, not
    pixels — by design the framework never stores keyframe images).
    """
    from PIL import Image, ImageDraw

    arr = np.clip(np.asarray(img_cur), 0, 255).astype(np.uint8)
    H, W = arr.shape[:2]
    canvas = Image.new("RGB", (2 * W, 2 * H), (16, 16, 16))
    d_all = ImageDraw.Draw(canvas)

    # pane 1: current frame, keypoints + match lines to ref positions
    cur = Image.fromarray(arr).convert("RGB")
    d = ImageDraw.Draw(cur)
    xy = np.asarray(feats_cur.xy)
    valid = np.asarray(feats_cur.valid)
    for i in np.nonzero(valid)[0]:
        x, y = xy[i]
        d.ellipse([x - 2, y - 2, x + 2, y + 2], outline=(0, 255, 0))
    if match_idx is not None and ref_xy is not None:
        midx = np.asarray(match_idx)
        rxy = np.asarray(ref_xy)
        for i in np.nonzero(midx >= 0)[0]:
            x1, y1 = rxy[i]
            x2, y2 = xy[midx[i]]
            d.line([x1, y1, x2, y2], fill=(255, 0, 0))
    canvas.paste(cur, (0, 0))

    # pane 2: reference keyframe (its image if the caller kept one,
    # else keypoints on black)
    if ref_img is not None:
        ref = Image.fromarray(
            np.clip(np.asarray(ref_img), 0, 255).astype(np.uint8)
        ).convert("RGB")
    else:
        ref = Image.new("RGB", (W, H), (0, 0, 0))
    dr = ImageDraw.Draw(ref)
    if ref_xy is not None:
        for x, y in np.asarray(ref_xy):
            if 0 <= x < W and 0 <= y < H:
                dr.ellipse([x - 2, y - 2, x + 2, y + 2],
                           outline=(0, 200, 255))
    canvas.paste(ref, (W, 0))

    # pane 3: loop match panel (keypoint geometry + correspondences)
    loop = Image.new("RGB", (W, H), (0, 0, 0))
    dl = ImageDraw.Draw(loop)
    if loop_xy is not None:
        lxy = np.asarray(loop_xy)
        for x, y in lxy:
            if 0 <= x < W and 0 <= y < H:
                dl.ellipse([x - 2, y - 2, x + 2, y + 2],
                           outline=(255, 200, 0))
        if loop_match is not None:
            lm = np.asarray(loop_match)
            for i in np.nonzero(lm >= 0)[0]:
                x1, y1 = lxy[i]
                x2, y2 = xy[lm[i]]
                dl.line([x1, y1, x2, y2], fill=(255, 0, 255))
    canvas.paste(loop, (0, H))

    if label:
        d_all.text((2 * W - 8 * len(label) - 10, 2 * H - 20), label,
                   fill=(255, 255, 255))
    canvas.save(path)


def draw_frame_debug(path: str, img, feats, match_idx=None, ref_xy=None):
    """Debug image: keypoints (green), matches as lines to the reference
    positions (red) — the FramePublish composition, single-pane."""
    from PIL import Image, ImageDraw

    arr = np.asarray(img)
    arr = np.clip(arr, 0, 255).astype(np.uint8)
    im = Image.fromarray(arr).convert("RGB")
    d = ImageDraw.Draw(im)
    xy = np.asarray(feats.xy)
    valid = np.asarray(feats.valid)
    for i in np.nonzero(valid)[0]:
        x, y = xy[i]
        d.ellipse([x - 2, y - 2, x + 2, y + 2], outline=(0, 255, 0))
    if match_idx is not None and ref_xy is not None:
        midx = np.asarray(match_idx)
        rxy = np.asarray(ref_xy)
        for i in np.nonzero(midx >= 0)[0]:
            x1, y1 = rxy[i]
            x2, y2 = xy[midx[i]]
            d.line([x1, y1, x2, y2], fill=(255, 0, 0))
    im.save(path)
