"""IO + viz smoke tests: DatasetRoom round-trip on a generated dataset,
plot/debug-image dumps, and the driver entry points on CPU."""
import os

import numpy as np
import pytest

from se2lam_tpu import viz
from se2lam_tpu.io import DatasetRoom
from se2lam_tpu.io.synthetic import SyntheticWorld

from synth_utils import make_cfg


def test_dataset_room_roundtrip(tmp_path):
    """Write a tiny DatasetRoom-format dataset (test_vn layout:
    image/<i>.bmp + odo_raw.txt) and read it back."""
    from PIL import Image

    root = tmp_path / "DatasetRoom"
    (root / "image").mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 5
    odo = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    with open(root / "odo_raw.txt", "w") as f:
        for r in odo:
            f.write(f"{r[0]} {r[1]} {r[2]}\n")
    imgs = []
    for i in range(n):
        img = rng.integers(0, 255, (48, 64)).astype(np.uint8)
        Image.fromarray(img).save(root / "image" / f"{i}.bmp")
        imgs.append(img)

    ds = DatasetRoom(str(root))
    assert len(ds) == n
    got = list(ds)
    assert len(got) == n
    for i, (img, o) in enumerate(got):
        assert img.shape == (48, 64)
        np.testing.assert_allclose(img, imgs[i].astype(np.float32))
        np.testing.assert_allclose(o, odo[i])

    ds2 = DatasetRoom(str(root), start=2, count=2)
    got2 = list(ds2)
    assert len(got2) == 2
    np.testing.assert_allclose(got2[0][1], odo[2])


def test_viz_dumps(tmp_path, rng):
    from se2lam_tpu import localmap, tracking
    from test_localmap import drive_frames, motion_poses
    from synth_utils import feats_at, make_scene

    cfg = make_cfg()
    pts, bits = make_scene(rng)
    poses = motion_poses(7)
    ms, kfs = drive_frames(cfg, poses, poses, pts, bits)

    p_map = tmp_path / "map.png"
    viz.plot_map(str(p_map), ms)
    assert p_map.stat().st_size > 1000

    p_traj = tmp_path / "traj.png"
    viz.plot_trajectories(
        str(p_traj), {"gt": np.asarray(poses)[:, :2]}
    )
    assert p_traj.stat().st_size > 1000

    f = feats_at(cfg, poses[0], pts, bits)
    img = np.zeros((cfg.height, cfg.width), np.float32)
    p_dbg = tmp_path / "frame.png"
    viz.draw_frame_debug(str(p_dbg), img, f)
    assert p_dbg.stat().st_size > 100


def _import_graft_entry():
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    import __graft_entry__ as g
    return g


def test_graft_entry_cpu():
    import jax

    g = _import_graft_entry()

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ts2, res = out
    assert int(res.n_matched) > 50
    assert np.isfinite(np.asarray(res.pose)).all()


def test_dataset_room_truncated_images(tmp_path):
    """A dataset with more odometry rows than frames on disk (interrupted
    copy) must iterate exactly the available frames and stop cleanly."""
    import os

    import numpy as np
    from PIL import Image

    from se2lam_tpu.io import DatasetRoom

    root = tmp_path / "DatasetRoom"
    (root / "image").mkdir(parents=True)
    rng = np.random.default_rng(0)
    with open(root / "odo_raw.txt", "w") as f:
        for i in range(6):
            f.write(f"{i * 0.1} 0.0 0.0\n")
    for i in range(4):                      # only 4 of 6 frames exist
        Image.fromarray(
            rng.integers(0, 255, (16, 24)).astype(np.uint8), mode="L"
        ).save(root / "image" / f"{i}.bmp")

    ds = DatasetRoom(str(root))
    out = list(ds)
    assert len(ds) == 4 and len(out) == 4
    assert out[0][0].dtype == np.uint8      # frames stay 1 byte/px


def test_graft_entry_dryrun_multichip():
    """The driver contract (CLAUDE.md): dryrun_multichip(8) must compile
    and run the sharded paths — distributed local BA, pose graph, bank
    scoring, fleet tracking — on the suite's 8-device CPU mesh. Its
    internal asserts cross-check the distributed solvers against their
    single-device counterparts."""
    g = _import_graft_entry()
    g.dryrun_multichip(8)
