"""Config loading tests: OpenCV FileStorage YAML parsing with the
reference's key names (src/Config.cpp:83-186), including the load-bearing
typo ``scale_facotr`` (src/Config.cpp:137)."""
import numpy as np

from se2lam_tpu.config import SystemConfig, read_cv_yaml

CAM_YML = """%YAML:1.0
---
image_width: 320
image_height: 240
camera_matrix: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [ 2.0e+02, 0., 160., 0., 210., 120., 0., 0., 1. ]
distortion_coefficients: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [ 0.01, -0.02, 0., 0., 0. ]
rvec_b_c: !!opencv-matrix
   rows: 3
   cols: 1
   dt: d
   data: [ 0., 0., 1.5707963267948966 ]
tvec_b_c: !!opencv-matrix
   rows: 3
   cols: 1
   dt: d
   data: [ 0.1, 0.2, 0.3 ]
"""

SETTINGS_YML = """%YAML:1.0
---
fps: 15
upper_depth: 8000
lower_depth: 0.5
odo_x_uncertain: 0.05
scale_facotr: 1.5
max_level: 3
max_feature_num: 500
local_iter: 12
LOCALIZATION_ONLY: 0
"""


def test_read_cv_yaml_matrix(tmp_path):
    p = tmp_path / "cam.yml"
    p.write_text(CAM_YML)
    d = read_cv_yaml(str(p))
    K = d["camera_matrix"]
    assert K.shape == (3, 3)
    assert K[0, 0] == 200.0 and K[1, 2] == 120.0
    assert d["image_width"] == 320


def test_from_yaml(tmp_path):
    cam = tmp_path / "CamConfig.yml"
    st = tmp_path / "Settings.yml"
    cam.write_text(CAM_YML)
    st.write_text(SETTINGS_YML)
    cfg = SystemConfig.from_yaml(str(cam), str(st))
    assert cfg.fx == 200.0 and cfg.fy == 210.0
    assert cfg.width == 320 and cfg.height == 240
    assert cfg.fps == 15
    assert cfg.scale_factor == 1.5  # via the 'scale_facotr' typo key
    assert cfg.max_level == 3
    assert cfg.local_iter == 12
    assert cfg.cap.n_features == 500
    # Rodrigues: rvec = pi/2 about z
    Tbc = cfg.Tbc_mat
    np.testing.assert_allclose(
        Tbc[:3, :3], [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12
    )
    np.testing.assert_allclose(Tbc[:3, 3], [0.1, 0.2, 0.3])
    # Tcb is the exact inverse
    np.testing.assert_allclose(cfg.Tcb_mat @ Tbc, np.eye(4), atol=1e-12)


def test_defaults_roundtrip():
    cfg = SystemConfig()
    assert cfg.accept_depth(1.0)
    assert not cfg.accept_depth(0.01)
    assert cfg.level_sigma2.shape == (cfg.max_level,)
    cfg2 = cfg.replace(fps=5)
    assert cfg2.fps == 5 and cfg.fps == 30


def test_read_cv_yaml_quoted_hash(tmp_path):
    """'#' inside a quoted scalar is data, not a comment; trailing
    comments outside quotes still strip."""
    from se2lam_tpu.config import read_cv_yaml

    p = tmp_path / "q.yml"
    p.write_text(
        '%YAML:1.0\n---\n'
        'map_file_path: "/data/run #3/map"  # trailing comment\n'
        "other_path: '/a #b'\n"
        'fps: 30  # comment\n'
    )
    y = read_cv_yaml(str(p))
    assert y["map_file_path"] == "/data/run #3/map"
    assert y["other_path"] == "/a #b"
    assert y["fps"] == 30


def test_obs_sigma_px_scales_level_sigma2():
    """The keypoint-noise calibration knob enters every reprojection
    edge through level_sigma2 (sigma_px^2 * scale^2l); default 1.0 is
    reference parity (Sigma_u = I*levelSigma2, src/Map.cpp:1030)."""
    import numpy as np

    from se2lam_tpu.config import SystemConfig

    base = SystemConfig()
    calib = base.replace(obs_sigma_px=2.0)
    np.testing.assert_allclose(
        calib.level_sigma2, 4.0 * base.level_sigma2, rtol=1e-6
    )
    assert base.level_sigma2[0] == 1.0
