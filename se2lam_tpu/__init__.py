"""se2lam_tpu — TPU-native SE(2)-constrained visual-odometric SLAM.

A from-scratch JAX/Pallas re-derivation of the capabilities of
izhengfan/se2lam (ICRA 2019 "Visual-Odometric Localization and Mapping for
Ground Vehicles Using SE(2)-XYZ Constraints"): monocular camera +
wheel-encoder SLAM for planar robots, built as a functional pipeline over
fixed-capacity device arrays instead of threads over a pointer graph.
"""

__version__ = "0.1.0"
