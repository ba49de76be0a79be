"""se2lam_tpu — TPU-native SE(2)-constrained visual-odometric SLAM.

A from-scratch JAX/Pallas re-derivation of the capabilities of
izhengfan/se2lam (ICRA 2019 "Visual-Odometric Localization and Mapping for
Ground Vehicles Using SE(2)-XYZ Constraints"): monocular camera +
wheel-encoder SLAM for planar robots, built as a functional pipeline over
fixed-capacity device arrays instead of threads over a pointer graph.
"""

__version__ = "0.1.0"


def enable_compilation_cache(cache_dir: str) -> None:
    """Persist compiled executables across processes.

    Production startup on a remote-attached chip pays minutes of XLA
    compiles for the pipeline's ~10 programs (tracking step, chunked
    step, keyframe insertion, local BA, prune, loop stack, global BA);
    with a persistent cache the second process start skips straight to
    execution. Avoid on CPU: XLA:CPU's AOT loader logs machine-feature
    mismatch warnings when reloading cached code across machine types.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)


def __getattr__(name):
    # lazy top-level exports: importing the package stays cheap (no jax
    # backend touch) until a symbol is actually used
    _lazy = {
        "SlamSystem": ("se2lam_tpu.system", "SlamSystem"),
        "Localizer": ("se2lam_tpu.localizer", "Localizer"),
        "SystemConfig": ("se2lam_tpu.config", "SystemConfig"),
        "Capacity": ("se2lam_tpu.config", "Capacity"),
        "MapState": ("se2lam_tpu.mapstate", "MapState"),
        "empty_map": ("se2lam_tpu.mapstate", "empty_map"),
        "LoopCloser": ("se2lam_tpu.loopclose", "LoopCloser"),
        "merge_maps": ("se2lam_tpu.mapmerge", "merge_maps"),
    }
    if name in _lazy:
        import importlib

        mod, attr = _lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'se2lam_tpu' has no attribute {name!r}")
