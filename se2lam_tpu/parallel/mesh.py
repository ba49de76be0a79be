"""Device-mesh construction helpers."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices.

    SLAM workloads here shard one data axis at a time (observations for
    local BA, keyframe banks for loop scoring), so a 1-D mesh is the
    natural layout; collectives ride ICI within a slice.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (axis,))
