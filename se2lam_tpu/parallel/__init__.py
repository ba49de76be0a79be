"""Multi-device distribution: sharded bundle adjustment and map-bank ops.

The reference has no distributed story (4 threads, one mutex-guarded map —
SURVEY §2 parallelism table). This package is the new capability: map
state and factor-graph workloads sharded over a ``jax.sharding.Mesh``,
with XLA inserting the collectives (psum of Schur-reduced systems,
all-gather argmax for loop scores) from sharding annotations.
"""
from .dist_ba import (  # noqa: F401
    DistBAProblem,
    dist_solve_local_ba,
    partition_points,
    sharded_solve_joint_ba,
    sharded_solve_local_ba,
)
from .dist_posegraph import dist_solve_pose_graph  # noqa: F401
from .dist_loop import (  # noqa: F401
    shard_bank, sharded_bow_detect, sharded_hamming_detect,
)
from .fleet import make_fleet_tracker, shard_fleet  # noqa: F401
from .fleet_localize import make_fleet_localizer  # noqa: F401
from .mesh import make_mesh  # noqa: F401
from . import runtime  # noqa: F401 — jax.distributed multi-host init
