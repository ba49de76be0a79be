"""Fleet localization: B robots localizing against ONE frozen map.

The production serving shape — a site builds a map once
(`SlamSystem.save_map`) and a fleet of robots localizes against it
(the reference's LOCALIZATION_ONLY mode, src/OdoSLAM.cpp:120-132, which
is strictly one-robot-per-process). Here the whole fleet is one
program: the chunked speculative localizer (`localizer._localize_chunk`
— on-device tracked-accept, k frames per sync, DESIGN §12) vmapped over
a robot axis. One dispatch covers B×k frames; the map is traced ONCE
and shared, not replicated per robot. Optionally shard the robot axis
over a device mesh (`fleet.shard_fleet`) — pure data parallelism, zero
cross-robot communication.

Lost robots fall out of the batch: the per-(robot, frame) ``tracked``
flags come back in the single fetch, and the host runs the BoW
relocalization path (`Localizer` internals) only for the robots/frames
that need it — the same speculate/verify split as the single-robot
chunk path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..frontend.orb import OrbConfig, make_batch_extractor
from ..localizer import _localize_chunk
from ..mapstate import MapState
from ..ops.camera import CameraModel

__all__ = ["make_fleet_localizer"]


def make_fleet_localizer(cfg: SystemConfig, ms: MapState,
                         min_tracked_matches: int = 10,
                         mesh=None, axis: str = "d"):
    """Returns (extract_fn, step_fn):

    - extract_fn(img_stack (B, k, H, W)) → OrbFeatures with (B, k) axes
    - step_fn(pose_b (B,3), last_odom_b (B,3), feats_bk, odo_bk (B,k,3))
        → (poses (B,k,3), tracked (B,k) bool)

    Frames: ``pose_b`` (and the returned poses) live in the MAP frame,
    whose gauge is the mapping session's first frame (that KF's pose is
    the origin — NOT the synthetic/world frame). ``last_odom_b`` and
    ``odo_bk`` are raw odometry readings; only their increments matter.

    step_fn speculatively localizes k frames for every robot in one
    dispatch; a robot's carry freezes at its first lost frame (the host
    relocalizes it out-of-band and re-enters it next chunk). The map is
    closed over — swap maps by rebuilding the localizer.
    """
    orb_cfg = OrbConfig(
        height=cfg.height, width=cfg.width,
        n_features=cfg.cap.n_features,
        scale_factor=cfg.scale_factor, n_levels=cfg.max_level,
    )
    cam = CameraModel.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.dist)
    undistort = any(abs(d) > 0 for d in cfg.dist)
    batch_extract = make_batch_extractor(orb_cfg, cam, undistort)
    gate = jnp.asarray(min_tracked_matches, jnp.int32)

    def _extract_flat(img_stack):
        # (B, k, H, W) → flatten to one (B*k,) sequential lax.map so
        # peak extractor memory stays at ONE frame's intermediates
        # regardless of fleet size (vmapping batch_extract over robots
        # multiplies the per-step peak by B — the observed TPU worker
        # OOM-crash pattern at batch 24, see make_batch_extractor)
        B, k = img_stack.shape[0], img_stack.shape[1]
        flat = img_stack.reshape((B * k,) + img_stack.shape[2:])
        feats = batch_extract(flat)
        return jax.tree.map(
            lambda x: x.reshape((B, k) + x.shape[1:]), feats
        )

    if mesh is not None:
        # robot axis sharded over a mesh: sequential extraction only
        # WITHIN a device's robot chunk, devices in parallel (lax.map
        # over a sharded axis would gather + serialize the whole fleet;
        # see make_fleet_tracker). The mesh axis size must divide B.
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        _extract_flat = shard_map(
            _extract_flat, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis),
        )

    extract_fn = jax.jit(_extract_flat)

    @jax.jit
    def step_fn(ms_in, pose_b, last_odom_b, feats_bk, odo_bk):
        # the map is a runtime ARGUMENT (in_axes=None broadcast), never a
        # baked-in constant: embedding an ~80 MB MapState as an XLA
        # constant would bloat the executable and re-upload it per swap
        k = odo_bk.shape[1]
        start = jnp.asarray(0, jnp.int32)
        stop = jnp.asarray(k, jnp.int32)
        return jax.vmap(
            lambda p, lo, f, o: _localize_chunk(
                ms_in, p, lo, f, o, start, stop, gate, cfg
            )
        )(pose_b, last_odom_b, feats_bk, odo_bk)

    def run_step(pose_b, last_odom_b, feats_bk, odo_bk):
        return step_fn(ms, pose_b, last_odom_b, feats_bk, odo_bk)

    return extract_fn, run_step
