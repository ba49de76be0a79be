"""Fleet tracking: many robots' frontends on one program.

The reference is strictly one-robot-per-process. Because every stage
here is a pure function over fixed-shape state, a fleet of B robots is
just a leading batch axis: ``vmap`` over the tracking step (and the
extractor), optionally sharded robot-major across a device mesh — pure
data parallelism with zero cross-robot communication. This is the
serving shape: one chip timeshares hundreds of tracking streams, a pod
shards the fleet.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import tracking
from ..config import SystemConfig
from ..frontend.orb import OrbConfig, make_extractor

__all__ = ["make_fleet_tracker", "shard_fleet"]


def make_fleet_tracker(cfg: SystemConfig, orb_cfg: OrbConfig | None = None,
                       mesh: Mesh | None = None, axis: str = "d"):
    """Returns (init_fn, step_fn, extract_fn):

    - init_fn(feats_b, pose_b, odom_b) → batched TrackState
    - step_fn(ts_b, imgs_b, odo_b, keys_b) → (ts_b, TrackResult_b)
    - extract_fn(imgs_b) → batched OrbFeatures

    All arguments carry a leading robot axis B; step_fn is jitted once
    for any B (retrace per batch size).

    Pass ``mesh`` when the fleet is sharded robot-major over a device
    mesh (``shard_fleet``): extraction then runs as a ``shard_map`` —
    each device lax.maps only its local robot chunk, in parallel across
    devices. Without it, lax.map over a sharded axis is a *scan* over
    that axis: XLA gathers every robot's frame to all devices and runs
    the extractor (the dominant per-frame cost) B times sequentially,
    which both serializes the fleet and breaks the zero-cross-robot-
    communication contract. The mesh axis size must then divide B.
    """
    if orb_cfg is None:
        orb_cfg = OrbConfig(
            height=cfg.height,
            width=cfg.width,
            n_features=cfg.cap.n_features,
            scale_factor=cfg.scale_factor,
            n_levels=cfg.max_level,
        )
    extract = make_extractor(orb_cfg)

    def init_fn(feats_b, pose_b, odom_b):
        N = orb_cfg.n_slots
        B = pose_b.shape[0]
        return jax.vmap(
            lambda f, p, o: tracking.init_track_state(
                f, p, o, 0,
                view_mp=jnp.zeros((N, 3), jnp.float32),
                obs_mask=jnp.zeros((N,), bool),
            )
        )(feats_b, pose_b, odom_b)

    def _extract_seq(imgs_b):
        # sequential lax.map over robots, NOT vmap: the extractor's
        # one-hot patch-gather intermediates are per-frame large and a
        # vmapped batch multiplies that peak by B (observed TPU worker
        # OOM-crash at batch 24 — see make_batch_extractor); tracking
        # below stays vmapped, its state is small
        return jax.lax.map(
            lambda im: extract(im.astype(jnp.float32)), imgs_b
        )

    if mesh is None:
        _extract_b = _extract_seq
    else:
        # robot axis sharded over the mesh: sequential only WITHIN each
        # device's chunk, devices in parallel (keeps the single-device
        # VMEM bound above without serializing the whole fleet)
        from jax import shard_map

        _extract_b = shard_map(
            _extract_seq, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis),
        )

    @jax.jit
    def step_fn(ts_b, imgs_b, odo_b, keys_b):
        feats_b = _extract_b(imgs_b)
        return jax.vmap(
            lambda ts, f, o, k: tracking.track_frame(ts, f, o, k, cfg)
        )(ts_b, feats_b, odo_b, keys_b)

    extract_fn = jax.jit(_extract_b)

    return init_fn, step_fn, extract_fn


def shard_fleet(tree, mesh: Mesh, axis: str = "d"):
    """Place a batched pytree with the robot axis sharded over the mesh
    (the mesh axis size must divide the batch size)."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
