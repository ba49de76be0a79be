"""Map checkpoint/resume.

TPU-native replacement for the reference MapStorage
(src/MapStorage.cpp:52-590): there, the pointer graph is flattened into
one OpenCV YAML (keypoints, descriptors, view-MPs + info, poses, odom,
dense observation matrices, covisibility/odo/feature graphs) plus per-KF
BMP debug images, then re-wired object-by-object on load. Here the map
already IS flat fixed-capacity arrays, so a checkpoint is a direct dump
of the MapState struct-of-arrays (compressed npz + json meta) — no
re-wiring pass, no id compaction, loads in one shot. The trained BoW
vocabulary rides along so localization-only mode can relocalize against
the saved map without retraining.
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..mapstate import MapState
from ..vocab import Vocabulary

__all__ = ["save_map", "load_map"]

_FORMAT_VERSION = 2  # v2: adds mp_desc_votes (majority-descriptor state)


def save_map(path: str, ms: MapState, vocab: Vocabulary | None = None,
             meta: dict | None = None):
    """Write the map (and optional vocabulary) to ``path`` (a directory)."""
    os.makedirs(path, exist_ok=True)
    arrays = {f"ms_{k}": np.asarray(v) for k, v in ms._asdict().items()}
    if vocab is not None:
        arrays["vocab_words"] = np.asarray(vocab.words)
        arrays["vocab_idf"] = np.asarray(vocab.idf)
    np.savez_compressed(os.path.join(path, "map.npz"), **arrays)
    info = {
        "format_version": _FORMAT_VERSION,
        "n_kf": int(ms.n_kf),
        "n_mp": int(ms.n_mp),
        "has_vocab": vocab is not None,
    }
    if meta:
        info["meta"] = meta
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(info, f, indent=2)


def load_map(path: str):
    """Load (MapState, Vocabulary | None, meta dict) from ``path``."""
    with open(os.path.join(path, "meta.json")) as f:
        info = json.load(f)
    version = info.get("format_version")
    if version not in (1, _FORMAT_VERSION):
        raise ValueError(f"unsupported map format: {version}")
    data = np.load(os.path.join(path, "map.npz"))
    fields = {}
    for name in MapState._fields:
        if f"ms_{name}" in data:
            fields[name] = jnp.asarray(data[f"ms_{name}"])
    if version == 1 and "mp_desc_votes" not in fields:
        # lossless upgrade: the stored majority descriptor is itself a
        # one-observation vote state
        fields["mp_desc_votes"] = fields["mp_desc"].astype(jnp.int16)
    ms = MapState(**fields)
    vocab = None
    if info.get("has_vocab"):
        vocab = Vocabulary(
            words=jnp.asarray(data["vocab_words"]),
            idf=jnp.asarray(data["vocab_idf"]),
        )
    return ms, vocab, info
