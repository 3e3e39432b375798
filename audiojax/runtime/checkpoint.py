"""Artifact save/load: params (msgpack) + manifest (JSON sidecar).

The reference's deployed artifact IS the checkpoint (weights are ONNX
initializers; metadata rides in the graph + a sidecar carrier,
/root/reference/audio_onnx_metadata.py:83-112).  Here an artifact directory
holds ``params.msgpack`` + ``manifest.json`` with the same fail-closed
required-key validation at load.
"""
from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from .manifest import Manifest

__all__ = ["save_artifact", "load_artifact"]


def save_artifact(path, params, manifest: Manifest) -> Path:
    from flax import serialization

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_params = jax.tree.map(np.asarray, params)
    (path / "params.msgpack").write_bytes(serialization.to_bytes(host_params))
    manifest.save(path / "manifest.json")
    return path


def load_artifact(path, params_template=None):
    """Load (params, manifest).  With a template the pytree structure/dtypes
    are validated; without, the raw nested-dict state is returned."""
    from flax import serialization

    path = Path(path)
    manifest = Manifest.load(path / "manifest.json")
    raw = (path / "params.msgpack").read_bytes()
    if params_template is not None:
        params = serialization.from_bytes(params_template, raw)
    else:
        params = serialization.msgpack_restore(raw)
    params = jax.tree.map(jax.numpy.asarray, params)
    return params, manifest
