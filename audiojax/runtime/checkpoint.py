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


def _check_roundtrippable(tree, where="params"):
    """Fail closed at SAVE time on structures the template-less loader cannot
    distinguish: msgpack stores lists as {"0": ...} dicts, so a genuine dict
    with contiguous digit keys would reload as a list, and an empty list as
    an empty dict (use load_artifact(params_template=...) to carry those)."""
    if isinstance(tree, dict):
        if tree and all(isinstance(k, str) and k.isdigit() for k in tree) \
                and sorted(map(int, tree)) == list(range(len(tree))):
            raise ValueError(
                f"{where}: dict with contiguous digit keys would reload as a "
                f"LIST without a params_template — rename the keys or load "
                f"with a template")
        for k, v in tree.items():
            _check_roundtrippable(v, f"{where}/{k}")
    elif isinstance(tree, (list, tuple)):
        if len(tree) == 0:
            raise ValueError(
                f"{where}: empty list would reload as an empty dict without "
                f"a params_template")
        for i, v in enumerate(tree):
            _check_roundtrippable(v, f"{where}/{i}")


def save_artifact(path, params, manifest: Manifest) -> Path:
    from flax import serialization

    _check_roundtrippable(params)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_params = jax.tree.map(np.asarray, params)
    (path / "params.msgpack").write_bytes(serialization.to_bytes(host_params))
    manifest.save(path / "manifest.json")
    return path


def _relist(tree):
    """msgpack stores Python lists as {"0": …, "1": …} dicts; restore lists so
    reloaded params match the model's pytree structure (e.g. per-layer lists)."""
    if isinstance(tree, dict):
        if tree and all(isinstance(k, str) and k.isdigit() for k in tree):
            idx = sorted(tree, key=int)
            if [int(k) for k in idx] == list(range(len(idx))):
                return [_relist(tree[k]) for k in idx]
        return {k: _relist(v) for k, v in tree.items()}
    return tree


def load_artifact(path, params_template=None):
    """Load (params, manifest).  With a template the pytree structure/dtypes
    are validated; without, the raw nested state is returned (lists restored)."""
    from flax import serialization

    path = Path(path)
    manifest = Manifest.load(path / "manifest.json")
    raw = (path / "params.msgpack").read_bytes()
    if params_template is not None:
        params = serialization.from_bytes(params_template, raw)
    else:
        params = _relist(serialization.msgpack_restore(raw))
    params = jax.tree.map(jax.numpy.asarray, params)
    return params, manifest
