"""AOT serialized-graph artifacts (runtime/aot.py).

The deployed-artifact-IS-the-graph property of the reference
(/root/reference/README.md:16-28): a serving host rebuilds the model from
serialized StableHLO bytes + params, without the model's Python.
"""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiojax.runtime import aot, registry
from audiojax.runtime.checkpoint import save_artifact
from audiojax.runtime.session import Session


@pytest.fixture(scope="module")
def gtcrn_artifact(tmp_path_factory):
    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(0), cfg)
    manifest = spec.make_manifest(cfg)
    fn = spec.make_forward(cfg)
    path = tmp_path_factory.mktemp("gtcrn_aot")
    save_artifact(path, params, manifest)
    aot.attach_graph(path, fn, params, manifest)
    return path, fn, params, manifest


def _windows(manifest, batch, seed=0):
    w = manifest.runtime_config()["INPUT_AUDIO_LENGTH"]
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.standard_normal((batch, w)) * 3000).astype(np.int16))


def test_poly_graph_serves_any_batch(gtcrn_artifact):
    """Symbolic-batch export: ONE blob reproduces the direct forward bit-exactly
    at two different window-batch sizes."""
    path, fn, params, manifest = gtcrn_artifact
    meta = json.loads((path / aot.GRAPH_META).read_text())
    assert meta["batch_mode"] == "poly", meta.get("symbolic_fallback_error")
    compiled = aot.load_compiled(path, params)
    for batch in (1, 3):
        audio = _windows(manifest, batch, seed=batch)
        np.testing.assert_array_equal(
            np.asarray(jax.jit(compiled)(params, audio)),
            np.asarray(jax.jit(fn)(params, audio)))


def test_session_serves_from_graph(gtcrn_artifact):
    """Session(model_fn=<deserialized graph>) == Session(model_fn=<python>)."""
    path, fn, params, manifest = gtcrn_artifact
    compiled = aot.load_compiled(path, params)
    clip = np.asarray(_windows(manifest, 1, seed=7)).reshape(-1)[: 40000].astype(np.int16)
    out_py = Session(fn, params, manifest).process(clip)
    out_aot = Session(compiled, params, manifest).process(clip)
    np.testing.assert_array_equal(out_aot.audio, out_py.audio)


def test_params_fingerprint_fail_closed(gtcrn_artifact):
    path, fn, params, manifest = gtcrn_artifact
    bad = dict(params)
    bad["extra"] = jnp.zeros((3,))
    with pytest.raises(ValueError, match="mismatch"):
        aot.load_compiled(path, bad)


def test_platform_scope_fail_closed(gtcrn_artifact, tmp_path):
    """A graph exported for another platform refuses to load (the reference's
    opt_level=99 OS-scoping analog)."""
    path, fn, params, manifest = gtcrn_artifact
    clone = tmp_path / "art"
    clone.mkdir()
    for f in path.iterdir():
        (clone / f.name).write_bytes(f.read_bytes())
    meta = json.loads((clone / aot.GRAPH_META).read_text())
    meta["platforms"] = ["tpu"]
    (clone / aot.GRAPH_META).write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="platform"):
        aot.load_compiled(clone, params)


def test_static_fallback_dispatch(tmp_path):
    """A model that rejects a symbolic batch falls back to explicit static
    batch exports; dispatch keys on the window-batch size and unknown sizes
    fail with an actionable error."""
    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(1), cfg)
    manifest = spec.make_manifest(cfg)
    real = spec.make_forward(cfg)

    def stubborn(params, audio):
        int(audio.shape[0])  # raises on a symbolic dim
        return real(params, audio)

    save_artifact(tmp_path, params, manifest)
    aot.attach_graph(tmp_path, stubborn, params, manifest, static_batches=(1, 2))
    meta = json.loads((tmp_path / aot.GRAPH_META).read_text())
    assert meta["batch_mode"] == "static"
    assert meta["symbolic_fallback_error"]
    compiled = aot.load_compiled(tmp_path, params)
    audio = _windows(manifest, 2, seed=11)
    np.testing.assert_array_equal(
        np.asarray(compiled(params, audio)), np.asarray(jax.jit(real)(params, audio)))
    with pytest.raises(ValueError, match="batch-3"):
        compiled(params, _windows(manifest, 3))


def test_two_input_model_graph(tmp_path):
    """AEC models (two audio inputs) export/serve through the same path."""
    import dataclasses

    spec = registry.get("sdaec")
    cfg = spec.make_config()
    if hasattr(cfg, "depth"):
        cfg = dataclasses.replace(cfg, depth=1)
    params = spec.init_params(jax.random.PRNGKey(2), cfg)
    manifest = spec.make_manifest(cfg)
    fn = spec.make_forward(cfg)
    save_artifact(tmp_path, params, manifest)
    aot.attach_graph(tmp_path, fn, params, manifest, static_batches=(1,))
    compiled = aot.load_compiled(tmp_path, params)
    near = _windows(manifest, 1, seed=3)
    far = _windows(manifest, 1, seed=4)
    np.testing.assert_array_equal(
        np.asarray(compiled(params, near, far)),
        np.asarray(jax.jit(fn)(params, near, far)))
