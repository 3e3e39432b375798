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


def test_reexport_drops_stale_blobs(gtcrn_artifact, tmp_path):
    """Re-exporting in the other batch mode must not leave the previous
    export's graph bytes in the artifact (a host could deserialize them by
    hand and serve a stale graph)."""
    path, fn, params, manifest = gtcrn_artifact
    art = tmp_path / "art"
    art.mkdir()
    for f in path.iterdir():
        (art / f.name).write_bytes(f.read_bytes())
    assert (art / aot.GRAPH_FILE).is_file()  # poly blob from the fixture

    def stubborn(params, audio):
        int(audio.shape[0])
        return fn(params, audio)

    aot.attach_graph(art, stubborn, params, manifest, static_batches=(1,))
    assert not (art / aot.GRAPH_FILE).exists()  # stale poly blob removed
    assert (art / f"{aot.GRAPH_FILE}.b1").is_file()
    # and back: static blobs removed by a poly re-export
    aot.attach_graph(art, fn, params, manifest)
    assert (art / aot.GRAPH_FILE).is_file()
    assert not list(art.glob(aot.GRAPH_FILE + ".b*"))


def test_empty_static_batches_is_an_error(gtcrn_artifact, tmp_path):
    """An explicit empty static-batch list must not silently substitute the
    defaults — and must not write a graphless meta."""
    path, fn, params, manifest = gtcrn_artifact

    def stubborn(params, audio):
        int(audio.shape[0])
        return fn(params, audio)

    with pytest.raises(ValueError, match="static_batches is empty"):
        aot.attach_graph(tmp_path, stubborn, params, manifest, static_batches=())
    assert not (tmp_path / aot.GRAPH_META).exists()


def test_gpu_backend_name_maps_to_lowering_platforms(gtcrn_artifact, tmp_path, monkeypatch):
    """jax.export stores lowering platform names ('cuda'/'rocm'); a host whose
    default_backend() reports 'gpu' must not be refused a cuda-exported graph
    — while a tpu-only graph still is."""
    path, fn, params, manifest = gtcrn_artifact
    clone = tmp_path / "art"
    clone.mkdir()
    for f in path.iterdir():
        (clone / f.name).write_bytes(f.read_bytes())
    meta = json.loads((clone / aot.GRAPH_META).read_text())
    monkeypatch.setattr(jax, "default_backend", lambda: "gpu")
    meta["platforms"] = ["cuda"]
    (clone / aot.GRAPH_META).write_text(json.dumps(meta))
    aot.load_compiled(clone, params)  # must not raise at load time
    meta["platforms"] = ["tpu"]
    (clone / aot.GRAPH_META).write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="platform"):
        aot.load_compiled(clone, params)


def test_prepare_for_graph_reproduces_compute_dtype(gtcrn_artifact, tmp_path):
    """graph.json records the served params' compute dtype; prepare_for_graph
    reproduces the host-side cast without the model's config class."""
    path, fn, params, manifest = gtcrn_artifact
    clone = tmp_path / "art"
    clone.mkdir()
    for f in path.iterdir():
        (clone / f.name).write_bytes(f.read_bytes())
    meta = json.loads((clone / aot.GRAPH_META).read_text())
    assert meta["params_compute_dtype"] is None  # f32 artifact
    assert aot.prepare_for_graph(params, clone) is params  # no-op

    meta["params_compute_dtype"] = "bfloat16"
    (clone / aot.GRAPH_META).write_text(json.dumps(meta))
    prepared = aot.prepare_for_graph(params, clone)
    dtypes = {str(jnp.result_type(l)) for l in jax.tree.leaves(prepared)}
    assert "float32" not in dtypes
    assert "bfloat16" in dtypes


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
