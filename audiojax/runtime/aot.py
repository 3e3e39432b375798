"""AOT deployment graphs: serialized StableHLO next to the params.

The reference's core product property is that the deployed artifact IS the
executable graph — an ONNX file whose weights are initializers and whose
metadata rides inside it (/root/reference/README.md:16-28): the serving host
needs onnxruntime and that file, never the model's Python.  audiojax
artifacts (params.msgpack + manifest.json) re-trace the model's Python at
load; this module closes that gap TPU-natively with ``jax.export``: the
traced computation is serialized (portable StableHLO bytes) into the
artifact, and :func:`load_compiled` rebuilds a servable callable from the
bytes alone.

Scope of the no-model-Python property: a host using the LIBRARY API
(``load_artifact`` + :func:`prepare_for_graph` + :func:`load_compiled` +
``Session``) needs ``audiojax.runtime`` + jax, never ``audiojax.models`` —
``graph.json`` records the compute dtype the served params were prepared to,
and :func:`prepare_for_graph` reproduces that preparation generically (the
params fingerprint check fails closed for the rare models whose preparation
is not a uniform cast).  The CLI's ``--aot`` flag, by contrast, still
resolves the model spec for its shared config/manifest plumbing; it serves
the serialized graph instead of re-tracing, but does import the model
module.

Shape policy — the window-batch axis is exported SYMBOLIC (jax.export shape
polymorphism), so ONE serialized graph serves any clip length through the
Session's window bucketing.  This mirrors the reference's dynamic-axes plan
(/root/reference/Optimize_ONNX_Common.py:245-278) without its cost: XLA
still compiles static shapes per bucket at run time, the *serialization* is
what's batch-polymorphic.  Models whose internals reject a symbolic batch
fall back fail-closed to an explicit static batch list (the reference's
DYNAMIC_AXES=False default, SURVEY.md §2.3).

Platform policy — like the reference's opt_level=99 artifacts being
OS-specific (/root/reference/README.md:94), a graph is exported for the
platform(s) you name; the default is the current backend.  Loading checks
the stored platform list fail-closed.
"""
from __future__ import annotations

import hashlib
import json
from pathlib import Path

import jax
import numpy as np

__all__ = ["attach_graph", "load_compiled", "has_graph", "prepare_for_graph",
           "GRAPH_FILE", "GRAPH_META"]

GRAPH_FILE = "graph.stablehlo"
GRAPH_META = "graph.json"


def _params_fingerprint(params) -> str:
    """Order-stable digest of the params pytree STRUCTURE (paths/shapes/dtypes
    — not values), so a graph can refuse params it was not traced for."""
    h = hashlib.sha256()
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in leaves:
        h.update(jax.tree_util.keystr(path).encode())
        h.update(str(tuple(np.shape(leaf))).encode())
        h.update(str(jax.numpy.result_type(leaf)).encode())
    return h.hexdigest()


def _audio_avals(manifest, batch):
    """ShapeDtypeStructs for the Session's model_fn call: one (b, W) int16
    per audio input ((b, ch, W) for multi-channel models)."""
    cfg = manifest.runtime_config()
    w = cfg["INPUT_AUDIO_LENGTH"]
    ch = cfg["INPUT_CHANNELS"]
    shape = (batch, w) if ch == 1 else (batch, ch, w)
    return tuple(jax.ShapeDtypeStruct(shape, jax.numpy.int16)
                 for _ in range(cfg["NUM_AUDIO_INPUTS"]))


def export_graph(model_fn, params, manifest, *, platforms=None,
                 static_batches=None, max_batch=64):
    """Trace + serialize ``model_fn(params, *audios)``.

    Returns ``(blobs, meta)``: ``blobs`` maps a batch tag ("poly" or "b<N>")
    to serialized bytes; ``meta`` is the JSON-able sidecar dict.  A symbolic
    window-batch axis is tried first, bounded by ``b <= max_batch`` so the
    models' size-dependent perf forks (e.g. the depthwise-unroll volume
    ceiling, nn/core.py) stay decidable and the poly graph takes the SAME
    kernel routes as direct jit at every admissible batch; jax.export
    enforces the bound at call time.  Models that are still inconclusive
    fall back to explicit static batches (default 1..16).
    """
    from jax import export as jexport

    param_avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x), jax.numpy.result_type(x)), params)
    kw = {"platforms": tuple(platforms)} if platforms else {}
    blobs: dict[str, bytes] = {}
    symbolic_error = None
    try:
        (b,) = jexport.symbolic_shape("b", constraints=[f"b <= {int(max_batch)}"])
        avals = _audio_avals(manifest, b)
        exp = jexport.export(jax.jit(model_fn), **kw)(param_avals, *avals)
        blobs["poly"] = exp.serialize()
    except Exception as e:  # noqa: BLE001 — fall back to static batches
        symbolic_error = f"{type(e).__name__}: {e}"
        # `None` means "use the defaults"; an explicit empty sequence is a
        # user error, surfaced below rather than silently substituted
        batches = (1, 2, 4, 8, 16) if static_batches is None else tuple(static_batches)
        for n in batches:
            avals = _audio_avals(manifest, int(n))
            exp = jexport.export(jax.jit(model_fn), **kw)(param_avals, *avals)
            blobs[f"b{int(n)}"] = exp.serialize()
    if not blobs:
        raise ValueError(
            "aot export produced no graphs: the symbolic-batch trace failed "
            f"({symbolic_error}) and static_batches is empty")
    meta = {
        "format": "jax.export/stablehlo",
        "platforms": list(exp.platforms),
        "batch_mode": "poly" if "poly" in blobs else "static",
        "max_batch": int(max_batch) if "poly" in blobs else None,
        "batches": sorted(blobs),
        # admissible window batches, visible at export time: poly graphs
        # accept 1..max_batch, static graphs exactly the listed sizes
        "admissible_batches": (f"1..{int(max_batch)}" if "poly" in blobs
                               else sorted(int(t[1:]) for t in blobs)),
        "symbolic_fallback_error": symbolic_error,
        "params_fingerprint": _params_fingerprint(params),
        # the compute dtype the served params were prepared to (None = as
        # stored); lets a model-Python-free host reproduce the preparation
        # via prepare_for_graph
        "params_compute_dtype": (getattr(manifest, "extra", None) or {}).get(
            "activation_compute_dtype"),
        "jax_version": jax.__version__,
    }
    return blobs, meta


def attach_graph(artifact_dir, model_fn, params, manifest, *, platforms=None,
                 static_batches=None, max_batch=64) -> Path:
    """Serialize the model graph into an existing artifact directory."""
    artifact_dir = Path(artifact_dir)
    blobs, meta = export_graph(model_fn, params, manifest, platforms=platforms,
                               static_batches=static_batches, max_batch=max_batch)
    # drop blobs from any previous export first: re-exporting static over a
    # prior poly export (or vice versa) must not leave stale graph bytes a
    # host could deserialize by hand
    for old in artifact_dir.glob(GRAPH_FILE + "*"):
        old.unlink()
    for tag, blob in blobs.items():
        (artifact_dir / f"{GRAPH_FILE}.{tag}" if tag != "poly"
         else artifact_dir / GRAPH_FILE).write_bytes(blob)
    (artifact_dir / GRAPH_META).write_text(json.dumps(meta, indent=2))
    return artifact_dir / GRAPH_META


def has_graph(artifact_dir) -> bool:
    return (Path(artifact_dir) / GRAPH_META).is_file()


def prepare_for_graph(params, artifact_dir):
    """Model-Python-free analog of ``registry.prepare_compute_params``: cast
    f32 param leaves to the compute dtype recorded in ``graph.json`` (no-op
    when none was recorded, and for quantized {'q8','scale'} trees whose
    dtypes are part of the dequant contract).  For the rare models whose
    preparation is not a uniform cast (a ``spec.prepare_params`` override),
    the resulting fingerprint mismatch makes :func:`load_compiled` fail
    closed with a re-export instruction rather than serve wrong numerics."""
    meta = json.loads((Path(artifact_dir) / GRAPH_META).read_text())
    dtype = meta.get("params_compute_dtype")
    if not dtype:
        return params
    import jax.numpy as jnp

    target = jnp.dtype(dtype)
    return jax.tree.map(
        lambda x: x.astype(target)
        if jnp.result_type(x) == jnp.float32 else x, params)


def load_compiled(artifact_dir, params):
    """Rebuild a servable ``fn(params, *audios)`` from the serialized graph.

    Fail-closed: refuses params whose pytree structure differs from the one
    the graph was traced for, and refuses to run on a platform the graph was
    not exported for.  The returned callable is jit-compatible (Session jits
    it) and, for static-batch graphs, dispatches on the window-batch size.
    """
    from jax import export as jexport

    artifact_dir = Path(artifact_dir)
    meta = json.loads((artifact_dir / GRAPH_META).read_text())
    fp = _params_fingerprint(params)
    if fp != meta["params_fingerprint"]:
        raise ValueError(
            "aot graph/params mismatch: the serialized graph was traced for a "
            "different params structure (fingerprint "
            f"{meta['params_fingerprint'][:12]}… vs {fp[:12]}…); re-export with "
            "attach_graph")
    backend = jax.default_backend()
    # jax.export stores LOWERING platform names ('cuda'/'rocm'), while
    # default_backend() reports the coarser 'gpu' — map before the check
    lowering_names = {"gpu": ("cuda", "rocm")}.get(backend, (backend,))
    if not set(lowering_names) & set(meta["platforms"]):
        raise ValueError(
            f"aot graph exported for platforms {meta['platforms']}, but the "
            f"current backend is {backend!r}; re-export on (or for) this "
            "platform — like the reference's opt_level=99 artifacts, compiled "
            "graphs are platform-scoped (/root/reference/README.md:94)")
    if meta["batch_mode"] == "poly":
        exp = jexport.deserialize((artifact_dir / GRAPH_FILE).read_bytes())
        max_batch = meta.get("max_batch")

        def call(params, *audios):
            n = audios[0].shape[0]
            if max_batch is not None and n > max_batch:
                raise ValueError(
                    f"aot graph was exported for window batches <= {max_batch} "
                    f"(got {n}); re-export with attach_graph(max_batch=…) for "
                    "longer clips")
            return exp.call(params, *audios)

        return call

    table = {}
    for tag in meta["batches"]:
        n = int(tag[1:])
        table[n] = jexport.deserialize(
            (artifact_dir / f"{GRAPH_FILE}.{tag}").read_bytes())

    def call(params, *audios):
        n = audios[0].shape[0]
        if n not in table:
            raise ValueError(
                f"aot graph has no batch-{n} export (available: "
                f"{sorted(table)}); re-export with static_batches including {n}")
        return table[n].call(params, *audios)

    return call
