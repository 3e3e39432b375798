"""Model inspector: parameters, compiled-graph cost analysis, serving geometry.

    /opt/venv/bin/python -m audiojax.utils.inspect_model --model gtcrn
    /opt/venv/bin/python -m audiojax.utils.inspect_model --model zipenhancer \
        --compute-dtype bfloat16

Prints a JSON report: parameter count/bytes, the manifest serving geometry,
and XLA's cost analysis of the compiled forward (FLOPs, bytes accessed,
arithmetic intensity, est. GFLOP per second of audio) — the observability
layer the reference lacks (its only introspection is the ONNX metadata
inspector, /root/reference/inspect_audio_metadata.py).
"""
from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np


def inspect_model(name: str, compute_dtype: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from ..runtime import registry

    spec = registry.get(name)
    cfg = spec.make_config()
    if compute_dtype is not None:
        if not registry.has_compute_dtype(cfg):
            raise ValueError(f"{name} has no compute_dtype knob")
        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    man = spec.make_manifest(cfg)
    rc = man.runtime_config()
    w, ch, k = rc["INPUT_AUDIO_LENGTH"], rc["INPUT_CHANNELS"], rc["NUM_AUDIO_INPUTS"]
    shape = (1, w) if ch == 1 else (1, ch, w)

    params = spec.init_params(jax.random.PRNGKey(0), cfg)
    leaves = jax.tree_util.tree_leaves(params)
    n_params = int(sum(np.prod(l.shape) for l in leaves))
    param_bytes = int(sum(np.prod(l.shape) * jnp.dtype(l.dtype).itemsize for l in leaves))

    inputs = [jnp.zeros(shape, jnp.int16) for _ in range(k)]
    lowered = jax.jit(spec.make_forward(cfg)).lower(params, *inputs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    chunk_s = w / rc["IN_SAMPLE_RATE"]

    report = {
        "model": name,
        "task": spec.task,
        "params": n_params,
        "param_mb": round(param_bytes / 2**20, 2),
        "chunk_seconds": round(chunk_s, 3),
        "input_shape": list(shape),
        "num_audio_inputs": k,
        "sample_rates": {"in": rc["IN_SAMPLE_RATE"], "model": rc["MODEL_SAMPLE_RATE"],
                         "out": rc["OUT_SAMPLE_RATE"]},
        "gflops_per_chunk": round(flops / 1e9, 3),
        "gflops_per_audio_second": round(flops / 1e9 / chunk_s, 3) if chunk_s else None,
        "bytes_accessed_mb": round(bytes_acc / 2**20, 2),
        "arithmetic_intensity": round(flops / bytes_acc, 2) if bytes_acc else None,
    }
    if compute_dtype:
        report["compute_dtype"] = compute_dtype
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", help="model name; omit with --all")
    ap.add_argument("--all", action="store_true", help="inspect every registered model")
    ap.add_argument("--compute-dtype", default=None, choices=["float32", "bfloat16"])
    args = ap.parse_args(argv)

    from ..runtime import registry

    names = registry.names() if args.all else [args.model]
    if not names or names == [None]:
        ap.error("--model or --all is required")
    failed = 0
    for n in names:
        try:
            print(json.dumps(inspect_model(n, args.compute_dtype)), flush=True)
        except Exception as e:
            failed += 1
            print(json.dumps({"model": n, "error": f"{type(e).__name__}: {e}"}), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
