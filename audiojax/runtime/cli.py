"""Command-line serving entry point.

Replaces the reference's 14 cloned Inference_*.py scripts with one generic
CLI driven by the model registry + manifest:

    python -m audiojax.runtime.cli --model gtcrn --input noisy.wav --output clean.wav
    python -m audiojax.runtime.cli --model nkf_aec --input near.wav far.wav --output out.wav
    python -m audiojax.runtime.cli --list

Without --artifact, parameters are randomly initialised (useful for smoke
runs and benchmarking; real weights come from ``audiojax.importers``).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _default_out(inp: Path, suffix: str) -> Path:
    """Default output path: next to the input, UNLESS the input lives in the
    read-only reference tree (--example inputs) — then the cwd."""
    import os

    parent = inp.parent
    if not os.access(parent, os.W_OK):
        parent = Path.cwd()
    return parent / (inp.stem + suffix)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="audiojax", description=__doc__)
    ap.add_argument("--model", help="model name (see --list)")
    ap.add_argument("--input", nargs="*", default=[], help="input wav path(s)")
    ap.add_argument("--output", help="output wav path (multi-source models append _0, _1, …)")
    ap.add_argument("--artifact", help="artifact dir with params.msgpack + manifest.json")
    ap.add_argument("--seed", type=int, default=0, help="random-params seed when no artifact")
    ap.add_argument("--example", action="store_true", help="use the reference Test_Examples input")
    ap.add_argument("--stream", action="store_true",
                    help="serve with state-carry streaming (low latency) instead of windowing")
    ap.add_argument("--compute-dtype", choices=["float32", "bfloat16"], default=None,
                    help="activation compute dtype for models that support it "
                         "(bf16 with f32 DSP islands — the reference's fp16-plan analog)")
    ap.add_argument("--block-hops", type=int, default=4, help="streaming block size in hops")
    ap.add_argument("--aot", action="store_true",
                    help="serve from the artifact's serialized graph (graph.stablehlo, "
                         "written by export --aot) instead of re-tracing model Python")
    ap.add_argument("--list", action="store_true", help="list registered models")
    args = ap.parse_args(argv)

    from . import registry

    if args.list:
        for n in registry.names():
            print(n)
        return 0

    if not args.model:
        ap.error("--model is required (or use --list)")
    spec = registry.get(args.model)

    import jax
    import numpy as np

    from .audio_io import read_audio, resample_np, to_mono, write_wav
    from .checkpoint import load_artifact
    from .session import Session

    import dataclasses

    cfg = spec.make_config()
    if args.artifact:
        params, manifest = load_artifact(args.artifact)
        if manifest.model_name != spec.name:
            print(f"artifact was exported for model {manifest.model_name!r} "
                  f"but --model is {spec.name!r}; refusing to serve with "
                  "mixed geometry", file=sys.stderr)
            return 2
        stored = (manifest.extra or {}).get("config")
        if stored is not None:
            # rebuild the EXACT exported config (JSON turned tuples into
            # lists; convert back for shape-bearing fields)
            def _detuple(v):
                return tuple(_detuple(x) for x in v) if isinstance(v, list) else v

            cfg = type(cfg)(**{k: _detuple(v) for k, v in stored.items()})
        # artifacts exported with --compute-dtype record it; reproduce unless
        # the user overrides on the command line
        recorded = (manifest.extra or {}).get("activation_compute_dtype")
        if recorded and not args.compute_dtype and stored is None:
            if registry.has_compute_dtype(cfg):
                cfg = dataclasses.replace(cfg, compute_dtype=recorded)
            else:
                # fail closed, mirroring export_artifact: serving f32 where
                # the artifact recorded e.g. bf16 would silently change both
                # numerics and performance
                print(f"artifact records activation_compute_dtype={recorded!r} "
                      f"but {spec.name} has no compute_dtype knob; refusing "
                      "to serve with a different dtype than exported",
                      file=sys.stderr)
                return 2
    if args.compute_dtype:
        if not registry.has_compute_dtype(cfg):
            print(f"{spec.name} has no compute_dtype knob; see the README's "
                  "bf16 model list or `inspect_model --all`", file=sys.stderr)
            return 2
        cfg = dataclasses.replace(cfg, compute_dtype=args.compute_dtype)
    if not args.artifact:
        print(f"note: no --artifact given; using randomly initialised {spec.name} params", file=sys.stderr)
        params = spec.init_params(jax.random.PRNGKey(args.seed), cfg)
        manifest = spec.make_manifest(cfg)

    inputs = [Path(p) for p in args.input]
    if args.example and not inputs:
        ex = registry.example_audio(spec.name)
        if ex is None:
            print(f"no example audio available for {spec.name}", file=sys.stderr)
            return 2
        inputs = list(ex)
    if len(inputs) != manifest.num_audio_inputs:
        print(f"{spec.name} needs {manifest.num_audio_inputs} input wav(s), got {len(inputs)}", file=sys.stderr)
        return 2

    audios = []
    for p in inputs:
        data, rate = read_audio(p)
        if manifest.input_channels == 1:
            data = to_mono(data)[None]
        data = resample_np(data, rate, manifest.in_sample_rate)
        audios.append(data)

    if args.stream:
        import time

        from .streaming import StreamingSession

        if spec.make_stream is None:
            print(f"{spec.name} does not support --stream (no state-carry streaming); "
                  f"streaming models: "
                  f"{[n for n in registry.names() if registry.get(n).make_stream]}",
                  file=sys.stderr)
            return 2
        from .optimize import materialize_params

        # the streaming path cannot wrap the forward, so optimized artifact
        # params are materialized host-side (q8f32 dequant / bf16 upcast)
        ss = StreamingSession(spec, materialize_params(params, manifest), cfg,
                              block_hops=args.block_hops)
        monos = [to_mono(a) if a.ndim > 1 else a for a in audios]
        # pad to the LONGEST input like Session.process (min() would silently
        # drop the tail of the longer AEC signal)
        n = max(m.shape[-1] for m in monos)
        monos = [np.pad(m, (0, n - m.shape[-1])) for m in monos]
        t0 = time.perf_counter()
        pieces = [ss.push(*monos)]
        pieces.append(ss.flush())
        elapsed = time.perf_counter() - t0
        out = np.concatenate(pieces)
        out_path = Path(args.output) if args.output else _default_out(
            inputs[0], f".{spec.name}.stream.wav")
        written = write_wav(out_path, out, manifest.out_sample_rate)
        print(f"wrote {written}")
        dur = out.shape[-1] / manifest.out_sample_rate
        print(f"streaming RTF: {elapsed / dur:.4f}  "
              f"(algorithmic latency {ss.latency_samples} samples = "
              f"{1000 * ss.latency_samples / manifest.model_sample_rate:.0f} ms)")
        return 0

    from .optimize import wrap_forward

    # pre-cast f32 leaves to the config's compute dtype once (no-op for f32
    # configs and for quantized artifacts — see prepare_compute_params)
    params = registry.prepare_compute_params(params, cfg, spec)
    if args.aot:
        from . import aot

        if not args.artifact or not aot.has_graph(args.artifact):
            print("--aot needs an --artifact containing a serialized graph "
                  "(export with `python -m audiojax.runtime.export … --aot`)",
                  file=sys.stderr)
            return 2
        fwd = aot.load_compiled(args.artifact, params)  # plan wrap is in-graph
    else:
        fwd = wrap_forward(spec.make_forward(cfg), manifest)
    session = Session(fwd, params, manifest)
    result = session.process(*audios)

    out_base = Path(args.output) if args.output else _default_out(inputs[0], f".{spec.name}.wav")
    written = []
    if len(result.outputs) == 1:
        written.append(write_wav(out_base, result.outputs[0], manifest.out_sample_rate))
    else:
        for i, o in enumerate(result.outputs):
            written.append(
                write_wav(out_base.with_name(out_base.stem + f"_{i}" + out_base.suffix), o, manifest.out_sample_rate)
            )
    for w in written:
        print(f"wrote {w}")
    print(f"RTF: {result.rtf:.4f}  ({result.elapsed_s*1e3:.1f} ms for {result.audio_duration_s:.2f} s audio; "
          f"includes one-off XLA compile — steady-state numbers come from bench.py)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
