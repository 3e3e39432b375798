"""Full model-zoo RTF benchmark on the current JAX backend.

Measures EVERY registered model at its manifest serving geometry (one
``INPUT_AUDIO_LENGTH`` window, batch 1 — the reference's published chunk
sizes, /root/reference/README.md:59-87) plus bf16-compute variants for the
models that expose a ``compute_dtype`` knob.  Prints one JSON line per model
and a final markdown table.

    /opt/venv/bin/python -m audiojax.utils.bench_all [--iters N] [--models a,b]

``bench.py`` at the repo root remains the canonical single-line benchmark;
this is the coverage sweep behind the README's full RTF table.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np

# Reference RTF baselines (BASELINE.md; primary = first ORT-CPU row).
BASELINES = {
    "zipenhancer": 0.32,
    "mossformergan_se": 1.085,
    "mossformer2_se": 0.09,
    "dfsmn": 0.0068,
    "gtcrn": 0.0036,
    "h_gtcrn": 0.03,
    "ul_unas": 0.0064,
    "sdaec": 0.105,
    "dfsmn_aec": 0.11,
    "nkf_aec": 0.018,
    "deep_echo": 0.024,
    "mossformer2_ss": 2.63,
    "melband_roformer": 1.40,
    "melband_roformer_stereo": 1.40,
    "mossformer2_sr": 1.49,
}


def _clip(shape, rate, seed=0):
    rng = np.random.default_rng(seed)
    n = shape[-1]
    t = np.arange(n) / rate
    wave = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    mono = (wave * 20000).astype(np.int16)
    return np.broadcast_to(mono, shape).copy()


def bench_model(name: str, *, iters: int, compute_dtype: str | None = None,
                quant: str | None = None, cfg_replace: dict | None = None,
                batch: int = 1) -> dict:
    """``batch`` > 1 is THROUGHPUT mode: ``batch`` independent clips run in one
    compiled call (the production-serving shape — concurrent requests batch on
    the leading axis) and the reported RTF is amortized per clip."""
    import jax
    import jax.numpy as jnp

    from ..runtime import registry

    spec = registry.get(name)
    cfg = spec.make_config()
    if compute_dtype is not None:
        if not registry.has_compute_dtype(cfg):
            raise ValueError(f"{name} has no compute_dtype knob")
        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    if cfg_replace:  # smoke-mode shrink (bench.py --smoke); same code path
        cfg = dataclasses.replace(cfg, **cfg_replace)
    man = spec.make_manifest(cfg)
    rc = man.runtime_config()
    w, ch, k = rc["INPUT_AUDIO_LENGTH"], rc["INPUT_CHANNELS"], rc["NUM_AUDIO_INPUTS"]
    shape = (batch, w) if ch == 1 else (batch, ch, w)
    inputs = [jnp.asarray(_clip(shape, rc["IN_SAMPLE_RATE"], seed=i)) for i in range(k)]

    params = spec.init_params(jax.random.PRNGKey(0), cfg)
    if compute_dtype is not None and not quant:
        # one host-side cast instead of a per-call in-jit tree convert
        params = registry.prepare_compute_params(params, cfg, spec)
    fwd = spec.make_forward(cfg)
    snr_q8 = None
    if quant:  # quantized-parameter serving path (q8f32 fused-dequant / q8dyn int8 MXU)
        from ..runtime.optimize import PLANS, apply_plan
        from ..utils.quantize import dequantize_tree

        ref_out = jax.jit(fwd)(params, *inputs)
        ref0 = np.asarray(ref_out[0] if isinstance(ref_out, (tuple, list)) else ref_out,
                          np.float64)
        params, _ = apply_plan(params, PLANS[quant])
        if quant == "q8f32":
            inner = fwd
            fwd = lambda p, *a: inner(dequantize_tree(p), *a)  # noqa: E731
        fn = jax.jit(fwd)
        q_out = fn(params, *inputs)
        q0 = np.asarray(q_out[0] if isinstance(q_out, (tuple, list)) else q_out, np.float64)
        err = np.sum((ref0 - q0) ** 2)
        snr_q8 = round(10.0 * np.log10(np.sum(ref0**2) / max(err, 1e-12)), 1)
    else:
        fn = jax.jit(fwd)

    # XLA's own cost model for the compiled executable — the analytic FLOP
    # count the MFU column is derived from (no hand-counted estimates).
    flops = None
    try:
        ca = fn.lower(params, *inputs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    def run_once():
        out = fn(params, *inputs)
        outs = out if isinstance(out, (tuple, list)) else (out,)
        return outs

    # warmup: compile, then a settle phase — the axon tunnel pays ~30 ms
    # per-call round-trips for the first ~10 executions of a new executable
    # before its dispatch path pipelines; time only the steady state
    for o in run_once():
        np.asarray(o)
    last = None
    for _ in range(12):
        last = run_once()
    for o in last:
        np.asarray(o[(0,) * (o.ndim - 1) + (slice(0, 4),)])
    # timed: queue iters executions on the device stream, sync once at the end
    # (single-chip execution is serialized; block_until_ready is async under
    # the axon tunnel, so the host transfer is the true sync).  Three passes,
    # MINIMUM reported: tunnel noise is strictly additive (relay stalls only
    # inflate a pass), and single-pass sub-5 ms rows swing ±2× run-to-run.
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        last = None
        for _ in range(iters):
            last = run_once()
        for o in last:
            np.asarray(o[(0,) * (o.ndim - 1) + (slice(0, 4),)])
        best = min(best, time.perf_counter() - start)
    elapsed = best / iters

    duration = w / rc["IN_SAMPLE_RATE"]
    rtf = elapsed / (duration * batch)  # amortized per clip in throughput mode
    base = BASELINES.get(name)
    row = {
        "model": name + (f"+{compute_dtype}" if compute_dtype else "")
        + (f"+{quant}" if quant else "")
        + (f"@bs{batch}" if batch != 1 else ""),
        "rtf": round(rtf, 6),
        "latency_ms": round(elapsed * 1e3, 3),
        "chunk_s": round(duration, 3),
        "baseline_rtf": base,
        "vs_baseline": round(base / rtf, 2) if base else None,
    }
    if flops:
        achieved = flops / elapsed
        row["gflops"] = round(flops / 1e9, 2)
        row["tflops_per_s"] = round(achieved / 1e12, 3)
        row["mfu_pct"] = round(100.0 * achieved / _peak_flops(), 2)
    if snr_q8 is not None:
        row["snr_vs_f32_db"] = snr_q8
    return row


def _peak_flops() -> float:
    """Peak dense-matmul FLOP/s of the current accelerator (bf16 MXU peak —
    the denominator every MFU number in the bench tables uses).  v5e: 197
    TFLOP/s bf16 (f32 matmuls pass through the same MXU at lower rate, so
    f32 rows understate their hardware efficiency — compare like-for-like)."""
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind or "v5litepod" in kind:
        return 197e12
    if "v4" in kind:
        return 275e12
    if "v5p" in kind or "v5 pod" in kind:
        return 459e12
    if "v6" in kind or "trillium" in kind:
        return 918e12
    return 197e12  # unknown: assume v5e-class


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--models", default=None, help="comma-separated subset")
    ap.add_argument("--batch", type=int, default=1,
                    help="clips per call (throughput mode; RTF amortized per clip)")
    ap.add_argument("--no-bf16", action="store_true", help="skip bf16-compute variants")
    ap.add_argument("--quant", default=None,
                    help="comma-separated quant plans (q8f32,q8dyn) benched for models "
                    "whose recommended plan quantizes (reference: Mel-Band only)")
    ap.add_argument("--json-out", default=None,
                    help="also write rows as JSON lines (input to utils.readme_tables)")
    args = ap.parse_args(argv)

    from ..runtime import registry

    names = args.models.split(",") if args.models else registry.names()
    rows = []
    for name in names:
        try:  # keep sweeping on any per-model failure (unknown names included)
            spec = registry.get(name)
            row = bench_model(name, iters=args.iters, batch=args.batch)
        except Exception as e:
            row = {"model": name, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(row), flush=True)
        rows.append(row)
        if "error" in row:
            continue
        cfg = spec.make_config()
        # --no-bf16 skips only the bf16 variants, NOT the --quant rows
        if not args.no_bf16 and registry.has_compute_dtype(cfg):
            try:
                row = bench_model(name, iters=args.iters, compute_dtype="bfloat16",
                                  batch=args.batch)
            except Exception as e:
                row = {"model": f"{name}+bfloat16", "error": f"{type(e).__name__}: {e}"}
            print(json.dumps(row), flush=True)
            rows.append(row)
        if args.quant:
            from ..runtime.optimize import plan_for

            # an explicit --models selection benches the requested quant rows
            # regardless of the recommended plan (e.g. the q8f32 artifact-size
            # sweep over the big-dense families); the default full sweep only
            # quantizes where the reference recommends it (Mel-Band)
            if args.models or plan_for(name).quantize != "none":
                for q in args.quant.split(","):
                    try:
                        row = bench_model(name, iters=args.iters, quant=q, batch=args.batch)
                    except Exception as e:
                        row = {"model": f"{name}+{q}", "error": f"{type(e).__name__}: {e}"}
                    print(json.dumps(row), flush=True)
                    rows.append(row)

    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write("".join(json.dumps(r) + "\n" for r in rows))

    print("\n| Model | RTF | chunk | reference CPU RTF | speedup | TFLOP/s | MFU |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['model']} | ERROR: {r['error']} | | | | | |")
        else:
            base = r["baseline_rtf"]
            tf = f"{r['tflops_per_s']:.2f}" if "tflops_per_s" in r else "—"
            mfu = f"{r['mfu_pct']:.1f}%" if "mfu_pct" in r else "—"
            print(f"| {r['model']} | {r['rtf']:.6f} | {r['chunk_s']:.1f} s | "
                  f"{base if base is not None else '—'} | "
                  f"{str(r['vs_baseline']) + '×' if r['vs_baseline'] else '—'} | "
                  f"{tf} | {mfu} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
