"""Artifact optimization pipeline — the reference's Optimize_ONNX plane.

Parity target: /root/reference/Optimize_ONNX_Common.py — per-model ``Plan`` /
``OptimizerConfig`` recipes (:46-113) driving a pipeline (resave → slim →
optional dynamic INT8 quant :432-460 → optional fp16 with op/node block lists
:377-429 → metadata restore :529), with fail-closed contract validation before
converting (ZipEnhancer/Optimize_ONNX.py:94-136) and a JSON audit report.

TPU-native mapping: the graph-level passes (fusion, slimming, constant
folding) are XLA's job and need no artifact rewriting; what remains a real
artifact-level decision is the PARAMETER REPRESENTATION:

- ``quantize="q8f32"`` → weight-only symmetric int8 (audiojax.utils.quantize),
  the DYNAMIC_Q8 plan analog.  The reference recommends it only for
  Mel-Band-Roformer (README.md:93) — mirrored in :data:`PLANS`.
- ``compute_dtype="bf16"`` → weight-only bfloat16 storage, the fp16-conversion
  analog: halves parameter HBM bytes; XLA fuses the widening convert into the
  consuming matmuls.  ``fp32_block`` path patterns pin numerically sensitive
  subtrees to f32 (the op/node block-list analog,
  Optimize_ONNX_Common.py:29-43).

Fail-closed like the reference: unknown plan fields and block patterns that
match nothing abort before touching the artifact; the manifest required-key
contract is re-validated after (metadata-restore analog), and an
``optimize_report.json`` audit is written next to the output artifact.

    python -m audiojax.runtime.optimize src_art/ dst_art/ --plan q8f32
"""
from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path

__all__ = ["Plan", "PLANS", "plan_for", "apply_plan", "optimize_artifact", "wrap_forward"]

_QUANT_MODES = ("none", "q8f32", "q8dyn")
_DTYPES = ("f32", "bf16")


@dataclasses.dataclass(frozen=True)
class Plan:
    """One optimization recipe (Optimize_ONNX_Common.py:46-113 ``Plan``)."""

    name: str
    quantize: str = "none"  # "none" | "q8f32"
    compute_dtype: str = "f32"  # "f32" | "bf16" (weight-only storage)
    q8_min_size: int = 4096
    fp32_block: tuple[str, ...] = ()  # regexes over leaf paths kept f32 under bf16
    notes: str = ""
    # measured below the repo's 40 dB output-SNR acceptance gate (or otherwise
    # not recommended for production): apply_plan warns so a user can't pick
    # a below-gate plan silently
    experimental: bool = False

    def __post_init__(self):
        if self.quantize not in _QUANT_MODES:
            raise ValueError(f"plan {self.name!r}: unknown quantize {self.quantize!r}")
        if self.compute_dtype not in _DTYPES:
            raise ValueError(f"plan {self.name!r}: unknown compute_dtype {self.compute_dtype!r}")
        if self.quantize != "none" and self.compute_dtype != "f32":
            raise ValueError(f"plan {self.name!r}: q8 and bf16 are mutually exclusive")


# Recommended per-model plans, mirroring each reference model dir's
# Optimize_ONNX.py recipe: dynamic Q8 helps exactly one model
# (Mel-Band-Roformer, /root/reference/README.md:93) and hurts the rest; the
# fp16 (here bf16) plans carry block lists for int16-domain squares and DFT
# kernels (ZipEnhancer/Optimize_ONNX.py:30-64).
PLANS: dict[str, Plan] = {
    "f32": Plan("f32", notes="identity plan: float32 weights (reference CPU default)"),
    "q8f32": Plan("q8f32", quantize="q8f32", notes="weight-only int8, f32 activations"),
    "q8dyn": Plan(
        "q8dyn", quantize="q8dyn",
        notes="dynamic-activation int8 matmuls on the MXU (true DYNAMIC_Q8 analog); "
        "dense weights stay int8 at run time, convs dequantize fused",
        # measured on Mel-Band: 32.3 dB vs f32 — BELOW the 40 dB acceptance
        # gate — and slower than f32 on v5e (README quant table); mirrors the
        # reference's own warning that dynamic quantization hurts most models
        # (/root/reference/README.md:93)
        experimental=True,
    ),
    "bf16": Plan("bf16", compute_dtype="bf16", notes="weight-only bf16 storage"),
    "melband_roformer": Plan(
        "melband_roformer", quantize="q8f32",
        notes="the one model where dynamic Q8 is recommended (README.md:93)",
    ),
}


def plan_for(model_name: str) -> Plan:
    """Recommended plan for a registered model (reference per-dir recipes)."""
    return PLANS.get(model_name, PLANS["f32"])


def _leaf_paths(params):
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [("/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path), leaf)
            for path, leaf in flat]


def apply_plan(params, plan: Plan):
    """params → (optimized params, audit dict).  Pure host-side transform."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..utils.quantize import quantize_tree, quantized_bytes

    audit = {"plan": dataclasses.asdict(plan)}
    if plan.experimental:
        import warnings

        warnings.warn(
            f"plan {plan.name!r} is EXPERIMENTAL: measured output SNR falls below "
            f"the 40 dB acceptance gate on at least one family ({plan.notes}); "
            f"prefer the recommended plan from plan_for(<model>)",
            stacklevel=2,
        )
        audit["experimental"] = True
    if plan.quantize in ("q8f32", "q8dyn"):  # identical artifact; serving differs
        out = quantize_tree(params, min_size=plan.q8_min_size)
        qb, fb = quantized_bytes(out)
        n_q = len([1 for p, _ in _leaf_paths(out) if p.endswith("/q8")])
        if n_q == 0:
            raise ValueError(
                f"plan {plan.name!r}: {plan.quantize} quantized ZERO leaves "
                f"(min_size={plan.q8_min_size}) — contract drift, aborting"
            )
        audit.update(leaves_quantized=n_q, bytes_after=qb, bytes_before=fb,
                     compression=round(fb / max(qb, 1), 3))
        return out, audit

    if plan.compute_dtype == "bf16":
        paths = _leaf_paths(params)
        # fail-closed: every block pattern must match at least one leaf path
        matched = {pat: [p for p, _ in paths if re.search(pat, p)] for pat in plan.fp32_block}
        dead = [pat for pat, hits in matched.items() if not hits]
        if dead:
            raise ValueError(
                f"plan {plan.name!r}: fp32_block patterns matched nothing: {dead} "
                "— contract drift, aborting"
            )
        blocked = {p for hits in matched.values() for p in hits}

        n_cast = 0

        def convert(path, leaf):
            nonlocal n_cast
            if path in blocked or not hasattr(leaf, "dtype") or leaf.ndim < 2:
                return leaf
            if leaf.dtype not in (jnp.float32, np.float32):
                return leaf
            n_cast += 1
            return jnp.asarray(leaf, jnp.bfloat16)

        # reuse the canonical path strings from _leaf_paths (same flatten
        # order) so block matching and conversion can never use different
        # path formats
        flat = jax.tree_util.tree_flatten_with_path(params)
        leaves = [convert(p, leaf) for (p, _), (_, leaf) in zip(paths, flat[0])]
        out = jax.tree_util.tree_unflatten(flat[1], leaves)
        # count only leaves THIS pass converted: pre-existing bf16 leaves must
        # not satisfy the fail-closed zero-cast check
        if n_cast == 0:
            raise ValueError(f"plan {plan.name!r}: bf16 cast ZERO leaves — contract drift, aborting")
        audit.update(leaves_cast_bf16=n_cast, leaves_blocked_f32=len(blocked))
        return out, audit

    audit.update(identity=True)
    return params, audit


def materialize_params(params, manifest):
    """Host-side equivalent of :func:`wrap_forward` for serving paths that
    cannot wrap the forward (state-carry streaming builds step/init fns from
    the spec): q8f32 dequantizes, bf16-plan weights upcast, q8dyn passes
    through (nn.core consumes {'q8','scale'} natively)."""
    opt = (manifest.extra or {}).get("optimize", {})
    if opt.get("quantize") == "q8f32":
        from ..utils.quantize import dequantize_tree

        return dequantize_tree(params)
    if opt.get("compute_dtype") == "bf16":
        import jax
        import jax.numpy as jnp

        return jax.tree.map(
            lambda l: l.astype(jnp.float32) if getattr(l, "dtype", None) == jnp.bfloat16 else l,
            params,
        )
    return params


def wrap_forward(fn, manifest):
    """Wrap a model forward so optimized params serve transparently: dequantize
    q8 leaves / upcast bf16 weights INSIDE jit (XLA fuses the converts)."""
    opt = (manifest.extra or {}).get("optimize", {})
    if opt.get("quantize") == "q8f32":
        from ..utils.quantize import dequantize_tree

        return lambda params, *a: fn(dequantize_tree(params), *a)
    if opt.get("quantize") == "q8dyn":
        # no wrapping: nn.core consumes {'q8','scale'} leaves natively —
        # dense takes the dynamic int8 MXU path, convs dequantize fused
        return fn
    if opt.get("compute_dtype") == "bf16":
        import jax
        import jax.numpy as jnp

        def upcast(params, *a):
            f32 = jax.tree.map(
                lambda l: l.astype(jnp.float32) if getattr(l, "dtype", None) == jnp.bfloat16 else l,
                params,
            )
            return fn(f32, *a)

        return upcast
    return fn


def optimize_artifact(src, dst, plan: Plan) -> Path:
    """Artifact → optimized artifact + audit report (``process_model`` analog,
    Optimize_ONNX_Common.py:475-531: transform, restore metadata contract,
    write the audit JSON)."""
    from .checkpoint import load_artifact, save_artifact
    from .manifest import validate_manifest_dict

    params, manifest = load_artifact(src)
    out_params, audit = apply_plan(params, plan)

    manifest.extra["optimize"] = {
        "plan": plan.name,
        "quantize": plan.quantize,
        "compute_dtype": plan.compute_dtype,
    }
    dst = save_artifact(dst, out_params, manifest)
    # metadata-restore analog: the required-key contract must survive the pass
    validate_manifest_dict(json.loads((Path(dst) / "manifest.json").read_text()))
    report = Path(dst) / "optimize_report.json"
    report.write_text(json.dumps(audit, indent=2, sort_keys=True))
    return dst


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="audiojax artifact optimizer")
    ap.add_argument("src", nargs="?", help="source artifact dir")
    ap.add_argument("dst", nargs="?", help="destination artifact dir")
    ap.add_argument("--plan", default="f32", help="plan name (see --list-plans)")
    ap.add_argument("--list-plans", action="store_true")
    args = ap.parse_args(argv)
    if args.list_plans:
        for name, p in PLANS.items():
            print(f"{name}: quantize={p.quantize} compute_dtype={p.compute_dtype}  {p.notes}")
        return 0
    if not args.src or not args.dst:
        ap.error("src and dst artifact dirs are required")
    if args.plan not in PLANS:
        ap.error(f"unknown plan {args.plan!r}; available: {sorted(PLANS)}")
    out = optimize_artifact(args.src, args.dst, PLANS[args.plan])
    print(f"wrote optimized artifact to {out} (report: {out}/optimize_report.json)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
