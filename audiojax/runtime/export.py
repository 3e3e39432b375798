"""Export entry point: upstream checkpoint → served audiojax artifact.

Parity target: the reference's per-model Export_*.py call stack (SURVEY.md
§3.1) — load the upstream torch checkpoint, apply the prefusion recipes,
write the deployable artifact with its metadata contract, and finish with an
end-to-end inference smoke test (every reference Export script's last act,
/root/reference/GTCRN/Export_GTCRN.py:698-702).

    python -m audiojax.runtime.export --model gtcrn \
        --checkpoint ckpt.tar --out artifact_dir/ [--plan bf16]

The import is fail-closed (unconsumed checkpoint keys abort) and writes
``import_report.json`` next to the artifact.
"""
from __future__ import annotations

from pathlib import Path

__all__ = ["export_artifact"]


def export_artifact(model_name: str, ckpt, out_dir, *, cfg=None, plan=None,
                    smoke: bool = True, import_kwargs=None, compute_dtype=None,
                    aot: bool = False):
    """checkpoint (path or state dict) → artifact dir; returns a report dict.

    ``compute_dtype`` ("bfloat16") selects the model's activation compute
    dtype and is RECORDED in the manifest (``activation_compute_dtype``) so
    the serving CLI reproduces it when loading the artifact — the analog of
    the reference deploying a distinct fp16 ONNX file.

    ``aot=True`` additionally serializes the traced serving graph (StableHLO,
    ``runtime/aot.py``) into the artifact so a host can serve it without the
    model's Python — the reference's artifact-IS-the-graph property
    (/root/reference/README.md:16-28).  The graph is traced over the SERVED
    function (plan dequant/upcast included) and the served params layout.
    """
    import dataclasses

    import numpy as np

    from ..importers import import_checkpoint
    from . import registry
    from .checkpoint import save_artifact
    from .optimize import optimize_artifact, wrap_forward
    from .session import Session

    spec = registry.get(model_name)
    cfg = cfg if cfg is not None else spec.make_config()
    if compute_dtype is not None:
        if not registry.has_compute_dtype(cfg):
            raise ValueError(f"{model_name} has no compute_dtype knob")
        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)

    if isinstance(ckpt, (str, Path)):
        import torch

        ckpt = torch.load(ckpt, map_location="cpu", weights_only=False)

    out_dir = Path(out_dir)
    kw = dict(import_kwargs or {})
    import inspect

    from ..importers import _IMPORTERS

    if "cfg" in inspect.signature(_IMPORTERS[model_name]).parameters:
        kw.setdefault("cfg", cfg)
    params = import_checkpoint(model_name, ckpt,
                               report_path=out_dir / "import_report.json", **kw)

    manifest = spec.make_manifest(cfg)
    # record the FULL serving config: the CLI rebuilds from this so artifacts
    # exported with non-default cfg (depths, alphas, dims) don't silently
    # serve with spec.make_config() defaults
    manifest = dataclasses.replace(
        manifest, extra={**manifest.extra, "config": dataclasses.asdict(cfg)}
    )
    if compute_dtype is not None:
        manifest = dataclasses.replace(
            manifest, extra={**manifest.extra, "activation_compute_dtype": compute_dtype}
        )
    save_artifact(out_dir, params, manifest)
    report = {"artifact": str(out_dir), "model": model_name}

    if plan is not None:
        optimize_artifact(out_dir, out_dir, plan)
        from .checkpoint import load_artifact

        params, manifest = load_artifact(out_dir)  # smoke what's on disk

    if aot:
        from . import aot as _aot

        served_params = registry.prepare_compute_params(params, cfg, spec)
        meta_path = _aot.attach_graph(
            out_dir, wrap_forward(spec.make_forward(cfg), manifest),
            served_params, manifest)
        report["aot"] = str(meta_path)
        import json as _json

        _meta = _json.loads(meta_path.read_text())
        # make the serving bound visible at export time (a clip longer than
        # the admissible window batch only fails at serve time otherwise)
        report["aot_batch_mode"] = _meta["batch_mode"]
        report["aot_admissible_batches"] = _meta["admissible_batches"]

    if smoke:
        # the reference runs the real inference script on a Test_Examples wav
        # after every export; here: synthetic int16 inputs through the Session
        rng = np.random.default_rng(0)
        n_in = manifest.num_audio_inputs
        length = min(manifest.input_audio_length, manifest.in_sample_rate)
        audios = [(rng.standard_normal(length) * 6000).astype(np.int16)[None]
                  for _ in range(n_in)]
        fwd = wrap_forward(spec.make_forward(cfg), manifest)
        result = Session(fwd, params, manifest).process(*audios)
        if not all(np.isfinite(o.astype(np.float64)).all() for o in result.outputs):
            raise RuntimeError("export smoke test produced non-finite output")
        report["smoke"] = {
            "out_samples": int(result.outputs[0].shape[-1]),
            "outputs": len(result.outputs),
            "rtf": round(result.rtf, 4),
        }
    return report


def main(argv=None):
    import argparse
    import json

    from .optimize import PLANS

    ap = argparse.ArgumentParser(description="audiojax artifact exporter")
    ap.add_argument("--model", required=True)
    ap.add_argument("--checkpoint", required=True, help="torch checkpoint path")
    ap.add_argument("--out", required=True, help="artifact output directory")
    ap.add_argument("--plan", help="optional optimization plan (see optimize --list-plans)")
    ap.add_argument("--compute-dtype", choices=["float32", "bfloat16"], default=None,
                    help="activation compute dtype, recorded in the manifest")
    ap.add_argument("--no-smoke", action="store_true", help="skip the inference smoke test")
    ap.add_argument("--aot", action="store_true",
                    help="serialize the traced serving graph (StableHLO) into the "
                         "artifact; the CLI then serves it with --aot, no model "
                         "Python needed")
    args = ap.parse_args(argv)
    if args.plan and args.plan not in PLANS:
        ap.error(f"unknown plan {args.plan!r}; available: {sorted(PLANS)}")
    plan = PLANS[args.plan] if args.plan else None
    report = export_artifact(args.model, args.checkpoint, args.out,
                             plan=plan, smoke=not args.no_smoke,
                             compute_dtype=args.compute_dtype, aot=args.aot)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
