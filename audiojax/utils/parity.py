"""Output-parity harness: SNR of an audiojax output against a reference wav.

The acceptance gate is ≥ 40 dB output SNR versus the reference ONNX outputs on
its Test_Examples (BASELINE.md).  In-repo, that gate is enforced end-to-end by
``tests/test_reference_parity.py``: the reference's own torch model classes
are AST-extracted from its Export scripts, instantiated with seeded weights,
and run against the same weights pushed through ``import_checkpoint`` —
40 dB per family (component-level for H-GTCRN and MossFormer-SR, whose e2e
gates are 20 dB due to measured f32 WPE conditioning / Snake chaos;
ZipEnhancer's independent-STFT e2e gates 35 dB once the atan2 branch cut is
folded away identically in both stacks, measured 61 dB; everything else
clears 40 dB end-to-end, most 55–75 dB).  This module is the
standalone measurement side for *pretrained* checkpoints: point it at a
reference output wav produced elsewhere (e.g. ORT on a connected machine).

    python -m audiojax.utils.parity --model gtcrn --artifact art/ \
        --input noisy.wav --reference ref_denoised.wav
"""
from __future__ import annotations

import numpy as np

__all__ = ["output_snr", "parity_report"]


def output_snr(reference: np.ndarray, test: np.ndarray) -> float:
    """SNR (dB) of ``test`` against ``reference`` over the common length."""
    n = min(reference.shape[-1], test.shape[-1])
    ref = reference[..., :n].astype(np.float64)
    err = ref - test[..., :n].astype(np.float64)
    sig = float(np.sum(ref * ref))
    noise = float(np.sum(err * err))
    if noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(max(sig, 1e-12) / noise)


def parity_report(reference: np.ndarray, test: np.ndarray, *, threshold_db: float = 40.0) -> dict:
    snr = output_snr(reference, test)
    return {
        "snr_db": round(snr, 2) if np.isfinite(snr) else snr,
        "threshold_db": threshold_db,
        "passed": bool(snr >= threshold_db),
        "ref_samples": int(reference.shape[-1]),
        "test_samples": int(test.shape[-1]),
    }


def main(argv=None):
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--input", nargs="+", required=True)
    ap.add_argument("--reference", required=True, help="reference output wav")
    ap.add_argument("--artifact", help="artifact dir (random params otherwise)")
    ap.add_argument("--threshold", type=float, default=40.0)
    args = ap.parse_args(argv)

    import jax

    from ..runtime import Session, load_artifact, read_wav, resample_np, to_mono
    from ..runtime import registry

    spec = registry.get(args.model)
    cfg = spec.make_config()
    if args.artifact:
        params, manifest = load_artifact(args.artifact)
    else:
        params = spec.init_params(jax.random.PRNGKey(0), cfg)
        manifest = spec.make_manifest(cfg)

    audios = []
    for p in args.input:
        data, rate = read_wav(p)
        if manifest.input_channels == 1:
            data = to_mono(data)[None]
        audios.append(resample_np(data, rate, manifest.in_sample_rate))
    from ..runtime.optimize import wrap_forward

    result = Session(wrap_forward(spec.make_forward(cfg), manifest), params, manifest).process(*audios)
    ref, _ = read_wav(args.reference)
    report = parity_report(to_mono(ref), result.audio, threshold_db=args.threshold)
    print(json.dumps(report))
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
