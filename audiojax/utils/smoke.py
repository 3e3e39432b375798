"""One-command completeness smoke: every registered model, end to end.

    python -m audiojax.utils.smoke [--seconds 0.6]

For each registry entry: random-init params → Session forward on synthetic
int16 input(s) (shape/finiteness), plus streaming one chunk where the model
registers a state-carry stream.  Prints one status line per model and exits
non-zero if anything fails — a quick whole-framework health check (the
reference's per-model Export smoke runs, rolled into one command).
"""
from __future__ import annotations

import sys
import traceback


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seconds", type=float, default=0.6, help="synthetic clip length")
    ap.add_argument("--models", nargs="*", help="subset of registry names")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from ..runtime import Session, registry
    from ..runtime.optimize import wrap_forward

    rng = np.random.default_rng(0)
    failures = 0
    names = args.models or registry.names()
    for name in names:
        spec = registry.get(name)
        try:
            cfg = spec.make_config()
            params = spec.init_params(jax.random.PRNGKey(0), cfg)
            manifest = spec.make_manifest(cfg)
            n = int(args.seconds * manifest.in_sample_rate)
            audios = []
            for _ in range(manifest.num_audio_inputs):
                a = (rng.standard_normal((manifest.input_channels, n)) * 6000).astype(np.int16)
                audios.append(a)
            result = Session(wrap_forward(spec.make_forward(cfg), manifest), params, manifest,
                             jit=True).process(*audios)
            ok = all(np.isfinite(o.astype(np.float64)).all() for o in result.outputs)
            stream = "-"
            if spec.make_stream is not None:
                init_fn, step_fn, delay = spec.make_stream(cfg)
                state = init_fn(1)
                chunk = 2 * cfg.hop
                chunks = [jax.numpy.asarray(a[0, :chunk][None]) for a in audios]
                state, out = step_fn(params, state, *chunks)
                out0 = out[0] if isinstance(out, tuple) else out
                stream = f"stream ok (delay {delay})" if np.isfinite(
                    np.asarray(out0).astype(np.float64)).all() else "stream NOT FINITE"
            status = "ok" if ok else "NOT FINITE"
            outs = "+".join(str(o.shape[-1]) for o in result.outputs)
            print(f"{name:24s} {status:10s} out {outs:>12s} @ {manifest.out_sample_rate} Hz  {stream}")
            if not ok or "NOT" in stream:
                failures += 1
        except Exception:
            failures += 1
            print(f"{name:24s} FAILED")
            traceback.print_exc()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
