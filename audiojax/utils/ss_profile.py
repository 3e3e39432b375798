"""MossFormer2-SS stage-ablation profile on the real chip.

Same method as :mod:`.zip_profile` / :mod:`.gan_profile` (see
:mod:`.ablation` for why standalone stage microbenchmarks lie on TPU): each
stage is stubbed with a shape-preserving no-op and the FULL jitted forward
re-timed at the serving geometry.

    python -m audiojax.utils.ss_profile [--seconds 2] [--dtype float32]

Stage map (reference: /root/reference/MossFormer2_SS_16K/
Export_MossFormer2_SS_16K.py: 516-559 gated dilated FSMN, 403-423 RMS
normalisation, 102-133/588-624 time-domain codec):

* ``flash_layers`` — all 24 FLASH (GAU) attention layers (model binding)
* ``fsmn_layers`` — all 24 gated dilated-dense FSMN blocks (model binding)
* ``dw_convs`` — every depthwise ConvModule residual inside both (patched in
  ``nn.mossformer``, whose globals the two blocks read at call time)
* ``scale_norms`` — the FLASH ScaleNorms (same mechanism)
* ``instance_norms`` — the per-channel time InstanceNorms in the FSMN
  memory stacks (same mechanism)
"""
from __future__ import annotations

import argparse
import dataclasses
import json

from .zip_profile import to_markdown


def build_stages(cfg):
    import audiojax.models.mossformer2_ss as SS
    import audiojax.nn.mossformer as NM
    from .ablation import Stage

    return [
        Stage("flash_layers", SS, "flash_layer", lambda p, x, **k: x),
        Stage("fsmn_layers", SS, "gated_fsmn_block_dilated", lambda p, x, **k: x),
        # inner slices: flash_layer/gated_fsmn_block_dilated read these from
        # nn.mossformer's module globals at call time, so patching the
        # DEFINING module reaches inside the (by-value-bound) blocks
        Stage("dw_convs", NM, "_depthwise_res", lambda p, x, pad: x),
        Stage("scale_norms", NM, "scale_norm",
              lambda p, x, *, eps=1e-5: x * p["g"]),
        Stage("instance_norms", NM, "instance_norm_t",
              lambda p, x, eps=1e-5: x),
    ]


def run(seconds: int = 2, dtype: str = "float32", iters: int = 20) -> dict:
    import jax
    import jax.numpy as jnp

    import audiojax.models.mossformer2_ss as SS
    from .ablation import ablate
    from .bench_all import _clip

    cfg = SS.MossFormer2SsConfig()
    if dtype != "float32":
        cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    params = SS.init_mossformer2_ss(jax.random.PRNGKey(0), cfg)
    if dtype != "float32":
        from ..runtime.registry import prepare_compute_params

        params = prepare_compute_params(params, cfg)
    audio = jnp.asarray(_clip((1, seconds * cfg.in_sample_rate), cfg.in_sample_rate))
    report = ablate(make_fn=lambda: jax.jit(SS.make_mossformer2_ss(cfg)),
                    params=params, audio=audio, sample_rate=cfg.in_sample_rate,
                    stages=build_stages(cfg), iters=iters)
    report["config"] = {"seconds": seconds, "dtype": dtype,
                        "chip": str(jax.devices()[0])}
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seconds", type=int, default=2)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", action="store_true", help="JSON instead of markdown")
    args = ap.parse_args(argv)
    report = run(seconds=args.seconds, dtype=args.dtype, iters=args.iters)
    print(json.dumps(report) if args.json else to_markdown(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
