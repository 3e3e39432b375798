"""MossFormerGAN-SE stage-ablation profile on the real chip.

Same method as :mod:`.zip_profile` (see there and :mod:`.ablation` for why
standalone stage microbenchmarks lie on TPU): each stage is stubbed with a
shape-preserving no-op and the FULL jitted forward re-timed.

    python -m audiojax.utils.gan_profile [--seconds 6] [--dtype float32]

Stage map (reference: /root/reference/MossFormerGAN_SE_16K/
Export_MossFormer_SE.py: 632-784 SyncANet blocks, 137-244 MossFormer GAU,
750-784 triple attention, 597-624 dense-FSMN, 786-868 decoders):

* ``stft`` / ``istft`` — the fused Pallas analysis/synthesis kernels
* ``sync_paths`` — all 12 intra/inter SyncANet paths incl. their
  unfold/refold convs and reshape plumbing (contains gau/se/fsmn below)
* ``mossformer_gau`` / ``se_layer`` / ``uni_fsmn`` / ``ffconvm`` — inner
  slices of every sync path
* ``triple_attention`` — the 6 per-block 4-head (C·F)-token attentions
* ``dense_fsmn`` — the 3 dilated dense-FSMN stacks (encoder + 2 decoders)
* ``decoders`` — both decoder heads incl. sub-pixel upsample
"""
from __future__ import annotations

import argparse
import dataclasses
import json

from .zip_profile import to_markdown


def build_stages(cfg):
    """Shape-correct stubs; all stages patch the MODEL module bindings."""
    import jax.numpy as jnp

    import audiojax.models.mossformergan_se as MG
    import audiojax.ops.stft_pallas as SP
    from .ablation import Stage

    t = cfg.fold_window // cfg.hop + 1

    def bcast(x, shape, dt):
        return jnp.broadcast_to(jnp.mean(x).astype(dt), shape)

    return [
        Stage("stft", SP, "fast_stft_packed",
              lambda x, c: bcast(x, (x.shape[0], t, 2 * cfg.f_bins), jnp.float32)),
        Stage("istft", SP, "fast_istft_packed",
              lambda s, c, out_length=None: bcast(s, (s.shape[0], cfg.fold_window),
                                                  jnp.float32)),
        Stage("sync_paths", MG, "_sync_path",
              lambda p, x, c, *, axis: x),
        Stage("mossformer_gau", MG, "mossformer_gau",
              lambda p, x, c, b: x),
        Stage("triple_attention", MG, "triple_attention",
              lambda p, x, c: x),
        Stage("se_layer", MG, "se_layer", lambda p, x: x),
        Stage("uni_fsmn", MG, "_uni_fsmn", lambda p, x, lorder: x),
        Stage("ffconvm", MG, "_ffconvm_fused",
              lambda p, x, dw: bcast(x, x.shape[:-1] + (p["lin"]["w"].shape[-1],),
                                     x.dtype)),
        Stage("dense_fsmn", MG, "_dense_fsmn_block",
              lambda p, x, depth, lorder: x),
        Stage("decoders", MG, "_decoder",
              lambda p, x, c: bcast(x, (x.shape[0], x.shape[1], 2 * x.shape[2],
                                        x.shape[3]), x.dtype)),
    ]


def run(seconds: int = 6, dtype: str = "float32", iters: int = 20) -> dict:
    import jax
    import jax.numpy as jnp

    import audiojax.models.mossformergan_se as MG
    from .ablation import ablate
    from .bench_all import _clip

    cfg = MG.MossFormerGanConfig()
    if dtype != "float32":
        cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    params = MG.init_mossformergan(jax.random.PRNGKey(0), cfg)
    if dtype != "float32":
        from ..runtime.registry import prepare_compute_params

        params = prepare_compute_params(params, cfg)
    n = seconds * cfg.in_sample_rate // cfg.fold_window * cfg.fold_window
    audio = jnp.asarray(_clip((1, n), cfg.in_sample_rate))
    report = ablate(make_fn=lambda: jax.jit(MG.make_mossformergan(cfg)),
                    params=params, audio=audio, sample_rate=cfg.in_sample_rate,
                    stages=build_stages(cfg), iters=iters)
    report["config"] = {"seconds": seconds, "dtype": dtype,
                        "chip": str(jax.devices()[0])}
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seconds", type=int, default=6)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", action="store_true", help="JSON instead of markdown")
    args = ap.parse_args(argv)
    report = run(seconds=args.seconds, dtype=args.dtype, iters=args.iters)
    print(json.dumps(report) if args.json else to_markdown(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
