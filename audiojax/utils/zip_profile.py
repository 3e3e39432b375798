"""ZipEnhancer stage-ablation profile on the real chip.

Produces the markdown table committed to PROFILES.md: each stage of the
flagship forward is stubbed with a shape-preserving no-op (see
utils/ablation.py for why standalone stage microbenchmarks lie on TPU) and
the FULL forward re-timed; the latency recovered is the stage's true
in-context cost, including the layout transitions it forces.

    python -m audiojax.utils.zip_profile [--seconds 6] [--dtype float32]

Stage map (reference: /root/reference/ZipEnhancer/Export_ZipEnhancer.py:
143-187 layer, 725-780 decoders, 843 STFT features):

* ``stft`` / ``istft`` — the fused Pallas analysis/synthesis kernels
* ``dense_encoder`` / ``decoder_pair`` — the causal DenseBlockV2 stacks
* ``zipformer_layers`` — all 8 dual-path Zipformer2 layers (4 encoders × 2)
* ``dualpath_plumbing`` — the two plain dual-path encoders incl. their
  transpose/reshape plumbing (layers alone are covered above)
* inner slices of every layer: ``attention_weights`` (shared QK+pos scores),
  ``self_attention`` (sa1+sa2), ``nonlin_attention``, ``conv_module``
  (conv1+conv2 gated depthwise), ``feed_forward`` (ff1-3)

Stubs broadcast a mean of their input so upstream stages keep a data
dependency (a constant stub would let XLA dead-code-eliminate everything
before it and over-attribute).
"""
from __future__ import annotations

import argparse
import dataclasses
import json


def build_stages(cfg, params, audio):
    """Shape-correct stubs via eval_shape on the real stage inputs."""
    import jax
    import jax.numpy as jnp

    import audiojax.models.zipenhancer as ZM
    import audiojax.nn.zipformer as ZF
    import audiojax.ops.stft_pallas as SP
    from .ablation import Stage

    # shapes seen inside the forward (after fold): B' windows of T frames
    bw = audio.shape[0] * (audio.shape[-1] // cfg.fold_window)
    t = cfg.fold_window // cfg.hop + 1
    f = cfg.f_bins
    dtype = jnp.dtype(cfg.compute_dtype)

    enc_sh = jax.eval_shape(
        lambda p, x: ZM.dense_encoder(p, x, cfg),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, dtype), params["encoder"]),
        jax.ShapeDtypeStruct((bw, t, f, 2), dtype))
    dec_sh = jax.eval_shape(
        lambda p, x: ZM.decoder_pair(p, x, cfg),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, dtype), params["decoder"]),
        jax.ShapeDtypeStruct(enc_sh.shape, dtype))

    def bcast(x, shape, dt):
        return jnp.broadcast_to(jnp.mean(x).astype(dt), shape)

    return [
        Stage("stft", SP, "fast_stft_packed",
              lambda x, c: bcast(x, (x.shape[0], t, 2 * f), jnp.float32)),
        Stage("istft", SP, "fast_istft_packed",
              lambda s, c, out_length=None: bcast(s, (s.shape[0], cfg.fold_window),
                                                  jnp.float32)),
        Stage("dense_encoder", ZM, "dense_encoder",
              lambda p, x, c: bcast(x, enc_sh.shape, enc_sh.dtype)),
        Stage("decoder_pair", ZM, "decoder_pair",
              lambda p, x, c: (bcast(x, dec_sh[0].shape, dec_sh[0].dtype),
                               bcast(x, dec_sh[1].shape, dec_sh[1].dtype))),
        Stage("zipformer_layers", ZM, "zipformer_layer",
              lambda p, x, pos, **k: x),
        Stage("dualpath_plumbing", ZM, "dualpath_encoder",
              lambda p, x, c: x),
        Stage("attention_weights", ZF, "attention_weights",
              lambda p, x, pos, *, num_heads, query_head_dim, pos_head_dim:
              bcast(x, (x.shape[0], num_heads, x.shape[1], x.shape[1]), x.dtype)),
        Stage("self_attention", ZF, "self_attention",
              lambda p, x, attn, *, num_heads: x * jnp.mean(attn).astype(x.dtype)),
        Stage("nonlin_attention", ZF, "nonlin_attention",
              lambda p, x, attn0: x * jnp.mean(attn0).astype(x.dtype)),
        Stage("conv_module", ZF, "conv_module", lambda p, x: x),
        Stage("feed_forward", ZF, "_feed_forward", lambda p, x, act=None: x),
    ]


def run(seconds: int = 6, dtype: str = "float32", iters: int = 20) -> dict:
    import jax
    import jax.numpy as jnp

    import audiojax.models.zipenhancer as ZM
    from .ablation import ablate
    from .bench_all import _clip

    cfg = ZM.ZipEnhancerConfig()
    if dtype != "float32":
        cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    params = ZM.init_zipenhancer(jax.random.PRNGKey(0), cfg)
    if dtype != "float32":
        from ..runtime.registry import prepare_compute_params

        params = prepare_compute_params(params, cfg)
    n = seconds * cfg.in_sample_rate // cfg.fold_window * cfg.fold_window
    audio = jnp.asarray(_clip((1, n), cfg.in_sample_rate))
    report = ablate(make_fn=lambda: jax.jit(ZM.make_zipenhancer(cfg)),
                    params=params, audio=audio, sample_rate=cfg.in_sample_rate,
                    stages=build_stages(cfg, params, audio), iters=iters)
    report["config"] = {"seconds": seconds, "dtype": dtype,
                        "chip": str(jax.devices()[0])}
    return report


def to_markdown(report: dict) -> str:
    base = report["baseline"]
    lines = [
        f"Baseline: RTF {base['rtf']:.6f} ({base['latency_s'] * 1e3:.2f} ms, "
        f"{report['config']['seconds']} s clip, {report['config']['dtype']}, "
        f"{report['config']['chip']})",
        "",
        "| stage | attributed ms | % of forward | RTF without it |",
        "|---|---|---|---|",
    ]
    for r in sorted(report["stages"], key=lambda r: -r["attributed_s"]):
        lines.append(f"| {r['name']} | {r['attributed_s'] * 1e3:.2f} | "
                     f"{r['attributed_pct']:.1f}% | {r['rtf']:.6f} |")
    return "\n".join(lines)


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
