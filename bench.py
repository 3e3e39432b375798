"""RTF benchmark on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Primary metric: ZipEnhancer (the flagship) real-time factor on a 60 s clip
batch-folded into 1.5 s windows — the reference's fold policy for long audio
(SURVEY.md §2.0.1).  GTCRN RTF rides along as an extra field.  Baselines are
the reference's i3-12300 ORT-CPU rows (BASELINE.md): ZipEnhancer 0.32,
GTCRN 0.0036.  vs_baseline = baseline/ours (>1 ⇒ faster).

``--smoke`` runs the SAME code path with tiny model depths and 1–2 iters so a
CPU test can execute every line (guard against shipping a broken scoreboard;
the numbers it prints are meaningless).

Timing note: under the axon tunnel ``block_until_ready`` is async; a host
transfer is the only true sync, so executions are chained (output feeds
input) and synced once.
"""
from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

from audiojax.utils.bench_all import BASELINES, _clip  # single canonical baselines dict


def _bench_model(fn, params, audio, iters: int, repeats: int = 3) -> float:
    from audiojax.utils import measure_rtf

    # min-of-3 passes: tunnel noise is strictly additive, and single-pass
    # sub-5 ms rows have been observed swinging ±2× run-to-run
    return measure_rtf(fn, params, audio, sample_rate=16000, iters=iters,
                       repeats=repeats)["latency_s"]


def run(smoke: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from audiojax.models.gtcrn import GtcrnConfig, init_gtcrn, make_gtcrn
    from audiojax.models.zipenhancer import ZipEnhancerConfig, init_zipenhancer, make_zipenhancer

    seconds = 3 if smoke else 60
    iters_big = 2 if smoke else 20
    iters_small = 2 if smoke else 30

    def clip(total, rate=16000):
        # one canonical bench stimulus (bench_all._clip) for comparable rows
        return jnp.asarray(_clip((1, total), rate))

    results = {}

    zcfg = ZipEnhancerConfig(fold_window=24000)
    if smoke:
        zcfg = dataclasses.replace(zcfg, dense_depth=1, encoder_downsample=((1, 1),))
    total = max(seconds * 16000 // zcfg.fold_window, 1) * zcfg.fold_window
    zfn = jax.jit(make_zipenhancer(zcfg))
    zparams = init_zipenhancer(jax.random.PRNGKey(0), zcfg)
    elapsed = _bench_model(zfn, zparams, clip(total), iters=iters_big)
    results["zipenhancer"] = elapsed / (total / 16000.0)

    from audiojax.runtime.registry import prepare_compute_params

    zcfg_bf16 = dataclasses.replace(zcfg, compute_dtype="bfloat16")
    zfn_bf16 = jax.jit(make_zipenhancer(zcfg_bf16))
    zparams_bf16 = prepare_compute_params(zparams, zcfg_bf16)  # host-side cast
    elapsed_bf16 = _bench_model(zfn_bf16, zparams_bf16, clip(total), iters=iters_big)
    results["zipenhancer_bf16"] = elapsed_bf16 / (total / 16000.0)

    gcfg = GtcrnConfig(fold_window=24064)
    total_g = max(seconds * 16000 // gcfg.fold_window, 1) * gcfg.fold_window
    gfn = jax.jit(make_gtcrn(gcfg))
    gparams = init_gtcrn(jax.random.PRNGKey(0), gcfg)
    elapsed_g = _bench_model(gfn, gparams, clip(total_g), iters=iters_small)
    results["gtcrn"] = elapsed_g / (total_g / 16000.0)

    # MossFormer2-SE-48K, bf16 compute (2 s window, the reference geometry)
    from audiojax.models.mossformer2_se import (MossFormer2SeConfig, init_mossformer2_se,
                                                make_mossformer2_se)

    mcfg = MossFormer2SeConfig(compute_dtype="bfloat16")
    if smoke:
        mcfg = dataclasses.replace(mcfg, depth=2)
    mfn = jax.jit(make_mossformer2_se(mcfg))
    mparams = prepare_compute_params(
        init_mossformer2_se(jax.random.PRNGKey(0), mcfg), mcfg)
    mclip = clip(96000, rate=48000)
    _bench_model(mfn, mparams, mclip, iters=2 if smoke else 5)  # extra settle (tunnel warmup)
    elapsed_m = _bench_model(mfn, mparams, mclip, iters=2 if smoke else 15)
    results["m2se_bf16"] = elapsed_m / 2.0

    # showcase rows from the full-zoo sweep geometry (bench_all): the two
    # heaviest reference models, per-chunk at their serving geometry
    from audiojax.utils.bench_all import bench_model

    shrink = {"depth": 1} if smoke else None
    ss_row = bench_model("mossformer2_ss", iters=iters_big, compute_dtype="bfloat16",
                         cfg_replace=shrink)
    mb_row = bench_model("melband_roformer", iters=iters_big, compute_dtype="bfloat16",
                         cfg_replace=shrink)
    results["m2ss_bf16"] = ss_row["rtf"]
    results["m2ss_vs_baseline"] = ss_row["vs_baseline"]  # baselines live in bench_all
    results["melband_bf16"] = mb_row["rtf"]
    results["melband_vs_baseline"] = mb_row["vs_baseline"]

    # MossFormerGAN-SE bf16 — tracks the banded-GEMM depthwise route win
    # (ops/dwconv_banded.py, PROFILES.md)
    if smoke:
        # the manifest's 6 s chunk is far too big for a CPU smoke (XLA:CPU's
        # grouped-conv lowering); one tiny fold window exercises the same code
        from audiojax.models.mossformergan_se import (
            MossFormerGanConfig, init_mossformergan, make_mossformergan)

        gan_cfg = MossFormerGanConfig(n_blocks=1, dense_depth=1, fold_window=2400,
                                      compute_dtype="bfloat16")
        gan_fn = jax.jit(make_mossformergan(gan_cfg))
        gan_p = prepare_compute_params(
            init_mossformergan(jax.random.PRNGKey(0), gan_cfg), gan_cfg)
        el = _bench_model(gan_fn, gan_p, clip(2400), iters=iters_big)
        results["gan_bf16"] = el / (2400 / 16000.0)
        results["gan_vs_baseline"] = round(BASELINES["mossformergan_se"]
                                           / results["gan_bf16"], 2)
    else:
        gan_row = bench_model("mossformergan_se", iters=iters_big,
                              compute_dtype="bfloat16")
        results["gan_bf16"] = gan_row["rtf"]
        results["gan_vs_baseline"] = gan_row["vs_baseline"]

    # throughput mode: 8 concurrent clips batched into ONE compiled call (the
    # production serving shape — requests batch on the leading axis); RTF is
    # amortized per clip, so this row shows what a loaded chip sustains
    zshrink = ({"dense_depth": 1, "encoder_downsample": ((1, 1),)} if smoke else None)
    tp_row = bench_model("zipenhancer", iters=iters_big, compute_dtype="bfloat16",
                         cfg_replace=zshrink, batch=2 if smoke else 8)
    results["zip_bs8"] = tp_row["rtf"]
    results["zip_bs8_mfu"] = tp_row.get("mfu_pct")

    # streaming RTF: 64 ms blocks through the state-carry step, steps chained
    # on-device via the carried state (only the final transfer syncs)
    from audiojax.models.gtcrn import gtcrn_stream_init, gtcrn_stream_step

    scfg = GtcrnConfig()
    step = jax.jit(gtcrn_stream_step, static_argnames="cfg")
    block = 4 * scfg.hop  # 64 ms
    n_blocks = 4 if smoke else 150
    settle = 2 if smoke else 12
    sparams = init_gtcrn(jax.random.PRNGKey(0), scfg)
    chunks = [jax.device_put(clip(block)) for _ in range(n_blocks)]
    state = gtcrn_stream_init(scfg)
    state, out = step(sparams, state, chunks[0], scfg)  # compile
    np.asarray(out)
    for chnk in chunks[:settle]:  # settle: the tunnel pays ~30 ms/call for the
        state, out = step(sparams, state, chnk, scfg)  # first ~10 executions
    np.asarray(out[0, :8])
    best = float("inf")  # min-of-3: this row measures per-dispatch relay RTT,
    for _ in range(1 if smoke else 3):  # which swings 3× between passes
        t0 = time.perf_counter()
        for chnk in chunks:
            state, out = step(sparams, state, chnk, scfg)
        np.asarray(out)  # true sync
        best = min(best, time.perf_counter() - t0)
    results["gtcrn_stream"] = best / (n_blocks * block / 16000.0)

    # chip-side streaming tick: the SAME ticks chained in ONE lax.scan
    # dispatch.  The host-loop row above issues one tunnel dispatch per tick
    # and so measures relay RTT (observed swinging 0.0095→0.042 between runs
    # with identical code); this row isolates the per-tick cost on the chip,
    # which is what a host adjacent to the TPU would see.
    blocks = jnp.stack([c[0] for c in chunks])[:, None, :]  # (n, 1, block)

    @jax.jit
    def chained(params, st0, blocks):
        def body(st, blk):
            st2, out = gtcrn_stream_step(params, st, blk, scfg)
            return st2, out[:, -1]  # tiny per-tick tap; avoids stacking audio
        return jax.lax.scan(body, st0, blocks)

    st0 = gtcrn_stream_init(scfg)
    _, outs = chained(sparams, st0, blocks)
    np.asarray(outs)  # compile + sync
    for _ in range(1 if smoke else 4):  # settle the new executable
        _, outs = chained(sparams, st0, blocks)
    np.asarray(outs)
    best = float("inf")
    for _ in range(1 if smoke else 3):
        t0 = time.perf_counter()
        _, outs = chained(sparams, st0, blocks)
        np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    results["gtcrn_stream_chip"] = best / (n_blocks * block / 16000.0)

    return {
        "metric": "ZipEnhancer RTF (60s clip, 1.5s fold windows, f32)",
        "value": round(results["zipenhancer"], 6),
        "unit": "RTF",
        "vs_baseline": round(BASELINES["zipenhancer"] / results["zipenhancer"], 2),
        "zipenhancer_bf16_rtf": round(results["zipenhancer_bf16"], 6),
        "zipenhancer_bf16_vs_baseline": round(
            BASELINES["zipenhancer"] / results["zipenhancer_bf16"], 2),
        "gtcrn_rtf": round(results["gtcrn"], 6),
        "gtcrn_vs_baseline": round(BASELINES["gtcrn"] / results["gtcrn"], 2),
        "gtcrn_stream_rtf_64ms_blocks": round(results["gtcrn_stream"], 6),
        "gtcrn_stream_chip_rtf_64ms_blocks": round(results["gtcrn_stream_chip"], 6),
        "mossformer2_se_bf16_rtf": round(results["m2se_bf16"], 6),
        "mossformer2_se_bf16_vs_baseline": round(
            BASELINES["mossformer2_se"] / results["m2se_bf16"], 2),
        "mossformer2_ss_bf16_rtf": round(results["m2ss_bf16"], 6),
        "mossformer2_ss_bf16_vs_baseline": results["m2ss_vs_baseline"],
        "melband_bf16_rtf": round(results["melband_bf16"], 6),
        "melband_bf16_vs_baseline": results["melband_vs_baseline"],
        "mossformergan_bf16_rtf": round(results["gan_bf16"], 6),
        "mossformergan_bf16_vs_baseline": results["gan_vs_baseline"],
        "zipenhancer_bf16_bs8_rtf_per_clip": round(results["zip_bs8"], 6),
        "zipenhancer_bf16_bs8_mfu_pct": results["zip_bs8_mfu"],
        "smoke": smoke,
        "chip": str(jax.devices()[0]),
    }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-config CPU sanity run exercising every bench line")
    args = ap.parse_args(argv)
    print(json.dumps(run(smoke=args.smoke)))


if __name__ == "__main__":
    main()
