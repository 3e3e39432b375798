"""RTF benchmark on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Primary metric this round: GTCRN real-time factor (processing time ÷ audio
duration) on a 60 s clip batch-folded into 1.5 s windows — the same fold
policy the reference uses for long audio (SURVEY.md §2.0.1).  Baseline:
GTCRN RTF 0.0036 on the reference's i3-12300 ORT-CPU row (BASELINE.md);
vs_baseline is the speedup factor baseline/ours (>1 = faster).
"""
from __future__ import annotations

import json
import time

import numpy as np

GTCRN_BASELINE_RTF = 0.0036


def main():
    import jax
    import jax.numpy as jnp

    from audiojax.models.gtcrn import GtcrnConfig, init_gtcrn, make_gtcrn

    fold = 24064  # 1.5 s fold windows rounded up to a hop multiple
    seconds = 60
    n_windows = seconds * 16000 // fold + 1
    total = n_windows * fold

    cfg = GtcrnConfig(fold_window=fold)
    params = init_gtcrn(jax.random.PRNGKey(0), cfg)
    fn = jax.jit(make_gtcrn(cfg))

    rng = np.random.default_rng(0)
    t = np.arange(total) / 16000
    clip = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(total)
    audio = jnp.asarray((clip * 20000).astype(np.int16)[None])

    # compile + warmup. NOTE: under the axon tunnel block_until_ready() is a
    # no-op (fully async dispatch); a host transfer is the only real sync, so
    # we chain executions (output feeds input — same int16 shape) and sync
    # once at the end. This measures steady-state serving throughput.
    np.asarray(fn(params, audio))
    iters = 50
    x = audio
    start = time.perf_counter()
    for _ in range(iters):
        x = fn(params, x)
    np.asarray(x[0, :8])
    elapsed = (time.perf_counter() - start) / iters

    duration = total / 16000.0
    rtf = elapsed / duration
    print(
        json.dumps(
            {
                "metric": "GTCRN RTF (60s clip, 1.5s fold windows, f32)",
                "value": round(rtf, 6),
                "unit": "RTF",
                "vs_baseline": round(GTCRN_BASELINE_RTF / rtf, 2),
                "chip": str(jax.devices()[0]),
                "latency_ms": round(elapsed * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
