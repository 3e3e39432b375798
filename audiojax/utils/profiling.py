"""RTF measurement (the reference's per-script timing, SURVEY.md §5, done right
for the async TPU dispatch path)."""
from __future__ import annotations

import time

import numpy as np

__all__ = ["measure_rtf"]


def measure_rtf(fn, params, audio, *, sample_rate: int, iters: int = 20,
                warmup: bool = True, settle: int = 12, repeats: int = 1) -> dict:
    """Steady-state real-time factor of ``fn(params, audio) -> audio-like``.

    Executions are CHAINED (output feeds input — both are int16 of identical
    shape) and synced once by a host transfer, because ``block_until_ready``
    is a no-op under async remote dispatch (e.g. the axon TPU tunnel).
    ``settle`` extra executions run after compile before timing starts — the
    tunnel pays ~30 ms per-call round-trips for the first ~10 executions of a
    new executable before its dispatch path pipelines.

    ``repeats`` > 1 times the loop that many times and reports the MINIMUM
    pass: tunnel noise is strictly additive (relay stalls inflate a pass,
    nothing deflates one), so the min is the robust steady-state estimator —
    single-pass sub-5 ms rows have been observed swinging ±2× run-to-run.
    """
    def chain(y):
        # multi-output models (separation, AEC+VAD) return tuples; the first
        # output is audio-shaped like the input, so it carries the chain
        return y[0] if isinstance(y, (tuple, list)) else y

    if warmup:
        np.asarray(chain(fn(params, audio)))
        x = audio
        for _ in range(settle):
            x = chain(fn(params, x))
        np.asarray(x[(0,) * (x.ndim - 1) + (slice(0, 8),)])
    best = float("inf")
    x = audio
    for _ in range(max(repeats, 1)):
        start = time.perf_counter()
        for _ in range(iters):
            x = chain(fn(params, x))
        np.asarray(x[(0,) * (x.ndim - 1) + (slice(0, 8),)])
        best = min(best, time.perf_counter() - start)
    elapsed = best / iters
    duration = audio.shape[-1] / sample_rate
    return {
        "latency_s": elapsed,
        "audio_s": duration,
        "rtf": elapsed / duration,
    }
