"""Stage-ablation profiling: attribute full-forward latency to stages.

Standalone microbenchmarks of a stage LIE on TPU — a depthwise conv that
times 1.4 ms alone cost 99 ms inside the MossFormerGAN forward because of
XLA relayout churn around it (CLAUDE.md perf rules).  The method that found
that: stub one stage at a time with a shape-preserving no-op, re-jit, and
time the FULL forward; the latency drop is the stage's true in-context cost
(compute + the layout transitions it forces).

Usage::

    import audiojax.nn.mossformer as mf
    report = ablate(
        make_fn=lambda: jax.jit(partial(forward, cfg=cfg)),
        params=params, audio=audio, sample_rate=16000,
        stages=[Stage("gau", mf, "flash_layer", lambda p, x, **k: x)],
    )

Each stub must preserve the stage's output shape/dtype (usually
``lambda *a, **k: <identity on the main operand>``) so the rest of the
graph compiles unchanged.  Because the forward is re-traced per ablation,
``make_fn`` must return a FRESH jitted callable (a plain ``jax.jit`` of the
model fn — never a cached module-level jit).
"""
from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Callable

from .profiling import measure_rtf

__all__ = ["Stage", "ablate", "stubbed"]


@dataclasses.dataclass(frozen=True)
class Stage:
    """One ablatable stage: ``module.attr`` is swapped for ``stub`` while a
    fresh trace of the forward is timed."""

    name: str
    module: Any
    attr: str
    stub: Callable


@contextlib.contextmanager
def stubbed(module, attr: str, replacement):
    """Temporarily replace ``module.attr`` (restores on exit, always)."""
    original = getattr(module, attr)
    setattr(module, attr, replacement)
    try:
        yield original
    finally:
        setattr(module, attr, original)


def ablate(*, make_fn: Callable[[], Callable], params, audio, sample_rate: int,
           stages: list[Stage], iters: int = 20, settle: int = 12) -> dict:
    """Time the full forward with each stage stubbed out, one at a time.

    Returns ``{"baseline": {...}, "stages": [{name, rtf, latency_s,
    attributed_s, attributed_pct}, ...]}`` where ``attributed_s`` is the
    latency recovered by removing the stage — its in-context cost.
    """
    import jax

    # jax.jit's trace cache is keyed on the *wrapped function*, so a fresh
    # jax.jit(fwd) would silently reuse the unstubbed trace — clear between
    # ablations to force a retrace that sees the stub.
    jax.clear_caches()
    base = measure_rtf(make_fn(), params, audio, sample_rate=sample_rate,
                       iters=iters, settle=settle)
    rows = []
    for st in stages:
        with stubbed(st.module, st.attr, st.stub):
            jax.clear_caches()
            r = measure_rtf(make_fn(), params, audio, sample_rate=sample_rate,
                            iters=iters, settle=settle)
        saved = base["latency_s"] - r["latency_s"]
        rows.append({
            "name": st.name,
            "rtf": r["rtf"],
            "latency_s": r["latency_s"],
            "attributed_s": saved,
            "attributed_pct": 100.0 * saved / base["latency_s"],
        })
    return {"baseline": base, "stages": rows}
