"""Stage-ablation profiling: attribute full-forward latency to stages.

Standalone microbenchmarks of a stage LIE on TPU — a depthwise conv that
times 1.4 ms alone cost 99 ms inside the MossFormerGAN forward because of
XLA relayout churn around it (CLAUDE.md perf rules).  The method that found
that: stub one stage at a time with a shape-preserving no-op, re-jit, and
time the FULL forward; the latency drop is the stage's true in-context cost
(compute + the layout transitions it forces).

Usage::

    import audiojax.models.mossformer2_ss as m2ss
    report = ablate(
        make_fn=lambda: jax.jit(partial(m2ss.mossformer2_ss_net, cfg=cfg)),
        params=params, audio=audio, sample_rate=16000,
        stages=[Stage("gau", m2ss, "flash_layer", lambda p, x, **k: x)],
    )

Each stub must preserve the stage's output shape/dtype (usually
``lambda *a, **k: <identity on the main operand>``) so the rest of the
graph compiles unchanged.

``Stage.module`` must be the module whose namespace the forward READS —
models bind blocks by value at import time (``from ..nn.mossformer import
flash_layer``), so stub the MODEL module (``m2ss`` above), not the defining
module: patching ``audiojax.nn.mossformer`` would leave the model's own
binding untouched and silently profile nothing.  ``ablate`` enforces this:
every stub is call-counted during its trace and a stage whose stub never
ran raises instead of reporting a bogus ~0 attribution.
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
        hits = 0

        def counted(*a, _stub=st.stub, **kw):
            nonlocal hits
            hits += 1
            return _stub(*a, **kw)

        with stubbed(st.module, st.attr, counted):
            jax.clear_caches()
            r = measure_rtf(make_fn(), params, audio, sample_rate=sample_rate,
                            iters=iters, settle=settle)
        if hits == 0:
            raise ValueError(
                f"stage {st.name!r}: stub for {st.module.__name__}.{st.attr} "
                f"was never called while tracing the forward — Stage.module "
                f"must be the module the forward actually reads (models bind "
                f"blocks by value at import; stub the model module)")
        saved = base["latency_s"] - r["latency_s"]
        rows.append({
            "name": st.name,
            "rtf": r["rtf"],
            "latency_s": r["latency_s"],
            "attributed_s": saved,
            "attributed_pct": 100.0 * saved / base["latency_s"],
        })
    return {"baseline": base, "stages": rows}
