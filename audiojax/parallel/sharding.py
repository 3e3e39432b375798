"""Multi-chip serving: mesh construction + sharded inference steps.

The reference is single-process/single-device; its only parallelism is the
in-graph batch-fold over time windows (SURVEY.md §2.0).  The TPU-native
analog scales that same axis across chips: a ``(dp, tp)`` mesh where

  * ``dp`` (data parallel) shards the fold-window batch — each chip denoises
    a disjoint set of 1.5 s windows; zero communication on the hot path, the
    stitch is a reshape of an already-sharded axis.
  * ``tp`` (tensor parallel) shards the frequency axis of the spectral
    stages via sharding constraints; XLA inserts the (ICI) collectives where
    the network mixes bins.

Parameters are replicated (every model here is ≤ a few MB — the interesting
axis is throughput over windows, not weight capacity).
"""
from __future__ import annotations

import contextlib
import threading
from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "sharded_model_fn",
    "spmd_mesh",
    "shard_hint",
]

_ctx = threading.local()


@contextlib.contextmanager
def spmd_mesh(mesh: Mesh):
    """Activate in-model sharding hints while tracing under this mesh.

    Models sprinkle :func:`shard_hint` at their natural partition points
    (e.g. ZipEnhancer's dual-path batch-flattened sequences); the hints are
    no-ops unless a mesh is active here, so single-chip code paths pay
    nothing.  Trace/jit the model INSIDE this context for the constraints to
    be baked into the lowered computation (XLA SPMD then inserts the ICI
    collectives — all-to-alls at dual-path transpositions, halo exchanges
    for sharded convolutions)."""
    prev = getattr(_ctx, "mesh", None)
    _ctx.mesh = mesh
    try:
        yield mesh
    finally:
        _ctx.mesh = prev


def shard_hint(x, *spec):
    """``with_sharding_constraint(x, P(*spec))`` under the active
    :func:`spmd_mesh`; identity when no mesh is active.  A spec entry may be
    an axis name, ``None``, or a tuple of axis names (shard one tensor axis
    over several mesh axes, e.g. ``("dp", "tp")``).  Axis names absent from
    the active mesh degrade to replicated, so a model annotated for
    ``("dp", "tp")`` also runs on a dp-only mesh unchanged."""
    mesh = getattr(_ctx, "mesh", None)
    if mesh is None:
        return x
    names = set(mesh.axis_names)

    def _clean(s):
        if isinstance(s, (tuple, list)):
            kept = tuple(a for a in s if a in names)
            return kept if len(kept) > 1 else (kept[0] if kept else None)
        return s if (s is None or s in names) else None

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*(_clean(s) for s in spec)))
    )


def make_mesh(n_devices: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a ``(dp, tp)`` mesh over ``n_devices`` (default: all devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        # validate against EXPLICIT device lists too — silently using all of
        # a passed list when the caller sized work for n_devices produces
        # confusing downstream divisibility errors
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} JAX device(s) are visible "
                f"({devices!r}); for a virtual CPU mesh set JAX_PLATFORMS=cpu "
                f"and --xla_force_host_platform_device_count before jax init"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % tp:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicate(mesh: Mesh, tree):
    """Replicate a parameter pytree across the whole mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(mesh: Mesh, x):
    """Shard the leading (window-batch) axis over ``dp``."""
    return jax.device_put(x, NamedSharding(mesh, P("dp")))


def sharded_model_fn(mesh: Mesh, model_fn):
    """jit ``model_fn(params, audio)`` with dp-sharded batch I/O.

    The model traces under :func:`spmd_mesh`, so any in-model
    :func:`shard_hint` partition points (ZipEnhancer/Mel-Band/MossFormer
    tp/sp annotations) bake into the lowered computation; on a tp=1 mesh
    they degrade to replicated, costing nothing.
    """
    in_s = (NamedSharding(mesh, P()), NamedSharding(mesh, P("dp")))
    out_s = NamedSharding(mesh, P("dp"))

    def traced(params, audio):
        # re-enter per call: jit may re-trace later (new shapes) on a thread
        # where no spmd_mesh context is active
        with spmd_mesh(mesh):
            return model_fn(params, audio)

    return jax.jit(traced, in_shardings=in_s, out_shardings=out_s)
