"""Pipeline parallelism for deep residual stacks.

The zoo's depth-24 MossFormer stacks (MossFormer2-SS/SE) and depth-6
SyncANet/Zipformer towers are homogeneous layer sequences — the natural
pipeline shape.  ``pp_stack_fn`` stages such a stack over a ``pp`` mesh
axis: each chip holds a contiguous chunk of layers, microbatches flow stage
to stage over ICI via ``lax.ppermute``, and the classic fill/drain schedule
keeps every stage busy in steady state (M microbatches over S stages cost
M + S − 1 ticks instead of M·S).

This is an additive capability with no reference equivalent (the reference
is single-device ORT; SURVEY.md §2.0).  It complements the dp/tp/sp hints in
``sharding.py``: dp shards the window batch, tp/sp shard within a window,
pp shards the *depth* axis — the right lever once a stack's parameters or
activations outgrow one chip's HBM.

Design notes (TPU-first):

* Implemented with ``shard_map`` over the ``pp`` axis + ``lax.ppermute`` —
  the XLA-native point-to-point collective that rides ICI neighbour links.
* The schedule is a static Python loop (M + S − 1 ticks, all shapes equal),
  so the whole pipeline is ONE compiled program; no host round-trips between
  ticks.
* Per-stage parameters arrive pre-stacked with a leading (S, L/S) axis and
  sharded over ``pp`` on axis 0, so each chip materialises only its own
  layers — the HBM saving that motivates pp in the first place.
* ``pp_stack_fn`` returns a stable jitted callable: build it once at serving
  setup and call it per request (a fresh closure per request would defeat
  jit's trace cache and recompile the whole schedule every time).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stack_layer_params", "pp_stack", "pp_stack_fn"]


def stack_layer_params(per_layer_params, n_stages: int):
    """[L homogeneous per-layer pytrees] → one pytree with leading (S, L/S)
    axes, ready to shard over the ``pp`` mesh axis (axis 0)."""
    n_layers = len(per_layer_params)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *per_layer_params)
    return jax.tree.map(
        lambda a: a.reshape((n_stages, n_layers // n_stages) + a.shape[1:]), stacked
    )


def pp_stack_fn(layer_fn, mesh: Mesh, *, axis: str = "pp",
                microbatches: int | None = None):
    """Build the staged-pipeline executor: ``fn(stage_params, x) -> y``.

    layer_fn(layer_params, h) -> h : one layer, shape-preserving.
    stage_params: pytree with leading (S, L/S) axes (see
        :func:`stack_layer_params`) — S MUST equal ``mesh.shape[axis]``.
    x: (B, ...) batch; split into ``microbatches`` equal microbatches
       (default: one per stage).  B must divide evenly.

    The returned callable is stable (one trace-cache entry): keep it for the
    lifetime of the serving mesh and call it per request.  Output equals
    layer_(L-1)(…layer_0(x)…) up to reduction order.
    """
    n_stages = mesh.shape[axis]
    m = n_stages if microbatches is None else microbatches
    if m < 1:
        raise ValueError(f"microbatches must be >= 1, got {m}")
    fwd = [(i, i + 1) for i in range(n_stages - 1)]

    def stage_body(params_local, xm_local):
        # params_local: (1, L/S, ...) — this chip's layer chunk
        # xm_local: (m, mb, ...) — microbatches, replicated over pp
        idx = lax.axis_index(axis)
        chunk = jax.tree.map(lambda a: a[0], params_local)
        n_local = jax.tree.leaves(chunk)[0].shape[0]
        zero = jnp.zeros_like(xm_local[0])
        carry = zero
        out = jnp.zeros_like(xm_local)
        for tick in range(m + n_stages - 1):
            # stage 0 ingests microbatch `tick` during the fill phase
            feed = xm_local[tick] if tick < m else zero
            h = jnp.where(idx == 0, feed, carry)
            for li in range(n_local):
                h = layer_fn(jax.tree.map(lambda a: a[li], chunk), h)
            # drain: the last stage emits microbatch tick−(S−1)
            j = tick - (n_stages - 1)
            if j >= 0:
                out = out.at[j].set(jnp.where(idx == n_stages - 1, h, out[j]))
            if fwd:
                carry = lax.ppermute(h, axis, fwd)
        # broadcast the last stage's outputs to every chip
        return lax.psum(jnp.where(idx == n_stages - 1, out, jnp.zeros_like(out)), axis)

    pp_spec = P(axis)
    rep = P()
    mapped = jax.jit(
        jax.shard_map(
            stage_body, mesh=mesh, in_specs=(pp_spec, rep), out_specs=rep,
            check_vma=False,
        )
    )

    def run(stage_params, x):
        s = jax.tree.leaves(stage_params)[0].shape[0]
        if s != n_stages:
            raise ValueError(
                f"stage_params has {s} stages but mesh axis {axis!r} has "
                f"{n_stages} devices — restack with "
                f"stack_layer_params(layers, {n_stages})")
        b = x.shape[0]
        if b % m:
            raise ValueError(f"batch {b} not divisible by {m} microbatches")
        xm = x.reshape((m, b // m) + x.shape[1:])
        stage_params = jax.device_put(stage_params, NamedSharding(mesh, pp_spec))
        ym = mapped(stage_params, jax.device_put(xm, NamedSharding(mesh, rep)))
        return ym.reshape((b,) + ym.shape[2:])

    return run


def pp_stack(layer_fn, mesh: Mesh, stage_params, x, *, axis: str = "pp",
             microbatches: int | None = None):
    """One-shot convenience wrapper around :func:`pp_stack_fn` (compiles per
    call — use ``pp_stack_fn`` for serving loops)."""
    return pp_stack_fn(layer_fn, mesh, axis=axis, microbatches=microbatches)(
        stage_params, x)
