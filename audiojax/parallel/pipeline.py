"""Pipeline parallelism for deep residual stacks.

The zoo's depth-24 MossFormer stacks (MossFormer2-SS/SE) and depth-6
SyncANet/Zipformer towers are homogeneous layer sequences — the natural
pipeline shape.  ``pp_stack`` stages such a stack over a ``pp`` mesh axis:
each chip holds a contiguous chunk of layers, microbatches flow stage to
stage over ICI via ``lax.ppermute``, and the classic fill/drain schedule
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
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stack_layer_params", "pp_stack"]


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


def pp_stack(layer_fn, mesh: Mesh, stage_params, x, *, axis: str = "pp",
             microbatches: int | None = None):
    """Apply ``layer_fn`` sequentially over a staged layer stack.

    layer_fn(layer_params, h) -> h : one layer, shape-preserving.
    stage_params: pytree with leading (S, L/S) axes (see
        :func:`stack_layer_params`); sharded over ``axis`` here.
    x: (B, ...) batch; split into ``microbatches`` equal microbatches
       (default: one per stage).  B must divide evenly.

    Returns layer_(L-1)(…layer_0(x)…), bit-comparable to the sequential
    loop up to reduction order.
    """
    n_stages = mesh.shape[axis]
    m = microbatches or n_stages
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    mb = b // m
    xm = x.reshape((m, mb) + x.shape[1:])

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
    fn = jax.jit(
        jax.shard_map(
            stage_body, mesh=mesh, in_specs=(pp_spec, rep), out_specs=rep,
            check_vma=False,
        )
    )
    stage_params = jax.device_put(stage_params, NamedSharding(mesh, pp_spec))
    ym = fn(stage_params, jax.device_put(xm, NamedSharding(mesh, rep)))
    return ym.reshape((b,) + ym.shape[2:])
