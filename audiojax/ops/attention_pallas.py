"""Pallas TPU kernel: fused ReLU² quadratic attention (GAU / FLASH family).

The MossFormer GAU and FLASH blocks share one attention form
(/root/reference/MossFormerGAN_SE_16K/Export_MossFormer_SE.py:137-244,
/root/reference/MossFormer2_SS_16K/Export_MossFormer2_SS_16K.py FLASH):

    out = relu(Q Kᵀ · scale)² V          (optionally with a zeroed diagonal)

as a large batch of SMALL matmuls (S ≈ 100–256, K = 128).  This kernel
processes a block of batch rows per program and keeps the similarity tile in
VMEM — only Q, K, V in and O out touch HBM.

Measured on v5e at the production shapes (GAN quad (964,101,128), FLASH
(16,256,128→2048), GAN cross (404,241,128)): the kernel TIES XLA's batched-
matmul lowering (±10%) — at these sizes both are MXU-occupancy-bound on
sub-128 tiles, not HBM-bound.  ``quad_attention`` therefore always takes the
jnp path; call :func:`quad_attention_pallas` explicitly for larger-S
workloads where the (N, S, S) HBM intermediate dominates.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quad_attention", "quad_attention_pallas", "quad_attention_jnp"]


def quad_attention_jnp(q, k, v, *, scale: float, mask_diag: bool = False):
    """Reference jnp path: relu(q kᵀ·scale)² v; q/k (N,S,K), v (N,S,V)."""
    sim = jnp.einsum("nik,njk->nij", q, k, preferred_element_type=jnp.float32) * scale
    attn = jnp.square(jax.nn.relu(sim))
    if mask_diag:
        s = q.shape[1]
        attn = jnp.where(jnp.eye(s, dtype=bool), 0.0, attn)
    return jnp.einsum("nij,njv->niv", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, tb, scale, mask_diag):
    for i in range(tb):
        sim = jax.lax.dot_general(
            q_ref[i], k_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        attn = jnp.square(jnp.maximum(sim, 0.0))
        if mask_diag:
            s = attn.shape[0]
            rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            attn = jnp.where(rows == cols, 0.0, attn)
        # keep attn in f32 for the PV matmul (same contract as the jnp path)
        o_ref[i] = jnp.dot(attn, v_ref[i].astype(jnp.float32),
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)


def quad_attention_pallas(q, k, v, *, scale: float, mask_diag: bool = False,
                          block_rows: int = 8, interpret: bool = False):
    """Fused relu² attention; same contract as :func:`quad_attention_jnp`."""
    n, s, _ = q.shape
    # size the row block to a ~6 MB VMEM budget (Q+K+V in, O out, double-
    # buffered, PLUS the per-row (s, s) f32 similarity tile the kernel
    # materialises — the QUADRATIC term that dominates at large S)
    itemsize = jnp.dtype(v.dtype).itemsize
    bytes_per_row = (itemsize * s * (q.shape[-1] + k.shape[-1] + 2 * v.shape[-1])
                     + 4 * s * s)
    tb = max(1, min(block_rows, (6 * 2**20) // max(bytes_per_row, 1), n))
    if bytes_per_row > 12 * 2**20:
        # even tb=1 cannot hold the similarity tile + blocks in VMEM —
        # fall back to the HBM-materialising jnp path instead of a Mosaic
        # allocation failure at compile time
        return quad_attention_jnp(q, k, v, scale=scale, mask_diag=mask_diag)
    blocks = -(-n // tb)
    if blocks * tb != n:  # pad the batch axis; garbage rows are sliced away
        pad = blocks * tb - n
        q, k, v = (jnp.pad(x, [(0, pad), (0, 0), (0, 0)]) for x in (q, k, v))

    out = pl.pallas_call(
        partial(_kernel, tb=tb, scale=scale, mask_diag=mask_diag),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((tb, s, q.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, s, k.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, s, v.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, s, v.shape[-1]), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((blocks * tb, s, v.shape[-1]), v.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:n]


def quad_attention(q, k, v, *, scale: float, mask_diag: bool = False):
    """relu(q kᵀ·scale)² v — jnp batched matmuls (measured fastest at the
    model shapes; see module docstring).  Use :func:`quad_attention_pallas`
    explicitly for large-S workloads."""
    return quad_attention_jnp(q, k, v, scale=scale, mask_diag=mask_diag)
