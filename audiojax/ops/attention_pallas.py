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

__all__ = ["quad_attention", "quad_attention_pallas", "quad_attention_jnp",
           "relpos_scores", "relpos_scores_pallas", "relpos_scores_jnp"]


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


# ─────────────────────────────────────────────────────────────────────────────
# Zipformer2 rel-pos attention scores: fused QKᵀ + positional bias + softmax
# ─────────────────────────────────────────────────────────────────────────────
#
# The reference RelPositionMultiheadAttentionWeights
# (/root/reference/ZipEnhancer/Export_ZipEnhancer.py:232-292) produces
# softmax(q kᵀ + pos) shared by sa1/sa2/nonlin-attention.  XLA's lowering
# streams the (N, H, S, S) score tensor through HBM several times (QK out,
# pos-einsum out, add, softmax read/write) and the P=4 positional contraction
# lowers to an awkward tiny-lane reduce; stage ablation attributed 18.9 ms of
# ZipEnhancer's 44 ms forward to this one stage.  This kernel keeps the score
# tile in VMEM and writes only the final probabilities — one HBM pass.
#
# Layout is chosen for the VMEM tiling (last two dims pad to (8, 128)):
#   q/k  (N, S, H·D)  — H·D = 128 at the model shape: lane-PERFECT blocks.
#                       The (N, H, S, D) layout wastes 4× on D=32 lanes and
#                       OOMed scoped VMEM at 20.7 MB / 16 MB (measured).
#   pp   (N, S, H·8)  — per-head pos projections padded to stride 8 so the
#                       in-kernel lane slices stay 8-aligned.
#   pe   (H, P, S, S) bf16 — the full pre-gathered table stays VMEM-resident
#                       across the whole grid (bf16 halves its footprint; the
#                       jnp einsum path bf16-rounds BOTH operands on the MXU,
#                       so this is still ≥ its precision).
#   out  (N, H, S, S) — (S, S) tiles pad ≤1.27×.
# Grid is 1-D over row blocks; heads unroll statically in-kernel (static lane
# slices), rows run under fori_loop so only one row's (S, S) temporaries are
# live on the Mosaic stack at a time (an unrolled nb≈50 OOMs the stack, while
# pushing the row loop into the grid at nb=8 cost +23 ms in per-step
# overhead — both measured on v5e).


def pos_stride(n_pos: int) -> int:
    """Lane stride of one head's slot in the packed pos-projection: the
    in-kernel lane slices stay 8-aligned (slot tail is zero-padded)."""
    return -(-n_pos // 8) * 8


def relpos_scores_jnp(q, k, pp, pe, *, num_heads: int):
    """softmax(q kᵀ + Σ_p pp·pe) over the last axis.

    q/k (N, S, H·D), pp (N, S, H·pos_stride(P)) (tail of each stride-8 head
    slot zero-padded), pe (H, P, S, S) → probs (N, H, S, S) in q.dtype.
    """
    n, s, hd = q.shape
    h, n_pos = pe.shape[0], pe.shape[1]
    qh = q.reshape(n, s, h, hd // h)
    kh = k.reshape(n, s, h, hd // h)
    pph = pp.reshape(n, s, h, pp.shape[-1] // h)[..., :n_pos]
    scores = jnp.einsum("nihd,njhd->nhij", qh, kh,
                        preferred_element_type=jnp.float32)
    scores = scores + jnp.einsum("nihp,hpij->nhij", pph,
                                 pe.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
    return jax.nn.softmax(scores, axis=-1).astype(q.dtype)


def _relpos_kernel(q_ref, k_ref, pp_ref, pe_ref, o_ref, *, n_pos, nb, num_heads):
    d = q_ref.shape[-1] // num_heads
    stride = pp_ref.shape[-1] // num_heads

    def body(i, _):
        qi = q_ref[i]
        ki = k_ref[i]
        ppi = pp_ref[i].astype(jnp.float32)
        for h in range(num_heads):  # static unroll: static 8-aligned lane slices
            scores = jax.lax.dot_general(
                qi[:, h * d : (h + 1) * d], ki[:, h * d : (h + 1) * d],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (S, S)
            for p in range(n_pos):  # P broadcast-FMAs on the tile.
                # NOTE: this VPU broadcast-multiply is exact in f32 — on real
                # chips it is MORE precise than the jnp einsum fallback, whose
                # P contraction XLA lowers through default-precision
                # (bf16-operand) MXU passes; chip-vs-jnp comparisons must use
                # an f64 reference.
                scores = scores + (ppi[:, h * stride + p : h * stride + p + 1]
                                   * pe_ref[h, p].astype(jnp.float32))
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            o_ref[i, h] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def relpos_scores_pallas(q, k, pp, pe, *, out_dtype=None, interpret: bool = False):
    """Fused scores kernel; same contract as :func:`relpos_scores_jnp`.

    ``out_dtype=bfloat16`` halves the probs' HBM write (and the consumers'
    reads) — on TPU this costs nothing beyond what already happens: the
    consuming einsums (sa1/sa2/nonlin) lower to MXU dots that round their
    operands to bf16 at default precision anyway, and probs ∈ [0, 1] have no
    exponent risk.  Softmax itself stays f32 in-kernel."""
    n, s, hd = q.shape
    h, n_pos = pe.shape[0], pe.shape[1]
    out_dtype = out_dtype or q.dtype
    isz = jnp.dtype(q.dtype).itemsize
    osz = jnp.dtype(out_dtype).itemsize
    pe = pe.astype(jnp.bfloat16)
    # VMEM budget: double-buffered in/out blocks + the resident bf16 table.
    # Padded bytes per row block-row: 3 input tiles (S, 128·⌈lanes/128⌉) + H
    # output (S, S) tiles, sublanes padded to 8, lanes to 128.
    sub = _pad8(s)
    lane_s = -(-s // 128) * 128
    in_row = 3 * sub * max(128, -(-hd // 128) * 128) * isz
    out_row = h * sub * lane_s * osz
    pe_bytes = 2 * h * n_pos * sub * lane_s  # bf16, possibly double-buffered
    budget = 10 * 2**20 - 2 * pe_bytes
    nb = max(1, min(budget // (2 * (in_row + out_row)), n, 16))
    blocks = -(-n // nb)
    if blocks * nb != n:  # pad; garbage rows are sliced away
        padn = blocks * nb - n
        q, k, pp = (jnp.pad(x, [(0, padn), (0, 0), (0, 0)])
                    for x in (q, k, pp))
    out = pl.pallas_call(
        partial(_relpos_kernel, n_pos=n_pos, nb=nb, num_heads=h),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((nb, s, hd), lambda ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, s, hd), lambda ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, s, pp.shape[-1]), lambda ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n_pos, s, s), lambda ni: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # resident across the grid
        ],
        out_specs=pl.BlockSpec((nb, h, s, s), lambda ni: (ni, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((blocks * nb, h, s, s), out_dtype),
        interpret=interpret,
    )(q, k, pp, pe)
    return out[:n]


def relpos_scores(q, k, pp, pe, *, num_heads: int):
    """Rel-pos attention scores — the jnp lowering, on every backend.

    The fused Pallas kernel (:func:`relpos_scores_pallas`) was measured on the
    real chip (v5e, ZipEnhancer geometries): it ties-or-beats the jnp path
    standalone (1.09×/2.05× at (964,101)/(404,241)) but LOSES in the full
    forward — 45.1 ms vs 42.8 ms f32-out, 47.9 ms with bf16 probs (the
    mixed-dtype consumer einsums materialise an f32 upcast of the whole
    (N, H, S, S) tensor) — because XLA already fuses QKᵀ+bias+softmax into a
    near-floor pipeline and the kernel's forced operand/result layouts cost
    more than the saved passes.  Kept (tested) as the measured record; see
    PROFILES.md."""
    del num_heads  # same signature as the jnp fallback
    return relpos_scores_jnp(q, k, pp, pe, num_heads=pe.shape[0])
