"""Pallas TPU kernel: true depthwise 1-D convolution (read-once).

XLA:TPU's `feature_group_count == C` conv lowering is pathological on the
mid-size maps the MossFormer family runs (measured v5e: the two k=31
depthwise ConvModules inside each MossFormerGAN GAU cost ~4 ms apiece at
(964, 101, 256) — ~20× off the HBM roofline), and the shift-add unroll
re-reads the input per tap (k× traffic).  This kernel streams each input
block into VMEM once, applies all k taps there with an f32 accumulator, and
writes the output once — the roofline form.

Reference op: the depthwise ConvModule / FSMN memory convs of
/root/reference/MossFormerGAN_SE_16K/Export_MossFormer_SE.py:137-244 and the
UniDeepFsmn memory of /root/reference/DFSMN/Export_DFSMN.py:142-174.

Contract (matches ``core.conv1d`` with groups == C, stride 1, dilation 1):
    x (B, T, C), w (k, C)  →  y (B, T + lo + hi - k + 1, C)
    y[b, t, c] = Σ_i x_padded[b, t + i, c] · w[i, c]
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dwconv1d_pallas", "dwconv1d_pallas_tiled", "dwconv1d_jnp"]


def dwconv1d_jnp(x, w, *, pads=(0, 0)):
    """Reference path: unrolled shifted-scaled adds with f32 accumulation."""
    lo, hi = pads
    xp = jnp.pad(x, [(0, 0), (lo, hi), (0, 0)])
    k = w.shape[0]
    t_out = xp.shape[1] - (k - 1)
    acc = None
    for i in range(k):
        # products in f32 (bf16×bf16 is exact in f32 — the MXU/VPU contract)
        term = xp[:, i : i + t_out, :].astype(jnp.float32) * w[i].astype(jnp.float32)
        acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


def _kernel(x_ref, w_ref, o_ref, *, k, t_out):
    acc = x_ref[:, 0:t_out, :].astype(jnp.float32) * w_ref[0]
    for i in range(1, k):
        acc = acc + x_ref[:, i : i + t_out, :].astype(jnp.float32) * w_ref[i]
    o_ref[...] = acc.astype(o_ref.dtype)


def dwconv1d_pallas(x, w, *, pads=(0, 0), block_rows: int = 8,
                    interpret: bool = False):
    """True depthwise conv1d; same contract as :func:`dwconv1d_jnp`.

    Requires C % 128 == 0 (clean lane tiling).  The (lo, hi) zero pad is
    applied host-side by XLA (one fused pad copy); every padded element is
    then read exactly once by the kernel.
    """
    b, t, c = x.shape
    k = w.shape[0]
    lo, hi = pads
    if c % 128 != 0:
        raise ValueError(f"dwconv1d_pallas needs C % 128 == 0, got C={c}")
    if w.shape != (k, c):
        raise ValueError(f"weight shape {w.shape} != (k, {c})")
    if w.dtype != x.dtype:
        raise TypeError(f"conv dtype mismatch: x {x.dtype} vs w {w.dtype}")
    xp = jnp.pad(x, [(0, 0), (lo, hi), (0, 0)])
    t_pad = t + lo + hi
    t_out = t_pad - (k - 1)
    if t_out <= 0:
        raise ValueError(f"non-positive output length {t_out}")

    # block over (batch rows, lane tiles); whole time axis stays in VMEM.
    itemsize = jnp.dtype(x.dtype).itemsize
    bytes_per_row = itemsize * 128 * (t_pad + t_out) + 4 * 128 * t_out  # in+out+acc
    tb = max(1, min(block_rows, (6 * 2**20) // max(bytes_per_row, 1), b))
    blocks = -(-b // tb)
    if blocks * tb != b:  # pad the batch axis; garbage rows are sliced away
        xp = jnp.pad(xp, [(0, blocks * tb - b), (0, 0), (0, 0)])

    out = pl.pallas_call(
        partial(_kernel, k=k, t_out=t_out),
        grid=(blocks, c // 128),
        in_specs=[
            pl.BlockSpec((tb, t_pad, 128), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 128), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, t_out, 128), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((blocks * tb, t_out, c), x.dtype),
        interpret=interpret,
    )(xp, w)
    return out[:b]


def _kernel_tiled(x_ref, w_ref, o_ref, scratch, sem, *, k, tile, n_rows, dilation):
    """One program computes a (tile, 128) output block for one (batch row,
    time tile, lane chunk): DMA the halo'd input strip from HBM into VMEM,
    then the k-tap shifted accumulate (all slices at static sublane offsets;
    dilation is just a tap-offset stride — no zero taps are spent)."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    ci = pl.program_id(2)
    start = pl.multiple_of(ti * tile, 8)  # tile is a multiple of 8
    dma = pltpu.make_async_copy(
        x_ref.at[bi, pl.ds(start, n_rows), pl.ds(ci * 128, 128)], scratch, sem
    )
    dma.start()
    dma.wait()
    rows = scratch[:]
    acc = rows[0:tile].astype(jnp.float32) * w_ref[0]
    for i in range(1, k):
        acc = acc + rows[i * dilation : i * dilation + tile].astype(jnp.float32) * w_ref[i]
    o_ref[0] = acc.astype(o_ref.dtype)


def dwconv1d_pallas_tiled(x, w, *, pads=(0, 0), tile: int = 256, dilation: int = 1,
                          interpret: bool = False):
    """Long-time-axis twin of :func:`dwconv1d_pallas` (same contract).

    The read-once kernel above blocks over (batch rows, lanes) with the whole
    time axis resident in VMEM — at MossFormer2-SS geometries (T≈3000) that
    degrades to one row per block and loses ~2.5× to lax.conv.  This variant
    grids over (batch, overlapping time tiles, lane chunks): each program
    manually DMAs a (tile + k - 1, 128) halo'd strip from HBM (overlapping
    input windows are inexpressible with blocked BlockSpecs) and emits one
    (tile, 128) output block, so hundreds of small programs pipeline instead
    of a handful of megablocks.  Reference op: the ff_convm / uv_conv / FSMN
    memory depthwise convs of
    /root/reference/MossFormer2_SS_16K/Export_MossFormer2_SS_16K.py.
    """
    b, t, c = x.shape
    k = w.shape[0]
    lo, hi = pads
    if c % 128 != 0:
        raise ValueError(f"dwconv1d_pallas_tiled needs C % 128 == 0, got C={c}")
    if tile % 8 != 0:
        raise ValueError(f"tile must be a multiple of 8, got {tile}")
    if w.shape != (k, c):
        raise ValueError(f"weight shape {w.shape} != (k, {c})")
    if w.dtype != x.dtype:
        raise TypeError(f"conv dtype mismatch: x {x.dtype} vs w {w.dtype}")
    span = (k - 1) * dilation  # receptive-field halo
    t_out = t + lo + hi - span
    if t_out <= 0:
        raise ValueError(f"non-positive output length {t_out}")
    nt = -(-t_out // tile)
    n_rows = -(-(tile + span) // 8) * 8  # DMA strip length, sublane-aligned
    # pad so every tile's halo'd strip exists: last DMA reads
    # [(nt-1)·tile, (nt-1)·tile + n_rows)
    xp = jnp.pad(x, [(0, 0), (lo, (nt - 1) * tile + n_rows - t - lo), (0, 0)])

    wf = w.astype(jnp.float32)  # taps are broadcast scalars per lane; keep f32
    out = pl.pallas_call(
        partial(_kernel_tiled, k=k, tile=tile, n_rows=n_rows, dilation=dilation),
        grid=(b, nt, c // 128),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, 128), lambda bi, ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, 128), lambda bi, ti, ci: (bi, ti, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nt * tile, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_rows, 128), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wf)
    return out[:, :t_out]
