"""Pallas TPU kernel: fused framing + windowed-DFT STFT.

The jnp path (audiojax.dsp.stft) frames with shifted slices and matmuls with
the DFT basis; XLA materialises the (B, T, n_fft) frame tensor in HBM between
the two steps.  This kernel fuses them: each grid program DMAs one aligned
strip of hop-sized audio rows into VMEM, materialises the overlapped frames
with ``pltpu.roll`` (sublane rotations — Mosaic forbids unaligned vector
slices), and feeds the MXU directly.  The frame tensor never exists in HBM,
cutting STFT traffic by ~n_fft/hop.

Caller contract matches ``dsp.stft_packed`` (centre padding included).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dsp.stft import (StftConfig, _inv_win_sum_np, _istft_basis_np, _stft_basis_np,
                        pad_center)

__all__ = [
    "stft_packed_pallas",
    "istft_packed_pallas",
    "pallas_supported",
    "fast_stft_packed",
    "fast_istft_packed",
]


def pallas_supported(cfg: StftConfig) -> bool:
    """The kernel's VMEM strip uses hop-wide lanes: hop must be 128-aligned."""
    return cfg.hop % 128 == 0


def fast_stft_packed(x, cfg: StftConfig):
    """Pallas-fused STFT on TPU when the geometry allows; jnp path otherwise."""
    import jax as _jax

    from ..dsp.stft import stft_packed as _jnp_stft

    if (pallas_supported(cfg) and _jax.default_backend() == "tpu"
            and x.ndim == 2 and x.dtype == jnp.float32):  # kernel contract
        return stft_packed_pallas(x, cfg)
    return _jnp_stft(x, cfg)


def fast_istft_packed(spec, cfg: StftConfig, out_length: int | None = None):
    """Pallas-fused ISTFT on TPU when the geometry allows; jnp path otherwise."""
    import jax as _jax

    from ..dsp.stft import istft_packed as _jnp_istft

    if (pallas_supported(cfg) and _jax.default_backend() == "tpu"
            and spec.ndim == 3 and spec.dtype == jnp.float32):  # kernel contract
        return istft_packed_pallas(spec, cfg, out_length=out_length)
    return _jnp_istft(spec, cfg, out_length)


def _kernel(x_ref, basis_ref, o_ref, scratch, sem, *, hop, n_fft, tb, n_rows, k_seg):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    start = pl.multiple_of(i * tb, 8)  # tb is a multiple of 8
    dma = pltpu.make_async_copy(x_ref.at[bi, pl.ds(start, n_rows)], scratch, sem)
    dma.start()
    dma.wait()

    rows = scratch[:]
    parts = [pltpu.roll(rows, (n_rows - k) % n_rows, 0)[:tb] for k in range(k_seg)]  # +shift only
    frames = jnp.concatenate(parts, axis=-1)[:, :n_fft]
    o_ref[0] = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)


def stft_packed_pallas(x: jnp.ndarray, cfg: StftConfig, *, frames_per_block: int = 128,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, L) float32 → packed (B, T, 2F); same contract as dsp.stft_packed."""
    x = pad_center(x, cfg)
    b, padded = x.shape
    n_t = (padded - cfg.n_fft) // cfg.hop + 1
    fb2 = 2 * cfg.f_bins

    tb = min(frames_per_block, -(-n_t // 8) * 8)
    tb = -(-tb // 8) * 8  # the kernel's pl.multiple_of(i·tb, 8) hint requires it
    blocks = -(-n_t // tb)
    k_seg = -(-cfg.n_fft // cfg.hop)
    n_rows = -(-(tb + k_seg - 1) // 8) * 8  # aligned strip height
    # pad so the last block's strip stays in bounds, then view as hop rows
    need = ((blocks - 1) * tb + n_rows) * cfg.hop
    if need > padded:
        x = jnp.pad(x, [(0, 0), (0, need - padded)])
    x = x[:, :need].reshape(b, need // cfg.hop, cfg.hop)

    basis = jnp.asarray(_stft_basis_np(cfg))
    kernel = partial(_kernel, hop=cfg.hop, n_fft=cfg.n_fft, tb=tb,
                     n_rows=n_rows, k_seg=k_seg)
    out = pl.pallas_call(
        kernel,
        grid=(b, blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # sliced via DMA in-kernel
            pl.BlockSpec((cfg.n_fft, fb2), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, fb2), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, blocks * tb, fb2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_rows, cfg.hop), jnp.float32), pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(x, basis)
    return out[:, :n_t]


def _ikernel(spec_ref, ibasis_ref, o_ref, scratch, sem, *, hop, n_fft, tb, n_rows, k_seg):
    """One program emits ``tb`` hop-rows of raw overlap-added audio.

    Reads ``n_rows = tb + k_seg - 1`` zero-front-padded spectral frames (the
    k_seg−1 halo supplies cross-block overlap), iDFT-matmuls them on the MXU,
    and overlap-adds via k_seg sublane rotations — the (B, T, n_fft) frame
    tensor never exists in HBM (the transposed twin of ``_kernel`` above)."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    start = pl.multiple_of(i * tb, 8)  # tb is a multiple of 8
    dma = pltpu.make_async_copy(spec_ref.at[bi, pl.ds(start, n_rows)], scratch, sem)
    dma.start()
    dma.wait()

    frames = jnp.dot(scratch[:], ibasis_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (n_rows, n_fft)
    if k_seg * hop > n_fft:
        frames = jnp.pad(frames, [(0, 0), (0, k_seg * hop - n_fft)])
    acc = jnp.zeros((tb, hop), jnp.float32)
    for k in range(k_seg):
        seg = frames[:, k * hop : (k + 1) * hop]
        # out_row[r] += frames_padded[r + (k_seg-1-k)].segment[k]
        shift = k_seg - 1 - k
        acc = acc + pltpu.roll(seg, (n_rows - shift) % n_rows, 0)[:tb]
    o_ref[0] = acc


def istft_packed_pallas(spec: jnp.ndarray, cfg: StftConfig, *, out_length: int | None = None,
                        frames_per_block: int = 128, interpret: bool = False) -> jnp.ndarray:
    """Packed (B, T, 2F) → (B, L_out); same contract as ``dsp.istft_packed``.

    The kernel fuses the iDFT matmul with the overlap-add (halo pattern over
    hop-rows); COLA reciprocal and centre trim stay host-graph-side where XLA
    fuses them into the consumer."""
    b, n_t, fb2 = spec.shape
    k_seg = -(-cfg.n_fft // cfg.hop)
    m_rows = n_t + k_seg - 1  # raw OLA hop-rows
    tb = min(frames_per_block, -(-m_rows // 8) * 8)
    tb = -(-tb // 8) * 8  # the kernel's pl.multiple_of(i·tb, 8) hint requires it
    blocks = -(-m_rows // tb)
    n_rows = -(-(tb + k_seg - 1) // 8) * 8  # aligned halo strip height
    need = (blocks - 1) * tb + n_rows
    # zero-front pad k_seg-1 frames (halo for row 0) + tail pad to the strip grid
    front = k_seg - 1
    # tail >= k_seg-1 always: need = (blocks-1)·tb + n_rows ≥ m_rows + k_seg−1
    # = n_t + 2·front, so the pad below never truncates
    tail = need - (n_t + front)
    # Mosaic HBM slices need 128-aligned lanes: zero-pad the 2F axis (and the
    # matching ibasis rows — zero rows contribute nothing to the iDFT matmul)
    fb2_pad = -(-fb2 // 128) * 128
    spec_p = jnp.pad(spec, [(0, 0), (front, tail), (0, fb2_pad - fb2)])

    ibasis = jnp.asarray(_istft_basis_np(cfg))
    if fb2_pad != fb2:
        ibasis = jnp.pad(ibasis, [(0, fb2_pad - fb2), (0, 0)])
    kernel = partial(_ikernel, hop=cfg.hop, n_fft=cfg.n_fft, tb=tb,
                     n_rows=n_rows, k_seg=k_seg)
    out = pl.pallas_call(
        kernel,
        grid=(b, blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # sliced via DMA in-kernel
            pl.BlockSpec((fb2_pad, cfg.n_fft), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, cfg.hop), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, blocks * tb, cfg.hop), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_rows, fb2_pad), jnp.float32), pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(spec_p, ibasis)

    raw_len = cfg.n_fft + cfg.hop * (n_t - 1)
    raw = out.reshape(b, blocks * tb * cfg.hop)[:, :raw_len]
    start = cfg.half if cfg.center else 0
    if out_length is not None:
        # reference semantics (SDAEC/STFT_Process.py:178): exactly out_length
        # samples from out_start, extending into the right centre-pad region
        end = start + out_length
    else:
        end = raw_len - start
    y = raw[:, start:end]
    inv = jnp.asarray(_inv_win_sum_np(cfg, n_t, out_length))
    return y * inv
