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

from ..dsp.stft import StftConfig, _stft_basis_np, pad_center

__all__ = ["stft_packed_pallas", "pallas_supported", "fast_stft_packed"]


def pallas_supported(cfg: StftConfig) -> bool:
    """The kernel's VMEM strip uses hop-wide lanes: hop must be 128-aligned."""
    return cfg.hop % 128 == 0


def fast_stft_packed(x, cfg: StftConfig):
    """Pallas-fused STFT on TPU when the geometry allows; jnp path otherwise."""
    import jax as _jax

    from ..dsp.stft import stft_packed as _jnp_stft

    if pallas_supported(cfg) and _jax.default_backend() == "tpu":
        return stft_packed_pallas(x, cfg)
    return _jnp_stft(x, cfg)


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

    tb = min(frames_per_block, -(-n_t // 8) * 8)  # sublane-aligned block
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
