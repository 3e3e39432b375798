"""FIR filtering as a banded-matrix GEMM — the MXU-native form of 1-channel
time-domain convolution.

A single-channel FIR (`lax.conv` with C_in = C_out = 1) utilises one MXU lane
in ~128 and is VPU/layout-bound on TPU.  Blocking the output into ``block``
-sample rows and multiplying by a banded constant matrix turns the same math
into a dense (n_blocks, block+k−1) × (block+k−1, block) GEMM that tiles the
systolic array perfectly.  Used by the MossFormer2-SR polyphase upsampler and
bandwidth-crossover (reference realises both as Conv(Transpose)1d,
/root/reference/MossFormer2_Super_Resolution/Export_MossFormer_SR.py:148-199).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["fir_gemm", "upsample_zero_stuff"]


@lru_cache(maxsize=None)
def _banded_np(taps: tuple, block: int) -> np.ndarray:
    """(block + k − 1, block) banded matrix B with B[p + t, p] = taps[t]."""
    k = len(taps)
    b = np.zeros((block + k - 1, block), np.float32)
    t = np.asarray(taps, np.float32)
    for p in range(block):
        b[p : p + k, p] = t
    b.flags.writeable = False  # cached: callers must not mutate
    return b


def fir_gemm(x: jnp.ndarray, taps: np.ndarray, *, left: int = 0,
             out_len: int | None = None, block: int = 512) -> jnp.ndarray:
    """``y[n] = Σ_t x[n + t − left] · taps[t]`` with zero padding outside.

    x: ``(..., L)`` float; taps: 1-D numpy (trace-time constant).
    ``out_len`` defaults to L.  Precision: the banded GEMM runs HIGHEST so the
    result matches the lax.conv formulation at f32.
    """
    k = int(len(taps))
    lead = x.shape[:-1]
    n_out = int(out_len) if out_len is not None else x.shape[-1]
    width = block + k - 1
    n_blocks = -(-n_out // block)
    # pad so every frame index n + t − left lands in bounds
    total = (n_blocks - 1) * block + width
    x = jnp.pad(x, [(0, 0)] * len(lead) + [(left, max(0, total - x.shape[-1] - left))])
    x = x[..., :total]
    # frame into overlapping (n_blocks, width) rows: reshape + shifted slices
    # (same zero-gather framing trick as dsp/stft.py:frame_signal with
    # hop=block, n_fft=width — kept inline because the padding geometry
    # differs: FIR pads for filter delay, STFT for centring)
    k_seg = -(-width // block)
    rows_needed = n_blocks + k_seg - 1
    row_total = rows_needed * block
    if row_total > total:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, row_total - total)])
    rows = x.reshape(*lead, rows_needed, block)
    segs = [rows[..., i : i + n_blocks, :] for i in range(k_seg)]
    frames = jnp.concatenate(segs, axis=-1)[..., :width]
    banded = jnp.asarray(_banded_np(tuple(np.asarray(taps, np.float32).tolist()), block))
    y = jnp.einsum("...bw,wp->...bp", frames, banded,
                   preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    return y.reshape(*lead, n_blocks * block)[..., :n_out]


def upsample_zero_stuff(x: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """Insert ``ratio − 1`` zeros after every sample: ``(..., L) → (..., ratio·L − (ratio−1))``.

    The zero-stuffed signal fed to :func:`fir_gemm` realises ConvTranspose1d
    (lhs-dilation) as a plain FIR.
    """
    lead = x.shape[:-1]
    n = x.shape[-1]
    stuffed = jnp.concatenate(
        [x[..., None], jnp.zeros((*lead, n, ratio - 1), x.dtype)], axis=-1
    ).reshape(*lead, n * ratio)
    return stuffed[..., : n * ratio - (ratio - 1)]
