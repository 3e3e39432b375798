"""int16 PCM contract helpers + in-graph linear resampling.

Every model graph shares the reference I/O conventions (SURVEY.md §2.3):
int16 PCM in → scale by 1/32768 → (optional DC removal / resample) → network
→ ×32767 → clamp → int16 PCM out, with the clamp staged through int32 so a
half-precision build cannot overflow before the cast
(/root/reference/MossFormer2_SS_16K/Export_MossFormer2_SS_16K.py:649-653).
"""
from __future__ import annotations

import jax.numpy as jnp

INV_INT16 = 1.0 / 32768.0
PCM_OUT_SCALE = 32767.0

__all__ = [
    "INV_INT16",
    "PCM_OUT_SCALE",
    "pcm_in",
    "pcm_out",
    "remove_dc",
    "resample_linear",
    "fold_windows",
    "unfold_windows",
]


def pcm_in(audio) -> jnp.ndarray:
    """int16 (or float-typed int16-range) samples → float32 in [-1, 1)."""
    return audio.astype(jnp.float32) * INV_INT16


def pcm_out(x, dtype=jnp.int16) -> jnp.ndarray:
    """float in [-1, 1] → int16 PCM with int32-staged clamp.

    The scale/clip runs in f32 regardless of input dtype: 32767 is not
    representable in bf16 (rounds to 32768), so a bf16-domain clip would let
    full-scale positives wrap to −32768 at the int16 cast."""
    y = x.astype(jnp.float32) * PCM_OUT_SCALE
    y = jnp.clip(y, -32768.0, 32767.0)
    if dtype == jnp.int16:
        return y.astype(jnp.int32).astype(jnp.int16)
    return y.astype(dtype)


def remove_dc(x) -> jnp.ndarray:
    """Subtract the per-signal mean (reference removes the DC offset over the
    whole clip, /root/reference/GTCRN/Export_GTCRN.py:647)."""
    return x - jnp.mean(x, axis=-1, keepdims=True)


def resample_linear(x, out_length: int) -> jnp.ndarray:
    """Linear resample of ``(..., L)`` to ``out_length`` samples.

    Matches ``F.interpolate(mode='linear', align_corners=False)``: output
    sample i reads input coordinate (i + 0.5) * L/out - 0.5, edge-clamped.
    Realised as two static gathers + lerp (out_length is static, so XLA sees
    constant index tensors).
    """
    length = x.shape[-1]
    if out_length == length:
        return x
    import numpy as np

    coords = (np.arange(out_length, dtype=np.float64) + 0.5) * (length / out_length) - 0.5
    coords = np.clip(coords, 0.0, length - 1)
    i0 = np.floor(coords).astype(np.int32)
    i1 = np.minimum(i0 + 1, length - 1)
    frac = (coords - i0).astype(np.float32)
    return x[..., i0] * (1.0 - jnp.asarray(frac)) + x[..., i1] * jnp.asarray(frac)


def fold_windows(x, window: int) -> jnp.ndarray:
    """Batch-fold ``(B, L=k*window)`` → ``(B*k, window)`` (SURVEY §2.0: the
    in-graph data parallelism over time windows)."""
    b, length = x.shape
    assert length % window == 0, f"length {length} not a multiple of window {window}"
    return x.reshape(b * (length // window), window)


def unfold_windows(x, batch: int) -> jnp.ndarray:
    """Inverse of :func:`fold_windows`: ``(B*k, W)`` → ``(B, k*W)``."""
    bk, w = x.shape
    return x.reshape(batch, (bk // batch) * w)
