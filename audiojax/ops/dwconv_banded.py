"""True depthwise 1-D convolution as a per-channel banded-matrix GEMM (MXU).

The Pallas read-once kernel (:mod:`.dwconv_pallas`) runs the k-tap
shift-multiply-accumulate on the VPU — at the MossFormerGAN FFConvM/FSMN
geometries that is VPU-compute-bound (k sequential f32 tap-FMAs over the
whole map).  This op moves the taps onto the MXU instead: for each channel
``c`` the convolution is a (T_pad × T_out) *banded matrix* product

    y[b, t, c] = Σ_p x_pad[b, p, c] · Wb[c, p, t],   Wb[c, t+i, t] = w[i, c]

i.e. a C-batched (B, T_pad) @ (T_pad, T_out) GEMM.  The band wastes
K/k = T_pad/k of the MXU's multiplies on structural zeros, but the MXU's
throughput advantage over the VPU is far larger than that waste at k ≤ 64 —
the same trade :mod:`audiojax.dsp.fir` makes for 1-channel FIR filters
(/root/reference/MossFormer2_Super_Resolution/Export_MossFormer_SR.py:148-170
is the reference's FIR analog), generalized to per-channel weights.

Measured (v5e, MossFormerGAN geometries, vs the Pallas kernel standalone):
(964, 98, 256) k=31: 2.19 → 1.27 ms · (404, 238, 256) k=31: 2.32 → 1.73 ms ·
(964, 98, 128) k=39: 1.88 → 1.05 ms · (404, 238, 128) k=39: 2.09 → 1.09 ms.
In the full MossFormerGAN bf16 forward, routing the FFConvM + FSMN memory
convs (1-D and the dense-block frequency-axis 2-D ones) here while KEEPING
the Pallas kernel for the GAU ConvModules takes 110.7 → 90.4 ms (−18%).
Under f32 compute the GEMM needs ``Precision.HIGHEST`` (the default-precision
bf16-operand passes would round the conv ~2e-3 rel) whose extra passes cancel
the win — so ``nn.core`` honors the banded route ONLY for bf16 activations.

Contract (matches ``core.conv1d`` with groups == C, stride 1, dilation 1):
    x (B, T, C), w (k, C)  →  y (B, T + lo + hi - k + 1, C)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dwconv1d_banded"]


def _band_eye_np(k: int, t_pad: int, t_out: int) -> np.ndarray:
    """E[i, p, t] = 1 iff p == t + i — the k shifted identities whose
    w-weighted sum is the banded matrix."""
    return np.stack([np.eye(t_pad, t_out, -i, dtype=np.float32) for i in range(k)])


def dwconv1d_banded(x, w, *, pads=(0, 0)):
    """Depthwise conv1d via C-batched banded GEMM; same contract as
    ``dwconv_pallas.dwconv1d_pallas`` (any C — no lane-multiple constraint)."""
    b, t, c = x.shape
    k = w.shape[0]
    lo, hi = pads
    if w.shape != (k, c):
        raise ValueError(f"weight shape {w.shape} != (k, {c})")
    if w.dtype != x.dtype:
        raise TypeError(f"conv dtype mismatch: x {x.dtype} vs w {w.dtype}")
    xp = jnp.pad(x, [(0, 0), (lo, hi), (0, 0)])
    t_pad = t + lo + hi
    t_out = t_pad - (k - 1)
    if t_out <= 0:
        raise ValueError(f"non-positive output length {t_out}")
    e = jnp.asarray(_band_eye_np(k, t_pad, t_out), x.dtype)
    # banded weights: exact placement of w into the band (one-hot contraction;
    # HIGHEST keeps f32 w entries bit-exact through the bf16-operand split)
    wb = jnp.einsum("kc,kpt->cpt", w, e, precision=jax.lax.Precision.HIGHEST)
    # the conv itself: bf16 operands hit the MXU single-pass with f32
    # accumulation (the same contract as the Pallas kernel's accumulator);
    # f32 operands take HIGHEST for unrounded taps (callers route f32
    # elsewhere for speed — see module docstring)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    if x.dtype == jnp.bfloat16 and jax.default_backend() != "tpu":
        # XLA:CPU has no BF16×BF16→F32 dot thunk; f32 operands give the same
        # products (bf16 values are exact in f32) on the test backend
        xp, wb = xp.astype(jnp.float32), wb.astype(jnp.float32)
    y = jnp.einsum("bpc,cpt->btc", xp, wb,
                   preferred_element_type=jnp.float32, precision=prec)
    return y.astype(x.dtype)
