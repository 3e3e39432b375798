"""ICCRN building blocks shared by SDAEC and Deep-Echo AEC.

Parity targets: /root/reference/SDAEC/Export_SDAEC.py:64-145 (CFB, CepsUnit,
LayerNorm, CH_LSTM_F/T) and /root/reference/Deep_Echo_AEC/Export_Deep_Echo.py
(same family, eps 1e-8 and a rectangular-window conv realisation of the
cepstral DFT — identical math).

Layout: canonical channel-last (B, T, F, C) with F = 160 spectral bins
(NFFT=319).  The cepstral transform is a 160-point real DFT *over the
frequency axis* (quefrency F2 = 81 bins), realised as two matmuls with
numpy-precomputed bases (forward cos/−sin table; inverse = pseudo-inverse of
the stacked real/imag rows, /root/reference/SDAEC/Export_SDAEC.py:208-221).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import core
from .rnn import lstm

__all__ = [
    "iccrn_layer_norm",
    "ch_lstm_f",
    "ch_lstm_t",
    "ceps_unit",
    "cfb",
    "init_ch_lstm_f",
    "init_ch_lstm_t",
    "init_cfb",
    "init_iccrn_ln",
]


def iccrn_layer_norm(p, x, eps_base: float):
    """ICCRN LayerNorm: normalise over the (F, C) plane per (batch, frame)
    with UNBIASED variance (reference divides the centred energy by c*f−1,
    Export_SDAEC.py:131-145). p: w, b of shape (F, C)."""
    f, c = x.shape[-2], x.shape[-1]
    mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
    xc = x - mu
    var_u = jnp.sum(xc * xc, axis=(-2, -1), keepdims=True) / float(f * c - 1)
    return xc * lax.rsqrt(var_u + eps_base) * p["w"] + p["b"]


def ch_lstm_f(p, x, *, with_linear: bool = True):
    """Bidirectional LSTM over the frequency axis.

    x (B, T, F, C) → raw (B, T, F, 2*feat) or linear-projected (B, T, F, out).
    """
    b, t, f, c = x.shape
    seq = x.reshape(b * t, f, c)
    yf = lstm(p["fwd"], seq)
    yb = lstm(p["bwd"], seq, reverse=True)
    y = jnp.concatenate([yf, yb], axis=-1)
    if with_linear:
        y = core.dense(p["linear"], y)
    return y.reshape(b, t, f, -1)


def ch_lstm_t(p, x, *, with_linear: bool = True, state=None, return_state: bool = False):
    """Unidirectional (optionally stacked) LSTM over the time axis.

    x (B, T, F, C) → (B, T, F, out).  ``p['layers']`` is a list of LSTM params
    (the mid bottleneck uses num_layers=2, Export_SDAEC.py:195-197).
    ``state``: per-layer (h, c) pairs, each (B·F, hidden) — carries the time
    recurrence across streaming chunks.
    """
    b, t, f, c = x.shape
    seq = jnp.swapaxes(x, 1, 2).reshape(b * f, t, c)
    new_state = []
    for i, lp in enumerate(p["layers"]):
        seq, last = lstm(lp, seq, None if state is None else state[i], return_state=True)
        new_state.append(last)
    if with_linear:
        seq = core.dense(p["linear"], seq)
    out = jnp.swapaxes(seq.reshape(b, f, t, -1), 1, 2)
    return (out, new_state) if return_state else out


@lru_cache(maxsize=None)
def _ceps_bases(n: int = 160):
    """(forward (n, 2*F2), inverse (2*F2, n)) cepstral DFT bases, float64."""
    bins = n // 2 + 1
    t = np.arange(n, dtype=np.float64)[:, None]
    f = np.arange(bins, dtype=np.float64)[None, :]
    omega = 2.0 * np.pi * t * f / n
    fwd = np.concatenate([np.cos(omega), -np.sin(omega)], axis=1)  # (n, 2*bins)
    stack = np.concatenate([np.cos(omega).T, -np.sin(omega).T], axis=0)  # (2*bins, n)
    inv = np.linalg.pinv(stack)  # (n, 2*bins)
    return fwd.astype(np.float32), inv.T.astype(np.float32)  # inv.T: (2*bins, n)


def ceps_unit(p, x, eps_base: float):
    """Cepstral gating: 160-pt real DFT over F → LN → bidir LSTM over
    quefrency → complex product with the cepstral spectrum → inverse DFT.
    x (B, T, 160, C) → (B, T, 160, C)."""
    n = x.shape[-2]
    ch = x.shape[-1]
    fwd, inv = _ceps_bases(n)
    bins = n // 2 + 1
    spec = jnp.einsum("...fc,fk->...kc", x, jnp.asarray(fwd),
                      preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    # (B, T, 2*bins, C) block layout [re_bins | im_bins] → (B, T, bins, 2C)
    re, im = spec[..., :bins, :], spec[..., bins:, :]
    pair = jnp.concatenate([re, im], axis=-1)
    gate = ch_lstm_f(p["lstm"], iccrn_layer_norm(p["ln"], pair, eps_base))
    gr, gi = gate[..., :ch], gate[..., ch:]
    out_re = gr * re - gi * im
    out_im = gr * im + gi * re
    packed = jnp.concatenate([out_re, out_im], axis=-2)  # (B, T, 2*bins, C)
    return jnp.einsum("...kc,kf->...fc", packed, jnp.asarray(inv),
                      preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)


def cfb(p, x, eps_base: float):
    """Convolutional-fusion block (Export_SDAEC.py:64-93):
    gate = σ(1×1(LN0 x)); h = 1×1(x); y = conv_F3(LN1(g·h)) + CepsUnit(LN2(h − g·h))."""
    g = jax.nn.sigmoid(core.dense(p["gate"], iccrn_layer_norm(p["ln0"], x, eps_base)))
    h = core.dense(p["input"], x)
    gx = g * h
    y = core.conv2d(p["conv"], iccrn_layer_norm(p["ln1"], gx, eps_base), padding=(0, 1))
    return y + ceps_unit(p["ceps"], iccrn_layer_norm(p["ln2"], h - gx, eps_base), eps_base)


# ─────────────────────────────────────────────────────────────────────────────
# Init
# ─────────────────────────────────────────────────────────────────────────────


def init_iccrn_ln(f, c):
    return {"w": jnp.ones((f, c)), "b": jnp.zeros((f, c))}


def init_ch_lstm_f(key, c_in, feat, out=None):
    from .rnn import init_lstm

    k1, k2, k3 = jax.random.split(key, 3)
    p = {"fwd": init_lstm(k1, c_in, feat), "bwd": init_lstm(k2, c_in, feat)}
    if out is not None:
        p["linear"] = core.init_dense(k3, 2 * feat, out)
    return p


def init_ch_lstm_t(key, c_in, feat, out=None, num_layers=1):
    from .rnn import init_lstm

    ks = jax.random.split(key, num_layers + 1)
    layers = []
    d = c_in
    for i in range(num_layers):
        layers.append(init_lstm(ks[i], d, feat))
        d = feat
    p = {"layers": layers}
    if out is not None:
        p["linear"] = core.init_dense(ks[-1], feat, out)
    return p


def init_cfb(key, c_in, c_out, f=160, f2=81):
    ks = jax.random.split(key, 5)
    return {
        "gate": core.init_dense(ks[0], c_in, c_out),
        "input": core.init_dense(ks[1], c_in, c_out),
        "conv": core.init_conv2d(ks[2], 1, 3, c_out, c_out),
        "ln0": init_iccrn_ln(f, c_in),
        "ln1": init_iccrn_ln(f, c_out),
        "ln2": init_iccrn_ln(f, c_out),
        "ceps": {
            "ln": init_iccrn_ln(f2, 2 * c_out),
            "lstm": init_ch_lstm_f(ks[3], 2 * c_out, c_out, 2 * c_out),
        },
    }
