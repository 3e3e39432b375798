"""Scan-based recurrent layers (GRU / LSTM), TPU-first.

The reference relies on cuDNN/ORT fused ``nn.GRU``/``nn.LSTM`` ops (e.g.
GTCRN's TRA attention and grouped dual-path GRUs,
/root/reference/GTCRN/Export_GTCRN.py:144-156,327-428; DFSMN-AEC's LSTMs).
Here recurrence is a ``lax.scan`` whose per-step work is only the hidden
matmul: the input projection for ALL timesteps is hoisted into one big
``(B*T, in) x (in, 3H)`` GEMM before the scan — that's the part the MXU can
tile; the scan carries just ``h @ w_hh``.

Weight layout (transposed from torch for right-multiplication):
  GRU   w_i: (in, 3H), w_h: (H, 3H), b_i/b_h: (3H,)   gate order r|z|n
  LSTM  w_i: (in, 4H), w_h: (H, 4H), b_i/b_h: (4H,)   gate order i|f|g|o
Zero initial state is the default — the reference strips exporter zero-state
scaffolding with graph surgery (Rewrite_ONNX_GRU_Zero_State); here it is
simply the scan's init carry, and a caller can pass real state for streaming.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .core import as_weight

__all__ = [
    "gru",
    "gru_bidir",
    "grouped_gru",
    "grouped_gru_bidir",
    "lstm",
    "init_gru",
    "init_lstm",
]


def _split3(a, h):
    return a[..., :h], a[..., h : 2 * h], a[..., 2 * h :]


def gru_cell(p, x, h):
    """One GRU step: x (..., in), h (..., H) → h' (..., H).

    Used by models that run their own recurrence (e.g. the NKF-AEC Kalman
    scan, where each Kalman frame advances four GRU states by one step)."""
    w_i, w_h = as_weight(p["w_i"]), as_weight(p["w_h"])  # q8 leaves: fused dequant
    hidden = w_h.shape[0]
    xt = jnp.matmul(x, w_i) + p["b_i"]
    gh = jnp.matmul(h, w_h) + p["b_h"]
    xr, xz, xn = _split3(xt, hidden)
    hr, hz, hn = _split3(gh, hidden)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru(p, x, h0=None, *, reverse: bool = False, return_state: bool = False):
    """GRU over ``x (B, T, in)`` → ``(B, T, H)`` (torch cell semantics)."""
    w_h = as_weight(p["w_h"])  # q8 leaves: fused dequant
    hidden = w_h.shape[0]
    xp = jnp.matmul(x, as_weight(p["w_i"])) + p["b_i"]  # (B, T, 3H)
    b_h = p["b_h"]
    if h0 is None:
        h0 = jnp.zeros(x.shape[:-2] + (hidden,), x.dtype)

    def step(h, xt):
        gh = jnp.matmul(h, w_h) + b_h
        xr, xz, xn = _split3(xt, hidden)
        hr, hz, hn = _split3(gh, hidden)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    # unroll amortises the TPU scan-loop overhead over several tiny hidden
    # matmuls per iteration (semantics-preserving)
    h_last, ys = lax.scan(step, h0, jnp.swapaxes(xp, 0, 1), reverse=reverse, unroll=8)
    ys = jnp.swapaxes(ys, 0, 1)
    return (ys, h_last) if return_state else ys


def gru_bidir(p_fwd, p_bwd, x, *, return_state: bool = False):
    """Bidirectional GRU; output is [forward ‖ backward] on the last axis."""
    yf = gru(p_fwd, x)
    yb = gru(p_bwd, x, reverse=True)
    y = jnp.concatenate([yf, yb], axis=-1)
    if return_state:
        return y, (yf[:, -1], yb[:, 0])
    return y


def _group_split(x, groups):
    b, t, c = x.shape
    return jnp.moveaxis(x.reshape(b, t, groups, c // groups), 2, 0)  # (G, B, T, C/G)


def _group_merge(y):
    g, b, t, h = y.shape
    return jnp.moveaxis(y, 0, 2).reshape(b, t, g * h)


def grouped_gru(p, x, *, groups: int, h0=None, return_state: bool = False):
    """Independent per-group GRUs via vmap; params stacked on a leading G axis.

    Matches the reference GRNN (two independent half-width GRUs whose outputs
    concatenate, /root/reference/GTCRN/Export_GTCRN.py:409-428) but
    generalised to G groups and executed as one batched scan.  ``h0``
    (G, B, H) threads streaming state through the groups.
    """
    xs = _group_split(x, groups)
    if h0 is None:
        y = jax.vmap(gru)(p, xs)
        if not return_state:
            return _group_merge(y)
        return _group_merge(y), y[..., -1, :]
    y, h_last = jax.vmap(lambda pp, v, h: gru(pp, v, h, return_state=True))(p, xs, h0)
    out = _group_merge(y)
    return (out, h_last) if return_state else out


def grouped_gru_bidir(p_fwd, p_bwd, x, *, groups: int):
    """Grouped bidirectional GRU.

    Per-group output is [fwd_g ‖ bwd_g]; groups concatenate after — the same
    channel order as running each group's bidirectional GRU independently.
    """
    xs = _group_split(x, groups)
    yf = jax.vmap(gru)(p_fwd, xs)
    yb = jax.vmap(lambda p, v: gru(p, v, reverse=True))(p_bwd, xs)
    return _group_merge(jnp.concatenate([yf, yb], axis=-1))


def _split4(a, h):
    return a[..., :h], a[..., h : 2 * h], a[..., 2 * h : 3 * h], a[..., 3 * h :]


def lstm(p, x, state=None, *, reverse: bool = False, return_state: bool = False):
    """LSTM over ``x (B, T, in)`` → ``(B, T, H)`` (torch cell semantics)."""
    w_h = as_weight(p["w_h"])  # q8 leaves: fused dequant
    hidden = w_h.shape[0]
    xp = jnp.matmul(x, as_weight(p["w_i"])) + p["b_i"]
    b_h = p["b_h"]
    if state is None:
        z = jnp.zeros(x.shape[:-2] + (hidden,), x.dtype)
        state = (z, z)

    def step(carry, xt):
        h, c = carry
        gh = jnp.matmul(h, w_h) + b_h
        xi, xf, xg, xo = _split4(xt, hidden)
        hi, hf, hg, ho = _split4(gh, hidden)
        i = jax.nn.sigmoid(xi + hi)
        f = jax.nn.sigmoid(xf + hf)
        g = jnp.tanh(xg + hg)
        o = jax.nn.sigmoid(xo + ho)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    last, ys = lax.scan(step, state, jnp.swapaxes(xp, 0, 1), reverse=reverse, unroll=8)
    ys = jnp.swapaxes(ys, 0, 1)
    return (ys, last) if return_state else ys


def init_gru(key, din, hidden):
    import numpy as np

    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(hidden)
    u = lambda k, sh: jax.random.uniform(k, sh, jnp.float32, -s, s)
    return {
        "w_i": u(k1, (din, 3 * hidden)),
        "w_h": u(k2, (hidden, 3 * hidden)),
        "b_i": u(k3, (3 * hidden,)),
        "b_h": u(k4, (3 * hidden,)),
    }


def init_lstm(key, din, hidden):
    import numpy as np

    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(hidden)
    u = lambda k, sh: jax.random.uniform(k, sh, jnp.float32, -s, s)
    return {
        "w_i": u(k1, (din, 4 * hidden)),
        "w_h": u(k2, (hidden, 4 * hidden)),
        "b_i": u(k3, (4 * hidden,)),
        "b_h": u(k4, (4 * hidden,)),
    }
