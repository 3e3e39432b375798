"""Zipformer2 blocks for ZipEnhancer (ModelScope zipenhancer_layers parity).

Parity target: the export-friendly forwards of
/root/reference/ZipEnhancer/Export_ZipEnhancer.py:118-355 — BiasNorm, SwooshL/R,
rel-position multi-head attention weights with the "skew" relative shift,
NonlinAttention (head-0 weights), SelfAttention, gated ConvolutionModule,
BypassModule, SimpleDownsample (softmax-weighted frame pooling) and
SimpleUpsample (nearest repeat), plus icefall's CompactRelPositionalEncoding
table.

Layout: (N, S, C) batch-major sequences (N = folded batch × cross axis).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from . import core
from ..ops.attention_pallas import pos_stride, relpos_scores

__all__ = [
    "swoosh_l",
    "swoosh_r",
    "bias_norm",
    "compact_rel_pos",
    "attention_weights",
    "self_attention",
    "nonlin_attention",
    "conv_module",
    "bypass",
    "simple_downsample",
    "simple_upsample",
    "zipformer_layer",
    "init_zipformer_layer",
]


def swoosh_l(x):
    """SwooshL(x) = softplus(x − 4) − 0.08x − 0.035."""
    return jax.nn.softplus(x - 4.0) - 0.08 * x - 0.035


def swoosh_r(x):
    """SwooshR(x) = softplus(x − 1) − 0.08x − 0.313261687."""
    return jax.nn.softplus(x - 1.0) - 0.08 * x - 0.313261687


def bias_norm(p, x):
    """BiasNorm: exp(log_scale) · x / rms(x − bias) over the channel axis."""
    rms = jnp.sqrt(jnp.mean(jnp.square(x - p["bias"]), axis=-1, keepdims=True))
    return x / rms * jnp.exp(p["log_scale"])


@lru_cache(maxsize=None)
def _compact_rel_pos_np(length: int, embed_dim: int, length_factor: float = 1.0) -> np.ndarray:
    """icefall CompactRelPositionalEncoding table: (2·length − 1, embed_dim).

    Relative offsets are log-compressed then atan-squashed; even columns carry
    cosines, odd columns sines, and the last column is 1.
    """
    t = np.arange(-(length - 1), length, dtype=np.float64)
    compression = embed_dim**0.5
    x = np.sign(t) * compression * (np.log(np.abs(t) + compression) - np.log(compression))
    x = np.arctan(x / (length_factor * embed_dim**0.5))
    freqs = 1.0 + np.arange(embed_dim // 2, dtype=np.float64)
    ang = x[:, None] * freqs[None, :]
    pe = np.zeros((len(t), embed_dim), dtype=np.float64)
    pe[:, 0::2] = np.cos(ang)
    pe[:, 1::2] = np.sin(ang)
    pe[:, -1] = 1.0
    return pe.astype(np.float32)


def compact_rel_pos(length: int, embed_dim: int) -> jnp.ndarray:
    return jnp.asarray(_compact_rel_pos_np(length, embed_dim))


def _rel_shift(pos_scores, seq_len: int):
    """Skew trick (Export_ZipEnhancer.py:270-284):
    out[..., i, j] = pos_scores[..., i, seq_len−1−i+j].

    Kept for reference/tests; the attention path below instead gathers the
    positional table BEFORE the contraction so the huge (N, H, S, 2S−1)
    intermediate is never materialised (it dominated HBM on long clips)."""
    n, h, s, s2 = pos_scores.shape
    x = jnp.concatenate([pos_scores[..., :1], pos_scores], axis=-1)
    x = x.reshape(n, h, s2 + 1, s)
    x = x[:, :, 1:, :]
    x = x.reshape(n, h, s, s2)
    return x[..., :seq_len]


@lru_cache(maxsize=None)
def _rel_index_np(s: int) -> np.ndarray:
    """idx[i, j] = s−1−i+j into the (2s−1)-row positional table."""
    i = np.arange(s)[:, None]
    j = np.arange(s)[None, :]
    return (s - 1 - i + j).astype(np.int32)


def attention_weights(p, x, pos, *, num_heads: int, query_head_dim: int, pos_head_dim: int):
    """RelPositionMultiheadAttentionWeights → softmax scores (N, H, S, S).

    ``p['in_proj']`` maps C → [Q(H·q) | K(H·q) | P(H·stride)] with each head's
    P slot zero-padded from pos_head_dim to an 8-lane stride (the importer
    pre-permutes the export's packed layout into this order,
    importers/zipenhancer.py:_repack_attn_in_proj): q/k/pp below are
    contiguous lane slices — no per-head gather/reshape materialisation and
    no runtime pad; ``p['linear_pos']`` maps pos_emb → H·p.
    """
    n, s, _ = x.shape
    hd = num_heads * query_head_dim
    stride = pos_stride(pos_head_dim)
    proj = core.dense(p["in_proj"], x)  # (N, S, 2·H·D + H·stride)
    # lane-packed (N, S, H·D) layouts — no (N, H, S, D) transpose: H·D = 128
    # at the model shape, so the fused kernel's VMEM blocks pad-free (see
    # ops/attention_pallas.py layout note)
    q = proj[..., :hd]
    k = proj[..., hd : 2 * hd]
    pp = proj[..., 2 * hd :]  # (N, S, H·stride); slot tails are never read

    pe = core.dense(p["linear_pos"], pos)  # (2S−1, H·pos_head)
    pe = pe.reshape(-1, num_heads, pos_head_dim)
    # gather the relative table into (S, S, H, P) BEFORE contracting: a few MB
    # instead of the skew trick's (N, H, S, 2S−1) HBM monster; transpose to
    # (H, P, S, S) so the fused kernel's table stays VMEM-resident
    pe_mat = jnp.transpose(pe[jnp.asarray(_rel_index_np(s))], (2, 3, 0, 1))
    # QKᵀ + positional bias + f32 softmax.  XLA's fused lowering measured at
    # the floor for this stage on-chip: a one-HBM-pass Pallas kernel ties it
    # standalone but loses in-context (see ops/attention_pallas.py and
    # PROFILES.md) — so this dispatches to the jnp path everywhere.
    return relpos_scores(q, k, pp, pe_mat, num_heads=num_heads)


def self_attention(p, x, attn, *, num_heads: int):
    """Apply shared attention weights to a value projection.

    The einsum keeps values and outputs in lane-packed (N, S, H, V) layout —
    no (N, H, S, V) transposes on either side of the mix."""
    n, s, _ = x.shape
    v = core.dense(p["in_proj"], x).reshape(n, s, num_heads, -1)
    y = jnp.einsum("nhij,njhv->nihv", attn, v, preferred_element_type=jnp.float32)
    y = y.reshape(n, s, -1).astype(x.dtype)
    return core.dense(p["out_proj"], y)


def nonlin_attention(p, x, attn0):
    """NonlinAttention: tanh-gated value path mixed by head-0 weights."""
    h = core.dense(p["in_proj"], x)
    hidden = h.shape[-1] // 3
    s, mid, y = h[..., :hidden], h[..., hidden : 2 * hidden], h[..., 2 * hidden :]
    mid = jnp.tanh(s) * mid
    mid = jnp.einsum("nij,njc->nic", attn0, mid, preferred_element_type=jnp.float32).astype(x.dtype)
    return core.dense(p["out_proj"], mid * y)


def conv_module(p, x):
    """Gated ConvolutionModule: in_proj → (value, σ gate) → depthwise conv →
    SwooshR → out_proj."""
    h = core.dense(p["in_proj"], x)
    c = h.shape[-1] // 2
    mid = h[..., :c] * jax.nn.sigmoid(h[..., c:])
    k = p["dw"]["w"].shape[0]
    mid = core.conv1d(p["dw"], mid, padding=(k - 1) // 2, groups=c)
    return core.dense(p["out_proj"], swoosh_r(mid))


def bypass(scale, src_orig, src):
    """BypassModule: src_orig + (src − src_orig) · scale (per channel)."""
    return src_orig + (src - src_orig) * scale


def simple_downsample(p, x, factor: int):
    """Softmax-weighted pooling of ``factor`` frames (last frame replicated to
    pad). x: (N, S, C) → (N, ceil(S/factor), C)."""
    n, s, c = x.shape
    ds = -(-s // factor)
    pad = ds * factor - s
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[:, -1:], pad, axis=1)], axis=1)
    w = jax.nn.softmax(p["bias"], axis=0).reshape(1, 1, factor, 1)
    return jnp.sum(x.reshape(n, ds, factor, c) * w, axis=2)


def simple_upsample(x, factor: int):
    return jnp.repeat(x, factor, axis=1)


def _feed_forward(p, x, act=swoosh_l):
    return core.dense(p["out"], act(core.dense(p["in"], x)))


def zipformer_layer(p, x, pos, *, num_heads: int, query_head_dim: int, pos_head_dim: int):
    """One Zipformer2 encoder layer (Export_ZipEnhancer.py:143-187).

    The final BiasNorm + layer bypass are explicit (the export pre-folds their
    scales); an enclosing dual-path bypass, if any, is the caller's job.
    """
    src_orig = x
    attn = attention_weights(p["attn"], x, pos, num_heads=num_heads,
                             query_head_dim=query_head_dim, pos_head_dim=pos_head_dim)
    x = x + _feed_forward(p["ff1"], x)
    x = x + nonlin_attention(p["nonlin"], x, attn[:, 0])
    x = x + self_attention(p["sa1"], x, attn, num_heads=num_heads)
    x = x + conv_module(p["conv1"], x)
    x = x + _feed_forward(p["ff2"], x)
    x = bypass(p["bypass_mid"], src_orig, x)
    x = x + self_attention(p["sa2"], x, attn, num_heads=num_heads)
    x = x + conv_module(p["conv2"], x)
    x = x + _feed_forward(p["ff3"], x, act=swoosh_l)
    x = bias_norm(p["norm"], x)
    return bypass(p["bypass"], src_orig, x)


def init_zipformer_layer(key, dim, *, num_heads=4, query_head_dim=32, pos_head_dim=4,
                         value_head_dim=12, ff_hidden=None, nonlin_hidden=None,
                         conv_kernel=31, pos_dim=48):
    ff_hidden = ff_hidden or 3 * dim // 2
    nonlin_hidden = nonlin_hidden or 3 * dim // 4
    ks = jax.random.split(key, 22)
    ff = lambda k1, k2: {"in": core.init_dense(k1, dim, ff_hidden), "out": core.init_dense(k2, ff_hidden, dim)}
    sa = lambda k1, k2: {
        "in_proj": core.init_dense(k1, dim, num_heads * value_head_dim),
        "out_proj": core.init_dense(k2, num_heads * value_head_dim, dim),
    }
    cm = lambda k1, k2, k3: {
        "in_proj": core.init_dense(k1, dim, 2 * dim),
        "dw": core.init_conv1d(k2, conv_kernel, dim, dim, groups=dim),
        "out_proj": core.init_dense(k3, dim, dim),
    }
    return {
        "attn": {
            # [Q | K | P] contiguous-lane packing; each head's P slot is
            # stride-8 padded (tail columns unread — see attention_weights)
            "in_proj": core.init_dense(
                ks[0], dim,
                num_heads * (2 * query_head_dim + pos_stride(pos_head_dim))),
            "linear_pos": core.init_dense(ks[1], pos_dim, num_heads * pos_head_dim, bias=False),
        },
        "ff1": ff(ks[2], ks[3]),
        "ff2": ff(ks[4], ks[5]),
        "ff3": ff(ks[6], ks[7]),
        "nonlin": {
            "in_proj": core.init_dense(ks[8], dim, 3 * nonlin_hidden),
            "out_proj": core.init_dense(ks[9], nonlin_hidden, dim),
        },
        "sa1": sa(ks[10], ks[11]),
        "sa2": sa(ks[12], ks[13]),
        "conv1": cm(ks[14], ks[15], ks[16]),
        "conv2": cm(ks[17], ks[18], ks[19]),
        "bypass_mid": jnp.full((dim,), 0.5),
        "bypass": jnp.full((dim,), 0.5),
        "norm": {"bias": jnp.zeros((dim,)), "log_scale": jnp.zeros(())},
    }
