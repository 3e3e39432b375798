"""Weight-only int8 quantization — the reference's DYNAMIC_Q8 plan equivalent.

The reference's dynamic INT8 quantization helps exactly one model
(Mel-Band-Roformer) and hurts the rest (/root/reference/README.md:93, kept as
a behaviour note in BASELINE.md).  The TPU-native analog is weight-only
symmetric int8: weights live in HBM at 1/4 the bytes and are dequantized on
the fly (XLA fuses the convert into the consuming matmul), which helps the
bandwidth-bound big-dense models.  Activations stay float — matching the
"q8f32" configuration the reference ships.

Usage:
    qparams = quantize_tree(params)            # int8 + per-column scales
    out = forward(dequantize_tree(qparams), x) # inside jit — convert fuses
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["quantize_tree", "dequantize_tree", "quantized_bytes"]

_MIN_SIZE = 4096  # don't quantize tiny leaves (biases, norms, alphas)


def _is_quant_leaf(x) -> bool:
    return isinstance(x, dict) and set(x) == {"q8", "scale"}


_QUANT_KEYS = ("w", "w_i", "w_h")  # dense/conv + RNN input/hidden weights


def quantize_tree(params, min_size: int = _MIN_SIZE):
    """float32 WEIGHT leaves (≥ min_size elements, ≥ 2 dims, key in
    ``_QUANT_KEYS``) → {'q8', 'scale'} dicts.

    Symmetric per-output-column scales (last axis), matching how dynamic ORT
    quantization scales MatMul initializers.  Only keys consumed through the
    q8-aware routes are eligible — ``w`` flows through ``core.as_weight`` /
    ``core.dense`` and ``w_i``/``w_h`` through ``nn.rnn``'s ``as_weight``
    calls; everything else (biases, norm gains — some of which are 2-D, e.g.
    GTCRN's (width, hidden) LayerNorm affine — is consumed by raw arithmetic
    and would crash or silently misbehave as a {'q8','scale'} dict)."""
    import jax.tree_util as jtu

    def q(path, leaf):
        key = getattr(path[-1], "key", None) if path else None
        if key not in _QUANT_KEYS:
            return leaf
        if not hasattr(leaf, "shape") or leaf.ndim < 2 or leaf.size < min_size:
            return leaf
        if leaf.dtype not in (jnp.float32, np.float32):
            return leaf
        arr = np.asarray(leaf, np.float32)
        # reduce over the CONTRACTION axis only (ndim−2), keeping leading
        # axes: grouped/stacked weights (e.g. the vmapped grouped-GRU's
        # (G, in, 3H) w_i) then carry per-group scales whose leading dims
        # match q8's, so jax.vmap over params axis 0 stays consistent
        amax = np.abs(arr).max(axis=arr.ndim - 2, keepdims=True)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q8 = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
        return {"q8": jnp.asarray(q8), "scale": jnp.asarray(scale)}

    return jtu.tree_map_with_path(q, params, is_leaf=_is_quant_leaf)


def dequantize_tree(params):
    """Inverse of :func:`quantize_tree`; run INSIDE jit so XLA fuses the
    int8→f32 convert into the consuming matmuls."""

    def dq(leaf):
        if _is_quant_leaf(leaf):
            return leaf["q8"].astype(jnp.float32) * leaf["scale"]
        return leaf

    return jax.tree.map(dq, params, is_leaf=_is_quant_leaf)


def quantized_bytes(params) -> tuple[int, int]:
    """(bytes_quantized_tree, bytes_float_tree) for reporting."""
    qb = fb = 0
    for leaf in jax.tree.leaves(params, is_leaf=_is_quant_leaf):
        if _is_quant_leaf(leaf):
            qb += leaf["q8"].size + 4 * leaf["scale"].size
            fb += 4 * leaf["q8"].size
        elif hasattr(leaf, "size"):
            qb += 4 * leaf.size
            fb += 4 * leaf.size
    return qb, fb
