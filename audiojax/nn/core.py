"""Core NN building blocks — functional, channel-last, TPU-first.

Everything here is a pure function over explicit parameter pytrees (nested
dicts of jnp arrays).  Layouts are channel-last throughout: 1-D feature maps
are ``(B, T, C)`` and 2-D maps are ``(B, T, F, C)`` — time on the sublane
axis, frequency/channels on the lane axis, which is the natural TPU tiling
(the torch reference uses channels-first ``(B, C, T, F)``; the importer
transposes weights once at load time).

Weight layouts:
  dense    w: (in, out), b: (out,)
  conv1d   w: (k, in/groups, out)        [WIO]
  conv2d   w: (kh, kw, in/groups, out)   [HWIO]
Transposed convs take the SAME layout as their forward counterparts and are
lowered to input-dilated convolutions (XLA has no native deconv; this is the
standard formulation and fuses identically).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "dense",
    "dyn_int8_matmul",
    "is_q8",
    "as_weight",
    "prelu",
    "cast_f32_tree",
    "conv1d",
    "conv2d",
    "conv1d_transpose",
    "conv2d_transpose",
    "deconv_kernel",
    "layer_norm",
    "rms_norm",
    "glorot",
    "init_dense",
    "init_conv1d",
    "init_conv2d",
]


def is_q8(w) -> bool:
    """True for a ``{'q8', 'scale'}`` quantized-weight leaf
    (audiojax.utils.quantize)."""
    return isinstance(w, dict) and "q8" in w


def as_weight(w):
    """Materialize a quantized leaf back to float INSIDE jit (XLA fuses the
    int8→float convert into the consuming matmul/conv); floats pass through."""
    if is_q8(w):
        return w["q8"].astype(w["scale"].dtype) * w["scale"]
    return w


def cast_f32_tree(tree, dtype):
    """Cast every float32 leaf to ``dtype`` (other dtypes pass through).

    This is THE compute-dtype cast every bf16-capable model applies at the
    top of its net, factored out so serving paths can apply it ONCE on the
    host (``runtime.registry.prepare_compute_params``): left inside jit, the
    whole-tree convert re-materializes per call — f32 read + bf16 write of
    every parameter — which costs more HBM traffic than the bf16 matmuls
    save on small-batch models (measured on MossFormer2-SE 48K, 54.7 M
    params, v5e: 3.88 ms f32 / 4.16 ms bf16 in-jit cast / 3.40 ms pre-cast).
    Because only f32 leaves are touched, the in-net cast is idempotent: on a
    pre-cast tree it traces to a no-op."""
    import jax

    dtype = jnp.dtype(dtype)
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda a: a.astype(dtype) if getattr(a, "dtype", None) == jnp.float32 else a, tree
    )


def dyn_int8_matmul(x, q8, scale):
    """Dynamic-activation int8 matmul: the TPU analog of ORT's DYNAMIC_Q8
    (activation scales computed at run time, weights pre-quantized —
    /root/reference/Optimize_ONNX_Common.py:432-460).

    Per-row symmetric activation quantization → int8×int8 ``dot_general`` with
    int32 accumulation (native MXU int8 path, 2× bf16 throughput on v5e) →
    float rescale by (row scale × per-column weight scale).

    x: float (..., in); q8: int8 (in, out); scale: float (1, out)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, jnp.finfo(jnp.float32).tiny) * (1.0 / 127.0)
    # clip before the int8 cast: low-precision x/xs can round to 128, which
    # would WRAP to -128 (weights get the same clip in quantize_tree)
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(xq, q8, (((x.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs.astype(jnp.float32)
            * scale.reshape((1,) * (acc.ndim - 1) + (-1,)))


def dense(p, x):
    """x: (..., in) @ w (in, out) + b.  A quantized ``w`` ({'q8','scale'},
    served under the ``q8dyn`` plan) takes the dynamic int8 MXU path."""
    w = p["w"]
    if is_q8(w):
        y = dyn_int8_matmul(x, w["q8"], w["scale"]).astype(x.dtype)
    else:
        y = jnp.matmul(x, w, preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def prelu(p, x):
    """PReLU with per-channel (or scalar) slope ``p['alpha']`` on the last axis."""
    a = p["alpha"]
    return jnp.where(x >= 0, x, a * x)


def _norm_pad(pad):
    if isinstance(pad, int):
        return (pad, pad)
    return tuple(pad)


# Grouped convs with ≥2 input channels per group and one output channel per
# group run as unrolled shift-and-scale adds below this tap budget —
# XLA:TPU's feature_group_count lowering is pathological there (~25× slower
# for the MossFormer2-SS dilated FSMN memory).  TRUE depthwise (one input
# channel per group) is shape-dependent (v5e measurements): the unrolled form
# wins on small/medium maps (lax pays fixed lowering overhead), lax wins once
# the unroll's re-read volume (elements × taps) grows past ~7e7 (the unroll
# re-reads the input per tap; lax's conv is single-pass).
_DW_UNROLL_MAX_TAPS = 64
_DW_UNROLL_MAX_VOLUME = 72_000_000  # x.size × taps


def _dw_shift_conv(w, x, pads, dilations):
    """Depthwise conv as Σ_taps shifted-scaled slices.

    x: (B, *spatial, C); w: (*k, 1, C) with Cout == C (multiplier 1).
    ``pads``/``dilations``: per spatial axis.  Stride 1 only.
    Accumulates in f32 (like lax.conv's MXU accumulator) so bf16 inputs don't
    round tap-by-tap; the result is cast back to the input dtype.
    """
    if w.dtype != x.dtype:  # match the lax.conv branch's trace-time error
        raise TypeError(f"conv dtype mismatch: x {x.dtype} vs w {w.dtype}")
    spatial = w.ndim - 2
    pad_cfg = [(0, 0)] + [tuple(p) for p in pads] + [(0, 0)]
    if any(lo or hi for lo, hi in pad_cfg):
        x = jnp.pad(x, pad_cfg)
    out_shape = [
        x.shape[1 + a] - dilations[a] * (w.shape[a] - 1) for a in range(spatial)
    ]
    acc = None
    for tap in np.ndindex(*w.shape[:spatial]):
        idx = (slice(None),) + tuple(
            slice(tap[a] * dilations[a], tap[a] * dilations[a] + out_shape[a])
            for a in range(spatial)
        )
        # cast BEFORE multiplying: bf16×bf16 products must not round to bf16
        # (route parity with lax.conv's MXU f32 accumulator and the Pallas
        # kernel, which also upcast operands first)
        term = x[idx].astype(jnp.float32) * w[tap][0].astype(jnp.float32)
        acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


def _grouped_single_out_conv1d(w, x, pads, dilation):
    """Grouped conv with ONE output channel per group, as shifted-scaled adds.

    x: (B, T, G·m); w: (k, m, G) — group g's output contracts input channels
    [g·m, (g+1)·m).  Generalises the depthwise (m=1) case; same rationale as
    :func:`_dw_shift_conv` (feature_group_count lowering is pathological on
    TPU for small maps)."""
    if w.dtype != x.dtype:  # match the lax.conv branch's trace-time error
        raise TypeError(f"conv dtype mismatch: x {x.dtype} vs w {w.dtype}")
    k, m, g = w.shape
    lo, hi = pads
    if lo or hi:
        x = jnp.pad(x, [(0, 0), (lo, hi), (0, 0)])
    t_out = x.shape[1] - dilation * (k - 1)
    xr = x.reshape(x.shape[0], x.shape[1], g, m)
    acc = None
    for i in range(k):
        seg = lax.slice_in_dim(xr, i * dilation, i * dilation + t_out, axis=1)
        for r in range(m):
            # f32 products AND accumulation (lax.conv parity); cast at the end
            term = seg[..., r].astype(jnp.float32) * w[i, r].astype(jnp.float32)
            acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


def conv1d(p, x, *, stride: int = 1, padding=0, dilation: int = 1, groups: int = 1,
           dw_route: str | None = None):
    """Channel-last 1-D convolution: x (B, T, Cin), w (k, Cin/groups, Cout).

    ``dw_route="banded"`` asks for the per-channel banded-GEMM depthwise path
    (``ops.dwconv_banded``) — a measured per-call-site hint, honored only
    where it pays: true depthwise, stride/dilation 1, **bfloat16**
    activations (under f32 the required HIGHEST-precision passes cancel the
    MXU win — measured on the full MossFormerGAN forward, see the op's
    docstring); anything else falls back to the automatic routes below.
    """
    w = as_weight(p["w"])  # q8 leaves: fused dequant (convs stay float)
    taps = w.shape[0] * w.shape[1]
    if (dw_route == "banded" and groups > 1 and w.shape[1] == 1
            and w.shape[2] == groups == x.shape[-1]
            and stride == 1 and dilation == 1 and x.ndim == 3
            and x.dtype == jnp.bfloat16):
        from ..ops.dwconv_banded import dwconv1d_banded

        y = dwconv1d_banded(x, w[:, 0, :], pads=_norm_pad(padding))
        if "b" in p:
            y = y + p["b"]
        return y
    if (groups > 1 and w.shape[1] == 1 and w.shape[2] == groups == x.shape[-1]
            and stride == 1 and dilation == 1 and x.ndim == 3
            and x.shape[-1] % 128 == 0 and w.shape[0] <= _DW_UNROLL_MAX_TAPS
            and x.shape[1] + sum(_norm_pad(padding)) > 512
            and x.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"):
        # LONG-time-axis true depthwise under bf16: the time-tiled Pallas
        # kernel (overlapping halo'd DMA strips, hundreds of small programs).
        # Measured on the full MossFormer2-SS bf16 forward (T≈4000, v5e):
        # 18.7 → 17.4 ms vs the lax/unroll routes; under f32 the same route
        # LOSES 1.5× (25.5 → 38.3 ms) — hence the bf16-only gate, like the
        # banded hint above.  Short time axes stay on the block-resident
        # kernel below.
        from ..ops.dwconv_pallas import dwconv1d_pallas_tiled

        y = dwconv1d_pallas_tiled(x, w[:, 0, :], pads=_norm_pad(padding))
    elif (groups > 1 and w.shape[1] == 2 and w.shape[2] == groups
            and x.shape[-1] == 2 * groups and stride == 1 and x.ndim == 3
            and groups % 128 == 0 and w.shape[0] <= _DW_UNROLL_MAX_TAPS
            and x.shape[1] + sum(_norm_pad(padding)) > 512
            and x.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"):
        # LONG-time-axis grouped 2-in/1-out convs (the SS dilated dense-FSMN
        # memory, (39, 2, 256) at T≈4000): lax feature-group semantics read
        # input lanes [2g, 2g+1] per group — one stride-2 channel deinterleave
        # turns it into TWO true-depthwise convs on the tiled kernel (native
        # tap-offset dilation, no zero taps).  Measured on the full SS bf16
        # forward, interleaved with the 2·k-tap unroll it replaces:
        # 18.9 → 17.76 ms (on top of the depthwise route above).
        from ..ops.dwconv_pallas import dwconv1d_pallas_tiled

        pads = _norm_pad(padding)
        y = (dwconv1d_pallas_tiled(x[..., 0::2], w[:, 0, :], pads=pads, dilation=dilation)
             + dwconv1d_pallas_tiled(x[..., 1::2], w[:, 1, :], pads=pads, dilation=dilation))
    elif (groups > 1 and w.shape[1] == 1 and w.shape[2] == groups == x.shape[-1]
            and stride == 1 and w.shape[0] <= _DW_UNROLL_MAX_TAPS
            and x.size * w.shape[0] <= _DW_UNROLL_MAX_VOLUME):
        y = _dw_shift_conv(w, x, [_norm_pad(padding)], [dilation])
    elif (groups > 1 and w.shape[1] >= 2 and w.shape[2] == groups
            and x.shape[-1] == w.shape[1] * groups
            and stride == 1 and taps <= 2 * _DW_UNROLL_MAX_TAPS):
        # taps > 128 falls through to lax below: the unroll emits one fused
        # op per tap, and past ~128 taps compile time and op-count overhead
        # outgrow the ~25× lax penalty; no zoo model exceeds 40 (k=20·m=2)
        y = _grouped_single_out_conv1d(w, x, _norm_pad(padding), dilation)
    elif (groups > 1 and w.shape[1] == 1 and w.shape[2] == groups == x.shape[-1]
            and stride == 1 and dilation == 1 and x.ndim == 3
            and x.shape[-1] % 128 == 0 and w.shape[0] <= _DW_UNROLL_MAX_TAPS
            and x.shape[1] + sum(_norm_pad(padding)) <= 512
            and jax.default_backend() == "tpu"):
        # Large true-depthwise maps with SHORT time axes (many batch rows per
        # VMEM block): Pallas read-once kernel.  Standalone it only ties
        # lax.conv, but in-context it pins the (row, lane) layout and kills
        # XLA's relayout churn around the conv — measured 74 ms off the
        # MossFormerGAN forward (253→143 ms with the GAU rewrites, v5e).
        # Long time axes (MossFormer2-SS T≈3000) degrade to one row per block
        # and lose 2.5× to lax — hence the T ≤ 512 gate (measured crossover
        # is between 271 and 3000; GAN/FSMN shapes all sit ≤ 271).
        from ..ops.dwconv_pallas import dwconv1d_pallas

        y = dwconv1d_pallas(x, w[:, 0, :], pads=_norm_pad(padding))
    else:
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride,),
            padding=[_norm_pad(padding)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
        )
    if "b" in p:
        y = y + p["b"]
    return y


def conv2d(p, x, *, stride=(1, 1), padding=(0, 0), dilation=(1, 1), groups: int = 1,
           dw_route: str | None = None):
    """Channel-last 2-D convolution: x (B, H, W, Cin), w (kh, kw, Cin/groups, Cout).

    ``dw_route="banded"``: (1, kw) true-depthwise convs over the W axis route
    through the banded-GEMM path under bf16 (see :func:`conv1d`); otherwise
    the automatic routes below apply.
    """
    w = as_weight(p["w"])  # q8 leaves: fused dequant (convs stay float)
    taps = w.shape[0] * w.shape[1]
    if (dw_route == "banded" and groups > 1 and w.shape[2] == 1
            and w.shape[3] == groups == x.shape[-1] and w.shape[0] == 1
            and tuple(stride) == (1, 1) and tuple(dilation) == (1, 1)
            and x.ndim == 4 and x.dtype == jnp.bfloat16):
        from ..ops.dwconv_banded import dwconv1d_banded

        b, h, wd, c = x.shape
        lo, hi = _norm_pad(padding[1])
        ph = _norm_pad(padding[0])
        if ph != (0, 0):
            x = jnp.pad(x, [(0, 0), ph, (0, 0), (0, 0)])
            h = x.shape[1]
        y = dwconv1d_banded(x.reshape(b * h, wd, c), w[0, :, 0, :], pads=(lo, hi))
        y = y.reshape(b, h, -1, c)
        if "b" in p:
            y = y + p["b"]
        return y
    if (groups > 1 and w.shape[2] == 1 and w.shape[3] == groups == x.shape[-1]
            and tuple(stride) == (1, 1) and taps <= _DW_UNROLL_MAX_TAPS
            and x.size * taps <= _DW_UNROLL_MAX_VOLUME):
        y = _dw_shift_conv(w, x, [_norm_pad(padding[0]), _norm_pad(padding[1])],
                           list(dilation))
    else:
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=tuple(stride),
            padding=[_norm_pad(padding[0]), _norm_pad(padding[1])],
            rhs_dilation=tuple(dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
    if "b" in p:
        y = y + p["b"]
    return y


def conv1d_transpose(p, x, *, stride: int = 1, padding=0, dilation: int = 1, groups: int = 1,
                     output_padding: int = 0):
    """Channel-last transposed 1-D conv with torch ConvTranspose1d geometry.

    ``w`` is stored as the *equivalent forward kernel* in WIO layout
    (k, Cin/groups, Cout) — spatially pre-flipped, channels pre-arranged (use
    :func:`deconv_kernel` to build it from a torch-layout deconv weight once
    at import time, so the traced graph contains no kernel munging).
    out_len = (T-1)*stride - 2*padding + dilation*(k-1) + 1.
    """
    w = as_weight(p["w"])
    k = w.shape[0]
    pad = padding if isinstance(padding, int) else padding[0]
    eff = dilation * (k - 1)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(eff - pad, eff - pad + output_padding)],
        lhs_dilation=(stride,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"]
    return y


def conv2d_transpose(p, x, *, stride=(1, 1), padding=(0, 0), dilation=(1, 1), groups: int = 1):
    """Channel-last transposed 2-D conv (torch ConvTranspose2d geometry).

    ``w``: equivalent forward kernel, HWIO (kh, kw, Cin/groups, Cout) — see
    :func:`conv1d_transpose`.
    """
    w = as_weight(p["w"])
    kh, kw = w.shape[0], w.shape[1]
    ph = padding[0] if isinstance(padding[0], int) else padding[0][0]
    pw = padding[1] if isinstance(padding[1], int) else padding[1][0]
    effh, effw = dilation[0] * (kh - 1), dilation[1] * (kw - 1)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(effh - ph, effh - ph), (effw - pw, effw - pw)],
        lhs_dilation=tuple(stride),
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"]
    return y


def deconv_kernel(w_torch: np.ndarray, groups: int = 1) -> np.ndarray:
    """torch ConvTranspose{1,2}d weight → equivalent forward kernel ({W,HW}IO).

    torch stores (Cin, Cout/groups, k...) where input channel i drives the
    outputs of its own group.  The equivalent input-dilated forward conv needs
    (k..., Cin/groups, Cout) with spatial axes flipped:
    ``kernel[k, i_local, o_global(g, o_local)] = w[i_global(g, i_local), o_local, K-1-k]``.
    """
    w = np.asarray(w_torch)
    cin = w.shape[0]
    opg = w.shape[1]
    spatial = w.shape[2:]
    nsp = len(spatial)
    ipg = cin // groups
    w = w.reshape(groups, ipg, opg, *spatial)
    # → (*spatial, ipg, groups, opg)
    w = np.moveaxis(w, [0, 1, 2], [nsp + 1, nsp, nsp + 2])
    w = w.reshape(*spatial, ipg, groups * opg)
    return np.flip(w, axis=tuple(range(nsp))).copy()


def layer_norm(p, x, *, ndims: int = 1, eps: float = 1e-5):
    """LayerNorm over the trailing ``ndims`` axes with affine ``g``/``b``.

    Matches torch ``nn.LayerNorm(normalized_shape)`` where ``normalized_shape``
    has ``ndims`` dims (GTCRN's dual-path blocks use 2-D normalized shape
    (width, hidden), /root/reference/GTCRN/Export_GTCRN.py:448,457).
    """
    axes = tuple(range(x.ndim - ndims, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=axes, keepdims=True)
    y = (x - mu) * lax.rsqrt(var + eps)
    if p is not None and "g" in p:
        y = y * p["g"] + p["b"]
    return y


def rms_norm(p, x, *, eps: float = 1e-8):
    """RMS normalisation over the last axis with optional gain.

    The mean-square is floored at the dtype's tiny even when ``eps=0`` so an
    all-zero frame yields 0·rsqrt(tiny) = 0, matching the reference's
    clamp_min(1e-12) L2 normalize (Export_MelBandRoformer.py:70-72) instead
    of 0·inf = NaN poisoning the attention softmax."""
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    y = x * lax.rsqrt(jnp.maximum(ms + eps, jnp.finfo(x.dtype).tiny))
    if p is not None and "g" in p:
        y = y * p["g"]
    return y


# ─────────────────────────────────────────────────────────────────────────────
# Initialisers (for tests / random-weight runs; real weights come from the
# checkpoint importer)
# ─────────────────────────────────────────────────────────────────────────────


def glorot(key, shape, fan_in=None, fan_out=None):
    if fan_in is None:
        fan_in = int(np.prod(shape[:-1]))
    if fan_out is None:
        fan_out = shape[-1]
    lim = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, jnp.float32, -lim, lim)


def init_dense(key, din, dout, bias=True):
    p = {"w": glorot(key, (din, dout))}
    if bias:
        p["b"] = jnp.zeros((dout,))
    return p


def init_conv1d(key, k, cin, cout, groups=1, bias=True):
    p = {"w": glorot(key, (k, cin // groups, cout))}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def init_conv2d(key, kh, kw, cin, cout, groups=1, bias=True):
    p = {"w": glorot(key, (kh, kw, cin // groups, cout))}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p
