"""MossFormer-family blocks: FLASH (GAU) attention + gated FSMN.

Parity target: the inlined ClearVoice MossFormer2 layers of
/root/reference/MossFormer2_SE_48K/Export_MossFormer_SE.py:391-479 (shared by
MossFormerGAN-SE, MossFormer2-SS and MossFormer2-SR with small variations):

  FLASH_ShareA_FFConvM layer
    token shift (half channels shifted one frame) → shared ScaleNorm →
    fused to_hidden‖to_qk Linear + SiLU + depthwise ConvModule residual →
    OffsetScale into 4 heads (quad_q, lin_q, quad_k, lin_k) → rotary on the
    first rot_dim channels → group-chunked quadratic attention
    relu(q kᵀ / g)² plus global linear attention (k v / n) → gate
    (att_u·v)·σ(att_v·u) → to_out ScaleNorm + Linear + SiLU + ConvModule →
    residual.

  Gated_FSMN_Block
    1×1 conv (dim→inner) + PReLU → LN → gated FSMN (fused to_u‖to_v FFConvM,
    UniDeepFsmn memory with symmetric pad) → LN → 1×1 conv (inner→dim) →
    residual.

Channel-last (B, T, C).  Rotary/positional tables are numpy-precomputed.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import core

__all__ = [
    "scale_norm",
    "ff_convm",
    "flash_layer",
    "gated_fsmn_block",
    "rotary_tables",
    "rope_mm_tables",
    "sinusoid_positions",
    "apply_rotary",
    "init_ff_convm",
    "init_flash_layer",
    "init_gated_fsmn_block",
]


def scale_norm(p, x, *, eps: float = 1e-5):
    """ScaleNorm: g · x / (‖x‖₂ · d^{-1/2} + eps)."""
    d = x.shape[-1]
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * (d**-0.5)
    return x * (p["g"] / (norm + eps))


def _depthwise_res(p, x, pad: int):
    """ConvModule: x + depthwise_conv(x) over time; w (k, 1, C)."""
    return x + core.conv1d(p, x, padding=pad, groups=x.shape[-1])


def ff_convm(p, x, *, norm: str = "scale", eps: float = 1e-5):
    """FFConvM: norm → Linear → SiLU → depthwise ConvModule residual."""
    if norm == "scale":
        y = scale_norm(p["norm"], x, eps=eps)
    elif norm == "layer":
        y = core.layer_norm(p.get("norm"), x, eps=eps)
    else:
        y = x
    y = jax.nn.silu(core.dense(p["lin"], y))
    k = p["conv"]["w"].shape[0]
    return _depthwise_res(p["conv"], y, (k - 1) // 2)


@lru_cache(maxsize=None)
def _rotary_tables_np(length: int, rot_dim: int, theta: float = 10000.0):
    freqs = 1.0 / (theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))
    ang = np.arange(length, dtype=np.float64)[:, None] * freqs[None, :]  # (T, rot/2)
    ang = np.repeat(ang, 2, axis=-1)  # interleave duplicate: (T, rot)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def rotary_tables(length: int, rot_dim: int):
    c, s = _rotary_tables_np(length, rot_dim)
    return jnp.asarray(c), jnp.asarray(s)


@lru_cache(maxsize=None)
def _rope_mm_tables_np(length: int, rot_dim: int, dim: int):
    cos, sin = _rotary_tables_np(length, rot_dim)
    cos_f = np.ones((length, dim), np.float32)
    sin_f = np.zeros((length, dim), np.float32)
    cos_f[:, :rot_dim] = cos
    sin_f[:, :rot_dim] = sin
    swap = np.zeros((dim, dim), np.float32)
    for m in range(rot_dim // 2):
        swap[2 * m + 1, 2 * m] = -1.0  # halfr[2m]   = -x[2m+1]
        swap[2 * m, 2 * m + 1] = 1.0   # halfr[2m+1] =  x[2m]
    return cos_f, sin_f, swap


def rope_mm_tables(length: int, rot_dim: int, dim: int):
    """RoPE-as-matmul tables (cos_full, sin_full, swap), satisfying

        apply_rotary(x, cos, sin, rot_dim) == x·cos_full + (x @ swap)·sin_full

    for x (..., length, dim).  The interleaved rotate-half becomes a
    contraction against a constant signed pair-swap matrix — one small MXU
    matmul instead of lane-stride-2 shuffles, which XLA:TPU lowers ~10×
    slower (measured on the MossFormerGAN GAU, v5e).  Because each swap row
    has exactly one ±1 entry, the matmul is numerically exact."""
    return tuple(jnp.asarray(a) for a in _rope_mm_tables_np(length, rot_dim, dim))


def apply_rotary(x, cos, sin, rot_dim: int):
    """RoPE on the first ``rot_dim`` channels (interleaved-pair convention,
    Export_MossFormer_SE.py:407-409). x: (..., T, D); cos/sin: (T, rot_dim)."""
    mid, rest = x[..., :rot_dim], x[..., rot_dim:]
    half = jnp.stack([-mid[..., 1::2], mid[..., 0::2]], axis=-1).reshape(mid.shape)
    rotated = mid * cos + half * sin
    return jnp.concatenate([rotated, rest], axis=-1)


@lru_cache(maxsize=None)
def _sinusoid_np(length: int, dim: int):
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    ang = np.arange(length, dtype=np.float64)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1).astype(np.float32)


def sinusoid_positions(length: int, dim: int):
    """ScaledSinuEmbedding table (T, dim); caller multiplies the learned scale."""
    return jnp.asarray(_sinusoid_np(length, dim))


def flash_layer(p, x, *, group_size: int, qk_dim: int, rot_dim: int = 32, eps: float = 1e-5,
                conv_residual: bool = True):
    """One FLASH_ShareA_FFConvM layer. x: (B, T, D) → (B, T, D).

    ``conv_residual``: MossFormer2-SE/SS ConvModules add the depthwise conv to
    their input; the MossFormer-SR variant REPLACES the activation with the
    conv output instead (/root/reference/MossFormer2_Super_Resolution/
    Export_MossFormer_SR.py:485,516 — no ``proj +``/``y +``)."""
    b, t, d = x.shape
    residual = x

    # token shift: first half of channels delayed by one frame
    half = d // 2
    x_shift = jnp.pad(x[..., :half], [(0, 0), (1, 0), (0, 0)])[:, :t]
    h = jnp.concatenate([x_shift, x[..., half:]], axis=-1)

    h = scale_norm(p["in_norm"], h, eps=eps)
    proj = jax.nn.silu(core.dense(p["in_lin"], h))
    k = p["in_conv"]["w"].shape[0]
    if conv_residual:
        proj = _depthwise_res(p["in_conv"], proj, (k - 1) // 2)
    else:
        proj = core.conv1d(p["in_conv"], proj, padding=(k - 1) // 2, groups=proj.shape[-1])

    vu2 = proj.shape[-1] - qk_dim
    vu = vu2 // 2
    v, u = proj[..., :vu], proj[..., vu:vu2]
    qk = proj[..., vu2:]

    # OffsetScale + RoPE, rotate-half as a matmul against a constant signed
    # pair-swap matrix (exact — each swap column has one ±1 entry; the
    # lane-interleave shuffle form is ~10× slower on TPU).  Because
    # (x·γ) @ swap == (x @ swap)·P(γ) with P the unsigned pair-swap
    # permutation, ONE shared qk @ swap matmul serves all four heads:
    #   rope(qk·γᵢ+βᵢ) = qk·(γᵢ·cos) + (qk@swap)·(P(γᵢ)·sin)
    #                    + (βᵢ·cos + (βᵢ@swap)·sin)
    # so each head is fused elementwise FMAs and the (B, T, 4, qk)
    # intermediate never materializes.
    cos_f, sin_f, swap = (a.astype(x.dtype)
                          for a in rope_mm_tables(t, rot_dim, qk_dim))
    perm = np.arange(qk_dim)
    perm[:rot_dim] = perm[:rot_dim] ^ 1  # pair-swap 2m <-> 2m+1
    gamma_p = p["os_gamma"][:, perm]  # (4, qk) = P(γᵢ)
    beta_swap = p["os_beta"] @ swap  # (4, qk)
    qk_swap = qk @ swap  # (B, T, qk) — the one matmul

    pad = (-t) % group_size
    g = (t + pad) // group_size

    def grouped(a):
        if pad:
            a = jnp.pad(a, [(0, 0), (0, pad), (0, 0)])
        return a.reshape(b, g, group_size, a.shape[-1])

    quad_q, lin_q, quad_k, lin_k = (
        grouped(qk * (p["os_gamma"][i] * cos_f) + qk_swap * (gamma_p[i] * sin_f)
                + (p["os_beta"][i] * cos_f + beta_swap[i] * sin_f))
        for i in range(4)
    )
    vug = grouped(proj[..., :vu2])

    # quadratic (per-group) attention; zero-padded keys need no mask
    attn = jax.nn.relu(
        jnp.einsum("bgik,bgjk->bgij", quad_q, quad_k, preferred_element_type=jnp.float32)
        / group_size
    )
    quad_out = jnp.einsum("bgij,bgjv->bgiv", attn * attn, vug, preferred_element_type=jnp.float32)

    # global linear attention
    lin_kv = jnp.einsum("bgjk,bgjv->bkv", lin_k, vug, preferred_element_type=jnp.float32) / t
    lin_out = jnp.einsum("bgik,bkv->bgiv", lin_q, lin_kv, preferred_element_type=jnp.float32)

    # einsums accumulate in f32 (preferred_element_type); return to the
    # compute dtype so bf16 configs stay bf16 through the stack
    att = (quad_out + lin_out).reshape(b, g * group_size, vu2)[:, :t].astype(x.dtype)
    att_v, att_u = att[..., :vu], att[..., vu:]
    out = (att_u * v) * jax.nn.sigmoid(att_v * u)

    out = scale_norm(p["out_norm"], out, eps=eps)
    out = jax.nn.silu(core.dense(p["out_lin"], out))
    k2 = p["out_conv"]["w"].shape[0]
    if conv_residual:
        out = _depthwise_res(p["out_conv"], out, (k2 - 1) // 2)
    else:
        out = core.conv1d(p["out_conv"], out, padding=(k2 - 1) // 2, groups=out.shape[-1])
    return residual + out


def gated_fsmn_block(p, x, *, lorder: int, eps: float = 1e-8,
                     conv_residual: bool = True, inner_residual: bool = True):
    """Gated_FSMN_Block (Export_MossFormer_SE.py:444-472). x: (B, T, D).

    NOTE: the SR export's seemingly residual-free forward actually folds the
    identity into every depthwise kernel's center tap (+1.0,
    Export_MossFormer_SR.py:296-313,355-362), so ALL MossFormer variants use
    the default residuals; the flags remain for experimentation only.
    """
    blk_in = x
    h = core.prelu(p["conv1_act"], core.dense(p["conv1"], x))
    gf_in = core.layer_norm(p["norm1"], h, eps=eps)

    # gated FSMN: fused to_u ‖ to_v FFConvM over a shared affine-free LN
    xn = core.layer_norm(None, gf_in, eps=eps)
    proj = jax.nn.silu(core.dense(p["uv_lin"], xn))
    k = p["uv_conv"]["w"].shape[0]
    if conv_residual:
        proj = _depthwise_res(p["uv_conv"], proj, (k - 1) // 2)
    else:
        proj = core.conv1d(p["uv_conv"], proj, padding=(k - 1) // 2, groups=proj.shape[-1])
    inner = proj.shape[-1] // 2
    xu, xv = proj[..., :inner], proj[..., inner:]

    # UniDeepFsmn memory on xu: relu-linear → project → symmetric depthwise
    # memory conv (kernel 2*lorder-1, pad lorder-1 both sides) + inner residual
    f1 = jax.nn.relu(core.dense(p["mem_lin"], xu))
    xp = core.dense(p["mem_proj"], f1)
    mem = core.conv1d(p["mem_conv"], xp, padding=lorder - 1, groups=inner)
    xu = xu + xp + mem if inner_residual else xu + mem

    y = xv * xu + gf_in
    y = core.layer_norm(p["norm2"], y, eps=eps)
    return core.dense(p["conv2"], y) + blk_in


def instance_norm_t(p, x, eps: float = 1e-5):
    """InstanceNorm1d: normalise each channel over time. x: (B, T, C)."""
    mu = jnp.mean(x, axis=-2, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-2, keepdims=True)
    y = (x - mu) * lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["g"] + p["b"]
    return y


def gated_fsmn_block_dilated(p, x, *, lorder: int, eps: float = 1e-8):
    """Gated_FSMN_Block_Dilated (MossFormer2-SS variant,
    /root/reference/MossFormer2_SS_16K/Export_MossFormer2_SS_16K.py:516-559):
    the memory is a dilated DenseNet stack — conv_j sees the concat of all
    previous outputs, with InstanceNorm + PReLU after each conv."""
    blk_in = x
    h = core.dense(p["front"], x)
    h = jnp.where(h >= 0, h, p["front_alpha"] * h)  # scalar PReLU as leaky
    gf_in = core.layer_norm(p["norm1"], h, eps=eps)

    xn = core.layer_norm(None, gf_in, eps=eps)
    proj = jax.nn.silu(core.dense(p["uv_lin"], xn))
    k = p["uv_conv"]["w"].shape[0]
    proj = _depthwise_res(p["uv_conv"], proj, (k - 1) // 2)
    inner = proj.shape[-1] // 2
    xu, xv = proj[..., :inner], proj[..., inner:]

    f1 = jax.nn.relu(core.dense(p["mem_lin"], xu))
    dense_feat = core.dense(p["mem_proj"], f1)
    mem_out = dense_feat
    for j, mp in enumerate(p["mem_stack"]):
        dilation = 2**j  # dense dilated stack: dilation doubles per level
        pad = dilation * (lorder - 1)
        mem_out = core.conv1d(mp["conv"], dense_feat, padding=pad, dilation=dilation,
                              groups=inner)
        mem_out = instance_norm_t(mp["norm"], mem_out)
        mem_out = core.prelu(mp["act"], mem_out)
        if j + 1 < len(p["mem_stack"]):
            dense_feat = jnp.concatenate([mem_out, dense_feat], axis=-1)
    xu = xu + mem_out

    y = xv * xu + gf_in
    y = core.layer_norm(p["norm2"], y, eps=eps)
    return core.dense(p["back"], y) + blk_in


def init_gated_fsmn_block_dilated(key, dim, inner, *, lorder=20, dw_kernel=17, depth=2):
    ks = jax.random.split(key, 7 + depth)
    mem_stack = []
    for j in range(depth):
        kj = jax.random.split(ks[6 + j], 2)
        cin = inner * (j + 1)
        mem_stack.append(
            {
                "conv": core.init_conv1d(kj[0], 2 * lorder - 1, cin, inner, groups=inner, bias=False),
                "norm": {"g": jnp.ones((inner,)), "b": jnp.zeros((inner,))},
                "act": {"alpha": jnp.full((inner,), 0.25)},
            }
        )
    return {
        "front": core.init_dense(ks[0], dim, inner),
        "front_alpha": jnp.asarray(0.25, jnp.float32),
        "norm1": {"g": jnp.ones((inner,)), "b": jnp.zeros((inner,))},
        "uv_lin": core.init_dense(ks[1], inner, 2 * inner),
        "uv_conv": core.init_conv1d(ks[2], dw_kernel, 2 * inner, 2 * inner, groups=2 * inner, bias=False),
        "mem_lin": core.init_dense(ks[3], inner, inner),
        "mem_proj": core.init_dense(ks[4], inner, inner, bias=False),
        "mem_stack": mem_stack,
        "norm2": {"g": jnp.ones((inner,)), "b": jnp.zeros((inner,))},
        "back": core.init_dense(ks[5], inner, dim),
    }


# ─────────────────────────────────────────────────────────────────────────────
# Init
# ─────────────────────────────────────────────────────────────────────────────


def init_ff_convm(key, din, dout, dw_kernel=17, norm="scale"):
    k1, k2 = jax.random.split(key)
    p = {
        "lin": core.init_dense(k1, din, dout),
        "conv": core.init_conv1d(k2, dw_kernel, dout, dout, groups=dout, bias=False),
    }
    if norm == "scale":
        p["norm"] = {"g": jnp.ones(())}
    elif norm == "layer":
        p["norm"] = {"g": jnp.ones((din,)), "b": jnp.zeros((din,))}
    return p


def init_flash_layer(key, dim, *, vu_dim, qk_dim, dw_kernel=17):
    ks = jax.random.split(key, 6)
    return {
        "in_norm": {"g": jnp.ones(())},
        "in_lin": core.init_dense(ks[0], dim, 2 * vu_dim + qk_dim),
        "in_conv": core.init_conv1d(ks[1], dw_kernel, 2 * vu_dim + qk_dim, 2 * vu_dim + qk_dim,
                                    groups=2 * vu_dim + qk_dim, bias=False),
        "os_gamma": jnp.ones((4, qk_dim)) * 0.1,
        "os_beta": jnp.zeros((4, qk_dim)),
        "out_norm": {"g": jnp.ones(())},
        "out_lin": core.init_dense(ks[2], vu_dim, dim),
        "out_conv": core.init_conv1d(ks[3], dw_kernel, dim, dim, groups=dim, bias=False),
    }


def init_gated_fsmn_block(key, dim, inner, *, lorder=20, dw_kernel=17):
    ks = jax.random.split(key, 7)
    return {
        "conv1": core.init_dense(ks[0], dim, inner),
        "conv1_act": {"alpha": jnp.full((inner,), 0.25)},
        "norm1": {"g": jnp.ones((inner,)), "b": jnp.zeros((inner,))},
        "uv_lin": core.init_dense(ks[1], inner, 2 * inner),
        "uv_conv": core.init_conv1d(ks[2], dw_kernel, 2 * inner, 2 * inner, groups=2 * inner, bias=False),
        "mem_lin": core.init_dense(ks[3], inner, inner),
        "mem_proj": core.init_dense(ks[4], inner, inner, bias=False),
        "mem_conv": core.init_conv1d(ks[5], 2 * lorder - 1, inner, inner, groups=inner, bias=False),
        "norm2": {"g": jnp.ones((inner,)), "b": jnp.zeros((inner,))},
        "conv2": core.init_dense(ks[6], inner, dim),
    }
