"""MossFormerGAN-SE-16K — ClearVoice SyncANet speech enhancer.

Parity target: /root/reference/MossFormerGAN_SE_16K/Export_MossFormer_SE.py —
STFT 400/100 (periodic hamming, reflect), power compression 0.3 applied to
magnitude AND the complex pair, DenseEncoder (1×1 + 4 dilated dense layers
each ending in a frequency-axis UniDeepFsmn + strided freq conv) → 6 SyncANet
blocks, each: intra (frequency) path [channel LayerNorm → grouped unfold conv
→ fused to_u/to_v FFConvM → UniDeepFsmn → gate → ConvTranspose refold →
MossFormer GAU with local quad + cross-token (diagonal-masked) + linear
attention → SE layer (avg+max channel attention) → residual], the mirrored
inter (time) path, and a 4-head triple attention over flattened (C·F) tokens
→ MaskDecoder (sub-pixel freq ×2) + ComplexDecoder → mask·compressed_spec +
complex_out → power decompression → ISTFT, per-window RMS norm/denorm.

Channel-last (B, T, F, C); GAU sequences (N, S, C).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..dsp import StftConfig
from ..dsp.pcm import fold_windows, resample_linear, unfold_windows
from ..nn import core
from ..parallel.sharding import shard_hint
from ..nn.mossformer import rope_mm_tables
from .zipenhancer import instance_norm_tf


@dataclasses.dataclass(frozen=True)
class MossFormerGanConfig:
    n_fft: int = 400
    hop: int = 100
    window: str = "hamming"
    pad_mode: str = "reflect"
    compress: float = 0.3
    emb_dim: int = 64
    emb_ks: int = 4
    emb_hs: int = 1
    uv_channels: int = 128
    n_blocks: int = 6
    dense_depth: int = 4
    lorder: int = 20
    # GAU (MossFormer) dims
    mf_hidden: int = 128  # packed [v | u]
    mf_vdim: int = 64
    mf_qk: int = 128
    mf_rot: int = 32
    dw_kernel: int = 31
    # triple attention
    attn_heads: int = 4
    attn_q_ch: int = 4
    attn_v_ch: int = 16
    sample_rate: int = 16000
    in_sample_rate: int = 16000
    out_sample_rate: int = 16000
    fold_window: int = 24000
    # bf16 compute with f32 STFT/decompress/ISTFT islands — the analog of the
    # reference's fp16 plan with its int16-domain f32 block list
    # (/root/reference/MossFormerGAN_SE_16K/Optimize_ONNX.py).
    compute_dtype: str = "float32"

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window, pad_mode=self.pad_mode)

    @property
    def f_bins(self) -> int:
        return self.n_fft // 2 + 1  # 201

    @property
    def n_freqs(self) -> int:
        return (self.f_bins + 2 - 3) // 2 + 1  # 101 sub-bands after the strided conv


def _ffconvm_fused(p, x, dw_kernel: int):
    """Fused to_u‖to_v FFConvM: affine-free LN → Linear → SiLU → depthwise
    conv residual (Export_MossFormer_SE.py:654-658).

    The depthwise conv takes the banded-GEMM route under bf16 (with the FSMN
    memory convs below, the largest single win of the GAN stage profile:
    110.7 → 90.4 ms full-forward — ops/dwconv_banded.py)."""
    h = core.layer_norm(None, x)
    h = jax.nn.silu(core.dense(p["lin"], h))
    return h + core.conv1d(p["conv"], h, padding=(dw_kernel - 1) // 2,
                           groups=h.shape[-1], dw_route="banded")


def _uni_fsmn(p, x, lorder: int):
    """UniDeepFsmn over the sequence axis: relu-linear → project → symmetric
    depthwise memory + inner residual."""
    f1 = jax.nn.relu(core.dense(p["lin"], x))
    p1 = core.dense(p["proj"], f1)
    mem = core.conv1d(p["mem"], p1, padding=lorder - 1, groups=p1.shape[-1],
                      dw_route="banded")
    return x + p1 + mem


def mossformer_gau(p, x, cfg: MossFormerGanConfig, b: int):
    """GatedFormer block (Export_MossFormer_SE.py:137-244): local quadratic
    attention over the sequence axis, cross-token attention over the batch-fold
    axis (diagonal-masked), global linear attention; gated combine.

    x: (b·BT, Q, C) where BT is the cross axis (frames for the intra path)."""
    n, q_len, c = x.shape
    bt = n // b
    half = c // 2
    x_shift = jnp.pad(x[..., :half], [(0, 0), (1, 0), (0, 0)])[:, :q_len]
    h = jnp.concatenate([x_shift, x[..., half:]], axis=-1)

    h = core.layer_norm(None, h)
    huv = jax.nn.silu(core.dense(p["in_lin"], h))
    huv = huv + core.conv1d(p["in_conv"], huv, padding=(cfg.dw_kernel - 1) // 2,
                            groups=huv.shape[-1])
    hidden, qk = huv[..., : cfg.mf_hidden], huv[..., cfg.mf_hidden :]

    # OffsetScale + RoPE, rotate-half as a matmul against a constant signed
    # pair-swap matrix (exact; lane-interleave shuffles are ~10× slower on
    # TPU).  The four per-projection diag(γᵢ)·swap matmuls are fused into ONE
    # (qk → 4·qk) matmul — a single full-lane MXU dispatch instead of four
    # quarter-width ones; the direct branch stays fused elementwise.
    cos_f, sin_f, swap = (a.astype(x.dtype)
                          for a in rope_mm_tables(q_len, cfg.mf_rot, cfg.mf_qk))
    d_qk = cfg.mf_qk
    # (qk, 4·qk): block-column i is diag(γᵢ)·swap — γ scales ROWS (the input
    # lane), matching the direct branch's qk*γᵢ; broadcasting over columns
    # would scale each rotated lane by its pair partner's γ instead.
    gamma_swap = jnp.concatenate(
        [p["gamma"][i][:, None] * swap for i in range(4)], axis=1)
    beta_swap = p["beta"] @ swap  # (4, qk)
    swapped = qk @ gamma_swap  # (N, Q, 4·qk)
    projs = []
    for i in range(4):
        direct = qk * p["gamma"][i] + p["beta"][i]
        sw = swapped[..., i * d_qk : (i + 1) * d_qk] + beta_swap[i]
        projs.append(direct * cos_f + sw * sin_f)
    quad_q, lin_q, quad_k, lin_k = projs

    # local quadratic attention over the sequence axis; the global linear
    # attention lin_q (lin_kᵀ hidden)/Q is re-associated as
    # ((lin_q lin_kᵀ)/Q) hidden so both share ONE value matmul and no
    # transposed (contract-over-sublanes) batched matmul remains.
    sim = jnp.einsum("nik,njk->nij", quad_q, quad_k, preferred_element_type=jnp.float32) / q_len
    attn = jnp.square(jax.nn.relu(sim))
    sim_lin = jnp.einsum("nik,njk->nij", lin_q, lin_k,
                         preferred_element_type=jnp.float32) / q_len
    att_hidden = jnp.einsum("nij,njv->niv", attn + sim_lin, hidden,
                            preferred_element_type=jnp.float32)

    # cross-token attention over the fold axis, diagonal masked.  The einsums
    # index the (b, BT, Q, ·) layout directly — no swapaxes materialisation
    # on either side (the cross output lands back in (b, BT, Q, v), which
    # reshapes to (N, Q, v) for free).
    qq = quad_q.reshape(b, bt, q_len, cfg.mf_qk)
    kk = quad_k.reshape(b, bt, q_len, cfg.mf_qk)
    hc = hidden.reshape(b, bt, q_len, cfg.mf_hidden)
    sim_c = jnp.einsum("biqk,bjqk->bqij", qq, kk, preferred_element_type=jnp.float32) / bt
    attn_c = jnp.square(jax.nn.relu(sim_c))
    eye = jnp.eye(bt, dtype=bool)
    attn_c = jnp.where(eye, 0.0, attn_c)
    cross = jnp.einsum("bqij,bjqv->biqv", attn_c, hc, preferred_element_type=jnp.float32)
    att_hidden = att_hidden + cross.reshape(n, q_len, cfg.mf_hidden)
    att_hidden = att_hidden.astype(hidden.dtype)  # back to compute dtype

    att_v, att_u = att_hidden[..., : cfg.mf_vdim], att_hidden[..., cfg.mf_vdim :]
    v, u = hidden[..., : cfg.mf_vdim], hidden[..., cfg.mf_vdim :]
    out = (att_u * v) * jax.nn.sigmoid(att_v * u)

    o = core.layer_norm(None, out)
    o = jax.nn.silu(core.dense(p["out_lin"], o))
    o = o + core.conv1d(p["out_conv"], o, padding=(cfg.dw_kernel - 1) // 2, groups=o.shape[-1])
    return x + o


def se_layer(p, x):
    """SELayer: sigmoid(MLP(avg-pool)) + sigmoid(MLP(max-pool)) channel gains.
    x: (B, T, F, C)."""
    avg = jnp.mean(x, axis=(1, 2))
    mx = jnp.max(x, axis=(1, 2))
    ga = jax.nn.sigmoid(core.dense(p["avg2"], jax.nn.relu(core.dense(p["avg1"], avg))))
    gm = jax.nn.sigmoid(core.dense(p["max2"], jax.nn.relu(core.dense(p["max1"], mx))))
    return x * (ga + gm)[:, None, None, :]


def _channel_ln(x, eps=1e-5):
    """LayerNormalization4D: stats over the channel axis per position."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    sd = jnp.sqrt(jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True) + eps)
    return (x - mu) / sd


def _sync_path(p, x, cfg: MossFormerGanConfig, *, axis: str):
    """One intra (axis='f') or inter (axis='t') SyncANet path. x: (B,T,F,C)."""
    b, t, f, c = x.shape
    h = _channel_ln(x)
    if axis == "f":
        seq = h.reshape(b * t, f, c)
        bt = t
    else:
        seq = jnp.swapaxes(h, 1, 2).reshape(b * f, t, c)
        bt = f
    # in-model tp: the SyncANet fold batch (B·T or B·F) splits over (dp, tp),
    # same pattern as ZipEnhancer's dual-path folds
    seq = shard_hint(seq, ("dp", "tp"))
    # grouped unfold conv (norm affine folded in by the importer): depthwise
    # kernel emb_ks producing C*emb_ks channels, stride emb_hs
    seq = core.conv1d(p["unfold"], seq, stride=cfg.emb_hs, groups=c)
    huv = _ffconvm_fused(p["uv"], seq, cfg.dw_kernel)
    iu, iv = huv[..., : cfg.uv_channels], huv[..., cfg.uv_channels :]
    iu = _uni_fsmn(p["fsmn"], iu, cfg.lorder)
    g = iv * iu
    g = core.conv1d_transpose(p["refold"], g, stride=cfg.emb_hs)  # back to full axis length
    g = mossformer_gau(p["mf"], g, cfg, b)
    if axis == "f":
        g = g.reshape(b, t, f, c)
    else:
        g = jnp.swapaxes(g.reshape(b, f, t, c), 1, 2)
    g = se_layer(p["se"], g)
    return g + x


def triple_attention(p, x, cfg: MossFormerGanConfig):
    """4-head attention over time with flattened (channel·freq) tokens
    (Export_MossFormer_SE.py:750-784). x: (B, T, F, C)."""
    b, t, f, c = x.shape
    h = cfg.attn_heads
    qc, vc = cfg.attn_q_ch, cfg.attn_v_ch
    qkv = core.prelu(p["qkv_act"], core.conv2d(p["qkv"], x))  # (B,T,F, 2hq + hv)
    qk = qkv[..., : 2 * h * qc].reshape(b, t, f, 2, h, qc)
    qk = jnp.moveaxis(qk, (3, 4), (1, 2))  # (B, 2, h, t, f, qc)
    qk = core.layer_norm(None, jnp.swapaxes(qk, -1, -2), ndims=2)  # LN over (qc, f)
    # per-(q/k, head) affines with the D^-1/4 attention scale folded in
    # (Export_MossFormer_SE.py:500-529)
    qk = qk * p["qk_g"] + p["qk_b"]  # (2, h, 1, qc, f) broadcast
    vv = qkv[..., 2 * h * qc :].reshape(b, t, f, h, vc)
    vv = jnp.moveaxis(vv, 3, 1)  # (B, h, t, f, vc)
    vv = core.layer_norm(None, jnp.swapaxes(vv, -1, -2), ndims=2)
    vv = vv * p["v_g"] + p["v_b"]  # (h, 1, vc, f) broadcast

    q = qk[:, 0].reshape(b, h, t, qc * f)
    k = qk[:, 1].reshape(b, h, t, qc * f)
    v = vv.reshape(b, h, t, vc * f)
    attn = jax.nn.softmax(
        jnp.einsum("bhik,bhjk->bhij", q, k, preferred_element_type=jnp.float32), axis=-1
    ).astype(x.dtype)
    y = jnp.einsum("bhij,bhjv->bhiv", attn, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(b, h, t, vc, f)
    y = jnp.transpose(y, (0, 2, 4, 1, 3)).reshape(b, t, f, h * vc)  # h-major channels
    y = core.prelu(p["proj_act"], core.conv2d(p["proj"], y))
    # LayerNormalization4DCF: stats over (C, F) per (b, t)
    mu = jnp.mean(y, axis=(2, 3), keepdims=True)
    sd = jnp.sqrt(jnp.mean(jnp.square(y - mu), axis=(2, 3), keepdims=True) + 1e-5)
    y = (y - mu) / sd * p["cf_g"] + p["cf_b"]
    return y + x


def _dense_fsmn_block(p, x, depth: int, lorder: int):
    """Dilated dense layers, each ending in a FREQUENCY-axis UniDeepFsmn
    (Export_MossFormer_SE.py:597-624). x: (B, T, F, C)."""
    skip = x
    out = x
    for i in range(depth):
        d = 1 << i
        lp = p[f"layer{i}"]
        h = jnp.pad(skip, [(0, 0), (d, 0), (0, 0), (0, 0)])
        h = core.conv2d(lp["conv"], h, padding=(0, 1), dilation=(d, 1))
        h = instance_norm_tf(lp["norm"], h)
        h = core.prelu(lp["act"], h)
        f1 = jax.nn.relu(core.conv2d(lp["fsmn_lin"], h))
        p1 = core.conv2d(lp["fsmn_proj"], f1)
        mem = core.conv2d(lp["fsmn_mem"], p1, padding=(0, lorder - 1),
                          groups=p1.shape[-1], dw_route="banded")
        out = h + p1 + mem
        skip = jnp.concatenate([out, skip], axis=-1)
    return out


def _decoder(p, x, cfg: MossFormerGanConfig):
    """Dense-FSMN block → sub-pixel freq ×2 → head convs."""
    h = _dense_fsmn_block(p["dense"], x, cfg.dense_depth, cfg.lorder)
    h = core.conv2d(p["sp_conv"], h, padding=(0, 1))  # (B,T,F',2C)
    b, t, f, c2 = h.shape
    c = c2 // 2
    # torch SPConvTranspose2d: channels view (r, C) r-major; width interleaves
    # f-major with r fastest (view(b,r,C,T,F).permute(0,2,3,4,1).view(…,F·r),
    # Export_MossFormer_SE.py:815-818) — merging the adjacent (f, r) axes
    # reproduces exactly that order.
    h = h.reshape(b, t, f, 2, c)
    return h.reshape(b, t, f * 2, c)


def mossformergan_net(p, mag_c, spec_c, cfg: MossFormerGanConfig):
    """compressed mag (B,T,F) + compressed complex (B,T,F,2) → enhanced packed."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if dtype != jnp.float32:
        p = core.cast_f32_tree(p, dtype)  # idempotent on pre-cast trees
        mag_c = mag_c.astype(dtype)
        spec_c = spec_c.astype(dtype)
    x = jnp.concatenate([mag_c[..., None], spec_c], axis=-1)  # (B,T,F,3)
    x = core.conv2d(p["enc_conv1"], x)
    x = core.prelu(p["enc_act1"], instance_norm_tf(p["enc_norm1"], x))
    x = _dense_fsmn_block(p["enc_dense"], x, cfg.dense_depth, cfg.lorder)
    x = core.conv2d(p["enc_conv2"], x, stride=(1, 2), padding=(0, 1))
    x = core.prelu(p["enc_act2"], instance_norm_tf(p["enc_norm2"], x))

    for i in range(cfg.n_blocks):
        blk = p[f"block{i}"]
        x = _sync_path(blk["intra"], x, cfg, axis="f")
        x = _sync_path(blk["inter"], x, cfg, axis="t")
        x = triple_attention(blk["attn"], x, cfg)

    # mask decoder → (B, T, F) mask
    m = _decoder(p["mask_dec"], x, cfg)
    m = core.conv2d(p["mask_conv1"], m)
    m = core.prelu(p["mask_act"], instance_norm_tf(p["mask_norm"], m))
    m = core.conv2d(p["mask_final"], m, padding=(0, 0))[..., 0]  # kernel (1,2): F→201
    mask = jnp.where(m >= 0, m, p["mask_out_alpha"] * m)

    # complex decoder → (B, T, F, 2)
    cx = _decoder(p["cplx_dec"], x, cfg)
    cx = core.prelu(p["cplx_act"], instance_norm_tf(p["cplx_norm"], cx))
    cplx = core.conv2d(p["cplx_final"], cx, padding=(0, 0))  # (B, T, 201, 2)

    final = (mask[..., None] * spec_c + cplx).astype(jnp.float32)  # f32 decompress island
    power = jnp.sum(final * final, axis=-1)
    # decompress: |final|^(1/c) unit-phase ≡ final · |final|²^((1/c − 1)/2)
    factor = jnp.power(jnp.clip(power, 1e-12, None), (1.0 / cfg.compress - 1.0) * 0.5)
    final = final * factor[..., None]
    return jnp.concatenate([final[..., 0], final[..., 1]], axis=-1)


def mossformergan_forward(params, audio, cfg: MossFormerGanConfig = MossFormerGanConfig()):
    """int16 PCM (B, L) → denoised int16 PCM (B, L)."""
    x = audio.astype(jnp.float32)
    if cfg.in_sample_rate != cfg.sample_rate:
        x = resample_linear(x, x.shape[-1] * cfg.sample_rate // cfg.in_sample_rate)

    batch = x.shape[0]
    model_len = x.shape[-1]
    align = cfg.fold_window if cfg.fold_window else cfg.hop
    padded = -(-model_len // align) * align
    if padded != model_len:
        x = jnp.pad(x, [(0, 0), (0, padded - model_len)])
    if cfg.fold_window:
        x = fold_windows(x, cfg.fold_window)

    norm = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-6)
    x = x / norm

    from ..ops.stft_pallas import fast_istft_packed, fast_stft_packed

    pk = fast_stft_packed(x, cfg.stft)  # Pallas-fused framing+DFT on TPU
    re, im = pk[..., : cfg.f_bins], pk[..., cfg.f_bins :]
    power = re * re + im * im
    mag_c = jnp.power(power, cfg.compress * 0.5)
    phase_scale = jnp.power(jnp.clip(power, np.finfo(np.float32).tiny, None),
                            cfg.compress * 0.5 - 0.5)
    spec_c = jnp.stack([re, im], axis=-1) * phase_scale[..., None]

    out = mossformergan_net(params, mag_c, spec_c, cfg)
    y = fast_istft_packed(out, cfg.stft)  # Pallas-fused iDFT + overlap-add
    y = y * norm

    if cfg.fold_window:
        y = unfold_windows(y, batch)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, model_len * cfg.out_sample_rate // cfg.sample_rate)
    y = jnp.where(jnp.isnan(y), 0.0, y)
    return jnp.clip(y, -32768.0, 32767.0).astype(jnp.int16)


# ─────────────────────────────────────────────────────────────────────────────
# Init
# ─────────────────────────────────────────────────────────────────────────────


def _init_in(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _init_dense_fsmn(key, c, depth, lorder):
    ks = jax.random.split(key, 4 * depth)
    p = {}
    for i in range(depth):
        p[f"layer{i}"] = {
            "conv": core.init_conv2d(ks[4 * i], 2, 3, c * (i + 1), c),
            "norm": _init_in(c),
            "act": {"alpha": jnp.full((c,), 0.25)},
            "fsmn_lin": core.init_conv2d(ks[4 * i + 1], 1, 1, c, c),
            "fsmn_proj": core.init_conv2d(ks[4 * i + 2], 1, 1, c, c, bias=False),
            "fsmn_mem": core.init_conv2d(ks[4 * i + 3], 1, 2 * lorder - 1, c, c, groups=c, bias=False),
        }
    return p


def _init_gau(key, cfg):
    ks = jax.random.split(key, 4)
    d_in = cfg.mf_hidden + cfg.mf_qk
    return {
        "in_lin": core.init_dense(ks[0], cfg.emb_dim, d_in),
        "in_conv": core.init_conv1d(ks[1], cfg.dw_kernel, d_in, d_in, groups=d_in, bias=False),
        "gamma": jnp.ones((4, cfg.mf_qk)) * 0.1,
        "beta": jnp.zeros((4, cfg.mf_qk)),
        "out_lin": core.init_dense(ks[2], cfg.mf_vdim, cfg.emb_dim),
        "out_conv": core.init_conv1d(ks[3], cfg.dw_kernel, cfg.emb_dim, cfg.emb_dim,
                                     groups=cfg.emb_dim, bias=False),
    }


def _init_path(key, cfg):
    ks = jax.random.split(key, 8)
    c = cfg.emb_dim
    in_ch = c * cfg.emb_ks
    return {
        "unfold": core.init_conv1d(ks[0], cfg.emb_ks, c, in_ch, groups=c),
        "uv": {
            "lin": core.init_dense(ks[1], in_ch, 2 * cfg.uv_channels),
            "conv": core.init_conv1d(ks[2], cfg.dw_kernel, 2 * cfg.uv_channels,
                                     2 * cfg.uv_channels, groups=2 * cfg.uv_channels, bias=False),
        },
        "fsmn": {
            "lin": core.init_dense(ks[3], cfg.uv_channels, cfg.uv_channels),
            "proj": core.init_dense(ks[4], cfg.uv_channels, cfg.uv_channels, bias=False),
            "mem": core.init_conv1d(ks[5], 2 * cfg.lorder - 1, cfg.uv_channels,
                                    cfg.uv_channels, groups=cfg.uv_channels, bias=False),
        },
        "refold": core.init_conv1d(ks[6], cfg.emb_ks, cfg.uv_channels, c),
        "mf": _init_gau(ks[7], cfg),
        "se": {
            # fresh subkeys — reusing ks[0..3] would correlate the SE block
            # with the unfold/uv/fsmn weights
            "avg1": core.init_dense(jax.random.fold_in(ks[0], 101), c, c // 4),
            "avg2": core.init_dense(jax.random.fold_in(ks[1], 102), c // 4, c),
            "max1": core.init_dense(jax.random.fold_in(ks[2], 103), c, c // 4),
            "max2": core.init_dense(jax.random.fold_in(ks[3], 104), c // 4, c),
        },
    }


def _init_attn(key, cfg):
    ks = jax.random.split(key, 2)
    h, qc, vc, f = cfg.attn_heads, cfg.attn_q_ch, cfg.attn_v_ch, cfg.n_freqs
    out_ch = 2 * h * qc + h * vc
    return {
        "qkv": core.init_conv2d(ks[0], 1, 1, cfg.emb_dim, out_ch),
        "qkv_act": {"alpha": jnp.full((out_ch,), 0.25)},
        "qk_g": jnp.ones((2, h, 1, qc, f)) * float((qc * f) ** -0.25),
        "qk_b": jnp.zeros((2, h, 1, qc, f)),
        "v_g": jnp.ones((h, 1, vc, f)),
        "v_b": jnp.zeros((h, 1, vc, f)),
        "proj": core.init_conv2d(ks[1], 1, 1, h * vc, cfg.emb_dim),
        "proj_act": {"alpha": jnp.full((cfg.emb_dim,), 0.25)},
        "cf_g": jnp.ones((f, cfg.emb_dim)),
        "cf_b": jnp.zeros((f, cfg.emb_dim)),
    }


def init_mossformergan(key, cfg: MossFormerGanConfig = MossFormerGanConfig()):
    c = cfg.emb_dim
    ks = jax.random.split(key, cfg.n_blocks + 12)
    p = {
        "enc_conv1": core.init_conv2d(ks[0], 1, 1, 3, c),
        "enc_norm1": _init_in(c),
        "enc_act1": {"alpha": jnp.full((c,), 0.25)},
        "enc_dense": _init_dense_fsmn(ks[1], c, cfg.dense_depth, cfg.lorder),
        "enc_conv2": core.init_conv2d(ks[2], 1, 3, c, c),
        "enc_norm2": _init_in(c),
        "enc_act2": {"alpha": jnp.full((c,), 0.25)},
        "mask_dec": {"dense": _init_dense_fsmn(ks[3], c, cfg.dense_depth, cfg.lorder),
                     "sp_conv": core.init_conv2d(ks[4], 1, 3, c, 2 * c)},
        "mask_conv1": core.init_conv2d(ks[5], 1, 1, c, c),
        "mask_norm": _init_in(c),
        "mask_act": {"alpha": jnp.full((c,), 0.25)},
        "mask_final": core.init_conv2d(ks[6], 1, 2, c, 1),
        "mask_out_alpha": jnp.asarray(0.25, jnp.float32),
        "cplx_dec": {"dense": _init_dense_fsmn(ks[7], c, cfg.dense_depth, cfg.lorder),
                     "sp_conv": core.init_conv2d(ks[8], 1, 3, c, 2 * c)},
        "cplx_norm": _init_in(c),
        "cplx_act": {"alpha": jnp.full((c,), 0.25)},
        "cplx_final": core.init_conv2d(ks[9], 1, 2, c, 2),
    }
    for i in range(cfg.n_blocks):
        bk = jax.random.split(ks[10 + i], 3)
        p[f"block{i}"] = {
            "intra": _init_path(bk[0], cfg),
            "inter": _init_path(bk[1], cfg),
            "attn": _init_attn(bk[2], cfg),
        }
    return p


def make_mossformergan(cfg: MossFormerGanConfig = MossFormerGanConfig()):
    return partial(mossformergan_forward, cfg=cfg)
