"""MossFormer2-SS-16K — two-speaker separation (time-domain encoder/decoder).

Parity target: /root/reference/MossFormer2_SS_16K/Export_MossFormer2_SS_16K.py —
two-stage RMS gain normalisation (−25 dB target + high-energy re-norm,
exactly invertible via rms_in/rms_out), Conv1d encoder (k=16, s=8) + ReLU,
GroupNorm + 1×1 + sinusoidal positions, 24 × [FLASH + dilated-dense gated
FSMN], per-speaker gated tail (speakers folded into batch), mask × encoding,
ConvTranspose1d decoder, per-speaker RMS restore.  PAD_HEAD warm-up samples
are a host policy (runtime session), not part of the graph.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..dsp.pcm import INV_INT16, pcm_in, resample_linear
from ..nn import core
from ..parallel.sharding import shard_hint
from ..nn.mossformer import (
    flash_layer,
    gated_fsmn_block_dilated,
    init_flash_layer,
    init_gated_fsmn_block_dilated,
    sinusoid_positions,
)
from .mossformer2_se import group_norm_all


@dataclasses.dataclass(frozen=True)
class MossFormer2SsConfig:
    num_spks: int = 2
    dim: int = 512
    depth: int = 24
    group_size: int = 256
    qk_dim: int = 128
    vu_dim: int = 1024
    rot_dim: int = 32
    fsmn_inner: int = 256
    lorder: int = 20
    mem_depth: int = 2
    dw_kernel: int = 17
    enc_kernel: int = 16
    enc_stride: int = 8
    norm_factor: float = 10.0 ** (-25.0 / 20.0)  # −25 dB RMS target
    sample_rate: int = 16000
    in_sample_rate: int = 16000
    out_sample_rate: int = 16000
    # compute dtype for the MossFormer stack; RMS normalisation and the
    # time-domain decoder output stay float32
    compute_dtype: str = "float32"


def norm_audio(x, norm_factor: float, eps: float = 1e-6):
    """Two-stage RMS normalisation (Export_MossFormer2_SS_16K.py:403-423).

    x: normalised PCM (B, L).  Returns (normed, rms_in) where rms_in is the
    int16-domain restore level for the output gain."""
    pow_x = x * x
    avg_pow = jnp.mean(pow_x, axis=-1, keepdims=True)
    rms = jnp.sqrt(avg_pow)
    scalar = norm_factor / (rms + eps)
    mask = (pow_x > avg_pow).astype(x.dtype)
    cnt = jnp.clip(jnp.sum(mask, axis=-1, keepdims=True), 1.0, None)
    high_rms = jnp.sqrt(jnp.sum(pow_x * mask, axis=-1, keepdims=True) / cnt)
    scalarx = norm_factor / (high_rms * scalar + eps)
    normed = x * scalar * scalarx
    gain = scalar * scalarx
    rms_in = rms * gain * (1.0 / (gain + eps)) * 32767.0
    return normed, rms_in


def mossformer2_ss_net(p, audio_normed, cfg: MossFormer2SsConfig):
    """normalised audio (B, L) → separated waves (B, spks, L_out)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if dtype != jnp.float32:
        p = core.cast_f32_tree(p, dtype)  # idempotent on pre-cast trees
        audio_normed = audio_normed.astype(dtype)
    b = audio_normed.shape[0]
    x_enc = jax.nn.relu(
        core.conv1d(p["encoder"], audio_normed[..., None], stride=cfg.enc_stride)
    )  # (B, n, 512)
    n = x_enc.shape[1]

    h = group_norm_all(p["front_norm"], x_enc)
    h = core.dense(p["front"], h)
    h = h + sinusoid_positions(n, cfg.dim).astype(h.dtype)[None] * p["pos_scale"]
    mdl_input = h

    for i in range(cfg.depth):
        # Sequence parallelism: shard the frame axis over tp (batch over dp).
        # The FLASH quadratic attention is group-local so frame shards are
        # independent; XLA inserts a psum for the global linear-attention
        # kv reduction and halo exchanges for the FSMN/depthwise convs.
        h = shard_hint(h, "dp", "tp", None)
        h = flash_layer(p[f"flash{i}"], h, group_size=cfg.group_size, qk_dim=cfg.qk_dim,
                        rot_dim=cfg.rot_dim)
        h = gated_fsmn_block_dilated(p[f"fsmn{i}"], h, lorder=cfg.lorder)
    h = core.layer_norm(p["mm_norm"], h)
    h = group_norm_all(p["intra_norm"], h)
    mask = h + mdl_input

    # tail: scalar PReLU → per-speaker gates (speakers fold into batch)
    a = p["tail_alpha"]
    mask = jnp.where(mask >= 0, mask, a * mask)
    gate = core.dense(p["tail_gate"], mask)  # (B, n, spks*2*dim)
    gate = gate.reshape(b, n, cfg.num_spks, 2 * cfg.dim)
    m = jnp.tanh(gate[..., : cfg.dim]) * jax.nn.sigmoid(gate[..., cfg.dim :])
    m = jax.nn.relu(core.dense(p["mask_decoder"], m))  # (B, n, spks, dim)

    sep = x_enc[:, :, None, :] * m  # (B, n, spks, dim)
    sep = jnp.moveaxis(sep, 2, 1).reshape(b * cfg.num_spks, n, cfg.dim)
    wav = core.conv1d_transpose(p["decoder"], sep, stride=cfg.enc_stride)  # (B*spks, L', 1)
    return wav[..., 0].reshape(b, cfg.num_spks, -1).astype(jnp.float32)


def mossformer2_ss_forward(params, audio, cfg: MossFormer2SsConfig = MossFormer2SsConfig()):
    """int16 mix (B, L) → (separated_0, separated_1) int16 (B, L) each."""
    x = pcm_in(audio)
    if cfg.in_sample_rate != cfg.sample_rate:
        x = resample_linear(x, x.shape[-1] * cfg.sample_rate // cfg.in_sample_rate)
    model_len = x.shape[-1]
    # align so the ConvTranspose decoder reproduces the length exactly
    pad_to = -(-(model_len - cfg.enc_kernel) // cfg.enc_stride) * cfg.enc_stride + cfg.enc_kernel
    if pad_to != model_len:
        x = jnp.pad(x, [(0, 0), (0, pad_to - model_len)])

    normed, rms_in = norm_audio(x, cfg.norm_factor)
    wav = mossformer2_ss_net(params, normed, cfg)  # (B, spks, L')

    rms_out = jnp.sqrt(jnp.mean(wav * wav, axis=-1, keepdims=True))
    gain = jnp.where(rms_out > 0.0, rms_in[:, None, :] / rms_out, jnp.zeros_like(rms_out))
    out = wav * gain  # already int16-domain via rms_in
    out = out[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        out = resample_linear(out, model_len * cfg.out_sample_rate // cfg.sample_rate)
    out = jnp.clip(out, -32768.0, 32767.0).astype(jnp.int32).astype(jnp.int16)
    return tuple(out[:, s] for s in range(cfg.num_spks))


def init_mossformer2_ss(key, cfg: MossFormer2SsConfig = MossFormer2SsConfig()):
    ks = jax.random.split(key, 2 * cfg.depth + 8)
    p = {
        "encoder": core.init_conv1d(ks[0], cfg.enc_kernel, 1, cfg.dim),
        "front_norm": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        "front": core.init_dense(ks[1], cfg.dim, cfg.dim),
        "pos_scale": jnp.asarray(cfg.dim**-0.5, jnp.float32),
        "mm_norm": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        "intra_norm": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        "tail_alpha": jnp.asarray(0.25, jnp.float32),
        "tail_gate": core.init_dense(ks[2], cfg.dim, cfg.num_spks * 2 * cfg.dim),
        "mask_decoder": core.init_dense(ks[3], cfg.dim, cfg.dim, bias=False),
        "decoder": core.init_conv1d(ks[4], cfg.enc_kernel, cfg.dim, 1),
    }
    for i in range(cfg.depth):
        p[f"flash{i}"] = init_flash_layer(ks[5 + 2 * i], cfg.dim, vu_dim=cfg.vu_dim,
                                          qk_dim=cfg.qk_dim, dw_kernel=cfg.dw_kernel)
        p[f"fsmn{i}"] = init_gated_fsmn_block_dilated(
            ks[6 + 2 * i], cfg.dim, cfg.fsmn_inner, lorder=cfg.lorder,
            dw_kernel=cfg.dw_kernel, depth=cfg.mem_depth,
        )
    return p


def make_mossformer2_ss(cfg: MossFormer2SsConfig = MossFormer2SsConfig()):
    return partial(mossformer2_ss_forward, cfg=cfg)
