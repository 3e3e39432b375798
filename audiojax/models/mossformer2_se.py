"""MossFormer2-SE-48K — 48 kHz speech enhancement (ClearVoice MossFormer2).

Parity target: /root/reference/MossFormer2_SE_48K/Export_MossFormer_SE.py —
Kaldi fbank (60 mel, 1920/384 frames, 2048-pt DFT) + Δ + ΔΔ → GroupNorm →
1×1 conv encoder (180→512) → scaled sinusoidal positions → 24 ×
[FLASH_ShareA + Gated-FSMN block] → LayerNorm → GroupNorm + residual →
PReLU → gated (tanh·σ) tail → 1×1 decoder → ReLU mask on the 961-bin
mask-STFT (shared 1920/384 framing, symmetric hamming) → ISTFT (center=False).

The reference pre-fuses to_hidden‖to_qk, ScaleNorm gains, the 1/g and 1/n
attention scales, and the speaker-0 tail rows at export; here those fusions
are importer transforms — the model code keeps the algebraic form and XLA
does the fusing.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..dsp import StftConfig, frame_signal
from ..dsp.pcm import INV_INT16, fold_windows, pcm_in, pcm_out, resample_linear, unfold_windows
from ..dsp.stft import _stft_basis_np
from ..frontend.kaldi import log_mel_fbank
from ..nn import core
from ..parallel.sharding import shard_hint
from ..nn.mossformer import (
    flash_layer,
    gated_fsmn_block,
    init_flash_layer,
    init_gated_fsmn_block,
    sinusoid_positions,
)
from jax import lax


@dataclasses.dataclass(frozen=True)
class MossFormer2SeConfig:
    n_mels: int = 60
    dim: int = 512
    depth: int = 24
    group_size: int = 256
    qk_dim: int = 128
    vu_dim: int = 1024
    rot_dim: int = 32
    fsmn_inner: int = 256
    lorder: int = 20
    dw_kernel: int = 17
    n_fft: int = 1920
    hop: int = 384
    kaldi_nfft: int = 2048
    preemph: float = 0.97
    sample_rate: int = 48000
    in_sample_rate: int = 48000
    out_sample_rate: int = 48000
    fold_window: int = 0
    # compute dtype for the MossFormer stack; the Kaldi fbank, mask-STFT and
    # ISTFT stay float32 (the reference's fp16 plans keep the same islands
    # full-precision) — attention/FSMN einsums already accumulate in f32 via
    # preferred_element_type
    compute_dtype: str = "float32"

    @property
    def frame_cfg(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window="hamming_symmetric", center=False)

    @property
    def stft_bins(self) -> int:
        return self.n_fft // 2 + 1  # 961


def group_norm_all(p, x, eps: float = 1e-8):
    """GroupNorm(1, C): normalise over (T, C) jointly, per-channel affine.
    x: (B, T, C)."""
    mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=(-2, -1), keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * p["g"] + p["b"]


def deltas(x):
    """torchaudio compute_deltas (win=5, replicate pad) via shifted slices.
    x: (B, T, M)."""
    t = x.shape[1]
    xp = jnp.concatenate([x[:, :1], x[:, :1], x, x[:, -1:], x[:, -1:]], axis=1)
    return (xp[:, 3 : 3 + t] - xp[:, 1 : 1 + t] + 2.0 * (xp[:, 4 : 4 + t] - xp[:, 0:t])) * 0.1


def mossformer2_se_net(p, fbank, cfg: MossFormer2SeConfig):
    """(B, T, 180) fbank+deltas → (B, T, 961) ReLU mask."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if dtype != jnp.float32:
        p = core.cast_f32_tree(p, dtype)  # idempotent on pre-cast trees
        fbank = fbank.astype(dtype)
    x = group_norm_all(p["in_norm"], fbank)
    x = core.dense(p["encoder"], x)  # 180 → 512
    pos = sinusoid_positions(x.shape[1], cfg.dim).astype(x.dtype) * p["pos_scale"]
    x = x + pos[None]

    h = x
    for i in range(cfg.depth):
        # sequence parallelism: frame axis over tp (see mossformer2_ss.py)
        h = shard_hint(h, "dp", "tp", None)
        h = flash_layer(p[f"flash{i}"], h, group_size=cfg.group_size, qk_dim=cfg.qk_dim,
                        rot_dim=cfg.rot_dim)
        h = gated_fsmn_block(p[f"fsmn{i}"], h, lorder=cfg.lorder)
    h = core.layer_norm(p["mm_norm"], h)
    h = group_norm_all(p["intra_norm"], h)
    x = h + x

    x = core.prelu(p["tail_act"], x)
    gate = core.dense(p["tail_gate"], x)
    d = cfg.dim
    x = jnp.tanh(gate[..., :d]) * jax.nn.sigmoid(gate[..., d:])
    return jax.nn.relu(core.dense(p["decoder"], x)).astype(jnp.float32)  # (B, T, 961)


def mossformer2_se_forward(params, audio, cfg: MossFormer2SeConfig = MossFormer2SeConfig()):
    """int16 PCM (B, L) @ 48 kHz → denoised int16 PCM."""
    x = pcm_in(audio)
    if cfg.in_sample_rate != cfg.sample_rate:
        x = resample_linear(x, int(round(x.shape[-1] * cfg.sample_rate / cfg.in_sample_rate)))

    batch = x.shape[0]
    model_len = x.shape[-1]
    align = cfg.fold_window if cfg.fold_window else cfg.hop
    padded = max(-(-model_len // align) * align, cfg.n_fft)
    if padded != model_len:
        x = jnp.pad(x, [(0, 0), (0, padded - model_len)])
    if cfg.fold_window:
        x = fold_windows(x, cfg.fold_window)

    frames = frame_signal(x, cfg.frame_cfg)
    fbank = log_mel_fbank(
        x, frame_len=cfg.n_fft, hop=cfg.hop, nfft=cfg.kaldi_nfft, n_mels=cfg.n_mels,
        fs=cfg.sample_rate, preemph=cfg.preemph,
        power_scale=1.0 / (INV_INT16 * INV_INT16), frames=frames,
    )
    d1 = deltas(fbank)
    feat = jnp.concatenate([fbank, d1, deltas(d1)], axis=-1)  # (B, T, 180)

    basis = jnp.asarray(_stft_basis_np(cfg.frame_cfg))
    spec = jnp.einsum("...tn,nf->...tf", frames, basis,
                      preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)

    mask = mossformer2_se_net(params, feat, cfg)
    masked = spec * jnp.concatenate([mask, mask], axis=-1)
    from ..ops.stft_pallas import fast_istft_packed

    y = fast_istft_packed(masked, cfg.frame_cfg)

    if cfg.fold_window:
        y = unfold_windows(y, batch)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, int(round(model_len * cfg.out_sample_rate / cfg.sample_rate)))
    return pcm_out(y)


def init_mossformer2_se(key, cfg: MossFormer2SeConfig = MossFormer2SeConfig()):
    ks = jax.random.split(key, 2 * cfg.depth + 8)
    p = {
        "in_norm": {"g": jnp.ones((3 * cfg.n_mels,)), "b": jnp.zeros((3 * cfg.n_mels,))},
        "encoder": core.init_dense(ks[0], 3 * cfg.n_mels, cfg.dim),
        "pos_scale": jnp.asarray(cfg.dim**-0.5, jnp.float32),
        "mm_norm": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        "intra_norm": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        "tail_act": {"alpha": jnp.asarray(0.25, jnp.float32)},
        "tail_gate": core.init_dense(ks[1], cfg.dim, 2 * cfg.dim),
        "decoder": core.init_dense(ks[2], cfg.dim, cfg.stft_bins, bias=False),
    }
    for i in range(cfg.depth):
        p[f"flash{i}"] = init_flash_layer(ks[3 + 2 * i], cfg.dim, vu_dim=cfg.vu_dim,
                                          qk_dim=cfg.qk_dim, dw_kernel=cfg.dw_kernel)
        p[f"fsmn{i}"] = init_gated_fsmn_block(ks[4 + 2 * i], cfg.dim, cfg.fsmn_inner,
                                              lorder=cfg.lorder, dw_kernel=cfg.dw_kernel)
    return p


def make_mossformer2_se(cfg: MossFormer2SeConfig = MossFormer2SeConfig()):
    return partial(mossformer2_se_forward, cfg=cfg)
