"""MossFormer2-SR — speech super-resolution 16 kHz → 48 kHz.

Parity target: /root/reference/MossFormer2_Super_Resolution/Export_MossFormer_SR.py —
polyphase windowed-sinc ×3 upsampler (ConvTranspose, Kaiser β=9, per-phase DC
gain, PCM scale folded) → HiFi-GAN-style log-mel (80 slaney mels, 1024/256
hann, reflect (nfft−hop)/2 pad) → MossFormer MaskNet (FLASH + FSMN, SR
variant flags) → HiFi-GAN generator (Snake activations, ups [8,8,2,2],
3 resblocks/stage, tanh) → bandwidth-substitution crossover:
out = generator + FIR_lowpass(input − generator) with a 511-tap Kaiser sinc
at 5.5 kHz.  Host OLA with Hann taper is the runtime session's job.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..dsp import StftConfig, frame_signal
from ..dsp.pcm import INV_INT16
from ..frontend.mel import slaney_mel_fbanks
from ..nn import core
from ..nn.mossformer import (
    flash_layer,
    gated_fsmn_block,
    init_flash_layer,
    init_gated_fsmn_block,
    sinusoid_positions,
)
from .mossformer2_se import group_norm_all


@dataclasses.dataclass(frozen=True)
class MossFormerSrConfig:
    n_mels: int = 80
    n_fft: int = 1024
    hop: int = 256
    dim: int = 512
    depth: int = 24
    group_size: int = 256
    qk_dim: int = 128
    vu_dim: int = 1024
    rot_dim: int = 32
    fsmn_inner: int = 256
    lorder: int = 20
    dw_kernel: int = 17
    upsample_ratio: int = 3
    resample_halfwidth: int = 32
    crossover_hz: float = 5500.0
    crossover_taps: int = 511
    crossover_beta: float = 8.0
    gen_channels: int = 1024
    gen_up_rates: tuple = (8, 8, 2, 2)
    gen_up_kernels: tuple = (16, 16, 4, 4)
    gen_res_kernels: tuple = (3, 7, 11)
    gen_res_dilations: tuple = (1, 3, 5)
    in_sample_rate: int = 16000
    out_sample_rate: int = 48000
    # compute dtype for the mask net; the sinc upsampler, mel front-end,
    # HiFi-GAN generator and crossover stay float32 (waveform-domain ops)
    compute_dtype: str = "float32"

    @property
    def mel_cfg(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window="hann", center=False)


@lru_cache(maxsize=None)
def _upsample_kernel_np(ratio: int, halfwidth: int) -> np.ndarray:
    """Windowed-sinc interpolation kernel with per-phase unit DC gain and the
    int16 PCM scale folded in (Export_MossFormer_SR.py:176-199)."""
    m = 2 * ratio * halfwidth + 1
    n = np.arange(m, dtype=np.float64) - (m - 1) / 2.0
    h = np.sinc(n / ratio) * np.kaiser(m, 9.0)
    for p in range(ratio):
        h[p::ratio] /= h[p::ratio].sum()
    return (h * INV_INT16).astype(np.float32)


@lru_cache(maxsize=None)
def _crossover_kernel_np(taps: int, fc: float, fs: float, beta: float) -> np.ndarray:
    taps = int(taps) | 1
    c = (taps - 1) // 2
    idx = np.arange(taps, dtype=np.float64) - c
    h = np.sinc(2.0 * fc / fs * idx) * np.kaiser(taps, beta)
    return (h / h.sum()).astype(np.float32)


def upsample_sinc(audio, cfg: MossFormerSrConfig):
    """int16 (B, L) → normalised (B, ratio*L) via polyphase sinc interpolation.

    Realised as zero-stuffing + banded-GEMM FIR (dsp.fir) — the ConvTranspose
    form uses one MXU lane in 128 and is ~5× slower on chip.  The stuffed
    zeros make ratio−1 of every ratio MACs structural zeros; a true polyphase
    split would save them, but at ~0.4 GFLOP the GEMM is already bandwidth-
    trivial, so the simpler form is kept."""
    from ..dsp.fir import fir_gemm, upsample_zero_stuff

    ratio, hw = cfg.upsample_ratio, cfg.resample_halfwidth
    k = _upsample_kernel_np(ratio, hw)  # symmetric: correlation == convolution
    xd = upsample_zero_stuff(audio.astype(jnp.float32), ratio)
    return fir_gemm(xd, k, left=ratio * hw, out_len=ratio * audio.shape[-1])


def snake(p, x):
    """Snake activation: x + (1/α)·sin²(αx); α per channel (last axis)."""
    a = p["alpha"]
    return x + jnp.square(jnp.sin(a * x)) / (a + 1e-9)


def _res_block(p, x, kernel: int, dilations):
    for j, d in enumerate(dilations):
        y = snake(p[f"a1_{j}"], x)
        y = core.conv1d(p[f"c1_{j}"], y, padding=d * (kernel - 1) // 2, dilation=d)
        y = snake(p[f"a2_{j}"], y)
        y = core.conv1d(p[f"c2_{j}"], y, padding=(kernel - 1) // 2)
        x = x + y
    return x


def hifigan_generator(p, mel, cfg: MossFormerSrConfig):
    """(B, T, n_mels) → waveform (B, T*prod(up_rates))."""
    x = core.conv1d(p["pre"], mel, padding=3)
    for i, (r, k) in enumerate(zip(cfg.gen_up_rates, cfg.gen_up_kernels)):
        x = snake(p[f"up_snake{i}"], x)
        x = core.conv1d_transpose(p[f"up{i}"], x, stride=r, padding=(k - r) // 2)
        acc = None
        for j, rk in enumerate(cfg.gen_res_kernels):
            y = _res_block(p[f"res{i}_{j}"], x, rk, cfg.gen_res_dilations)
            acc = y if acc is None else acc + y
        x = acc / len(cfg.gen_res_kernels)
    x = snake(p["post_snake"], x)
    x = core.conv1d(p["post"], x, padding=3)
    return jnp.tanh(x[..., 0])


def prepare_params_sr(params, cfg: "MossFormerSrConfig"):
    """Compute-dtype cast for SR: only the masknet's own weights — the
    HiFi-GAN generator (the largest subtree) deliberately runs f32, so bf16
    copies of it would be pure waste.  Exposed as the model's
    ``prepare_params`` so serving paths can apply the cast once host-side
    instead of re-materializing it every call inside jit."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if dtype == jnp.float32:
        return params
    return {k: (core.cast_f32_tree(v, dtype) if k != "gen" else v)
            for k, v in params.items()}


def sr_masknet(p, mel, cfg: MossFormerSrConfig):
    """(B, T, n_mels) log-mel → (B, T, n_mels) enhanced mel for the generator."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if dtype != jnp.float32:
        p = prepare_params_sr(p, cfg)  # idempotent on pre-cast trees
        mel = mel.astype(dtype)
    x = group_norm_all(p["front_norm"], mel)
    x = core.dense(p["front"], x)
    x = x + sinusoid_positions(x.shape[1], cfg.dim).astype(x.dtype)[None] * p["pos_scale"]
    mdl_input = x
    h = x
    for i in range(cfg.depth):
        # The SR export shows no explicit residual Adds because it folds the
        # identity into every depthwise kernel's CENTER TAP (+1.0,
        # Export_MossFormer_SR.py:296-313,355-362) — the ConvModule and
        # UniDeepFsmn inner residuals are therefore all PRESENT, same as
        # MossFormer2-SE (caught by tests/test_reference_parity.py).
        h = flash_layer(p[f"flash{i}"], h, group_size=cfg.group_size, qk_dim=cfg.qk_dim,
                        rot_dim=cfg.rot_dim)
        h = gated_fsmn_block(p[f"fsmn{i}"], h, lorder=cfg.lorder)
    h = core.layer_norm(p["mm_norm"], h)
    h = group_norm_all(p["intra_norm"], h)
    x = h + mdl_input

    a = p["tail_alpha"]
    x = jnp.where(x >= 0, x, a * x)
    gate = core.dense(p["tail_gate"], x)
    d = cfg.dim
    x = jnp.tanh(gate[..., :d]) * jax.nn.sigmoid(gate[..., d:])
    return jax.nn.relu(core.dense(p["decoder"], x)).astype(jnp.float32)  # (B, T, n_mels)


def mossformer_sr_forward(params, audio, cfg: MossFormerSrConfig = MossFormerSrConfig()):
    """int16 (B, L) @ 16 kHz → int16 (B, 3L) @ 48 kHz."""
    in_len = audio.shape[-1]
    # NO input alignment pad: the reference frames the raw 3L upsample
    # (static_frames = floor((3L + 2·mel_pad − nfft)/hop) + 1,
    # Export_MossFormer_SR.py:138-146) and reflect-extends the generator
    # output by gen_pad = 3L − frames·hop below; zero-padding the input
    # instead would perturb the group-norm statistics and attention of
    # every frame, not just the tail.
    up = upsample_sinc(audio, cfg)  # (B, 3L) normalised
    model_len = up.shape[-1]

    # HiFi-GAN mel framing: reflect pad (nfft-hop)/2, center=False STFT
    mp = (cfg.n_fft - cfg.hop) // 2
    padded_up = jnp.concatenate(
        [jnp.flip(up[..., 1 : mp + 1], -1), up, jnp.flip(up[..., -(mp + 1) : -1], -1)], axis=-1
    )
    frames = frame_signal(padded_up, cfg.mel_cfg)
    from ..dsp.stft import _stft_basis_np

    basis = jnp.asarray(_stft_basis_np(cfg.mel_cfg))
    spec = jnp.einsum("...tn,nf->...tf", frames, basis,
                      preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    fb = cfg.n_fft // 2 + 1
    mag = jnp.sqrt(spec[..., :fb] ** 2 + spec[..., fb:] ** 2 + 1e-9)
    mel_fb = jnp.asarray(slaney_mel_fbanks(fb, 0.0, 8000.0, cfg.n_mels, float(cfg.out_sample_rate)))
    mel = jnp.log(jnp.clip(jnp.einsum("...tf,fm->...tm", mag, mel_fb,
                                      preferred_element_type=jnp.float32), 1e-5, None))

    enhanced_mel = sr_masknet(params, mel, cfg)
    gen = hifigan_generator(params["gen"], enhanced_mel, cfg)  # (B, frames*256)

    if gen.shape[-1] < model_len:  # reflect-extend the tail (Export_MossFormer_SR.py:605-607)
        gp = model_len - gen.shape[-1]
        gen = jnp.concatenate([gen, jnp.flip(gen[..., -(gp + 1) : -1], -1)], axis=-1)
    gen = gen[..., :model_len]

    # bandwidth substitution: out = gen + lowpass(up − gen)
    xo = _crossover_kernel_np(cfg.crossover_taps, cfg.crossover_hz, float(cfg.out_sample_rate),
                              cfg.crossover_beta)
    half = (len(xo) - 1) // 2
    diff = up - gen
    diff = jnp.concatenate(
        [jnp.flip(diff[..., 1 : half + 1], -1), diff, jnp.flip(diff[..., -(half + 1) : -1], -1)],
        axis=-1,
    )
    from ..dsp.fir import fir_gemm

    low = fir_gemm(diff, xo, out_len=diff.shape[-1] - (len(xo) - 1))
    out = gen + low
    out = out[..., : in_len * cfg.upsample_ratio]
    out = jnp.clip(out, -1.0, 1.0) * 32768.0
    return jnp.clip(out.astype(jnp.int32), -32768, 32767).astype(jnp.int16)


def init_mossformer_sr(key, cfg: MossFormerSrConfig = MossFormerSrConfig()):
    ks = jax.random.split(key, 2 * cfg.depth + 16)
    p = {
        "front_norm": {"g": jnp.ones((cfg.n_mels,)), "b": jnp.zeros((cfg.n_mels,))},
        "front": core.init_dense(ks[0], cfg.n_mels, cfg.dim),
        "pos_scale": jnp.asarray(cfg.dim**-0.5, jnp.float32),
        "mm_norm": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        "intra_norm": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        "tail_alpha": jnp.asarray(0.25, jnp.float32),
        "tail_gate": core.init_dense(ks[1], cfg.dim, 2 * cfg.dim),
        "decoder": core.init_dense(ks[2], cfg.dim, cfg.n_mels, bias=False),
    }
    for i in range(cfg.depth):
        p[f"flash{i}"] = init_flash_layer(ks[3 + 2 * i], cfg.dim, vu_dim=cfg.vu_dim,
                                          qk_dim=cfg.qk_dim, dw_kernel=cfg.dw_kernel)
        p[f"fsmn{i}"] = init_gated_fsmn_block(ks[4 + 2 * i], cfg.dim, cfg.fsmn_inner,
                                              lorder=cfg.lorder, dw_kernel=cfg.dw_kernel)
    # generator
    gk = jax.random.split(ks[-1], 96)
    ch = cfg.gen_channels
    gen = {"pre": core.init_conv1d(gk[0], 7, cfg.n_mels, ch)}
    gi = 1
    for i, (r, k) in enumerate(zip(cfg.gen_up_rates, cfg.gen_up_kernels)):
        gen[f"up_snake{i}"] = {"alpha": jnp.ones((ch,))}
        gen[f"up{i}"] = core.init_conv1d(gk[gi], k, ch, ch // 2)
        gi += 1
        ch //= 2
        for j, rk in enumerate(cfg.gen_res_kernels):
            rb = {}
            for jj, d in enumerate(cfg.gen_res_dilations):
                rb[f"a1_{jj}"] = {"alpha": jnp.ones((ch,))}
                rb[f"c1_{jj}"] = core.init_conv1d(gk[gi], rk, ch, ch)
                gi += 1
                rb[f"a2_{jj}"] = {"alpha": jnp.ones((ch,))}
                rb[f"c2_{jj}"] = core.init_conv1d(gk[gi], rk, ch, ch)
                gi += 1
            gen[f"res{i}_{j}"] = rb
    gen["post_snake"] = {"alpha": jnp.ones((ch,))}
    gen["post"] = core.init_conv1d(gk[gi], 7, ch, 1)
    p["gen"] = gen
    return p


def make_mossformer_sr(cfg: MossFormerSrConfig = MossFormerSrConfig()):
    return partial(mossformer_sr_forward, cfg=cfg)
