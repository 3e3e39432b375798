"""H-GTCRN — 2-microphone hybrid denoiser (WPE → AuxIVA → GTCRN-IVA), 16 kHz.

Parity target: /root/reference/H-GTCRN/Export_H_GTCRN.py — the classical
front-end runs INSIDE the graph: multi-channel STFT (512/256, hann, reflect)
→ WPE dereverberation (Lg = rt60·fs/hop taps, complex CG solve) → 10-iter
AuxIVA blind separation (analytic 2×2 solve, projection-back) → source pick
by energy → 6-channel feature [mic0 re/im, mic1 re/im, selected log-mag,
other log-mag] → GTCRN-IVA backbone → complex ratio mask applied to mic 0 →
ISTFT.  DC removal uses the global mean over both channels
(Export_H_GTCRN.py:969).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..dsp import StftConfig
from ..dsp.pcm import pcm_in, resample_linear
from ..nn.spatial import auxiva, wpe
from .gtcrn import GtcrnConfig, gtcrn_backbone, init_gtcrn


@dataclasses.dataclass(frozen=True)
class HGtcrnConfig:
    n_fft: int = 512
    hop: int = 256
    window: str = "hann"
    pad_mode: str = "reflect"
    rt60: float = 0.3
    wpe_delay: int = 2
    wpe_iter: int = 1
    cg_iter: int = 36
    iva_iter: int = 10
    sample_rate: int = 16000
    in_sample_rate: int = 16000
    out_sample_rate: int = 16000

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window, pad_mode=self.pad_mode)

    @property
    def wpe_taps(self) -> int:
        return int(self.rt60 * self.sample_rate / self.hop)

    @property
    def gtcrn_cfg(self) -> GtcrnConfig:
        # H-GTCRN's GTCRN-IVA core differs from plain GTCRN in two ways:
        # the ERB log scale is 24.7 (Export_H_GTCRN.py:102-105) and the
        # decoder GT depth convs are causal regular convs, not transposed
        # (Export_H_GTCRN.py:236-300 — ConvBlock default use_deconv=False).
        return GtcrnConfig(n_fft=self.n_fft, hop=self.hop, window=self.window,
                           pad_mode=self.pad_mode, erb_scale=24.7,
                           dec_gt_deconv=False)


def h_gtcrn_forward(params, audio, cfg: HGtcrnConfig = HGtcrnConfig()):
    """int16 (B, 2, L) two-microphone audio → denoised int16 (B, L)."""
    b, ch, length = audio.shape
    assert ch == 2, "H-GTCRN expects 2-channel input"
    x = pcm_in(audio)
    if cfg.in_sample_rate != cfg.sample_rate:
        x = resample_linear(x, length * cfg.sample_rate // cfg.in_sample_rate)
    x = x - jnp.mean(x, axis=(-2, -1), keepdims=True)  # global DC over both mics

    model_len = x.shape[-1]
    padded = -(-model_len // cfg.hop) * cfg.hop
    if padded != model_len:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, padded - model_len)])

    from ..ops.stft_pallas import fast_istft_packed, fast_stft_packed

    packed = fast_stft_packed(x.reshape(b * 2, -1), cfg.stft)  # Pallas-fused on TPU
    re, im = packed[..., : cfg.stft.f_bins], packed[..., cfg.stft.f_bins :]  # (2B, T, F)
    t, fb = re.shape[1], re.shape[2]
    spec = (re + 1j * im).reshape(b, 2, t, fb)
    spec_cf = jnp.swapaxes(spec, 2, 3)  # (B, 2, F, T)

    drb = wpe(spec_cf, taps=cfg.wpe_taps, delay=cfg.wpe_delay,
              num_iter=cfg.wpe_iter, cg_iter=cfg.cg_iter)
    sep = auxiva(drb, n_iter=cfg.iva_iter)  # (B, 2, F, T)

    power = jnp.square(jnp.abs(sep))
    energy = jnp.sum(power, axis=(2, 3))  # (B, 2)
    # reference picks source 0 when energy_0 < energy_1 (Export_H_GTCRN.py:1006)
    pick_first = (energy[:, 0] < energy[:, 1])[:, None, None]
    log_mag = 0.5 * jnp.log10(jnp.clip(power, 1e-24, None))  # (B, 2, F, T)
    sel_log = jnp.where(pick_first, log_mag[:, 0], log_mag[:, 1])
    unsel_log = jnp.where(pick_first, log_mag[:, 1], log_mag[:, 0])

    # features channel-last (B, T, F, 6): [re0, im0, re1, im1, sel, unsel]
    feat = jnp.stack(
        [
            spec[:, 0].real, spec[:, 0].imag,
            spec[:, 1].real, spec[:, 1].imag,
            jnp.swapaxes(sel_log, 1, 2), jnp.swapaxes(unsel_log, 1, 2),
        ],
        axis=-1,
    )

    m = gtcrn_backbone(params, feat, cfg.gtcrn_cfg)  # (B, T, F, 2)
    re0, im0 = spec[:, 0].real, spec[:, 0].imag
    s_re = re0 * m[..., 0] - im0 * m[..., 1]
    s_im = im0 * m[..., 0] + re0 * m[..., 1]
    y = fast_istft_packed(jnp.concatenate([s_re, s_im], axis=-1), cfg.stft)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, model_len * cfg.out_sample_rate // cfg.sample_rate)
    y = jnp.where(jnp.isnan(y), 0.0, y * 32767.0)
    return jnp.clip(y, -32768.0, 32767.0).astype(jnp.int16)


def init_h_gtcrn(key, cfg: HGtcrnConfig = HGtcrnConfig()):
    """GTCRN params with a 6-channel (→18 after SFE) first encoder conv."""
    from ..nn import core

    k_base, k_enc0 = jax.random.split(key)
    params = init_gtcrn(k_base, cfg.gtcrn_cfg)
    params["enc0"]["conv"] = core.init_conv2d(k_enc0, 1, 5, 18, cfg.gtcrn_cfg.channels)
    return params


def make_h_gtcrn(cfg: HGtcrnConfig = HGtcrnConfig()):
    return partial(h_gtcrn_forward, cfg=cfg)
