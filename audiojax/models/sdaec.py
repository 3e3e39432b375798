"""SDAEC — time-alignment-free acoustic echo cancellation, 16 kHz.

Parity target: /root/reference/SDAEC/Export_SDAEC.py — odd-NFFT STFT
(319/160, periodic hamming, constant centre pad, 160 bins), AlphaPredictor
time alignment fused into one causal 2-channel conv over per-frame powers
(k=10) that scales the far-end spectrum, then the ICCRN: frequency-LSTM in →
1×1 → 5 CFB encoders → time-LSTM bottleneck (2 layers) → 5 CFB decoders with
skip concats → time-LSTM out → 1×1 → packed (real, imag) → ISTFT.

Channel-last (B, T, F=160, C); CFB/CepsUnit/CH-LSTM blocks live in
audiojax.nn.cfb.  The reference fuses the in/out LSTMs' linear layers into
the adjacent 1×1 convs (Export_SDAEC.py:243-267) — algebraically identical to
this unfused form; the importer may fold them.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..dsp import StftConfig, istft_packed, stft_packed
from ..dsp.pcm import fold_windows, pcm_in, pcm_out, resample_linear, unfold_windows
from ..nn import core
from ..nn.cfb import cfb, ch_lstm_f, ch_lstm_t, init_cfb, init_ch_lstm_f, init_ch_lstm_t, init_iccrn_ln, iccrn_layer_norm

LN_EPS = 1e-6  # SDAEC LayerNorm unbiased-variance epsilon (Export_SDAEC.py:139)


@dataclasses.dataclass(frozen=True)
class SdaecConfig:
    n_fft: int = 319
    hop: int = 160
    window: str = "hamming"  # periodic (SDAEC registry)
    channels: int = 20
    alpha_k: int = 10
    sample_rate: int = 16000
    in_sample_rate: int = 16000
    out_sample_rate: int = 16000
    fold_window: int = 0

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window, pad_mode="constant")

    @property
    def f_bins(self) -> int:
        return self.n_fft // 2 + 1  # 160


def alpha_align(p, mix_power, far_power, k: int):
    """Fused AlphaPredictor: causal conv over [mix_power, far_power] frames
    (Export_SDAEC.py:371-380). powers (B, T) each → |alpha| (B, T)."""
    feats = jnp.stack([mix_power, far_power], axis=-1)  # (B, T, 2)
    feats = jnp.pad(feats, [(0, 0), (k - 1, 0), (0, 0)])
    a = core.conv1d(p, feats)  # kernel (k, 2, 1)
    return jnp.abs(a[..., 0])


def iccrn_net(p, x, cfg: SdaecConfig):
    """(B, T, 160, 4) [mix_re, mix_im, far_re, far_im] → (B, T, 320) packed."""
    e0 = ch_lstm_f(p["in_lstm"], x)
    e0 = core.dense(p["in_conv"], jnp.concatenate([e0, x], axis=-1))
    enc = [e0]
    h = e0
    for i in range(5):
        h = cfb(p[f"enc{i}"], h, LN_EPS)
        enc.append(h)
    mid = ch_lstm_t(p["mid_lstm"], iccrn_layer_norm(p["mid_ln"], h, LN_EPS))
    h = cfb(p["dec0"], enc[5] * mid, LN_EPS)
    for i in range(1, 5):
        h = cfb(p[f"dec{i}"], jnp.concatenate([enc[5 - i], h], axis=-1), LN_EPS)
    d0 = ch_lstm_t(p["out_lstm"], jnp.concatenate([e0, h], axis=-1))
    out = core.dense(p["out_conv"], jnp.concatenate([d0, h], axis=-1))  # (B, T, 160, 2)
    return jnp.concatenate([out[..., 0], out[..., 1]], axis=-1)  # (B, T, 320)


def sdaec_forward(params, near_end, far_end, cfg: SdaecConfig = SdaecConfig()):
    """(near int16 (B, L), far int16 (B, L)) → echo-cancelled int16 (B, L)."""
    pair = jnp.concatenate([near_end, far_end], axis=0)
    x = pcm_in(pair)
    if cfg.in_sample_rate != cfg.sample_rate:
        x = resample_linear(x, x.shape[-1] * cfg.sample_rate // cfg.in_sample_rate)
    x = x - jnp.mean(x, axis=-1, keepdims=True)

    batch = near_end.shape[0]
    model_len = x.shape[-1]
    if cfg.fold_window:
        raise ValueError("in-graph batch-fold is unsupported for odd-NFFT models; "
                         "use session-level window batching instead")
    # odd NFFT loses one hop through STFT->ISTFT (T = (L-1)//hop + 1); pad one
    # extra hop so the output covers the full input length (the reference
    # instead emits a shorter clip and slides the host window by the output
    # length, Inference template stride correction)
    padded = (-(-model_len // cfg.hop) + 1) * cfg.hop
    x = jnp.pad(x, [(0, 0), (0, padded - model_len)])

    spec = stft_packed(x, cfg.stft)  # (2B', T, 2F)
    nb = spec.shape[0] // 2
    mix, far = spec[:nb], spec[nb:]

    mix_power = jnp.sum(mix * mix, axis=-1)  # (B', T)
    far_power = jnp.sum(far * far, axis=-1)
    alpha = alpha_align(params["alpha"], mix_power, far_power, cfg.alpha_k)
    far = far * alpha[..., None]

    fb = cfg.f_bins
    feats = jnp.stack([mix[..., :fb], mix[..., fb:], far[..., :fb], far[..., fb:]], axis=-1)
    out = iccrn_net(params, feats, cfg)
    y = istft_packed(out, cfg.stft, out_length=x.shape[-1])

    if cfg.fold_window:
        y = unfold_windows(y, batch)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, model_len * cfg.out_sample_rate // cfg.sample_rate)
    return pcm_out(y)


def init_sdaec(key, cfg: SdaecConfig = SdaecConfig()):
    c = cfg.channels
    ks = jax.random.split(key, 18)
    params = {
        "alpha": {"w": core.glorot(ks[0], (cfg.alpha_k, 2, 1)), "b": jnp.zeros((1,))},
        "in_lstm": init_ch_lstm_f(ks[1], 4, c, c),
        "in_conv": core.init_dense(ks[2], 4 + c, c),
        "mid_ln": init_iccrn_ln(cfg.f_bins, c),
        "mid_lstm": init_ch_lstm_t(ks[3], c, 2 * c, c, num_layers=2),
        "out_lstm": init_ch_lstm_t(ks[4], 2 * c, c, 2 * c),
        "out_conv": core.init_dense(ks[5], 3 * c, 2),
    }
    for i in range(5):
        params[f"enc{i}"] = init_cfb(ks[6 + i], c, c)
    params["dec0"] = init_cfb(ks[11], c, c)
    for i in range(1, 5):
        params[f"dec{i}"] = init_cfb(ks[11 + i], 2 * c, c)
    return params


def make_sdaec(cfg: SdaecConfig = SdaecConfig()):
    def fn(params, near_end, far_end):
        return sdaec_forward(params, near_end, far_end, cfg=cfg)

    return fn
