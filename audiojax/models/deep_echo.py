"""Deep-Echo AEC — explicit complex echo-path estimation, 16 kHz.

Parity target: /root/reference/Deep_Echo_AEC/Export_Deep_Echo.py — same
319/160 STFT and CFB/CepsUnit family as SDAEC (eps 1e-8 LayerNorm variant),
but a lighter net (1 CFB encoder + 1 CFB decoder) whose head predicts an
order-10 COMPLEX echo-path filter per (bin, frame); the echo estimate is
Σ_l path_l · delayed_far_l over a causal delay bank (the reference builds the
bank with a grouped identity-kernel conv2d, Export_Deep_Echo.py:303-311 —
here it is L shifted slices), and the output is mic − echo → ISTFT.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..dsp import StftConfig, istft_packed, stft_packed
from ..dsp.pcm import fold_windows, pcm_in, pcm_out, resample_linear, unfold_windows
from ..nn import core
from ..nn.cfb import cfb, ch_lstm_f, ch_lstm_t, init_cfb, init_ch_lstm_f, init_ch_lstm_t, init_iccrn_ln, iccrn_layer_norm

LN_EPS = 1e-8  # Deep-Echo LayerNorm epsilon (Export_Deep_Echo.py:186-189)


@dataclasses.dataclass(frozen=True)
class DeepEchoConfig:
    n_fft: int = 319
    hop: int = 160
    window: str = "hamming"
    channels: int = 20
    echo_order: int = 10
    sample_rate: int = 16000
    in_sample_rate: int = 16000
    out_sample_rate: int = 16000
    fold_window: int = 0

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window, pad_mode="constant")

    @property
    def f_bins(self) -> int:
        return self.n_fft // 2 + 1


def apply_echo_path(far, path, order: int):
    """echo = Σ_l path_l · far delayed by (order−1−l) frames (complex).

    far: (B, T, F, 2); path: (B, T, F, 2, order) → echo (B, T, F, 2)."""
    t = far.shape[1]
    padded = jnp.pad(far, [(0, 0), (order - 1, 0), (0, 0), (0, 0)])
    delayed = jnp.stack([padded[:, l : l + t] for l in range(order)], axis=-1)  # (B,T,F,2,L)
    dr, di = delayed[..., 0, :], delayed[..., 1, :]
    pr, pi = path[..., 0, :], path[..., 1, :]
    echo_re = jnp.sum(pr * dr - pi * di, axis=-1)
    echo_im = jnp.sum(pr * di + pi * dr, axis=-1)
    return jnp.stack([echo_re, echo_im], axis=-1)


def deep_echo_net(p, mix, far, cfg: DeepEchoConfig):
    """mix/far (B, T, F, 2) complex-last → enhanced packed (B, T, 2F)."""
    # checkpoint channel order: [mix_re, far_re, mix_im, far_im]
    # (Export_Deep_Echo.py:418-421)
    x = jnp.stack([mix[..., 0], far[..., 0], mix[..., 1], far[..., 1]], axis=-1)
    e0 = ch_lstm_f(p["in_lstm"], x)
    e0 = core.dense(p["in_conv"], jnp.concatenate([e0, x], axis=-1))
    e1 = cfb(p["enc"], e0, LN_EPS)
    mid = ch_lstm_t(p["mid_lstm"], iccrn_layer_norm(p["mid_ln"], e1, LN_EPS))
    d1 = cfb(p["dec"], e1 * mid, LN_EPS)
    d0 = ch_lstm_t(p["out_lstm"], jnp.concatenate([e0, d1], axis=-1))
    out = core.dense(p["out_conv"], jnp.concatenate([d0, d1], axis=-1))  # (B,T,F,2*order)
    path = out.reshape(*out.shape[:-1], 2, cfg.echo_order)
    enhanced = mix - apply_echo_path(far, path, cfg.echo_order)
    return jnp.concatenate([enhanced[..., 0], enhanced[..., 1]], axis=-1)


def deep_echo_forward(params, near_end, far_end, cfg: DeepEchoConfig = DeepEchoConfig()):
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

    spec = stft_packed(x, cfg.stft)
    nb = spec.shape[0] // 2
    fb = cfg.f_bins
    to_cl = lambda s: jnp.stack([s[..., :fb], s[..., fb:]], axis=-1)
    out = deep_echo_net(params, to_cl(spec[:nb]), to_cl(spec[nb:]), cfg)
    y = istft_packed(out, cfg.stft, out_length=x.shape[-1])

    if cfg.fold_window:
        y = unfold_windows(y, batch)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, model_len * cfg.out_sample_rate // cfg.sample_rate)
    return pcm_out(y)


def init_deep_echo(key, cfg: DeepEchoConfig = DeepEchoConfig()):
    c = cfg.channels
    ks = jax.random.split(key, 8)
    return {
        "in_lstm": init_ch_lstm_f(ks[0], 4, c, c),
        "in_conv": core.init_dense(ks[1], 4 + c, c),
        "enc": init_cfb(ks[2], c, c),
        "mid_ln": init_iccrn_ln(cfg.f_bins, c),
        "mid_lstm": init_ch_lstm_t(ks[3], c, 2 * c, c, num_layers=2),
        "dec": init_cfb(ks[4], c, c),
        "out_lstm": init_ch_lstm_t(ks[5], 2 * c, c, 2 * c),
        "out_conv": core.init_dense(ks[6], 3 * c, 2 * cfg.echo_order),
    }


def make_deep_echo(cfg: DeepEchoConfig = DeepEchoConfig()):
    def fn(params, near_end, far_end):
        return deep_echo_forward(params, near_end, far_end, cfg=cfg)

    return fn
