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
from ..dsp.pcm import pcm_in, pcm_out, resample_linear
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
    center: bool = True  # False = snip-edges framing (streaming-equivalent)
    # The standalone exports mean-center the pair (Export_Deep_Echo.py:386); the
    # DFSMN_AEC cascade does NOT (_preprocess_audio_pair,
    # /root/reference/DFSMN_AEC/Export_DFSMN_AEC.py:1198-1216) — the cascade
    # builds backends with demean=False.
    demean: bool = True
    # The cascade chains the temp waveform in float (see sdaec.py:
    # SdaecConfig.float_output); cascade backends set float_output=True.
    float_output: bool = False

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window,
                          pad_mode="constant", center=self.center)

    @property
    def f_bins(self) -> int:
        return self.n_fft // 2 + 1


def apply_echo_path(far, path, order: int, history=None):
    """echo = Σ_l path_l · far delayed by (order−1−l) frames (complex).

    far: (B, T, F, 2); path: (B, T, F, 2, order) → echo (B, T, F, 2).
    ``history``: previous (order−1) far frames for streaming (zeros ≡ the
    offline left pad)."""
    t = far.shape[1]
    if history is None:
        padded = jnp.pad(far, [(0, 0), (order - 1, 0), (0, 0), (0, 0)])
    else:
        padded = jnp.concatenate([history, far], axis=1)
    delayed = jnp.stack([padded[:, l : l + t] for l in range(order)], axis=-1)  # (B,T,F,2,L)
    dr, di = delayed[..., 0, :], delayed[..., 1, :]
    pr, pi = path[..., 0, :], path[..., 1, :]
    echo_re = jnp.sum(pr * dr - pi * di, axis=-1)
    echo_im = jnp.sum(pr * di + pi * dr, axis=-1)
    return jnp.stack([echo_re, echo_im], axis=-1)


def deep_echo_net(p, mix, far, cfg: DeepEchoConfig, state=None):
    """mix/far (B, T, F, 2) complex-last → enhanced packed (B, T, 2F).

    ``state`` (from :func:`deep_echo_stream_init`) carries the two time-LSTM
    stacks and the far-spectrum delay-bank history across streaming chunks."""
    # checkpoint channel order: [mix_re, far_re, mix_im, far_im]
    # (Export_Deep_Echo.py:418-421)
    x = jnp.stack([mix[..., 0], far[..., 0], mix[..., 1], far[..., 1]], axis=-1)
    e0 = ch_lstm_f(p["in_lstm"], x)
    e0 = core.dense(p["in_conv"], jnp.concatenate([e0, x], axis=-1))
    e1 = cfb(p["enc"], e0, LN_EPS)
    mid, mid_state = ch_lstm_t(p["mid_lstm"], iccrn_layer_norm(p["mid_ln"], e1, LN_EPS),
                               state=None if state is None else state["mid"],
                               return_state=True)
    d1 = cfb(p["dec"], e1 * mid, LN_EPS)
    d0, out_state = ch_lstm_t(p["out_lstm"], jnp.concatenate([e0, d1], axis=-1),
                              state=None if state is None else state["out"],
                              return_state=True)
    out = core.dense(p["out_conv"], jnp.concatenate([d0, d1], axis=-1))  # (B,T,F,2*order)
    path = out.reshape(*out.shape[:-1], 2, cfg.echo_order)
    hist = None if state is None else state["far_hist"]
    enhanced = mix - apply_echo_path(far, path, cfg.echo_order, history=hist)
    packed = jnp.concatenate([enhanced[..., 0], enhanced[..., 1]], axis=-1)
    if state is None:
        return packed
    far_full = far if hist is None else jnp.concatenate([hist, far], axis=1)
    # slice by start: -(order-1) with order=1 would be -0: (whole history)
    new_state = {"mid": mid_state, "out": out_state,
                 "far_hist": far_full[:, far_full.shape[1] - (cfg.echo_order - 1):]}
    return packed, new_state


def deep_echo_forward(params, near_end, far_end, cfg: DeepEchoConfig = DeepEchoConfig()):
    pair = jnp.concatenate([near_end, far_end], axis=0)
    x = pcm_in(pair)
    if cfg.in_sample_rate != cfg.sample_rate:
        x = resample_linear(x, x.shape[-1] * cfg.sample_rate // cfg.in_sample_rate)
    if cfg.demean:
        x = x - jnp.mean(x, axis=-1, keepdims=True)

    model_len = x.shape[-1]
    if cfg.fold_window:
        raise ValueError("in-graph batch-fold is unsupported for odd-NFFT models; "
                         "use session-level window batching instead")
    # hop-align; the exact-output_length ISTFT (reference semantics,
    # SDAEC/STFT_Process.py:178, same contract in Deep_Echo's
    # static_norm_divisor path) reconstructs all ``padded`` samples — the
    # last half-window from the decaying COLA edge, exactly like the
    # reference graph
    padded = -(-model_len // cfg.hop) * cfg.hop
    x = jnp.pad(x, [(0, 0), (0, padded - model_len)])

    from ..ops.stft_pallas import fast_istft_packed, fast_stft_packed

    spec = fast_stft_packed(x, cfg.stft)  # Pallas-fused on TPU
    nb = spec.shape[0] // 2
    fb = cfg.f_bins
    to_cl = lambda s: jnp.stack([s[..., :fb], s[..., fb:]], axis=-1)
    out = deep_echo_net(params, to_cl(spec[:nb]), to_cl(spec[nb:]), cfg)
    y = fast_istft_packed(out, cfg.stft, out_length=x.shape[-1])
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, model_len * cfg.out_sample_rate // cfg.sample_rate)
    return y if cfg.float_output else pcm_out(y)


# ─────────────────────────────────────────────────────────────────────────────
# Streaming (state-carry AEC; same recipe as SDAEC plus the far-spectrum
# delay-bank history for the order-10 echo-path filter)
# ─────────────────────────────────────────────────────────────────────────────


def deep_echo_stream_init(cfg: DeepEchoConfig = DeepEchoConfig(), batch: int = 1):
    if cfg.in_sample_rate != cfg.sample_rate or cfg.out_sample_rate != cfg.sample_rate:
        raise ValueError(
            f"streaming runs at the model rate only ({cfg.sample_rate} Hz); "
            "resample on the host (the offline forward resamples "
            "in-graph, the stream step does not)")
    carry = cfg.n_fft - cfg.hop
    c = cfg.channels
    z = lambda h: (jnp.zeros((batch * cfg.f_bins, h), jnp.float32),
                   jnp.zeros((batch * cfg.f_bins, h), jnp.float32))
    return {
        "near_tail": jnp.zeros((batch, carry), jnp.float32),
        "far_tail": jnp.zeros((batch, carry), jnp.float32),
        "net": {
            "mid": [z(2 * c), z(2 * c)],
            "out": [z(c)],
            "far_hist": jnp.zeros((batch, cfg.echo_order - 1, cfg.f_bins, 2), jnp.float32),
        },
        "ola_tail": jnp.zeros((batch, carry), jnp.float32),
    }


def deep_echo_stream_step(params, state, near_chunk, far_chunk,
                          cfg: DeepEchoConfig = DeepEchoConfig()):
    """One streaming AEC step: int16 chunks (B, m·hop) → (state, int16 out).

    Like SDAEC, the constant center pad coincides with the streaming zero
    prefix, so the stream matches the offline path exactly at a
    (n_fft − hop)-sample delay (no DC removal in the stream)."""
    from ..dsp.stft import stream_istft

    assert near_chunk.shape[-1] % cfg.hop == 0, "chunk length must be a hop multiple"
    frame_cfg = dataclasses.replace(cfg.stft, center=False)

    buf_n = jnp.concatenate([state["near_tail"], pcm_in(near_chunk)], axis=-1)
    buf_f = jnp.concatenate([state["far_tail"], pcm_in(far_chunk)], axis=-1)

    fb = cfg.f_bins
    to_cl = lambda s: jnp.stack([s[..., :fb], s[..., fb:]], axis=-1)
    mix = to_cl(stft_packed(buf_n, frame_cfg))
    far = to_cl(stft_packed(buf_f, frame_cfg))

    packed, net_state = deep_echo_net(params, mix, far, cfg, state=state["net"])



    carry = cfg.n_fft - cfg.hop
    emit_len = near_chunk.shape[-1]
    out, new_tail = stream_istft(packed, frame_cfg, state["ola_tail"], emit_len)

    new_state = {
        "near_tail": buf_n[:, -carry:],
        "far_tail": buf_f[:, -carry:],
        "net": net_state,
        "ola_tail": new_tail,
    }
    return new_state, (out if cfg.float_output else pcm_out(out))


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
