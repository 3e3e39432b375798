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

import jax
import jax.numpy as jnp

from ..dsp import StftConfig, istft_packed, stft_packed
from ..dsp.pcm import pcm_in, pcm_out, resample_linear
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
    center: bool = True  # False = snip-edges framing (streaming-equivalent)
    # The standalone exports mean-center the pair (Export_SDAEC.py:399); the
    # DFSMN_AEC cascade does NOT (_preprocess_audio_pair,
    # /root/reference/DFSMN_AEC/Export_DFSMN_AEC.py:1198-1216) — the cascade
    # builds backends with demean=False.
    demean: bool = True
    # The cascade passes the echo-cancelled temp waveform between stages in
    # float (Export_DFSMN_AEC.py:1239-1263 keeps ``temp`` as the ISTFT's float
    # output); int16-quantizing a small AEC residual costs ~-17 dB, so the
    # cascade builds backends with float_output=True.
    float_output: bool = False

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window,
                          pad_mode="constant", center=self.center)

    @property
    def f_bins(self) -> int:
        return self.n_fft // 2 + 1  # 160


def alpha_align(p, mix_power, far_power, k: int, cache=None, *, return_cache: bool = False):
    """Fused AlphaPredictor: causal conv over [mix_power, far_power] frames
    (Export_SDAEC.py:371-380). powers (B, T) each → |alpha| (B, T).

    ``cache`` carries the previous (k−1) power pairs across streaming chunks
    (zero history ≡ the offline left pad)."""
    feats = jnp.stack([mix_power, far_power], axis=-1)  # (B, T, 2)
    if cache is None:
        cache = jnp.zeros((feats.shape[0], k - 1, 2), feats.dtype)
    full = jnp.concatenate([cache, feats], axis=1)
    a = core.conv1d(p, full)  # kernel (k, 2, 1), valid over T outputs
    alpha = jnp.abs(a[..., 0])
    # slice by start index: -(k-1) with k=1 would be -0: (the whole history)
    return (alpha, full[:, full.shape[1] - (k - 1):]) if return_cache else alpha


def iccrn_net(p, x, cfg: SdaecConfig, state=None):
    """(B, T, 160, 4) [mix_re, mix_im, far_re, far_im] → (B, T, 320) packed.

    All time recurrence lives in the two CH_LSTM_T stacks; ``state``
    (from :func:`sdaec_stream_init`) carries their (h, c) pairs across
    streaming chunks and returns ``(packed, new_state)``."""
    e0 = ch_lstm_f(p["in_lstm"], x)
    e0 = core.dense(p["in_conv"], jnp.concatenate([e0, x], axis=-1))
    enc = [e0]
    h = e0
    for i in range(5):
        h = cfb(p[f"enc{i}"], h, LN_EPS)
        enc.append(h)
    mid, mid_state = ch_lstm_t(p["mid_lstm"], iccrn_layer_norm(p["mid_ln"], h, LN_EPS),
                               state=None if state is None else state["mid"],
                               return_state=True)
    h = cfb(p["dec0"], enc[5] * mid, LN_EPS)
    for i in range(1, 5):
        h = cfb(p[f"dec{i}"], jnp.concatenate([enc[5 - i], h], axis=-1), LN_EPS)
    d0, out_state = ch_lstm_t(p["out_lstm"], jnp.concatenate([e0, h], axis=-1),
                              state=None if state is None else state["out"],
                              return_state=True)
    out = core.dense(p["out_conv"], jnp.concatenate([d0, h], axis=-1))  # (B, T, 160, 2)
    packed = jnp.concatenate([out[..., 0], out[..., 1]], axis=-1)  # (B, T, 320)
    return packed if state is None else (packed, {"mid": mid_state, "out": out_state})


def sdaec_forward(params, near_end, far_end, cfg: SdaecConfig = SdaecConfig()):
    """(near int16 (B, L), far int16 (B, L)) → echo-cancelled int16 (B, L)."""
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
    # SDAEC/STFT_Process.py:178) then reconstructs all ``padded`` samples —
    # the last half-window from the decaying COLA edge, exactly like the
    # reference graph
    padded = -(-model_len // cfg.hop) * cfg.hop
    x = jnp.pad(x, [(0, 0), (0, padded - model_len)])

    from ..ops.stft_pallas import fast_istft_packed, fast_stft_packed

    spec = fast_stft_packed(x, cfg.stft)  # (2B', T, 2F); Pallas-fused on TPU
    nb = spec.shape[0] // 2
    mix, far = spec[:nb], spec[nb:]

    mix_power = jnp.sum(mix * mix, axis=-1)  # (B', T)
    far_power = jnp.sum(far * far, axis=-1)
    alpha = alpha_align(params["alpha"], mix_power, far_power, cfg.alpha_k)
    far = far * alpha[..., None]

    fb = cfg.f_bins
    feats = jnp.stack([mix[..., :fb], mix[..., fb:], far[..., :fb], far[..., fb:]], axis=-1)
    out = iccrn_net(params, feats, cfg)
    y = fast_istft_packed(out, cfg.stft, out_length=x.shape[-1])
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, model_len * cfg.out_sample_rate // cfg.sample_rate)
    return y if cfg.float_output else pcm_out(y)


# ─────────────────────────────────────────────────────────────────────────────
# Streaming (state-carry echo cancellation: the SURVEY.md §5 "north star" —
# SDAEC is causal in time: freq-axis LSTMs run per frame, the two time-LSTM
# stacks and the alpha conv carry explicit state)
# ─────────────────────────────────────────────────────────────────────────────


def sdaec_stream_init(cfg: SdaecConfig = SdaecConfig(), batch: int = 1):
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
        "alpha": jnp.zeros((batch, cfg.alpha_k - 1, 2), jnp.float32),
        "net": {"mid": [z(2 * c), z(2 * c)], "out": [z(c)]},
        "ola_tail": jnp.zeros((batch, carry), jnp.float32),
    }


def sdaec_stream_step(params, state, near_chunk, far_chunk, cfg: SdaecConfig = SdaecConfig()):
    """One streaming AEC step: int16 chunks (B, m·hop) → (state, int16 out).

    Semantics: processes the inputs as if (n_fft − hop) zeros were prepended,
    with snip-edges framing — matches the offline ``center=False`` path on the
    zero-prepended pair to within f32 reassociation, delayed by (n_fft − hop)
    samples.  No DC removal (the offline path removes the clip-global mean,
    which a live stream cannot know).
    """
    from ..dsp.stft import stream_istft

    assert near_chunk.shape[-1] % cfg.hop == 0, "chunk length must be a hop multiple"
    frame_cfg = dataclasses.replace(cfg.stft, center=False)

    near = pcm_in(near_chunk)
    far = pcm_in(far_chunk)
    buf_n = jnp.concatenate([state["near_tail"], near], axis=-1)
    buf_f = jnp.concatenate([state["far_tail"], far], axis=-1)

    mix = stft_packed(buf_n, frame_cfg)  # (B, m, 2F)
    fspec = stft_packed(buf_f, frame_cfg)
    mix_power = jnp.sum(mix * mix, axis=-1)
    far_power = jnp.sum(fspec * fspec, axis=-1)
    alpha, alpha_cache = alpha_align(params["alpha"], mix_power, far_power,
                                     cfg.alpha_k, state["alpha"], return_cache=True)
    fspec = fspec * alpha[..., None]

    fb = cfg.f_bins
    feats = jnp.stack([mix[..., :fb], mix[..., fb:], fspec[..., :fb], fspec[..., fb:]], axis=-1)
    packed, net_state = iccrn_net(params, feats, cfg, state=state["net"])

  # (B, m·hop + n_fft − hop)

    carry = cfg.n_fft - cfg.hop
    emit_len = near_chunk.shape[-1]
    out, new_tail = stream_istft(packed, frame_cfg, state["ola_tail"], emit_len)

    new_state = {
        "near_tail": buf_n[:, -carry:],
        "far_tail": buf_f[:, -carry:],
        "alpha": alpha_cache,
        "net": net_state,
        "ola_tail": new_tail,
    }
    return new_state, (out if cfg.float_output else pcm_out(out))


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
