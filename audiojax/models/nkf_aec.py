"""NKF-AEC — neural-Kalman-filter acoustic echo cancellation, 16 kHz.

Parity target: /root/reference/NKF_AEC/Export_NKF_AEC.py.  Per STFT frame t
and frequency bin f, an order-L complex Kalman filter tracks the echo path:

  x_t   = ref[t-L+1 … t]                    (delay-line slice, zero history)
  dh    = h_post − h_prior ; swap(h_prior, h_post)
  e     = mic_t − ⟨x_t, h_prior⟩            (complex dot over L taps)
  kg    = KGNet([x_t, e, dh])               (complex dense → complex GRU →
                                             dense → dense, shared over bins)
  h_post = h_prior + kg·e ;  echo_t = ⟨x_t, h_post⟩
  out    = ISTFT(mic − echo)

The reference UNROLLS 126 frames into the ONNX graph (and needs graph surgery
to delete 1510 weight-alias Identities); here the recurrence is ONE
``lax.scan`` whose carry is (h_prior, h_post, 4 GRU states) — the graph is
frame-count-independent and the weights exist once.  "Complex" modules follow
the reference's real decomposition: ComplexDense applies independent real
affines to the two parts; ComplexGRU combines four real GRU passes as
(h_rr − h_ii, h_ri + h_ir); ComplexPReLU is one shared scalar slope.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..dsp import StftConfig, stft
from ..dsp.pcm import fold_windows, pcm_in, pcm_out, resample_linear, unfold_windows
from ..nn import core
from ..nn.rnn import gru_cell


@dataclasses.dataclass(frozen=True)
class NkfConfig:
    n_fft: int = 1024
    hop: int = 256
    window: str = "hann"
    filter_order: int = 4  # L
    fc_dim: int = 18
    rnn_dim: int = 18
    sample_rate: int = 16000
    in_sample_rate: int = 16000
    out_sample_rate: int = 16000
    fold_window: int = 0
    # The standalone exports mean-center the pair (Export_NKF_AEC.py:269); the
    # DFSMN_AEC cascade does NOT (_preprocess_audio_pair,
    # /root/reference/DFSMN_AEC/Export_DFSMN_AEC.py:1198-1216) — the cascade
    # builds backends with demean=False.
    demean: bool = True
    # The cascade chains the temp waveform in float (see sdaec.py:
    # SdaecConfig.float_output); cascade backends set float_output=True.
    float_output: bool = False
    center: bool = True  # False = snip-edges framing (streaming-equivalent)

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window,
                          pad_mode="constant", center=self.center)

    @property
    def f_bins(self) -> int:
        return self.n_fft // 2 + 1


def _cdense(p, x):
    """Reference ComplexDense: independent real affines on (re, im) pairs.
    x: (..., D, 2) → (..., O, 2)."""
    re = core.dense(p["r"], x[..., 0])
    im = core.dense(p["i"], x[..., 1])
    return jnp.stack([re, im], axis=-1)


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _cdot(a, b):
    """Complex dot over the tap axis: (..., L, 2) × (..., L, 2) → (..., 2)."""
    re = jnp.sum(a[..., 0] * b[..., 0] - a[..., 1] * b[..., 1], axis=-1)
    im = jnp.sum(a[..., 0] * b[..., 1] + a[..., 1] * b[..., 0], axis=-1)
    return jnp.stack([re, im], axis=-1)


def _cmul(a, b):
    re = a[..., 0] * b[..., 0] - a[..., 1] * b[..., 1]
    im = a[..., 0] * b[..., 1] + a[..., 1] * b[..., 0]
    return jnp.stack([re, im], axis=-1)


def kg_net(p, x, grus):
    """KGNet step: x (N, 2L+1, 2) → (kg (N, L, 2), new GRU states).

    ``grus`` = (h_rr, h_ir, h_ri, h_ii), each (N, rnn_dim).  The four real GRU
    passes batch as two cell calls (gru_r on [re; im], gru_i on [re; im])."""
    h_rr, h_ir, h_ri, h_ii = grus
    x = _leaky(_cdense(p["fc_in"], x), p["fc_in_slope"])
    re, im = x[..., 0], x[..., 1]
    both = jnp.concatenate([re, im], axis=0)
    out_r = gru_cell(p["gru_r"], both, jnp.concatenate([h_rr, h_ir], axis=0))
    out_i = gru_cell(p["gru_i"], both, jnp.concatenate([h_ri, h_ii], axis=0))
    n = re.shape[0]
    h_rr, h_ir = out_r[:n], out_r[n:]
    h_ri, h_ii = out_i[:n], out_i[n:]
    y = jnp.stack([h_rr - h_ii, h_ri + h_ir], axis=-1)  # (N, rnn_dim, 2)
    y = _leaky(_cdense(p["fc_mid"], y), p["fc_mid_slope"])
    kg = _cdense(p["fc_out"], y)
    return kg, (h_rr, h_ir, h_ri, h_ii)


def nkf_scan(params, ref_spec, mic_spec, cfg: NkfConfig, state=None):
    """Kalman recurrence over frames: specs are (B, T, F, 2) → echo (B, T, F, 2).

    ``state`` (from :func:`nkf_stream_init`) = (scan carry, ref delay-line
    history (B, L−1, F, 2)); with it the recurrence continues exactly across
    streaming chunks and ``(echo, new_state)`` is returned."""
    b, t_frames, f_bins, _ = ref_spec.shape
    filter_l = cfg.filter_order

    # delay-line slices: xt[t] = ref[t-L+1 … t]  (zero history)
    if state is None:
        padded = jnp.pad(ref_spec, [(0, 0), (filter_l - 1, 0), (0, 0), (0, 0)])
    else:
        padded = jnp.concatenate([state[1], ref_spec], axis=1)
    xt_all = jnp.stack([padded[:, k : k + t_frames] for k in range(filter_l)], axis=-2)
    # (B, T, F, L, 2) — scan over T
    xs = (jnp.swapaxes(xt_all, 0, 1), jnp.swapaxes(mic_spec, 0, 1))

    n = b * f_bins
    zeros_h = jnp.zeros((b, f_bins, filter_l, 2), ref_spec.dtype)
    zeros_g = jnp.zeros((n, cfg.rnn_dim), ref_spec.dtype)
    carry0 = (zeros_h, zeros_h, (zeros_g, zeros_g, zeros_g, zeros_g)) if state is None else state[0]

    def step(carry, frame):
        h_prior, h_post, grus = carry
        xt, mic_t = frame  # (B, F, L, 2), (B, F, 2)
        dh = h_post - h_prior
        h_prior, h_post = h_post, h_prior
        e = mic_t - _cdot(xt, h_prior)  # (B, F, 2)
        feat = jnp.concatenate([xt, e[..., None, :], dh], axis=-2)  # (B, F, 2L+1, 2)
        kg, grus = kg_net(params, feat.reshape(n, 2 * filter_l + 1, 2), grus)
        kg = kg.reshape(b, f_bins, filter_l, 2)
        h_post = h_prior + _cmul(kg, e[..., None, :])
        echo_t = _cdot(xt, h_post)
        return (h_prior, h_post, grus), echo_t

    carry_out, echo = jax.lax.scan(step, carry0, xs, unroll=4)
    echo = jnp.swapaxes(echo, 0, 1)  # (B, T, F, 2)
    if state is None:
        return echo
    # NOTE: -(L-1) with L=1 would be -0: (the WHOLE array); slice by start
    return echo, (carry_out, padded[:, padded.shape[1] - (filter_l - 1):])


def nkf_forward(params, far_end, near_end, cfg: NkfConfig = NkfConfig()):
    """(far int16 (B, L), near int16 (B, L)) → echo-cancelled int16 (B, L)."""
    pair = jnp.concatenate([far_end, near_end], axis=0)
    x = pcm_in(pair)
    if cfg.in_sample_rate != cfg.sample_rate:
        x = resample_linear(x, x.shape[-1] * cfg.sample_rate // cfg.in_sample_rate)
    if cfg.demean and not cfg.fold_window:
        x = x - jnp.mean(x, axis=-1, keepdims=True)

    batch = far_end.shape[0]
    model_len = x.shape[-1]
    align = cfg.fold_window if cfg.fold_window else cfg.hop
    padded = -(-model_len // align) * align
    if padded != model_len:
        x = jnp.pad(x, [(0, 0), (0, padded - model_len)])
    if cfg.fold_window:
        x = fold_windows(x, cfg.fold_window)
        if cfg.demean:
            # reference order: fold FIRST, demean PER WINDOW
            # (Export_NKF_AEC.py:255-269 reshapes before audio_pair.mean)
            x = x - jnp.mean(x, axis=-1, keepdims=True)

    from ..ops.stft_pallas import fast_istft_packed, fast_stft_packed

    packed = fast_stft_packed(x, cfg.stft)  # Pallas-fused on TPU (hop is 128-aligned)
    re, im = packed[..., : cfg.stft.f_bins], packed[..., cfg.stft.f_bins :]  # (2B', T, F)
    spec = jnp.stack([re, im], axis=-1)
    nb = spec.shape[0] // 2
    ref_spec, mic_spec = spec[:nb], spec[nb:]

    echo = nkf_scan(params, ref_spec, mic_spec, cfg)
    out = mic_spec - echo
    y = fast_istft_packed(jnp.concatenate([out[..., 0], out[..., 1]], axis=-1), cfg.stft)

    if cfg.fold_window:
        y = unfold_windows(y, batch)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, model_len * cfg.out_sample_rate // cfg.sample_rate)
    return y if cfg.float_output else pcm_out(y)


# ─────────────────────────────────────────────────────────────────────────────
# Streaming (the Kalman recurrence is already an explicit per-frame state —
# streaming just carries the scan carry + delay-line history across chunks)
# ─────────────────────────────────────────────────────────────────────────────


def nkf_stream_init(cfg: NkfConfig = NkfConfig(), batch: int = 1):
    if cfg.in_sample_rate != cfg.sample_rate or cfg.out_sample_rate != cfg.sample_rate:
        raise ValueError(
            f"streaming runs at the model rate only ({cfg.sample_rate} Hz); "
            "resample on the host (the offline forward resamples "
            "in-graph, the stream step does not)")
    carry = cfg.n_fft - cfg.hop
    f, l = cfg.f_bins, cfg.filter_order
    n = batch * f
    zeros_h = jnp.zeros((batch, f, l, 2), jnp.float32)
    zeros_g = jnp.zeros((n, cfg.rnn_dim), jnp.float32)
    return {
        "near_tail": jnp.zeros((batch, carry), jnp.float32),
        "far_tail": jnp.zeros((batch, carry), jnp.float32),
        "kalman": ((zeros_h, zeros_h, (zeros_g, zeros_g, zeros_g, zeros_g)),
                   jnp.zeros((batch, l - 1, f, 2), jnp.float32)),
        "ola_tail": jnp.zeros((batch, carry), jnp.float32),
    }


def nkf_stream_step(params, state, near_chunk, far_chunk, cfg: NkfConfig = NkfConfig()):
    """One streaming AEC step: int16 chunks (B, m·hop) → (state, int16 out).

    Uniform (near, far) argument order like the other streaming AEC models.
    Processes as if (n_fft − hop) zeros were prepended with snip-edges
    framing; the Kalman filter state (h_prior/h_post, the four GRU states,
    the reference delay line) carries exactly."""
    from ..dsp.stft import stream_istft

    assert near_chunk.shape[-1] % cfg.hop == 0, "chunk length must be a hop multiple"
    frame_cfg = dataclasses.replace(cfg.stft, center=False)

    buf_n = jnp.concatenate([state["near_tail"], pcm_in(near_chunk)], axis=-1)
    buf_f = jnp.concatenate([state["far_tail"], pcm_in(far_chunk)], axis=-1)

    re_m, im_m = stft(buf_n, frame_cfg)
    re_f, im_f = stft(buf_f, frame_cfg)
    mic_spec = jnp.stack([re_m, im_m], axis=-1)
    ref_spec = jnp.stack([re_f, im_f], axis=-1)

    echo, kalman = nkf_scan(params, ref_spec, mic_spec, cfg, state=state["kalman"])
    out_sp = mic_spec - echo
    packed = jnp.concatenate([out_sp[..., 0], out_sp[..., 1]], axis=-1)



    carry = cfg.n_fft - cfg.hop
    emit_len = near_chunk.shape[-1]
    out, new_tail = stream_istft(packed, frame_cfg, state["ola_tail"], emit_len)

    new_state = {
        "near_tail": buf_n[:, -carry:],
        "far_tail": buf_f[:, -carry:],
        "kalman": kalman,
        "ola_tail": new_tail,
    }
    return new_state, (out if cfg.float_output else pcm_out(out))


def init_nkf(key, cfg: NkfConfig = NkfConfig()):
    from ..nn.rnn import init_gru

    ks = jax.random.split(key, 8)
    d_in = 2 * cfg.filter_order + 1
    return {
        "fc_in": {"r": core.init_dense(ks[0], d_in, cfg.fc_dim), "i": core.init_dense(ks[1], d_in, cfg.fc_dim)},
        "fc_in_slope": jnp.asarray(0.2, jnp.float32),
        "gru_r": init_gru(ks[2], cfg.fc_dim, cfg.rnn_dim),
        "gru_i": init_gru(ks[3], cfg.fc_dim, cfg.rnn_dim),
        "fc_mid": {"r": core.init_dense(ks[4], cfg.rnn_dim, cfg.fc_dim), "i": core.init_dense(ks[5], cfg.rnn_dim, cfg.fc_dim)},
        "fc_mid_slope": jnp.asarray(0.2, jnp.float32),
        "fc_out": {"r": core.init_dense(ks[6], cfg.fc_dim, cfg.filter_order), "i": core.init_dense(ks[7], cfg.fc_dim, cfg.filter_order)},
    }


def make_nkf(cfg: NkfConfig = NkfConfig()):
    """Serving entry with the uniform AEC argument order (near_end, far_end).

    (The reference NKF ONNX binds far_end first while SDAEC/Deep-Echo bind
    near_end first; audiojax standardises all AEC models on (near, far).)
    """

    def fn(params, near_end, far_end):
        return nkf_forward(params, far_end, near_end, cfg=cfg)

    return fn
