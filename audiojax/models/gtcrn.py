"""GTCRN — 16 kHz speech denoiser (the smallest model; first end-to-end slice).

Parity target: the export wrapper and re-implemented network of the reference
(/root/reference/GTCRN/Export_GTCRN.py): ERB 65+64 band split, SFE one-hot
subband unfolding, conv encoder/decoder with causal group-temporal conv blocks
(dilations 1/2/5), TRA recurrent attention, two grouped dual-path GRU blocks
over frequency (width 33) and time, complex ratio mask, int16 PCM contract
with STFT (512/256, hann_sqrt, reflect) baked into the graph.

TPU-native realisation: channel-last ``(B, T, F, C)`` throughout, matmul-DFT
STFT/ISTFT (audiojax.dsp), scan GRUs with hoisted input projections, causal
padding as a plain concat (the reference needs ONNX graph surgery for its
zero-state GRUs and causal pads — here they are just jnp ops).  BatchNorm is
assumed pre-fused into conv weights by the importer (the reference fuses at
export, Export_GTCRN.py:171-194).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..dsp import StftConfig, stft_packed
from ..dsp.pcm import fold_windows, pcm_in, pcm_out, remove_dc, resample_linear, unfold_windows
from ..nn import core, rnn
from ..nn.erb import erb_compress, erb_expand


@dataclasses.dataclass(frozen=True)
class GtcrnConfig:
    n_fft: int = 512
    hop: int = 256
    window: str = "hann_sqrt"
    pad_mode: str = "reflect"
    n_low: int = 65
    n_erb: int = 64
    channels: int = 16
    width: int = 33  # frequency width at the dual-path stage
    sample_rate: int = 16000
    in_sample_rate: int = 16000
    out_sample_rate: int = 16000
    fold_window: int = 0  # batch-fold window length in samples; 0 = off
    center: bool = True  # False = snip-edges framing (streaming-equivalent)
    erb_scale: float = 21.4  # ERB log scale; H-GTCRN uses 24.7
    # plain GTCRN realises decoder GT depth convs as ConvTranspose2d; H-GTCRN
    # uses causal regular convs there (/root/reference/H-GTCRN/Export_H_GTCRN.py:236-300)
    dec_gt_deconv: bool = True

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window,
                          pad_mode=self.pad_mode, center=self.center)


# ─────────────────────────────────────────────────────────────────────────────
# Blocks
# ─────────────────────────────────────────────────────────────────────────────


def sfe(x, kernel: int = 3):
    """Subband feature extraction: channel-last unfold over frequency.

    Output channel c*kernel+o is the input channel c shifted by (o - k//2)
    bins — identical to the reference's fixed one-hot depthwise conv
    (/root/reference/GTCRN/Export_GTCRN.py:117-141) but realised as shifted
    slices (no conv needed).
    """
    half = (kernel - 1) // 2
    f = x.shape[-2]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(half, half), (0, 0)])
    shifted = [xp[..., o : o + f, :] for o in range(kernel)]
    return jnp.stack(shifted, axis=-1).reshape(*x.shape[:-1], x.shape[-1] * kernel)


def tra(p, x, h=None, *, return_state: bool = False):
    """Temporal recurrent attention: GRU over per-frame channel energies
    (/root/reference/GTCRN/Export_GTCRN.py:144-156).  ``h`` carries the GRU
    state across streaming chunks."""
    z = jnp.mean(jnp.square(x), axis=-2)  # (B, T, C)
    g, h_last = rnn.gru(p["gru"], z, h, return_state=True)
    a = jax.nn.sigmoid(core.dense(p["fc"], g))
    y = x * a[..., None, :]
    return (y, h_last) if return_state else y


def conv_block(p, x, *, stride, padding, groups=1, deconv=False, last=False):
    f = core.conv2d_transpose if deconv else core.conv2d
    y = f(p["conv"], x, stride=stride, padding=padding, groups=groups)
    return jnp.tanh(y) if last else core.prelu(p, y)


def gt_conv_block(p, x, *, dilation: int, deconv: bool, state=None):
    """Group temporal conv block (/root/reference/GTCRN/Export_GTCRN.py:200-324).

    Causal over time: encoder pads (k-1)*d zero frames on the left; decoder
    uses a transposed conv and trims the (k-1)*d tail frames — both depend
    only on the current and previous 2·dilation frames, so streaming carries
    a ``cache`` of those frames plus the TRA GRU state.
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    pad_t = 2 * dilation  # (kernel_t - 1) * dilation with kernel_t = 3

    h = core.prelu(p["pc1"], core.conv2d(p["pc1"], sfe(x1)))
    new_cache = None
    if state is None and deconv:
        # offline deconv: implicit zero history; trim the future tail
        h = core.conv2d_transpose(p["depth"], h, padding=(0, 1), dilation=(dilation, 1),
                                  groups=h.shape[-1])
        h = h[:, :-pad_t]
    else:
        hist = (jnp.zeros((h.shape[0], pad_t) + h.shape[2:], h.dtype)
                if state is None else state["cache"])
        hx = jnp.concatenate([hist, h], axis=1)  # (B, pad_t + T, F, C)
        new_cache = hx[:, -pad_t:]
        if deconv:
            y = core.conv2d_transpose(p["depth"], hx, padding=(0, 1), dilation=(dilation, 1),
                                      groups=hx.shape[-1])
            h = y[:, pad_t:-pad_t]  # drop history-only head + future tail
        else:
            h = core.conv2d(p["depth"], hx, padding=(0, 1), dilation=(dilation, 1),
                            groups=hx.shape[-1])
    h = core.prelu(p["depth_a"], h)
    h = core.conv2d(p["pc2"], h)
    h, tra_h = tra(p["tra"], h, None if state is None else state["tra"], return_state=True)
    # interleave transformed/bypass channels: out[2i]=h[i], out[2i+1]=x2[i]
    out = jnp.stack([h, x2], axis=-1).reshape(*x.shape[:-1], 2 * half)
    if state is None:
        return out
    return out, {"cache": new_cache, "tra": tra_h}


def dpgrnn(p, x, *, width: int, hidden: int, state=None, return_state: bool = False):
    """Grouped dual-path RNN over (freq=width) then (time), with per-path
    Linear + LayerNorm((width, hidden)) + residual
    (/root/reference/GTCRN/Export_GTCRN.py:431-481).

    The intra path runs over frequency (stateless in time); the inter path is
    a unidirectional GRU over time whose hidden state (G=2, B·width, C/2)
    carries across streaming chunks via ``state``."""
    b, t, w, c = x.shape

    intra = x.reshape(b * t, w, c)
    intra = rnn.grouped_gru_bidir(p["intra_fwd"], p["intra_bwd"], intra, groups=2)
    intra = core.dense(p["intra_fc"], intra).reshape(b, t, w, hidden)
    x = x + core.layer_norm(p["intra_ln"], intra, ndims=2, eps=1e-8)

    inter = jnp.swapaxes(x, 1, 2).reshape(b * w, t, c)
    inter, h_last = rnn.grouped_gru(p["inter"], inter, groups=2, h0=state, return_state=True)
    inter = core.dense(p["inter_fc"], inter).reshape(b, w, t, hidden)
    out = x + core.layer_norm(p["inter_ln"], jnp.swapaxes(inter, 1, 2), ndims=2, eps=1e-8)
    return (out, h_last) if return_state else out


# ─────────────────────────────────────────────────────────────────────────────
# Network
# ─────────────────────────────────────────────────────────────────────────────

_ENC_DIL = (1, 2, 5)


def gtcrn_backbone(p, feat, cfg: GtcrnConfig, state=None):
    """ERB-compressed feature map (B, T, F, C) → complex mask (B, T, F, 2).

    Shared by GTCRN (3-channel [mag, re, im] features) and H-GTCRN's GTCRN-IVA
    (6-channel spatial features, /root/reference/H-GTCRN/Export_H_GTCRN.py:1005-1030).
    With ``state`` (from :func:`gtcrn_stream_init`) all temporal context —
    depthwise conv caches, TRA GRU states, dual-path inter GRU states — is
    carried across chunks and ``(mask, new_state)`` is returned.
    """
    feat = erb_compress(feat, cfg.n_low, cfg.n_erb, cfg.n_fft, scale=cfg.erb_scale)
    feat = sfe(feat)  # (B, T, 129, 3C)

    e = conv_block(p["enc0"], feat, stride=(1, 2), padding=(0, 2))
    skips = [e]
    e = conv_block(p["enc1"], e, stride=(1, 2), padding=(0, 2), groups=2)
    skips.append(e)
    ns = {"enc_gt": [], "dec_gt": []} if state is not None else None
    for i, d in enumerate(_ENC_DIL):
        if state is None:
            e = gt_conv_block(p[f"enc_gt{i}"], e, dilation=d, deconv=False)
        else:
            e, s = gt_conv_block(p[f"enc_gt{i}"], e, dilation=d, deconv=False,
                                 state=state["enc_gt"][i])
            ns["enc_gt"].append(s)
        skips.append(e)

    if state is None:
        e = dpgrnn(p["dp1"], e, width=cfg.width, hidden=cfg.channels)
        e = dpgrnn(p["dp2"], e, width=cfg.width, hidden=cfg.channels)
    else:
        e, ns["dp1"] = dpgrnn(p["dp1"], e, width=cfg.width, hidden=cfg.channels,
                              state=state["dp1"], return_state=True)
        e, ns["dp2"] = dpgrnn(p["dp2"], e, width=cfg.width, hidden=cfg.channels,
                              state=state["dp2"], return_state=True)

    for i, d in enumerate(reversed(_ENC_DIL)):
        if state is None:
            e = gt_conv_block(p[f"dec_gt{i}"], e + skips[4 - i], dilation=d,
                              deconv=cfg.dec_gt_deconv)
        else:
            e, s = gt_conv_block(p[f"dec_gt{i}"], e + skips[4 - i], dilation=d,
                                 deconv=cfg.dec_gt_deconv, state=state["dec_gt"][i])
            ns["dec_gt"].append(s)
    e = conv_block(p["dec1"], e + skips[1], stride=(1, 2), padding=(0, 2), groups=2, deconv=True)
    m = conv_block(p["dec0"], e + skips[0], stride=(1, 2), padding=(0, 2), deconv=True, last=True)

    mask = erb_expand(m, cfg.n_low, cfg.n_erb, cfg.n_fft, scale=cfg.erb_scale)  # (B, T, F, 2)
    return mask if state is None else (mask, ns)


def gtcrn_net(p, spec_ri, cfg: GtcrnConfig):
    """Enhance a packed spectrum: (B, T, 2F) → (B, T, 2F).

    Mirrors GTCRN.forward_packed (/root/reference/GTCRN/Export_GTCRN.py:592-596)
    in channel-last layout.
    """
    fb = cfg.stft.f_bins
    re, im = spec_ri[..., :fb], spec_ri[..., fb:]
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    feat = jnp.stack([mag, re, im], axis=-1)  # (B, T, F, 3)
    m = gtcrn_backbone(p, feat, cfg)
    m0, m1 = m[..., 0], m[..., 1]
    return jnp.concatenate([re * m0 - im * m1, im * m0 + re * m1], axis=-1)


def gtcrn_forward(params, audio, cfg: GtcrnConfig = GtcrnConfig()):
    """int16 PCM (B, L) → denoised int16 PCM, STFT/ISTFT in-graph.

    Mirrors GTCRN_CUSTOM.forward (/root/reference/GTCRN/Export_GTCRN.py:636-693):
    resample sandwich, 1/32768 scale, DC removal, optional batch-fold, network,
    ×32767 + int16 clamp.
    """
    x = pcm_in(audio)
    if cfg.in_sample_rate > cfg.sample_rate:
        x = resample_linear(x, x.shape[-1] * cfg.sample_rate // cfg.in_sample_rate)
    x = remove_dc(x)
    if cfg.in_sample_rate < cfg.sample_rate:
        x = resample_linear(x, x.shape[-1] * cfg.sample_rate // cfg.in_sample_rate)

    batch = x.shape[0]
    model_len = x.shape[-1]
    # pad to a whole number of hops (or fold windows) so STFT→ISTFT is
    # length-exact; the reference does this on the host
    # (/root/reference/GTCRN/Inference_GTCRN_ONNX.py:279-298), we keep it
    # in-graph.
    align = cfg.fold_window if cfg.fold_window else cfg.hop
    padded = -(-model_len // align) * align
    if padded != model_len:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, padded - model_len)])
    if cfg.fold_window:
        x = fold_windows(x, cfg.fold_window)

    from ..ops.stft_pallas import fast_istft_packed, fast_stft_packed

    spec = fast_stft_packed(x, cfg.stft)  # Pallas-fused on TPU (hop is 128-aligned)
    enhanced = gtcrn_net(params, spec, cfg)
    y = fast_istft_packed(enhanced, cfg.stft)  # Pallas-fused iDFT + overlap-add

    if cfg.fold_window:
        y = unfold_windows(y, batch)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, y.shape[-1] * cfg.out_sample_rate // cfg.sample_rate)
    return pcm_out(y)


# ─────────────────────────────────────────────────────────────────────────────
# Streaming (state-carry serving: the SURVEY.md §5 "north star" — the
# reference runs GTCRN stateless per window; here every temporal dependency
# is an explicit carried state, so chunks stream with (n_fft − hop) latency)
# ─────────────────────────────────────────────────────────────────────────────


def gtcrn_stream_init(cfg: GtcrnConfig = GtcrnConfig(), batch: int = 1):
    """Fresh streaming state: audio framing tail, per-block depthwise conv
    caches + TRA GRU states, dual-path inter GRU states, and the synthesis
    overlap-add tail."""
    if cfg.in_sample_rate != cfg.sample_rate or cfg.out_sample_rate != cfg.sample_rate:
        raise ValueError(
            f"streaming runs at the model rate only ({cfg.sample_rate} Hz); "
            "resample on the host (the offline forward resamples "
            "in-graph, the stream step does not)")
    c = cfg.channels
    carry = cfg.n_fft - cfg.hop

    def gt_state(d):
        return {
            "cache": jnp.zeros((batch, 2 * d, cfg.width, c), jnp.float32),
            "tra": jnp.zeros((batch, c), jnp.float32),
        }

    return {
        "audio_tail": jnp.zeros((batch, carry), jnp.float32),
        "net": {
            "enc_gt": [gt_state(d) for d in _ENC_DIL],
            "dec_gt": [gt_state(d) for d in reversed(_ENC_DIL)],
            "dp1": jnp.zeros((2, batch * cfg.width, c // 2), jnp.float32),
            "dp2": jnp.zeros((2, batch * cfg.width, c // 2), jnp.float32),
        },
        "ola_tail": jnp.zeros((batch, carry), jnp.float32),
    }


def gtcrn_stream_step(params, state, chunk, cfg: GtcrnConfig = GtcrnConfig()):
    """One streaming step: int16 chunk (B, k·hop) → (state, int16 out (B, k·hop)).

    Semantics: the stream processes the input as if (n_fft − hop) zeros were
    prepended, with snip-edges (center=False) framing — output sample i equals
    the offline ``center=False`` path on that zero-prepended signal for
    i ≥ hop (to within f32 reassociation).  Output is delayed by
    (n_fft − hop) samples relative to the live input.  No DC removal is
    applied (the offline path removes the clip-global mean, which a live
    stream cannot know).
    """

    from ..dsp.stft import stream_istft

    assert chunk.shape[-1] % cfg.hop == 0, "chunk length must be a hop multiple"
    x = pcm_in(chunk)
    buf = jnp.concatenate([state["audio_tail"], x], axis=-1)

    frame_cfg = dataclasses.replace(cfg.stft, center=False)
    spec = stft_packed(buf, frame_cfg)  # (B, k, 2F)
    fb = frame_cfg.n_fft // 2 + 1
    re, im = spec[..., :fb], spec[..., fb:]
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    feat = jnp.stack([mag, re, im], axis=-1)
    mask, net_state = gtcrn_backbone(params, feat, cfg, state=state["net"])
    m0, m1 = mask[..., 0], mask[..., 1]
    enhanced = jnp.concatenate([re * m0 - im * m1, im * m0 + re * m1], axis=-1)

  # (B, k·hop + n_fft − hop)

    carry = cfg.n_fft - cfg.hop
    emit_len = chunk.shape[-1]
    out, new_tail = stream_istft(enhanced, frame_cfg, state["ola_tail"], emit_len)

    new_state = {
        "audio_tail": buf[:, -carry:],
        "net": net_state,
        "ola_tail": new_tail,
    }
    return new_state, pcm_out(out)


# ─────────────────────────────────────────────────────────────────────────────
# Random init (tests / benches; real weights come from the importer)
# ─────────────────────────────────────────────────────────────────────────────


def _init_tra(key, c):
    k1, k2 = jax.random.split(key)
    return {"gru": rnn.init_gru(k1, c, 2 * c), "fc": core.init_dense(k2, 2 * c, c)}


def _init_conv_block(key, cin, cout, groups=1, last=False):
    p = {"conv": core.init_conv2d(key, 1, 5, cin, cout, groups=groups)}
    if not last:
        p["alpha"] = jnp.full((cout,), 0.25)
    return p


def _init_gt_block(key, c):
    ks = jax.random.split(key, 5)
    half, hid = c // 2, c
    return {
        "pc1": {**core.init_conv2d(ks[0], 1, 1, half * 3, hid), "alpha": jnp.full((hid,), 0.25)},
        "depth": core.init_conv2d(ks[1], 3, 3, hid, hid, groups=hid),
        "depth_a": {"alpha": jnp.full((hid,), 0.25)},
        "pc2": core.init_conv2d(ks[2], 1, 1, hid, half),
        "tra": _init_tra(ks[3], half),
    }


def _init_dpgrnn(key, c, width):
    ks = jax.random.split(key, 7)
    stack = lambda k, din, h: jax.vmap(lambda kk: rnn.init_gru(kk, din, h))(jax.random.split(k, 2))
    return {
        "intra_fwd": stack(ks[0], c // 2, c // 4),
        "intra_bwd": stack(ks[1], c // 2, c // 4),
        "intra_fc": core.init_dense(ks[2], c, c),
        "intra_ln": {"g": jnp.ones((width, c)), "b": jnp.zeros((width, c))},
        "inter": stack(ks[3], c // 2, c // 2),
        "inter_fc": core.init_dense(ks[4], c, c),
        "inter_ln": {"g": jnp.ones((width, c)), "b": jnp.zeros((width, c))},
    }


def init_gtcrn(key, cfg: GtcrnConfig = GtcrnConfig()):
    c = cfg.channels
    ks = jax.random.split(key, 12)
    params = {
        "enc0": _init_conv_block(ks[0], 9, c),
        "enc1": _init_conv_block(ks[1], c, c, groups=2),
        "dec1": _init_conv_block(ks[8], c, c, groups=2),
        "dec0": _init_conv_block(ks[9], c, 2, last=True),
        "dp1": _init_dpgrnn(ks[6], c, cfg.width),
        "dp2": _init_dpgrnn(ks[7], c, cfg.width),
    }
    for i in range(3):
        params[f"enc_gt{i}"] = _init_gt_block(ks[2 + i], c)
        params[f"dec_gt{i}"] = _init_gt_block(ks[10] if i == 0 else ks[11] if i == 1 else ks[5], c)
    return params


def make_gtcrn(cfg: GtcrnConfig = GtcrnConfig()):
    """Return a jittable ``fn(params, audio_int16) -> audio_int16``."""
    return partial(gtcrn_forward, cfg=cfg)
