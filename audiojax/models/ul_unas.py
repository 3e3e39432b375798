"""UL-UNAS — NAS-derived U-Net denoiser, 16 kHz.

Parity target: /root/reference/UL-UNAS/Export_UL_UNAS.py — log-power ERB
features → encoder of NAS-chosen blocks (XConvBlock / XDWSBlock / XMBBlocks,
all causal in time via symmetric-pad + tail trim), each block gated by a
causal time-frequency attention (cTFA = temporal GRU gate × frequency-GRU
gate) and AffinePReLU (per-(channel,freq) affine with PReLU slope) → two
grouped dual-path GRU blocks → mirrored decoder → sigmoid mask on the packed
spectrum → ISTFT.  BatchNorm and the 0.5/ln10 log scale are pre-fused by the
importer (reference fuses at export, Export_UL_UNAS.py:724-739).

Channel-last (B, T, F, C) throughout.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp import StftConfig, stft_packed
from ..dsp.pcm import fold_windows, pcm_in, pcm_out, resample_linear, unfold_windows
from ..nn import core, rnn
from ..nn.erb import erb_compress, erb_expand

# encoder block plan (type, out_ch, out_width, (kt, kf), stride_f, groups)
# — the NAS result hard-coded by the reference (Export_UL_UNAS.py:662-672)
_TYPES = (0, 2, 1, 2, 1)  # 0=XConv, 1=XDWS, 2=XMB
_CHANNELS = (12, 24, 24, 32, 16)
_WIDTHS = (65, 33, 33, 33, 33)
_KERNELS = ((3, 3), (2, 3), (2, 3), (1, 5), (1, 5))
_STRIDES = (2, 2, 1, 1, 1)
_GROUPS = (1, 2, 2, 2, 2)


@dataclasses.dataclass(frozen=True)
class UlUnasConfig:
    n_fft: int = 512
    hop: int = 256
    window: str = "hann"
    pad_mode: str = "reflect"
    n_low: int = 65
    n_erb: int = 64
    fa_ratio: int = 4
    sample_rate: int = 16000
    in_sample_rate: int = 16000
    out_sample_rate: int = 16000
    fold_window: int = 0
    center: bool = True  # False = snip-edges framing (streaming-equivalent)

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window,
                          pad_mode=self.pad_mode, center=self.center)


def affine_prelu(p, x):
    """Per-(freq, channel) affine PReLU in its export-fused form
    (Export_UL_UNAS.py:120-128): where(x>0, w+1, w+slope)·x + b."""
    return jnp.where(x > 0, p["pos"], p["neg"]) * x + p["bias"]


def shuffle_channels(x):
    """Interleave the two channel groups: out[2i]=x[i], out[2i+1]=x[half+i]."""
    half = x.shape[-1] // 2
    return jnp.stack([x[..., :half], x[..., half:]], axis=-1).reshape(*x.shape[:-1], 2 * half)


def freq_attention(p, power, ratio: int):
    """FA: bidirectional GRU over frequency super-bands of the channel-mean
    power (Export_UL_UNAS.py:132-169). power: (B, T, F, C) → gate (B, T, F, 1)."""
    x = jnp.mean(power, axis=-1)  # (B, T, F)
    b, t, f = x.shape
    pad = (-f) % ratio
    if pad:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, pad)])
    h = (f + pad) // ratio
    seq = x.reshape(b * t, h, ratio)
    y = rnn.gru_bidir(p["fwd"], p["bwd"], seq)
    y = core.dense(p["fc"], y).reshape(b, t, f + pad)
    if pad:
        y = y[..., :f]
    return y[..., None]


def ctfa(p, x, ratio: int, h=None, *, return_state: bool = False):
    """Causal time-frequency attention (Export_UL_UNAS.py:171-193).
    ``h`` carries the temporal GRU state across streaming chunks."""
    power = x * x
    zt = jnp.mean(power, axis=-2)  # (B, T, C)
    g, h_last = rnn.gru(p["ta_gru"], zt, h, return_state=True)
    at = jax.nn.sigmoid(core.dense(p["ta_fc"], g))
    af = jax.nn.sigmoid(freq_attention(p["fa"], power, ratio))
    y = at[..., None, :] * x * af
    return (y, h_last) if return_state else y


def _causal_conv(p, x, *, kernel, stride_f, groups, deconv, cache=None):
    """Causal time conv/deconv.  ``cache`` ((kt−1) input frames) streams the
    time context; ``(y, new_cache)`` is returned when it is given."""
    kt, kf = kernel
    if cache is None:
        if deconv:
            y = core.conv2d_transpose(
                p, x, stride=(1, stride_f), padding=(0, kf // 2), groups=groups
            )
        else:
            y = core.conv2d(
                p, x, stride=(1, stride_f), padding=(kt - 1, kf // 2), groups=groups
            )
        if kt > 1:
            y = y[:, : -(kt - 1)]
        return y
    if kt == 1:
        new_cache = cache  # empty history
        xx = x
    else:
        xx = jnp.concatenate([cache, x], axis=1)
        new_cache = xx[:, -(kt - 1):]
    if deconv:
        y = core.conv2d_transpose(p, xx, stride=(1, stride_f), padding=(0, kf // 2),
                                  groups=groups)
        if kt > 1:
            y = y[:, kt - 1 : -(kt - 1)]
    else:
        y = core.conv2d(p, xx, stride=(1, stride_f), padding=(0, kf // 2), groups=groups)
    return y, new_cache


def x_conv_block(p, x, spec, cfg, *, deconv=False, last=False, state=None):
    _, _, _, kernel, stride, groups = spec
    if state is None:
        y = _causal_conv(p["conv"], x, kernel=kernel, stride_f=stride, groups=groups, deconv=deconv)
    else:
        y, cache = _causal_conv(p["conv"], x, kernel=kernel, stride_f=stride, groups=groups,
                                deconv=deconv, cache=state["cache"])
    if not last:
        y = affine_prelu(p["act"], y)
    y, ta = ctfa(p["ctfa"], y, cfg.fa_ratio,
                 None if state is None else state["ta"], return_state=True)
    if groups == 2 and not last:
        y = shuffle_channels(y)
    return y if state is None else (y, {"cache": cache, "ta": ta})


def x_dws_block(p, x, spec, cfg, *, deconv=False, last=False, state=None):
    _, _, _, kernel, stride, groups = spec
    out_ch = p["pconv"]["w"].shape[-1]  # decoder blocks differ from the spec
    h = core.conv2d(p["pconv"], x, groups=groups)
    h = affine_prelu(p["pconv_act"], h)
    if groups == 2:
        h = shuffle_channels(h)
    if state is None:
        h = _causal_conv(p["dconv"], h, kernel=kernel, stride_f=stride, groups=out_ch, deconv=deconv)
    else:
        h, cache = _causal_conv(p["dconv"], h, kernel=kernel, stride_f=stride, groups=out_ch,
                                deconv=deconv, cache=state["cache"])
    if not last:
        h = affine_prelu(p["dconv_act"], h)
    h, ta = ctfa(p["ctfa"], h, cfg.fa_ratio,
                 None if state is None else state["ta"], return_state=True)
    return h if state is None else (h, {"cache": cache, "ta": ta})


def x_mb_block(p, x, spec, cfg, *, deconv=False, last=False, state=None):
    in_ch = x.shape[-1]
    _, _, _, kernel, stride, groups = spec
    out_ch = p["pconv1"]["w"].shape[-1]  # decoder blocks differ from the spec
    h = core.conv2d(p["pconv1"], x, groups=groups)
    h = affine_prelu(p["pconv1_act"], h)
    if groups == 2:
        h = shuffle_channels(h)
    if state is None:
        h = _causal_conv(p["dconv"], h, kernel=kernel, stride_f=stride, groups=out_ch, deconv=deconv)
    else:
        h, cache = _causal_conv(p["dconv"], h, kernel=kernel, stride_f=stride, groups=out_ch,
                                deconv=deconv, cache=state["cache"])
    h = affine_prelu(p["dconv_act"], h)
    h = core.conv2d(p["pconv2"], h, groups=groups)
    h, ta = ctfa(p["ctfa"], h, cfg.fa_ratio,
                 None if state is None else state["ta"], return_state=True)
    if in_ch == out_ch and stride == 1:
        h = h + x
    if groups == 2 and not last:
        h = shuffle_channels(h)
    return h if state is None else (h, {"cache": cache, "ta": ta})


_BLOCK_FNS = (x_conv_block, x_dws_block, x_mb_block)


def dpgrnn(p, x, hidden: int, state=None, *, return_state: bool = False):
    """UL-UNAS dual-path block (fc maps hidden→input, unlike GTCRN's).
    ``state``: inter (time) grouped-GRU hidden (G=2, B·width, C/2)."""
    b, t, w, c = x.shape
    intra = x.reshape(b * t, w, c)
    intra = rnn.grouped_gru_bidir(p["intra_fwd"], p["intra_bwd"], intra, groups=2)
    intra = core.dense(p["intra_fc"], intra).reshape(b, t, w, c)
    x = x + core.layer_norm(p["intra_ln"], intra, ndims=2, eps=1e-8)

    inter = jnp.swapaxes(x, 1, 2).reshape(b * w, t, c)
    inter, h_last = rnn.grouped_gru(p["inter"], inter, groups=2, h0=state, return_state=True)
    inter = core.dense(p["inter_fc"], inter).reshape(b, w, t, c)
    out = x + core.layer_norm(p["inter_ln"], jnp.swapaxes(inter, 1, 2), ndims=2, eps=1e-8)
    return (out, h_last) if return_state else out


def ul_unas_net(p, spec_ri, cfg: UlUnasConfig, state=None):
    """(B, T, 2F) packed spectrum → (B, T, 2F) masked spectrum.

    With ``state`` (from :func:`ul_unas_stream_init`) every temporal
    dependency — causal conv caches, cTFA GRU states, dual-path inter GRU
    states — carries across chunks and ``(out, new_state)`` is returned."""
    fb = cfg.stft.f_bins
    re, im = spec_ri[..., :fb], spec_ri[..., fb:]
    power = re * re + im * im
    # log10(sqrt(power)) = 0.5/ln10 · log(power); the reference folds the
    # scale into the first conv (Export_UL_UNAS.py:730-733) — we keep it
    # explicit and let XLA fold it.
    feat = jnp.log(jnp.clip(power, 1e-24, None)) * float(0.5 / np.log(10.0))
    feat = feat[..., None]  # (B, T, F, 1)
    # UL-UNAS carries its ERB filterbank as (frozen) Linear weights in the
    # checkpoint (Export_UL_UNAS.py:60-63); imported params thread them here,
    # random init falls back to the analytic filters.
    erb_w = p.get("erb")
    feat = erb_compress(feat, cfg.n_low, cfg.n_erb, cfg.n_fft,
                        weight=None if erb_w is None else erb_w["fc"])

    specs = list(zip(_TYPES, _CHANNELS, _WIDTHS, _KERNELS, _STRIDES, _GROUPS))
    ns = {"enc": [], "dec": []} if state is not None else None
    skips = []
    x = feat
    for i, s in enumerate(specs):
        if state is None:
            x = _BLOCK_FNS[s[0]](p[f"enc{i}"], x, s, cfg)
        else:
            x, bs = _BLOCK_FNS[s[0]](p[f"enc{i}"], x, s, cfg, state=state["enc"][i])
            ns["enc"].append(bs)
        skips.append(x)

    if state is None:
        x = dpgrnn(p["dp1"], x, _CHANNELS[-1])
        x = dpgrnn(p["dp2"], x, _CHANNELS[-1])
    else:
        x, ns["dp1"] = dpgrnn(p["dp1"], x, _CHANNELS[-1], state["dp1"], return_state=True)
        x, ns["dp2"] = dpgrnn(p["dp2"], x, _CHANNELS[-1], state["dp2"], return_state=True)

    n = len(specs)
    for j, i in enumerate(range(n - 1, 0, -1)):
        if state is None:
            x = _BLOCK_FNS[specs[i][0]](p[f"dec{j}"], x + skips[i], specs[i], cfg, deconv=True)
        else:
            x, bs = _BLOCK_FNS[specs[i][0]](p[f"dec{j}"], x + skips[i], specs[i], cfg,
                                            deconv=True, state=state["dec"][j])
            ns["dec"].append(bs)
    if state is None:
        x = _BLOCK_FNS[specs[0][0]](p[f"dec{n-1}"], x + skips[0], specs[0], cfg,
                                    deconv=True, last=True)
    else:
        x, bs = _BLOCK_FNS[specs[0][0]](p[f"dec{n-1}"], x + skips[0], specs[0], cfg,
                                        deconv=True, last=True, state=state["dec"][n - 1])
        ns["dec"].append(bs)
    mask = jax.nn.sigmoid(x)  # (B, T, 129, 1)

    mask = erb_expand(mask, cfg.n_low, cfg.n_erb, cfg.n_fft,
                      weight=None if erb_w is None else erb_w["ifc"])[..., 0]
    out = spec_ri * jnp.concatenate([mask, mask], axis=-1)
    return out if state is None else (out, ns)


def ul_unas_forward(params, audio, cfg: UlUnasConfig = UlUnasConfig()):
    """int16 PCM (B, L) → denoised int16 PCM (no DC removal — reference parity,
    Export_UL_UNAS.py REMOVE_DC_OFFSET=False)."""
    x = pcm_in(audio)
    if cfg.in_sample_rate != cfg.sample_rate:
        x = resample_linear(x, x.shape[-1] * cfg.sample_rate // cfg.in_sample_rate)

    batch = x.shape[0]
    model_len = x.shape[-1]
    align = cfg.fold_window if cfg.fold_window else cfg.hop
    padded = -(-model_len // align) * align
    if padded != model_len:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, padded - model_len)])
    if cfg.fold_window:
        x = fold_windows(x, cfg.fold_window)

    from ..ops.stft_pallas import fast_istft_packed, fast_stft_packed

    spec = fast_stft_packed(x, cfg.stft)  # Pallas-fused on TPU (hop is 128-aligned)
    out = ul_unas_net(params, spec, cfg)
    y = fast_istft_packed(out, cfg.stft)

    if cfg.fold_window:
        y = unfold_windows(y, batch)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, model_len * cfg.out_sample_rate // cfg.sample_rate)
    return pcm_out(y)


# ─────────────────────────────────────────────────────────────────────────────
# Streaming (state-carry serving: causal conv caches + cTFA/dual-path GRUs)
# ─────────────────────────────────────────────────────────────────────────────


def _stream_plan(cfg: UlUnasConfig):
    """Per-block (conv-cache shape info, ta width) for enc and dec chains."""
    specs = list(zip(_TYPES, _CHANNELS, _WIDTHS, _KERNELS, _STRIDES, _GROUPS))
    enc, dec = [], []
    width, ch_in = cfg.n_low + cfg.n_erb, 1
    for btype, ch, w_out, (kt, kf), stride, groups in specs:
        cache_ch = ch_in if btype == 0 else ch  # XConv caches its input; DWS/MB the post-pconv
        enc.append((kt, width, cache_ch, ch))
        width, ch_in = w_out, ch
    n = len(specs)
    for j, i in enumerate(range(n - 1, 0, -1)):
        btype, _, _, (kt, kf), stride, groups = specs[i]
        out_ch = _CHANNELS[i - 1]
        cache_ch = ch_in if btype == 0 else out_ch
        dec.append((kt, width, cache_ch, out_ch))
        width, ch_in = _WIDTHS[i - 1], out_ch
    btype, _, _, (kt, kf), stride, groups = specs[0]
    dec.append((kt, width, ch_in if btype == 0 else 1, 1))
    return enc, dec


def ul_unas_stream_init(cfg: UlUnasConfig = UlUnasConfig(), batch: int = 1):
    if cfg.in_sample_rate != cfg.sample_rate or cfg.out_sample_rate != cfg.sample_rate:
        raise ValueError(
            f"streaming runs at the model rate only ({cfg.sample_rate} Hz); "
            "resample on the host (the offline forward resamples "
            "in-graph, the stream step does not)")
    carry = cfg.n_fft - cfg.hop
    enc_plan, dec_plan = _stream_plan(cfg)

    def block_state(kt, width, cache_ch, out_ch):
        return {
            "cache": jnp.zeros((batch, kt - 1, width, cache_ch), jnp.float32),
            "ta": jnp.zeros((batch, 2 * out_ch), jnp.float32),
        }

    w, c = _WIDTHS[-1], _CHANNELS[-1]
    return {
        "audio_tail": jnp.zeros((batch, carry), jnp.float32),
        "net": {
            "enc": [block_state(*pl) for pl in enc_plan],
            "dec": [block_state(*pl) for pl in dec_plan],
            "dp1": jnp.zeros((2, batch * w, c // 2), jnp.float32),
            "dp2": jnp.zeros((2, batch * w, c // 2), jnp.float32),
        },
        "ola_tail": jnp.zeros((batch, carry), jnp.float32),
    }


def ul_unas_stream_step(params, state, chunk, cfg: UlUnasConfig = UlUnasConfig()):
    """One streaming step: int16 chunk (B, k·hop) → (state, int16 out (B, k·hop)).

    Same zero-prepended snip-edges semantics as the GTCRN stream; output is
    delayed by (n_fft − hop) samples.  (UL-UNAS applies no DC removal, so the
    stream has no DC divergence from the offline path.)"""
    from ..dsp.stft import stream_istft

    assert chunk.shape[-1] % cfg.hop == 0, "chunk length must be a hop multiple"
    frame_cfg = dataclasses.replace(cfg.stft, center=False)

    x = pcm_in(chunk)
    buf = jnp.concatenate([state["audio_tail"], x], axis=-1)
    spec = stft_packed(buf, frame_cfg)
    out_spec, net_state = ul_unas_net(params, spec, cfg, state=state["net"])



    carry = cfg.n_fft - cfg.hop
    emit_len = chunk.shape[-1]
    out, new_tail = stream_istft(out_spec, frame_cfg, state["ola_tail"], emit_len)

    new_state = {
        "audio_tail": buf[:, -carry:],
        "net": net_state,
        "ola_tail": new_tail,
    }
    return new_state, pcm_out(out)


# ─────────────────────────────────────────────────────────────────────────────
# Init
# ─────────────────────────────────────────────────────────────────────────────


def _init_affine_prelu(width, ch):
    return {
        "pos": jnp.full((width, ch), 1.0 + 0.0),  # affine(1.0) + 1 … fused form
        "neg": jnp.full((width, ch), 1.0 + 0.25),
        "bias": jnp.zeros((width, ch)),
    }


def _init_ctfa(key, ch, width, ratio):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "ta_gru": rnn.init_gru(k1, ch, 2 * ch),
        "ta_fc": core.init_dense(k2, 2 * ch, ch),
        "fa": {
            "fwd": rnn.init_gru(k3, ratio, ratio),
            "bwd": rnn.init_gru(k4, ratio, ratio),
            "fc": core.init_dense(k5, 2 * ratio, ratio),
        },
    }


def _in_width_for(width, stride, deconv):
    if stride == 2:
        return width // 2 + 1 if deconv else width * 2 - 1
    return width


def _init_block(key, spec, in_ch, cfg, *, deconv=False, last=False, out_ch=None, width=None):
    btype, ch, w, kernel, stride, groups = spec
    ch = out_ch if out_ch is not None else ch
    w = width if width is not None else w
    kt, kf = kernel
    ks = jax.random.split(key, 8)
    p = {}
    if btype == 0:  # XConv
        p["conv"] = core.init_conv2d(ks[0], kt, kf, in_ch, ch, groups=groups)
        if not last:
            p["act"] = _init_affine_prelu(w, ch)
        p["ctfa"] = _init_ctfa(ks[1], ch, w, cfg.fa_ratio)
    elif btype == 1:  # XDWS
        p["pconv"] = core.init_conv2d(ks[0], 1, 1, in_ch, ch, groups=groups)
        p["pconv_act"] = _init_affine_prelu(_in_width_for(w, stride, deconv), ch)
        p["dconv"] = core.init_conv2d(ks[1], kt, kf, ch, ch, groups=ch)
        if not last:
            p["dconv_act"] = _init_affine_prelu(w, ch)
        p["ctfa"] = _init_ctfa(ks[2], ch, w, cfg.fa_ratio)
    else:  # XMB
        p["pconv1"] = core.init_conv2d(ks[0], 1, 1, in_ch, ch, groups=groups)
        p["pconv1_act"] = _init_affine_prelu(_in_width_for(w, stride, deconv), ch)
        p["dconv"] = core.init_conv2d(ks[1], kt, kf, ch, ch, groups=ch)
        p["dconv_act"] = _init_affine_prelu(w, ch)
        p["pconv2"] = core.init_conv2d(ks[2], 1, 1, ch, ch, groups=groups)
        p["ctfa"] = _init_ctfa(ks[3], ch, w, cfg.fa_ratio)
    return p


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


def init_ul_unas(key, cfg: UlUnasConfig = UlUnasConfig()):
    specs = list(zip(_TYPES, _CHANNELS, _WIDTHS, _KERNELS, _STRIDES, _GROUPS))
    ks = jax.random.split(key, 2 * len(specs) + 2)
    params = {}
    in_ch = 1
    for i, s in enumerate(specs):
        params[f"enc{i}"] = _init_block(ks[i], s, in_ch, cfg)
        in_ch = s[1]
    n = len(specs)
    in_ch = _CHANNELS[-1]
    for j, i in enumerate(range(n - 1, 0, -1)):
        out_ch = _CHANNELS[i - 1]
        params[f"dec{j}"] = _init_block(
            ks[n + j], specs[i], in_ch, cfg, deconv=True, out_ch=out_ch, width=_WIDTHS[i - 1]
        )
        in_ch = out_ch
    params[f"dec{n-1}"] = _init_block(
        ks[2 * n - 1], specs[0], in_ch, cfg, deconv=True, last=True, out_ch=1,
        width=cfg.n_low + cfg.n_erb,
    )
    params["dp1"] = _init_dpgrnn(ks[-2], _CHANNELS[-1], _WIDTHS[-1])
    params["dp2"] = _init_dpgrnn(ks[-1], _CHANNELS[-1], _WIDTHS[-1])
    return params


def make_ul_unas(cfg: UlUnasConfig = UlUnasConfig()):
    return partial(ul_unas_forward, cfg=cfg)
