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

from ..dsp import StftConfig, istft_packed, stft_packed
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

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window, pad_mode=self.pad_mode)


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


def tra(p, x):
    """Temporal recurrent attention: GRU over per-frame channel energies
    (/root/reference/GTCRN/Export_GTCRN.py:144-156)."""
    z = jnp.mean(jnp.square(x), axis=-2)  # (B, T, C)
    a = jax.nn.sigmoid(core.dense(p["fc"], rnn.gru(p["gru"], z)))
    return x * a[..., None, :]


def conv_block(p, x, *, stride, padding, groups=1, deconv=False, last=False):
    f = core.conv2d_transpose if deconv else core.conv2d
    y = f(p["conv"], x, stride=stride, padding=padding, groups=groups)
    return jnp.tanh(y) if last else core.prelu(p, y)


def gt_conv_block(p, x, *, dilation: int, deconv: bool):
    """Group temporal conv block (/root/reference/GTCRN/Export_GTCRN.py:200-324).

    Causal over time: encoder pads (k-1)*d zero frames on the left; decoder
    uses a transposed conv and trims the (k-1)*d tail frames.
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    pad_t = 2 * dilation  # (kernel_t - 1) * dilation with kernel_t = 3

    h = core.prelu(p["pc1"], core.conv2d(p["pc1"], sfe(x1)))
    if deconv:
        h = core.conv2d_transpose(p["depth"], h, padding=(0, 1), dilation=(dilation, 1),
                                  groups=h.shape[-1])
        h = h[:, :-pad_t]
    else:
        zeros = jnp.zeros((h.shape[0], pad_t) + h.shape[2:], h.dtype)
        h = jnp.concatenate([zeros, h], axis=1)
        h = core.conv2d(p["depth"], h, padding=(0, 1), dilation=(dilation, 1),
                        groups=h.shape[-1])
    h = core.prelu(p["depth_a"], h)
    h = core.conv2d(p["pc2"], h)
    h = tra(p["tra"], h)
    # interleave transformed/bypass channels: out[2i]=h[i], out[2i+1]=x2[i]
    return jnp.stack([h, x2], axis=-1).reshape(*x.shape[:-1], 2 * half)


def dpgrnn(p, x, *, width: int, hidden: int):
    """Grouped dual-path RNN over (freq=width) then (time), with per-path
    Linear + LayerNorm((width, hidden)) + residual
    (/root/reference/GTCRN/Export_GTCRN.py:431-481)."""
    b, t, w, c = x.shape

    intra = x.reshape(b * t, w, c)
    intra = rnn.grouped_gru_bidir(p["intra_fwd"], p["intra_bwd"], intra, groups=2)
    intra = core.dense(p["intra_fc"], intra).reshape(b, t, w, hidden)
    x = x + core.layer_norm(p["intra_ln"], intra, ndims=2, eps=1e-8)

    inter = jnp.swapaxes(x, 1, 2).reshape(b * w, t, c)
    inter = rnn.grouped_gru(p["inter"], inter, groups=2)
    inter = core.dense(p["inter_fc"], inter).reshape(b, w, t, hidden)
    return x + core.layer_norm(p["inter_ln"], jnp.swapaxes(inter, 1, 2), ndims=2, eps=1e-8)


# ─────────────────────────────────────────────────────────────────────────────
# Network
# ─────────────────────────────────────────────────────────────────────────────

_ENC_DIL = (1, 2, 5)


def gtcrn_backbone(p, feat, cfg: GtcrnConfig):
    """ERB-compressed feature map (B, T, F, C) → complex mask (B, T, F, 2).

    Shared by GTCRN (3-channel [mag, re, im] features) and H-GTCRN's GTCRN-IVA
    (6-channel spatial features, /root/reference/H-GTCRN/Export_H_GTCRN.py:1005-1030).
    """
    feat = erb_compress(feat, cfg.n_low, cfg.n_erb, cfg.n_fft)
    feat = sfe(feat)  # (B, T, 129, 3C)

    e = conv_block(p["enc0"], feat, stride=(1, 2), padding=(0, 2))
    skips = [e]
    e = conv_block(p["enc1"], e, stride=(1, 2), padding=(0, 2), groups=2)
    skips.append(e)
    for i, d in enumerate(_ENC_DIL):
        e = gt_conv_block(p[f"enc_gt{i}"], e, dilation=d, deconv=False)
        skips.append(e)

    e = dpgrnn(p["dp1"], e, width=cfg.width, hidden=cfg.channels)
    e = dpgrnn(p["dp2"], e, width=cfg.width, hidden=cfg.channels)

    for i, d in enumerate(reversed(_ENC_DIL)):
        e = gt_conv_block(p[f"dec_gt{i}"], e + skips[4 - i], dilation=d, deconv=True)
    e = conv_block(p["dec1"], e + skips[1], stride=(1, 2), padding=(0, 2), groups=2, deconv=True)
    m = conv_block(p["dec0"], e + skips[0], stride=(1, 2), padding=(0, 2), deconv=True, last=True)

    return erb_expand(m, cfg.n_low, cfg.n_erb, cfg.n_fft)  # (B, T, F, 2)


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

    from ..ops.stft_pallas import fast_stft_packed

    spec = fast_stft_packed(x, cfg.stft)  # Pallas-fused on TPU (hop is 128-aligned)
    enhanced = gtcrn_net(params, spec, cfg)
    y = istft_packed(enhanced, cfg.stft)

    if cfg.fold_window:
        y = unfold_windows(y, batch)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, y.shape[-1] * cfg.out_sample_rate // cfg.sample_rate)
    return pcm_out(y)


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
