"""ZipEnhancer — flagship 16 kHz speech enhancer (ModelScope Zipformer2 dual-path).

Parity target: /root/reference/ZipEnhancer/Export_ZipEnhancer.py — per-window
RMS norm → STFT (400/100, hann, reflect) → mag^0.3 compression + phase →
DenseEncoder (1×1 conv + 4 causal DenseBlockV2 layers + strided freq conv) →
4 TSConformer encoders (dual-path Zipformer2 layers over frequency then time;
encoders 1–2 run time/freq-downsampled with softmax-pooled frames and
nearest upsampling + bypass combiner) → grouped mask+phase dense decoders
with sub-pixel frequency upsampling → magnitude^(1/0.3) × unit phase vector
(rectangular, no atan) → ISTFT → RMS denorm, NaN-sanitise, int16 clamp.

Layout: features channel-last (B, T, F, C); Zipformer sequences batch-major
(N, S, C) with N = B×T (frequency path) or B×F (time path).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..dsp import StftConfig
from ..dsp.pcm import fold_windows, resample_linear, unfold_windows
from ..nn import core
from ..parallel.sharding import shard_hint
from ..nn.zipformer import (
    bypass,
    compact_rel_pos,
    init_zipformer_layer,
    simple_downsample,
    simple_upsample,
    zipformer_layer,
)


@dataclasses.dataclass(frozen=True)
class ZipEnhancerConfig:
    n_fft: int = 400
    hop: int = 100
    window: str = "hann"
    pad_mode: str = "reflect"
    compress: float = 0.3
    channels: int = 64
    dense_depth: int = 4
    num_heads: int = 4
    query_head_dim: int = 32
    pos_head_dim: int = 4
    value_head_dim: int = 12
    ff_hidden: int = 96
    nonlin_hidden: int = 48
    conv_kernel: int = 31
    pos_dim: int = 48
    # per-encoder (time_downsample, freq_downsample); 1 = plain dual-path
    encoder_downsample: tuple = ((1, 1), (2, 2), (4, 4), (1, 1))
    sample_rate: int = 16000
    in_sample_rate: int = 16000
    out_sample_rate: int = 16000
    fold_window: int = 24000  # 1.5 s windows, hop-aligned — fold is ON by default
    # compute dtype for the Zipformer stack; STFT/ISTFT, RMS norm and the
    # mask/phase application stay float32 (the reference's fp16 plans keep the
    # same islands full-precision, /root/reference/ZipEnhancer/Optimize_ONNX.py:30-64)
    compute_dtype: str = "float32"

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window, pad_mode=self.pad_mode)

    @property
    def f_bins(self) -> int:
        return self.n_fft // 2 + 1  # 201


def instance_norm_tf(p, x, eps: float = 1e-5):
    """InstanceNorm2d: per-(batch, channel) stats over (T, F); x (B, T, F, C)."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=(1, 2), keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * p["g"] + p["b"]


def _dense_block(p, x, depth: int):
    """Causal DenseBlockV2: kernel (2,3) convs with dilation (2^i, 1), left-pad
    in time (pad then trim tail), InstanceNorm + PReLU, dense skip concat."""
    skip = x
    for i in range(depth):
        d = 1 << i
        layer = p[f"layer{i}"]
        h = jnp.pad(skip, [(0, 0), (d, 0), (0, 0), (0, 0)])
        h = core.conv2d(layer["conv"], h, padding=(0, 1), dilation=(d, 1))
        h = instance_norm_tf(layer["norm"], h)
        h = core.prelu(layer["act"], h)
        x = h
        skip = jnp.concatenate([h, skip], axis=-1)
    return x


def dense_encoder(p, x, cfg: ZipEnhancerConfig):
    """(B, T, F, 2) [mag, phase] → (B, T, F', C)."""
    x = core.conv2d(p["conv1"], x)
    x = core.prelu(p["act1"], instance_norm_tf(p["norm1"], x))
    x = _dense_block(p["dense"], x, cfg.dense_depth)
    x = core.conv2d(p["conv2"], x, stride=(1, 2), padding=(0, 1))
    return core.prelu(p["act2"], instance_norm_tf(p["norm2"], x))


def _layer_kwargs(cfg):
    return dict(num_heads=cfg.num_heads, query_head_dim=cfg.query_head_dim,
                pos_head_dim=cfg.pos_head_dim)


def dualpath_encoder(p, x, cfg: ZipEnhancerConfig):
    """(B, T, F, C): one Zipformer2 layer over frequency, then one over time,
    each wrapped in an outer bypass (Export_ZipEnhancer.py:577-592)."""
    b, t, f, c = x.shape
    # tp shards the folded sequence-batch axis: B×T for the frequency path,
    # B×F for the time path — within-example model parallelism (every chip
    # holds a slice of each window's frames); XLA SPMD inserts the all-to-all
    # at the path transposition where the sharded axis changes meaning.
    seq = shard_hint(x.reshape(b * t, f, c), ("dp", "tp"))
    y = zipformer_layer(p["f_layer"], seq, compact_rel_pos(f, cfg.pos_dim), **_layer_kwargs(cfg))
    x = bypass(p["bypass_f"], seq, y).reshape(b, t, f, c)

    seq = shard_hint(jnp.swapaxes(x, 1, 2).reshape(b * f, t, c), ("dp", "tp"))
    y = zipformer_layer(p["t_layer"], seq, compact_rel_pos(t, cfg.pos_dim), **_layer_kwargs(cfg))
    y = bypass(p["bypass_t"], seq, y)
    return jnp.swapaxes(y.reshape(b, f, t, c), 1, 2)


def downsampled_encoder(p, x, cfg: ZipEnhancerConfig, t_ds: int, f_ds: int):
    """Dual-path encoder on (t/ds, f/ds) resolution with pooled frames and a
    bypass out-combiner (Export_ZipEnhancer.py:794-816)."""
    b, t, f, c = x.shape
    src_orig = x
    # downsample time
    seq = jnp.swapaxes(x, 1, 2).reshape(b * f, t, c)
    seq = simple_downsample(p["down_t"], seq, t_ds)
    dt = seq.shape[1]
    # downsample freq
    seq = jnp.swapaxes(seq.reshape(b, f, dt, c), 1, 2).reshape(b * dt, f, c)
    seq = simple_downsample(p["down_f"], seq, f_ds)
    df = seq.shape[1]

    seq = shard_hint(seq, ("dp", "tp"))  # B×dt folded batch for the freq path
    y = zipformer_layer(p["f_layer"], seq, compact_rel_pos(df, cfg.pos_dim), **_layer_kwargs(cfg))
    seq = bypass(p["bypass_f"], seq, y)
    seq = jnp.swapaxes(seq.reshape(b, dt, df, c), 1, 2).reshape(b * df, dt, c)
    seq = shard_hint(seq, ("dp", "tp"))  # B×df folded batch for the time path
    y = zipformer_layer(p["t_layer"], seq, compact_rel_pos(dt, cfg.pos_dim), **_layer_kwargs(cfg))
    seq = bypass(p["bypass_t"], seq, y)

    seq = seq * p["combine_scale"]
    # upsample freq then time, trim the pooling pad
    seq = jnp.swapaxes(seq.reshape(b, df, dt, c), 1, 2).reshape(b * dt, df, c)
    seq = simple_upsample(seq, f_ds)[:, :f]
    seq = jnp.swapaxes(seq.reshape(b, dt, f, c), 1, 2).reshape(b * f, dt, c)
    seq = simple_upsample(seq, t_ds)[:, :t]
    up = jnp.swapaxes(seq.reshape(b, f, t, c), 1, 2)
    return src_orig * (1.0 - p["combine_scale"]) + up


def decoder_pair(p, x, cfg: ZipEnhancerConfig):
    """Mask+phase decoders: two shared-topology dense blocks (the reference
    batches them as groups=2 convs, Export_ZipEnhancer.py:760-767 — separate
    streams here are algebraically identical and let XLA schedule them in
    parallel), sub-pixel frequency ×2 upsampling, then the mask ReLU head and
    rectangular phase head (Export_ZipEnhancer.py:725-780,866-892)."""
    mx = _dense_block(p["mask_dense"], x, cfg.dense_depth)
    px = _dense_block(p["phase_dense"], x, cfg.dense_depth)

    def upsample(q, h):
        h = core.conv2d(q["conv"], h, padding=(0, 1))  # (B,T,F',2C)
        b, t, f, c2 = h.shape
        c = c2 // 2
        # sub-pixel frequency x2: torch channel order is c-major, upscale-minor
        # (Export_ZipEnhancer.py:767-769)
        h = h.reshape(b, t, f, c, 2)
        h = jnp.swapaxes(h, -2, -1).reshape(b, t, f * 2, c)
        h = instance_norm_tf(q["norm"], h)
        return core.prelu(q["act"], h)

    mx = upsample(p["mask_up"], mx)
    px = upsample(p["phase_up"], px)

    mag_mask = jax.nn.relu(core.conv2d(p["mask_out"], mx)[..., 0])  # kernel (1,2): F→201
    phase_ri = core.conv2d(p["phase_out"], px)  # (B, T, 201, 2)
    return mag_mask, phase_ri


def zipenhancer_net(params, mag, pha, cfg: ZipEnhancerConfig):
    """compressed magnitude+phase (B, T, F) → (mag_out, phase_ri) per frame."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if dtype != jnp.float32:
        params = core.cast_f32_tree(params, dtype)  # idempotent on pre-cast trees
    x = jnp.stack([mag, pha], axis=-1).astype(dtype)
    x = dense_encoder(params["encoder"], x, cfg)
    for i, (t_ds, f_ds) in enumerate(cfg.encoder_downsample):
        enc = params[f"ts{i}"]
        if t_ds == 1 and f_ds == 1:
            x = dualpath_encoder(enc, x, cfg)
        else:
            x = downsampled_encoder(enc, x, cfg, t_ds, f_ds)
    mag_mask, phase_ri = decoder_pair(params["decoder"], x, cfg)
    return mag_mask.astype(jnp.float32), phase_ri.astype(jnp.float32)


def zipenhancer_forward(params, audio, cfg: ZipEnhancerConfig = ZipEnhancerConfig()):
    """int16 PCM (B, L) → denoised int16 PCM (B, L)."""
    x = audio.astype(jnp.float32)  # int16-scale: the RMS norm makes it scale-free
    if cfg.in_sample_rate != cfg.sample_rate:
        x = resample_linear(x, x.shape[-1] * cfg.sample_rate // cfg.in_sample_rate)

    batch = x.shape[0]
    model_len = x.shape[-1]
    align = cfg.fold_window if cfg.fold_window else cfg.hop
    padded = -(-model_len // align) * align
    if padded != model_len:
        x = jnp.pad(x, [(0, 0), (0, padded - model_len)])
    if cfg.fold_window:
        x = fold_windows(x, cfg.fold_window)

    norm = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-6)
    x = x / norm

    from ..ops.stft_pallas import fast_istft_packed, fast_stft_packed

    pk = fast_stft_packed(x, cfg.stft)  # Pallas-fused framing+DFT on TPU
    f = cfg.f_bins
    re, im = pk[..., :f], pk[..., f:]
    mag = jnp.power(re * re + im * im + 1e-9, cfg.compress * 0.5)
    pha = jnp.arctan2(im, re + 1e-5)

    mag_mask, phase_ri = zipenhancer_net(params, mag, pha, cfg)

    magnitude = jnp.power(mag_mask, 1.0 / cfg.compress)
    phase_norm = jnp.linalg.norm(phase_ri, axis=-1, keepdims=True)
    unit = jnp.where(phase_norm > 0.0, phase_ri / jnp.where(phase_norm > 0.0, phase_norm, 1.0),
                     jnp.asarray([1.0, 0.0]))
    spec = magnitude[..., None] * unit  # (B, T, F, 2)
    packed = jnp.concatenate([spec[..., 0], spec[..., 1]], axis=-1)
    y = fast_istft_packed(packed, cfg.stft)  # Pallas-fused iDFT + overlap-add

    y = y * norm
    if cfg.fold_window:
        y = unfold_windows(y, batch)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, model_len * cfg.out_sample_rate // cfg.sample_rate)
    y = jnp.where(jnp.isnan(y), 0.0, y)
    return jnp.clip(y, -32768.0, 32767.0).astype(jnp.int16)


# ─────────────────────────────────────────────────────────────────────────────
# Init
# ─────────────────────────────────────────────────────────────────────────────


def _init_in_pr(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,)), }


def _init_dense_block(key, c, depth):
    ks = jax.random.split(key, depth)
    p = {}
    for i in range(depth):
        p[f"layer{i}"] = {
            "conv": core.init_conv2d(ks[i], 2, 3, c * (i + 1), c),
            "norm": _init_in_pr(c),
            "act": {"alpha": jnp.full((c,), 0.25)},
        }
    return p


def _init_ts(key, cfg, downsampled):
    ks = jax.random.split(key, 6)
    lk = dict(num_heads=cfg.num_heads, query_head_dim=cfg.query_head_dim,
              pos_head_dim=cfg.pos_head_dim, value_head_dim=cfg.value_head_dim,
              ff_hidden=cfg.ff_hidden, nonlin_hidden=cfg.nonlin_hidden,
              conv_kernel=cfg.conv_kernel, pos_dim=cfg.pos_dim)
    p = {
        "f_layer": init_zipformer_layer(ks[0], cfg.channels, **lk),
        "t_layer": init_zipformer_layer(ks[1], cfg.channels, **lk),
    }
    p["bypass_f"] = jnp.full((cfg.channels,), 0.5)
    p["bypass_t"] = jnp.full((cfg.channels,), 0.5)
    if downsampled:
        p["combine_scale"] = jnp.full((cfg.channels,), 0.5)
    return p


def init_zipenhancer(key, cfg: ZipEnhancerConfig = ZipEnhancerConfig()):
    c = cfg.channels
    ks = jax.random.split(key, 16)
    encoder = {
        "conv1": core.init_conv2d(ks[0], 1, 1, 2, c),
        "norm1": _init_in_pr(c),
        "act1": {"alpha": jnp.full((c,), 0.25)},
        "dense": _init_dense_block(ks[1], c, cfg.dense_depth),
        "conv2": core.init_conv2d(ks[2], 1, 3, c, c),
        "norm2": _init_in_pr(c),
        "act2": {"alpha": jnp.full((c,), 0.25)},
    }
    decoder = {
        "mask_dense": _init_dense_block(ks[3], c, cfg.dense_depth),
        "phase_dense": _init_dense_block(ks[4], c, cfg.dense_depth),
        "mask_up": {"conv": core.init_conv2d(ks[5], 1, 3, c, 2 * c), "norm": _init_in_pr(c),
                    "act": {"alpha": jnp.full((c,), 0.25)}},
        "phase_up": {"conv": core.init_conv2d(ks[6], 1, 3, c, 2 * c), "norm": _init_in_pr(c),
                     "act": {"alpha": jnp.full((c,), 0.25)}},
        "mask_out": core.init_conv2d(ks[7], 1, 2, c, 1),
        "phase_out": core.init_conv2d(ks[8], 1, 2, c, 2),
    }
    params = {"encoder": encoder, "decoder": decoder}
    for i, (t_ds, f_ds) in enumerate(cfg.encoder_downsample):
        ds = not (t_ds == 1 and f_ds == 1)
        p = _init_ts(ks[9 + i], cfg, ds)
        if ds:
            p["down_t"] = {"bias": jnp.zeros((t_ds,))}
            p["down_f"] = {"bias": jnp.zeros((f_ds,))}
        params[f"ts{i}"] = p
    return params


def make_zipenhancer(cfg: ZipEnhancerConfig = ZipEnhancerConfig()):
    return partial(zipenhancer_forward, cfg=cfg)
