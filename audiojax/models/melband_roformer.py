"""Mel-Band Roformer — vocal separation at 44.1 kHz (mono and stereo).

Parity target: /root/reference/Mel_Band_Roformer/{Mono,Stereo}/Export_MelBandRoformer.py —
STFT 2048/441 (hann, reflect) → slaney mel filterbank split into 60
OVERLAPPING bands (bin membership = fb > 0, with the DC and Nyquist corners
forced in; stereo interleaves channels into the bin axis) → per-band
RMSNorm+Linear embedding to dim → depth × axial transformers (time attention
then band attention, RoPE over the full head dim, per-head sigmoid gates,
RMSNorm'd attention/FF with a final per-transformer RMSNorm) → per-band
MLP+GLU mask estimator → overlap-averaged complex mask (scatter-add ÷ counts;
the reference folds the denominator into the GLU value branch) → complex
multiply → ISTFT.

The mono variant's stereo→mono checkpoint folding (L/R averaging,
Mono/Export_MelBandRoformer.py:270-344) is an importer transform.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp import StftConfig, istft, stft
from ..dsp.pcm import pcm_in, pcm_out
from ..frontend.mel import slaney_mel_fbanks
from ..nn import core
from ..nn.core import rms_norm
from ..nn.mossformer import rope_mm_tables
from ..parallel.sharding import shard_hint


@dataclasses.dataclass(frozen=True)
class MelBandConfig:
    n_fft: int = 2048
    hop: int = 441
    window: str = "hann"
    pad_mode: str = "reflect"
    num_bands: int = 60
    dim: int = 384
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    mlp_expansion: int = 4
    # hidden tanh layers in the mask-estimator MLP; the shipped checkpoint has
    # TWO (the export wrapper hardcodes linears at net[0]/net[2]/net[4],
    # /root/reference/Mel_Band_Roformer/Mono/Export_MelBandRoformer.py:576-584)
    mask_depth: int = 2
    channels: int = 1  # 1 = mono, 2 = stereo
    sample_rate: int = 44100
    in_sample_rate: int = 44100
    out_sample_rate: int = 44100
    fold_window: int = 0
    # bf16 transformer compute with an f32 complex-mask/ISTFT island; the
    # reference even recommends dynamic INT8 for this model
    # (/root/reference/README.md:93), so bf16 is comfortably inside its
    # quantization tolerance.
    compute_dtype: str = "float32"

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.hop, window=self.window, pad_mode=self.pad_mode)

    @property
    def f_bins(self) -> int:
        return self.n_fft // 2 + 1


@lru_cache(maxsize=None)
def band_layout(cfg: MelBandConfig):
    """(freq_indices, band_widths, counts): the overlapping mel band selection
    (Mono/Export_MelBandRoformer.py:418-434). Indices are into the
    channel-interleaved bin axis of length f_bins*channels."""
    fb = slaney_mel_fbanks(cfg.f_bins, 0.0, cfg.sample_rate / 2.0, cfg.num_bands,
                           float(cfg.sample_rate)).T.copy()  # (bands, bins)
    fb[0, 0] = 1.0
    fb[-1, -1] = 1.0
    member = fb > 0
    indices = []
    widths = []
    for b in range(cfg.num_bands):
        bins = np.nonzero(member[b])[0]
        if cfg.channels == 1:
            sel = bins
        else:  # stereo: channel-interleaved bin axis (bin*ch + c)
            sel = np.stack([bins * cfg.channels + c for c in range(cfg.channels)], axis=1).reshape(-1)
        indices.append(sel)
        widths.append(2 * len(bins) * cfg.channels)
    freq_indices = np.concatenate(indices).astype(np.int32)
    counts = np.zeros((cfg.f_bins * cfg.channels,), np.float32)
    np.add.at(counts, freq_indices, 1.0)
    return freq_indices, tuple(widths), np.maximum(counts, 1.0)


def _width_runs(widths):
    """Consecutive equal-width runs of the band layout: [(start, count, w)]."""
    runs = []
    for i, w in enumerate(widths):
        if runs and runs[-1][2] == w:
            runs[-1][1] += 1
        else:
            runs.append([i, 1, w])
    return [tuple(r) for r in runs]


def _attention(p, x, rope, cfg: MelBandConfig):
    n, s, _ = x.shape
    h, dh = cfg.heads, cfg.dim_head
    normed = rms_norm(p["norm"], x, eps=0.0)
    # lane-packed (N, S, H, D) throughout — to_qkv's output columns are
    # already [Q | K | V] blocks, so q/k/v are contiguous slices, and the
    # einsums below keep the head axis in lanes: no (N, H, S, D) transposes
    # on either side of the mix (same measured win as ZipEnhancer's
    # attention repack, PROFILES.md).
    qkv = core.dense(p["to_qkv"], normed).reshape(n, s, 3, h, dh)
    gates = jax.nn.sigmoid(core.dense(p["to_gates"], normed))  # (n, s, heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (n, s, h, dh)
    # RoPE with rotate-half as a matmul against a constant signed pair-swap
    # matrix (exact; lane-interleave shuffles are ~10× slower on TPU — see
    # nn.mossformer.rope_mm_tables).  cos/sin are (S, D): broadcast over the
    # interior head axis.
    cos, sin, swap = rope
    cos_b, sin_b = cos[:, None, :], sin[:, None, :]
    q = q * cos_b + (q @ swap) * sin_b
    k = k * cos_b + (k @ swap) * sin_b
    # Under bf16 compute the scores + softmax stay bf16 on TPU: the f32
    # score pipeline (f32 QKᵀ out, f32 softmax traffic on the (N,H,S,S)
    # tensor) is exactly what made bf16 SLOWER than f32 for this family
    # (stage ablation, v5e: attention +8.2 ms f32 → +10.8 ms bf16; with
    # bf16 scores the full forward goes 18.2 → 15.7 ms, beating f32's
    # 16.1).  Max-subtracted softmax is stable in bf16 and probs are
    # bounded [0,1]; measured fidelity cost 0.9 dB on the 41.7 dB bf16
    # plan.  CPU keeps the f32 pipeline (XLA:CPU has no bf16 dot thunks).
    f32_scores = x.dtype == jnp.float32 or jax.default_backend() != "tpu"
    acc = jnp.float32 if f32_scores else None
    attn = jax.nn.softmax(
        jnp.einsum("nihk,njhk->nhij", q, k, preferred_element_type=acc) * dh**-0.5,
        axis=-1,
    ).astype(x.dtype)
    out = jnp.einsum("nhij,njhv->nihv", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out * gates[..., None]  # (n, s, h, dh)
    return core.dense(p["to_out"], out.reshape(n, s, h * dh))


def _transformer(p, x, rope, cfg: MelBandConfig):
    x = x + _attention(p["attn"], x, rope, cfg)
    h = jax.nn.gelu(core.dense(p["ff1"], rms_norm(p["ff_norm"], x, eps=0.0)), approximate=False)
    x = x + core.dense(p["ff2"], h)
    return rms_norm(p["out_norm"], x, eps=0.0)


def melband_net(p, spec, cfg: MelBandConfig):
    """spec (B, T, F·ch, 2) complex-last interleaved → masked spec same shape."""
    freq_idx, widths, counts = band_layout(cfg)
    dtype = jnp.dtype(cfg.compute_dtype)
    if dtype != jnp.float32:
        p = core.cast_f32_tree(p, dtype)  # idempotent on pre-cast trees
    b, t, fc, _ = spec.shape
    sel = spec[:, :, jnp.asarray(freq_idx), :]  # (B, T, S, 2)
    flat = sel.reshape(b, t, -1).astype(dtype)  # (B, T, 2S) band-major [re, im] pairs

    # band split: per-band RMSNorm + Linear → (bands, B, T, dim).  Bands are
    # contiguous equal-width RUNS (the mel layout repeats widths), so each
    # run batches into ONE stacked matmul instead of per-band tiny GEMMs —
    # the reference's _band_runs trick (Export_MelBandRoformer.py:556-566).
    feats = []
    off = 0
    for i0, r, w in _width_runs(widths):
        part = flat[..., off : off + r * w].reshape(b, t, r, w)
        off += r * w
        gains = jnp.stack([p["band_split"][j]["norm"]["g"] for j in range(i0, i0 + r)])
        normed = rms_norm(None, part, eps=0.0) * gains  # (B, T, r, w)
        wts = jnp.stack([core.as_weight(p["band_split"][j]["lin"]["w"])
                         for j in range(i0, i0 + r)])  # (r, w, dim)
        bias = jnp.stack([p["band_split"][j]["lin"]["b"] for j in range(i0, i0 + r)])
        y = jnp.einsum("btrw,rwd->rbtd", normed, wts,
                       preferred_element_type=dtype) + bias[:, None, None]
        feats.append(y)
    x = jnp.concatenate(feats, axis=0)  # (nb, B, T, dim)
    nb = cfg.num_bands

    dh = cfg.dim_head
    trope = tuple(a.astype(dtype) for a in rope_mm_tables(t, dh, dh))
    frope = tuple(a.astype(dtype) for a in rope_mm_tables(nb, dh, dh))
    # In-model tensor parallelism: each axial pass is batched over the OTHER
    # axis (time attention over nb·B band-tokens, band attention over t·B
    # time-tokens), so sharding that folded batch over ("dp","tp") partitions
    # the transformer stack within a window; XLA inserts the all-to-alls at
    # the axial transpositions (same pattern as ZipEnhancer's dual-path).
    for i in range(cfg.depth):
        seq = shard_hint(x.reshape(nb * b, t, cfg.dim), ("dp", "tp"))
        seq = _transformer(p[f"time{i}"], seq, trope, cfg)
        x = seq.reshape(nb, b, t, cfg.dim)
        seq = shard_hint(
            jnp.transpose(x, (2, 1, 0, 3)).reshape(t * b, nb, cfg.dim), ("dp", "tp"))
        seq = _transformer(p[f"freq{i}"], seq, frope, cfg)
        x = jnp.transpose(seq.reshape(t, b, nb, cfg.dim), (2, 1, 0, 3))

    # mask estimator: shared-width MLP batched over bands, per-band GLU head.
    # Upstream topology (Export_MelBandRoformer.py:236-252 MLP): linear→tanh
    # repeated mask_depth times, then a final per-band linear with NO tanh,
    # then GLU.
    h = x
    for lay in p["me_hidden"]:
        h = jnp.tanh(jnp.einsum("nbtd,ndk->nbtk", h, core.as_weight(lay["w"]),
                                preferred_element_type=jnp.float32)
                     + lay["b"][:, None, None]).astype(dtype)
    masks = []
    for i0, r, w in _width_runs(widths):  # batched per equal-width run
        wts = jnp.stack([core.as_weight(p["me_out"][j]["w"])
                         for j in range(i0, i0 + r)])  # (r, inner, 2w)
        bias = jnp.stack([p["me_out"][j]["b"] for j in range(i0, i0 + r)])
        g = jnp.einsum("rbtd,rdk->btrk", h[i0 : i0 + r], wts,
                       preferred_element_type=dtype) + bias[None, None]
        m = g[..., :w] * jax.nn.sigmoid(g[..., w:])  # GLU, (B, T, r, w)
        masks.append(m.reshape(b, t, r * w))  # band-major flatten
    mask_flat = jnp.concatenate(masks, axis=-1)  # (B, T, 2S)
    mask = mask_flat.reshape(b, t, -1, 2).astype(jnp.float32)  # f32 mask island

    # overlap-average scatter: sum contributions per bin / membership count
    acc = jnp.zeros((b, t, fc, 2), mask.dtype)
    acc = acc.at[:, :, jnp.asarray(freq_idx), :].add(mask)
    mask_avg = acc / jnp.asarray(counts)[None, None, :, None]

    mr, mi = mask_avg[..., 0], mask_avg[..., 1]
    sr, si = spec[..., 0], spec[..., 1]
    return jnp.stack([sr * mr - si * mi, sr * mi + si * mr], axis=-1)


def melband_forward(params, audio, cfg: MelBandConfig = MelBandConfig()):
    """int16 (B, ch, L) (or (B, L) mono) → separated vocals, same shape."""
    squeeze = audio.ndim == 2
    if squeeze:
        audio = audio[:, None, :]
    b, ch, length = audio.shape
    assert ch == cfg.channels, f"model expects {cfg.channels} channel(s), got {ch}"

    x = pcm_in(audio.reshape(b * ch, length))
    model_len = x.shape[-1]
    padded = -(-model_len // cfg.hop) * cfg.hop
    if padded != model_len:
        x = jnp.pad(x, [(0, 0), (0, padded - model_len)])

    re, im = stft(x, cfg.stft)  # (B*ch, T, F)
    t = re.shape[1]
    spec = jnp.stack([re, im], axis=-1).reshape(b, ch, t, cfg.f_bins, 2)
    # channel-interleaved bin axis (bin*ch + c)
    spec = jnp.moveaxis(spec, 1, 3).reshape(b, t, cfg.f_bins * ch, 2)

    out = melband_net(params, spec, cfg)

    out = out.reshape(b, t, cfg.f_bins, ch, 2)
    out = jnp.moveaxis(out, 3, 1).reshape(b * ch, t, cfg.f_bins, 2)
    y = istft(out[..., 0], out[..., 1], cfg.stft)
    y = y[..., :model_len].reshape(b, ch, model_len)
    y = pcm_out(y)
    return y[:, 0] if squeeze else y


def init_melband(key, cfg: MelBandConfig = MelBandConfig()):
    _, widths, _ = band_layout(cfg)
    ks = jax.random.split(key, 2 * cfg.depth + 4)
    inner = cfg.mlp_expansion * cfg.dim

    def tf(k):
        k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)
        return {
            "attn": {
                "norm": {"g": jnp.ones((cfg.dim,))},
                "to_qkv": core.init_dense(k2, cfg.dim, 3 * cfg.heads * cfg.dim_head, bias=False),
                "to_gates": core.init_dense(k3, cfg.dim, cfg.heads),
                "to_out": core.init_dense(k4, cfg.heads * cfg.dim_head, cfg.dim, bias=False),
            },
            "ff_norm": {"g": jnp.ones((cfg.dim,))},
            "ff1": core.init_dense(k5, cfg.dim, inner),
            "ff2": core.init_dense(k6, inner, cfg.dim),
            "out_norm": {"g": jnp.ones((cfg.dim,))},
        }

    p = {}
    for i in range(cfg.depth):
        p[f"time{i}"] = tf(ks[2 * i])
        p[f"freq{i}"] = tf(ks[2 * i + 1])

    bs_keys = jax.random.split(ks[-4], len(widths))
    p["band_split"] = [
        {"norm": {"g": jnp.ones((w,))}, "lin": core.init_dense(bs_keys[i], w, cfg.dim)}
        for i, w in enumerate(widths)
    ]
    mk = jax.random.split(ks[-3], len(widths) + 2)
    p["me_hidden"] = []
    hk = jax.random.split(mk[-2], cfg.mask_depth)
    d_in = cfg.dim
    for j in range(cfg.mask_depth):
        p["me_hidden"].append({
            "w": jax.vmap(lambda k, d=d_in: core.glorot(k, (d, inner)))(jax.random.split(hk[j], len(widths))),
            "b": jnp.zeros((len(widths), inner)),
        })
        d_in = inner
    p["me_out"] = [core.init_dense(mk[i], inner, 2 * w) for i, w in enumerate(widths)]
    return p


def make_melband(cfg: MelBandConfig = MelBandConfig()):
    return partial(melband_forward, cfg=cfg)
