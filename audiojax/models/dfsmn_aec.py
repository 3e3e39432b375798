"""DFSMN-AEC — two-stage echo-cancellation cascade with optional VAD, 16 kHz.

Parity target: /root/reference/DFSMN_AEC/Export_DFSMN_AEC.py — a pluggable
light-AEC backend (SDAEC / Deep-Echo / NKF, chosen by config) produces a
temporary echo-reduced waveform; a Kaldi fbank (80 mel, 640/320 frames,
1024-pt DFT, symmetric hamming) runs over [near, temp, echo = near − factor·temp]
(3×80 = 240 features); the DFSMN mask net (linear → ReLU → UniDeepFsmn stack →
linear → sigmoid) masks the temp waveform's 640/320 STFT; ISTFT reconstructs.
A second head (linear → sigmoid) optionally emits per-frame speech
probabilities (``vad_results``); host-side timestamp conversion lives in
audiojax.runtime.vad.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..dsp import StftConfig, frame_signal, istft_packed
from ..dsp.pcm import INV_INT16, pcm_in, pcm_out, resample_linear
from ..dsp.stft import _stft_basis_np
from ..frontend.kaldi import log_mel_fbank
from ..nn import core
from .dfsmn import dfsmn_mask_net
from .deep_echo import DeepEchoConfig, deep_echo_forward, init_deep_echo
from .nkf_aec import NkfConfig, init_nkf, nkf_forward
from .sdaec import SdaecConfig, init_sdaec, sdaec_forward

BACKENDS = ("sdaec", "deep_echo", "nkf")


@dataclasses.dataclass(frozen=True)
class DfsmnAecConfig:
    backend: str = "sdaec"
    n_mels: int = 80
    hidden: int = 256
    depth: int = 9
    lorder: int = 20
    frame_len: int = 640
    hop: int = 320
    kaldi_nfft: int = 1024
    preemph: float = 0.97
    echo_factor: float = 1.0
    output_vad: bool = False
    sample_rate: int = 16000
    in_sample_rate: int = 16000
    out_sample_rate: int = 16000

    @property
    def mask_cfg(self) -> StftConfig:
        return StftConfig(self.frame_len, self.hop, window="hamming_symmetric", center=False)

    @property
    def mask_bins(self) -> int:
        return self.frame_len // 2 + 1  # 321


def _backend(cfg: DfsmnAecConfig):
    if cfg.backend == "sdaec":
        return SdaecConfig(), init_sdaec, sdaec_forward
    if cfg.backend == "deep_echo":
        return DeepEchoConfig(), init_deep_echo, deep_echo_forward
    if cfg.backend == "nkf":
        bcfg = NkfConfig()
        return bcfg, init_nkf, lambda p, near, far, cfg=bcfg: nkf_forward(p, far, near, cfg)
    raise ValueError(f"unknown backend {cfg.backend!r}; expected one of {BACKENDS}")


def dfsmn_aec_forward(params, near_end, far_end, cfg: DfsmnAecConfig = DfsmnAecConfig()):
    """(near int16 (B,L), far int16 (B,L)) → aec int16 (B,L) [, vad (B,T)]."""
    bcfg, _, backend_fwd = _backend(cfg)
    temp_i16 = backend_fwd(params["backend"], near_end, far_end, bcfg)

    near = pcm_in(near_end)
    temp = pcm_in(temp_i16)
    if cfg.in_sample_rate != cfg.sample_rate:
        tgt = near.shape[-1] * cfg.sample_rate // cfg.in_sample_rate
        near, temp = resample_linear(near, tgt), resample_linear(temp, tgt)

    model_len = near.shape[-1]
    padded = max(-(-model_len // cfg.hop) * cfg.hop, cfg.frame_len)
    if padded != model_len:
        near = jnp.pad(near, [(0, 0), (0, padded - model_len)])
        temp = jnp.pad(temp, [(0, 0), (0, padded - model_len)])
    echo = near - cfg.echo_factor * temp

    # 3×80-mel Kaldi features over [near, temp, echo], int16-domain powers
    feats = []
    for sig in (near, temp, echo):
        feats.append(
            log_mel_fbank(sig, frame_len=cfg.frame_len, hop=cfg.hop, nfft=cfg.kaldi_nfft,
                          n_mels=cfg.n_mels, fs=cfg.sample_rate, preemph=cfg.preemph,
                          power_scale=1.0 / (INV_INT16 * INV_INT16))
        )
    feat = jnp.concatenate(feats, axis=-1)  # (B, T, 240)

    vad = None
    if cfg.output_vad:
        mask, _, trunk = dfsmn_mask_net(params["mask_net"], feat, return_trunk=True)
        vad = jax.nn.sigmoid(core.dense(params["vad_head"], trunk))[..., 0]
    else:
        mask, _ = dfsmn_mask_net(params["mask_net"], feat)

    frames = frame_signal(temp, cfg.mask_cfg)
    basis = jnp.asarray(_stft_basis_np(cfg.mask_cfg))
    spec = jnp.einsum("...tn,nf->...tf", frames, basis,
                      preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    masked = spec * jnp.concatenate([mask, mask], axis=-1)
    y = istft_packed(masked, cfg.mask_cfg)
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, model_len * cfg.out_sample_rate // cfg.sample_rate)
    out = pcm_out(y)
    return (out, vad) if cfg.output_vad else out


def init_dfsmn_aec(key, cfg: DfsmnAecConfig = DfsmnAecConfig()):
    from .dfsmn import DfsmnConfig, init_dfsmn

    bcfg, backend_init, _ = _backend(cfg)
    k1, k2, k3 = jax.random.split(key, 3)
    mask_cfg = DfsmnConfig(n_mels=3 * cfg.n_mels, hidden=cfg.hidden, depth=cfg.depth,
                           lorder=cfg.lorder, n_fft=cfg.frame_len, hop=cfg.hop)
    params = {
        "backend": backend_init(k1, bcfg),
        "mask_net": init_dfsmn(k2, mask_cfg),
    }
    if cfg.output_vad:
        params["vad_head"] = core.init_dense(k3, cfg.hidden, 1)
    return params


def make_dfsmn_aec(cfg: DfsmnAecConfig = DfsmnAecConfig()):
    def fn(params, near_end, far_end):
        return dfsmn_aec_forward(params, near_end, far_end, cfg=cfg)

    return fn
