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
    # "Matches the original DFSMN echo estimate scaling"
    # (/root/reference/DFSMN_AEC/Export_DFSMN_AEC.py:1195, self.factor)
    echo_factor: float = 1.15
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
    # demean=False: unlike the standalone AEC exports, the cascade's
    # _preprocess_audio_pair does NOT mean-center the pair
    # (/root/reference/DFSMN_AEC/Export_DFSMN_AEC.py:1198-1216).
    # float_output=True: the reference cascade chains the temp waveform between
    # stages in float; an int16 round-trip would bury a small echo-cancelled
    # residual under ~-17 dB quantization noise.
    if cfg.backend == "sdaec":
        return SdaecConfig(demean=False, float_output=True), init_sdaec, sdaec_forward
    if cfg.backend == "deep_echo":
        return DeepEchoConfig(demean=False, float_output=True), init_deep_echo, deep_echo_forward
    if cfg.backend == "nkf":
        bcfg = NkfConfig(demean=False, float_output=True)
        return bcfg, init_nkf, lambda p, near, far, cfg=bcfg: nkf_forward(p, far, near, cfg)
    raise ValueError(f"unknown backend {cfg.backend!r}; expected one of {BACKENDS}")


def dfsmn_aec_forward(params, near_end, far_end, cfg: DfsmnAecConfig = DfsmnAecConfig()):
    """(near int16 (B,L), far int16 (B,L)) → aec int16 (B,L) [, vad (B,T)]."""
    bcfg, _, backend_fwd = _backend(cfg)
    temp = backend_fwd(params["backend"], near_end, far_end, bcfg)  # float

    near = pcm_in(near_end)
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


# ─────────────────────────────────────────────────────────────────────────────
# Streaming (the full cascade with state carry: backend stream → FIFO
# re-alignment to one stage-2 hop → streaming DFSMN mask net)
# ─────────────────────────────────────────────────────────────────────────────


def _stream_backend(cfg: DfsmnAecConfig):
    if cfg.backend == "sdaec":
        from .sdaec import sdaec_stream_init, sdaec_stream_step

        bcfg = SdaecConfig(float_output=True)
        return bcfg, sdaec_stream_init, sdaec_stream_step, bcfg.n_fft - bcfg.hop
    if cfg.backend == "deep_echo":
        from .deep_echo import deep_echo_stream_init, deep_echo_stream_step

        bcfg = DeepEchoConfig(float_output=True)
        return bcfg, deep_echo_stream_init, deep_echo_stream_step, bcfg.n_fft - bcfg.hop
    raise ValueError(f"backend {cfg.backend!r} has no streaming path (sdaec/deep_echo do)")


def dfsmn_aec_stream_init(cfg: DfsmnAecConfig = DfsmnAecConfig(), batch: int = 1):
    """State: backend stream state, re-alignment FIFOs (the backend's
    159-sample delay is padded up to one full stage-2 hop so stage-2 frames
    stay hop-aligned with the offline path), stage-2 framing tails, FSMN
    memories, and the synthesis OLA tail."""
    if cfg.in_sample_rate != cfg.sample_rate or cfg.out_sample_rate != cfg.sample_rate:
        raise ValueError(
            f"streaming runs at the model rate only ({cfg.sample_rate} Hz); "
            "resample on the host (the offline forward resamples "
            "in-graph, the stream step does not)")
    bcfg, b_init, _, b_delay = _stream_backend(cfg)
    pad_to_hop = cfg.hop - b_delay  # extra temp buffering (e.g. 320-159=161)
    carry2 = cfg.frame_len - cfg.hop
    return {
        "backend": b_init(bcfg, batch),
        "temp_fifo": jnp.zeros((batch, pad_to_hop), jnp.float32),
        "near_fifo": jnp.zeros((batch, cfg.hop), jnp.int16),
        "near_tail": jnp.zeros((batch, carry2), jnp.float32),
        "temp_tail": jnp.zeros((batch, carry2), jnp.float32),
        "fsmn": [jnp.zeros((batch, cfg.lorder - 1, cfg.hidden), jnp.float32)
                 for _ in range(cfg.depth)],
        "ola_tail": jnp.zeros((batch, carry2), jnp.float32),
    }


def dfsmn_aec_stream_step(params, state, near_chunk, far_chunk,
                          cfg: DfsmnAecConfig = DfsmnAecConfig()):
    """One cascade step: int16 chunks (B, m·hop) → (state, int16 out[, vad]).

    Total delay vs the offline cascade = 2·hop samples (one hop of backend
    re-alignment + the stage-2 zero-prefix); interior samples match the
    offline path past the stage-2 FSMN receptive field (the backend stage is
    exact, see test_sdaec_deep_echo)."""
    assert near_chunk.shape[-1] % cfg.hop == 0, "chunk length must be a hop multiple"
    bcfg, _, b_step, _ = _stream_backend(cfg)
    m = near_chunk.shape[-1]

    bstate, temp_raw = b_step(params["backend"], state["backend"], near_chunk, far_chunk, bcfg)

    # re-align: temp is 159 samples behind the input; buffer it (and near) so
    # both streams are delayed by exactly one stage-2 hop
    temp_buf = jnp.concatenate([state["temp_fifo"], temp_raw], axis=-1)  # float
    near_buf = jnp.concatenate([state["near_fifo"], near_chunk], axis=-1)
    temp, temp_fifo = temp_buf[:, :m], temp_buf[:, m:]
    near_i16, near_fifo = near_buf[:, :m], near_buf[:, m:]

    near = pcm_in(near_i16)
    buf_n = jnp.concatenate([state["near_tail"], near], axis=-1)
    buf_t = jnp.concatenate([state["temp_tail"], temp], axis=-1)
    echo = buf_n - cfg.echo_factor * buf_t

    feats = []
    for sig in (buf_n, buf_t, echo):
        feats.append(
            log_mel_fbank(sig, frame_len=cfg.frame_len, hop=cfg.hop, nfft=cfg.kaldi_nfft,
                          n_mels=cfg.n_mels, fs=cfg.sample_rate, preemph=cfg.preemph,
                          power_scale=1.0 / (INV_INT16 * INV_INT16))
        )
    feat = jnp.concatenate(feats, axis=-1)

    vad = None
    if cfg.output_vad:
        mask, fsmn_state, trunk = dfsmn_mask_net(params["mask_net"], feat, state["fsmn"],
                                                 return_trunk=True)
        vad = jax.nn.sigmoid(core.dense(params["vad_head"], trunk))[..., 0]
    else:
        mask, fsmn_state = dfsmn_mask_net(params["mask_net"], feat, state["fsmn"])

    frames = frame_signal(buf_t, cfg.mask_cfg)
    basis = jnp.asarray(_stft_basis_np(cfg.mask_cfg))
    spec = jnp.einsum("...tn,nf->...tf", frames, basis,
                      preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    masked = spec * jnp.concatenate([mask, mask], axis=-1)

    from ..dsp.stft import stream_istft

    carry2 = cfg.frame_len - cfg.hop
    out, new_tail = stream_istft(masked, cfg.mask_cfg, state["ola_tail"], m)

    new_state = {
        "backend": bstate,
        "temp_fifo": temp_fifo,
        "near_fifo": near_fifo,
        "near_tail": buf_n[:, -carry2:],
        "temp_tail": buf_t[:, -carry2:],
        "fsmn": fsmn_state,
        "ola_tail": new_tail,
    }
    result = pcm_out(out)
    return (new_state, (result, vad)) if cfg.output_vad else (new_state, result)


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
