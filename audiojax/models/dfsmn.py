"""DFSMN — 48 kHz causal denoiser (ModelScope DfsmnAns PSM mask network).

Parity target: /root/reference/DFSMN/Export_DFSMN.py — Kaldi log-mel fbank
(120 mel, 1920/960 frames, 2048-pt DFT, preemph 0.97, per-frame DC removal)
fused with a 1920-pt mask STFT over the SAME frames; mask net =
linear(120→256) → ReLU → depth× UniDeepFsmn (ReLU-linear → projection →
causal depthwise memory conv, lorder taps, inner residual folded into the
current-frame tap) → linear(256→961) → sigmoid PSM mask; ISTFT with
*periodic* hamming synthesis (analysis is symmetric), center=False.

TPU-native: one shared framing + two DFT matmuls; the mask net is pure
dense/depthwise-conv in (B, T, C) channel-last.  The causal FSMN memory also
gets a first-class STREAMING path: ``dfsmn_mask_net`` threads an explicit
per-layer memory state, upgrading the reference's stateless-window serving to
exact chunked state-carry streaming (SURVEY.md §5 "north star").
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..dsp import StftConfig, frame_signal
from ..dsp.pcm import INV_INT16, fold_windows, pcm_in, pcm_out, resample_linear, unfold_windows
from ..dsp.stft import _stft_basis_np
from ..frontend.kaldi import log_mel_fbank
from ..nn import core, rnn  # noqa: F401  (rnn unused here; kept for parity with other models)
from jax import lax


@dataclasses.dataclass(frozen=True)
class DfsmnConfig:
    n_mels: int = 120
    hidden: int = 256
    depth: int = 9
    lorder: int = 20
    n_fft: int = 1920
    hop: int = 960
    kaldi_nfft: int = 2048
    preemph: float = 0.97
    sample_rate: int = 48000
    in_sample_rate: int = 48000
    out_sample_rate: int = 48000
    fold_window: int = 0

    @property
    def frame_cfg(self) -> StftConfig:
        # analysis framing shared by fbank and mask STFT: symmetric hamming,
        # snip-edges (center=False)
        return StftConfig(self.n_fft, self.hop, window="hamming_symmetric", center=False)

    @property
    def istft_cfg(self) -> StftConfig:
        # synthesis uses PERIODIC hamming (librosa.istft default parity,
        # /root/reference/DFSMN/Export_DFSMN.py:35)
        return StftConfig(self.n_fft, self.hop, window="hamming_periodic", center=False)

    @property
    def stft_bins(self) -> int:
        return self.n_fft // 2 + 1


def dfsmn_mask_net(p, fbank, state=None, *, return_trunk: bool = False):
    """(B, T, n_mels) log-fbank → (B, T, stft_bins) sigmoid mask.

    ``state``: optional per-layer causal memories, each (B, lorder-1, hidden).
    Returns (mask, new_state) — passing the returned state into the next call
    continues the causal memory exactly (streaming).  With ``return_trunk`` the
    pre-mask FSMN trunk rides along (the DFSMN-AEC VAD head consumes it,
    /root/reference/DFSMN_AEC/Export_DFSMN_AEC.py:1318-1320).
    """
    x = jax.nn.relu(core.dense(p["lin1"], fbank))
    w0 = p["layers"][0]["mem"]["w"]
    lorder = (w0["q8"] if core.is_q8(w0) else w0).shape[0]  # q8dyn artifacts
    new_state = []
    for i, layer in enumerate(p["layers"]):
        f1 = jax.nn.relu(core.dense(layer["lin"], x))
        p1 = core.dense(layer["proj"], f1)
        if state is None:
            pad = jnp.zeros((p1.shape[0], lorder - 1, p1.shape[-1]), p1.dtype)
        else:
            pad = state[i]
        mem_in = jnp.concatenate([pad, p1], axis=1)
        # depthwise causal memory conv; the importer folds the inner residual
        # (p1 + conv(p1)) into the current-frame tap
        # (/root/reference/DFSMN/Export_DFSMN.py:165-166)
        mem = core.conv1d(layer["mem"], mem_in, groups=p1.shape[-1])
        # slice by start: -(lorder-1) with lorder=1 would keep the WHOLE buffer
        new_state.append(mem_in[:, mem_in.shape[1] - (lorder - 1):])
        x = x + mem
    mask = jax.nn.sigmoid(core.dense(p["lin2"], x))
    if return_trunk:
        return mask, new_state, x
    return mask, new_state


def dfsmn_forward(params, audio, cfg: DfsmnConfig = DfsmnConfig()):
    """int16 PCM (B, L) @ in_rate → denoised int16 PCM (B, L_out)."""
    x = pcm_in(audio)
    if cfg.in_sample_rate != cfg.sample_rate:
        x = resample_linear(x, int(round(x.shape[-1] * cfg.sample_rate / cfg.in_sample_rate)))

    batch = x.shape[0]
    model_len = x.shape[-1]
    if cfg.fold_window and (cfg.fold_window % cfg.hop or cfg.fold_window < cfg.n_fft):
        raise ValueError(
            f"fold_window={cfg.fold_window} must be a hop ({cfg.hop}) multiple "
            f">= n_fft ({cfg.n_fft}): the snip-edges ISTFT emits frames*hop "
            f"samples per window and a misaligned fold silently drops samples "
            f"at every window boundary")
    align = cfg.fold_window if cfg.fold_window else cfg.hop
    padded = max(-(-model_len // align) * align, cfg.n_fft)
    if padded != model_len:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, padded - model_len)])
    if cfg.fold_window:
        x = fold_windows(x, cfg.fold_window)

    frames = frame_signal(x, cfg.frame_cfg)  # shared framing for fbank + STFT
    fbank = log_mel_fbank(
        x,
        frame_len=cfg.n_fft,
        hop=cfg.hop,
        nfft=cfg.kaldi_nfft,
        n_mels=cfg.n_mels,
        fs=cfg.sample_rate,
        preemph=cfg.preemph,
        power_scale=1.0 / (INV_INT16 * INV_INT16),
        frames=frames,
    )
    basis = jnp.asarray(_stft_basis_np(cfg.frame_cfg))
    spec = jnp.einsum("...tn,nf->...tf", frames, basis,
                      preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)

    mask, _ = dfsmn_mask_net(params, fbank)
    masked = spec * jnp.concatenate([mask, mask], axis=-1)
    from ..ops.stft_pallas import fast_istft_packed

    y = fast_istft_packed(masked, cfg.istft_cfg)  # Pallas-fused on TPU

    if cfg.fold_window:
        y = unfold_windows(y, batch)
    # center=False ISTFT emits n_fft + hop*(T-1) = padded samples; trim tail
    y = y[..., :model_len]
    if cfg.out_sample_rate != cfg.sample_rate:
        y = resample_linear(y, int(round(model_len * cfg.out_sample_rate / cfg.sample_rate)))
    return pcm_out(y)


# ─────────────────────────────────────────────────────────────────────────────
# Streaming (the SURVEY.md §5 "north star": state-carry replaces stateless
# windowing — bit-consistent with the offline path in steady state)
# ─────────────────────────────────────────────────────────────────────────────


def dfsmn_stream_init(cfg: DfsmnConfig, batch: int = 1):
    """Fresh streaming state: audio tail (n_fft−hop raw samples), per-layer
    FSMN memories, and the overlap-add tail of the synthesis window."""
    if cfg.in_sample_rate != cfg.sample_rate or cfg.out_sample_rate != cfg.sample_rate:
        raise ValueError(
            f"streaming runs at the model rate only ({cfg.sample_rate} Hz); "
            "resample on the host (the offline forward resamples "
            "in-graph, the stream step does not)")
    carry = cfg.n_fft - cfg.hop
    return {
        "audio_tail": jnp.zeros((batch, carry), jnp.float32),
        "fsmn": [
            jnp.zeros((batch, cfg.lorder - 1, cfg.hidden), jnp.float32)
            for _ in range(cfg.depth)
        ],
        "ola_tail": jnp.zeros((batch, carry), jnp.float32),
    }


def _steady_cola_np(cfg: DfsmnConfig):
    """Steady-state COLA divisor of the synthesis window (dsp.stft helper)."""
    from ..dsp.stft import steady_cola_np

    return steady_cola_np(cfg.istft_cfg)


def dfsmn_stream_step(params, state, chunk, cfg: DfsmnConfig = DfsmnConfig()):
    """One streaming step: int16 chunk (B, k·hop) → (state, int16 out (B, k·hop)).

    Semantics: the stream processes the input as if (n_fft − hop) zeros were
    prepended — output sample i equals the offline path's output on that
    zero-prepended signal for i ≥ hop (same frame sequence, same FSMN state
    trajectory, same OLA sums) to within 1 int16 LSB (f32 reassociation
    between the chunked and whole-clip graphs).  Relative to the plain offline
    output the stream is therefore delayed by (n_fft − hop) samples, and the
    extra zero-context first frame perturbs the mask only within the FSMN
    receptive field, 1 + depth·(lorder−1) frames (see tests/test_dfsmn.py).
    """
    assert chunk.shape[-1] % cfg.hop == 0, "chunk length must be a hop multiple"
    x = pcm_in(chunk)
    buf = jnp.concatenate([state["audio_tail"], x], axis=-1)

    frames = frame_signal(buf, cfg.frame_cfg)  # k frames
    fbank = log_mel_fbank(
        buf, frame_len=cfg.n_fft, hop=cfg.hop, nfft=cfg.kaldi_nfft,
        n_mels=cfg.n_mels, fs=cfg.sample_rate, preemph=cfg.preemph,
        power_scale=1.0 / (INV_INT16 * INV_INT16), frames=frames,
    )
    basis = jnp.asarray(_stft_basis_np(cfg.frame_cfg))
    spec = jnp.einsum("...tn,nf->...tf", frames, basis,
                      preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)

    mask, fsmn_state = dfsmn_mask_net(params, fbank, state["fsmn"])
    masked = spec * jnp.concatenate([mask, mask], axis=-1)

    from ..dsp.stft import stream_istft

    carry = cfg.n_fft - cfg.hop
    emit_len = chunk.shape[-1]
    out, new_tail = stream_istft(masked, cfg.istft_cfg, state["ola_tail"], emit_len)

    new_state = {
        "audio_tail": buf[:, -carry:],
        "fsmn": fsmn_state,
        "ola_tail": new_tail,
    }
    return new_state, pcm_out(out)


def init_dfsmn(key, cfg: DfsmnConfig = DfsmnConfig()):
    ks = jax.random.split(key, cfg.depth + 2)
    layers = []
    for i in range(cfg.depth):
        k1, k2, k3 = jax.random.split(ks[i], 3)
        mem_w = core.glorot(k3, (cfg.lorder, 1, cfg.hidden)) * 0.1
        mem_w = mem_w.at[-1, 0, :].add(1.0)  # inner-residual fold
        layers.append(
            {
                "lin": core.init_dense(k1, cfg.hidden, cfg.hidden),
                "proj": core.init_dense(k2, cfg.hidden, cfg.hidden, bias=False),
                "mem": {"w": mem_w},
            }
        )
    return {
        "lin1": core.init_dense(ks[-2], cfg.n_mels, cfg.hidden),
        "lin2": core.init_dense(ks[-1], cfg.hidden, cfg.stft_bins),
        "layers": layers,
    }


def make_dfsmn(cfg: DfsmnConfig = DfsmnConfig()):
    return partial(dfsmn_forward, cfg=cfg)
