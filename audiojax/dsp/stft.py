"""Matmul-DFT STFT / ISTFT — the TPU-native equivalent of the reference L1 layer.

Parity target: the Conv1d/ConvTranspose1d STFT/ISTFT of the reference
(/root/reference/GTCRN/STFT_Process.py:129-361 and its per-model variants).
Same math, different realisation:

  * The reference frames the signal implicitly through a strided Conv1d whose
    kernel is the windowed DFT basis.  Here we frame explicitly with a
    zero-gather "reshape + K shifted slices" trick (no gather ops, static
    shapes) and run ONE big (B*T, n_fft) x (n_fft, 2F) matmul — this lands on
    the MXU as a large GEMM instead of a 1-input-channel conv.
  * The reference reconstructs with ConvTranspose1d; here iDFT is a matmul
    followed by a static unrolled overlap-add (K shifted adds), then COLA
    normalisation with a precomputed reciprocal window-square overlap sum
    (cf. ``static_norm`` and ``inv_win_sum`` in the reference variants,
    e.g. /root/reference/UL-UNAS/STFT_Process.py:263-265).

Layouts: audio is ``(..., L)``; spectra are time-major channel-last
``(..., T, F)`` (T on sublanes, F on lanes — the natural TPU tiling).  Helpers
convert to the reference's packed channel-first ``(B, 2F, T)`` form when a
model contract needs it.

All bases/windows/normalisers are computed in numpy float64 at trace time and
enter the jitted graph as constants.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

# DFT matmuls must run at true f32 on the MXU (default TPU precision is bf16
# multiplies, which costs ~20 dB of reconstruction SNR on the int16 contract).
_DFT_PRECISION = lax.Precision.HIGHEST

from .windows import padded_window

__all__ = [
    "StftConfig",
    "num_frames",
    "pad_center",
    "frame_signal",
    "overlap_add",
    "steady_cola_np",
    "stream_istft",
    "stft",
    "stft_packed",
    "stft_real",
    "istft",
    "istft_packed",
    "istft_polar",
]


@dataclasses.dataclass(frozen=True)
class StftConfig:
    """Static STFT/ISTFT geometry; hashable so basis tables can be cached.

    Field semantics mirror the reference ``STFT_Process.__init__``
    (/root/reference/GTCRN/STFT_Process.py:144-211): ``input_scale`` /
    ``output_scale`` are folded into the DFT bases (used by NKF-AEC to absorb
    the int16 PCM scale, /root/reference/NKF_AEC/STFT_Process.py:210-211).
    """

    n_fft: int
    hop: int
    win_length: int | None = None
    window: str = "hann"
    center: bool = True
    pad_mode: str = "constant"  # 'constant' | 'reflect'
    input_scale: float = 1.0
    output_scale: float = 1.0

    @property
    def wl(self) -> int:
        return self.n_fft if self.win_length is None else self.win_length

    @property
    def half(self) -> int:
        return self.n_fft // 2

    @property
    def f_bins(self) -> int:
        return self.n_fft // 2 + 1


def num_frames(cfg: StftConfig, length: int) -> int:
    """Number of full analysis frames for an input of ``length`` samples."""
    padded = length + 2 * cfg.half if cfg.center else length
    return (padded - cfg.n_fft) // cfg.hop + 1


def istft_length(cfg: StftConfig, n_frames: int) -> int:
    """Length of the ISTFT output for ``n_frames`` frames (after centre trim)."""
    raw = cfg.n_fft + cfg.hop * (n_frames - 1)
    return raw - 2 * cfg.half if cfg.center else raw


# ─────────────────────────────────────────────────────────────────────────────
# Precomputed constants (numpy, cached per config)
# ─────────────────────────────────────────────────────────────────────────────


@lru_cache(maxsize=None)
def _window_np(cfg: StftConfig) -> np.ndarray:
    return padded_window(cfg.window, cfg.wl, cfg.n_fft)


@lru_cache(maxsize=None)
def _stft_basis_np(cfg: StftConfig) -> np.ndarray:
    """(n_fft, 2F) windowed forward-DFT basis: [cos | -sin] * window * scale."""
    n = np.arange(cfg.n_fft, dtype=np.float64)[:, None]
    f = np.arange(cfg.f_bins, dtype=np.float64)[None, :]
    omega = 2.0 * np.pi / cfg.n_fft * n * f
    w = (_window_np(cfg) * cfg.input_scale)[:, None]
    basis = np.concatenate([np.cos(omega) * w, -np.sin(omega) * w], axis=1)
    return basis.astype(np.float32)


@lru_cache(maxsize=None)
def _istft_basis_np(cfg: StftConfig) -> np.ndarray:
    """(2F, n_fft) windowed inverse-DFT basis with one-sided 2/N scaling.

    Matches the reference inverse kernel (bins 0 and Nyquist scaled 1/N,
    interior bins 2/N; /root/reference/GTCRN/STFT_Process.py:229-251).
    """
    k = np.arange(cfg.f_bins, dtype=np.float64)[:, None]
    n = np.arange(cfg.n_fft, dtype=np.float64)[None, :]
    omega = 2.0 * np.pi / cfg.n_fft * k * n
    scale = np.full((cfg.f_bins, 1), 2.0)
    scale[0, 0] = 1.0
    if cfg.n_fft % 2 == 0:
        scale[-1, 0] = 1.0
    w = _window_np(cfg)[None, :] / cfg.n_fft
    real_rows = scale * np.cos(omega) * w
    imag_rows = scale * -np.sin(omega) * w
    return np.concatenate([real_rows, imag_rows], axis=0).astype(np.float32)


@lru_cache(maxsize=None)
def _inv_win_sum_np(cfg: StftConfig, n_frames: int, out_length: int | None) -> np.ndarray:
    """Reciprocal COLA normaliser, pre-sliced to the output region.

    The reference overlap-adds window**2 with a ConvTranspose1d and divides
    (/root/reference/GTCRN/STFT_Process.py:253-277).  We compute the same sum
    in numpy and store its reciprocal (zeros → 1 so silent COLA gaps pass
    zeros through instead of inf).
    """
    w2 = _window_np(cfg) ** 2
    raw = cfg.n_fft + cfg.hop * (n_frames - 1)
    acc = np.zeros(raw)
    for t in range(n_frames):
        acc[t * cfg.hop : t * cfg.hop + cfg.n_fft] += w2
    start = cfg.half if cfg.center else 0
    # out_length follows the reference's exact-output_length contract
    # (/root/reference/SDAEC/STFT_Process.py:178: out_end = out_start +
    # output_length): the slice may extend INTO the right centre-pad region,
    # normalised by the decaying COLA sum there — NOT trim-both-pads-then-cut.
    end = start + out_length if out_length is not None else (raw - start)
    acc = acc[start:end]
    inv = np.where(acc == 0.0, 1.0, 1.0 / np.maximum(acc, 1e-300))
    return (inv * cfg.output_scale).astype(np.float32)


# ─────────────────────────────────────────────────────────────────────────────
# Framing / overlap-add
# ─────────────────────────────────────────────────────────────────────────────


def pad_center(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """Centre-pad ``half`` samples each side, reflect or constant.

    Reflect uses the exact slice-and-flip of the reference
    (/root/reference/GTCRN/STFT_Process.py:286-295).
    """
    if not cfg.center:
        return x
    h = cfg.half
    if cfg.pad_mode == "reflect":
        if x.shape[-1] < h + 1:
            # torch.stft errors here too; a silent short pad would
            # desynchronise the frame count from num_frames()
            raise ValueError(
                f"reflect center-pad of {h} needs at least {h + 1} samples, "
                f"got {x.shape[-1]}")
        left = jnp.flip(x[..., 1 : h + 1], axis=-1)
        right = jnp.flip(x[..., -(h + 1) : -1], axis=-1)
        return jnp.concatenate([left, x, right], axis=-1)
    zeros = jnp.zeros(x.shape[:-1] + (h,), x.dtype)
    return jnp.concatenate([zeros, x, zeros], axis=-1)


def frame_signal(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """Slice ``(..., L)`` into ``(..., T, n_fft)`` frames with stride ``hop``.

    Gather-free: pad to a hop multiple, view as rows of ``hop`` samples, and
    concatenate K = ceil(n_fft/hop) shifted row slices.  K is a small static
    constant (2–5 for every model config), so this unrolls to a handful of
    cheap strided slices that XLA fuses.
    """
    x = pad_center(x, cfg)
    lead = x.shape[:-1]
    padded = x.shape[-1]
    n_t = (padded - cfg.n_fft) // cfg.hop + 1
    if n_t < 1:
        raise ValueError(f"input too short for STFT: {padded} < n_fft={cfg.n_fft}")
    k_seg = -(-cfg.n_fft // cfg.hop)
    rows_needed = n_t + k_seg - 1
    total = rows_needed * cfg.hop
    if total > padded:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, total - padded)])
    else:
        x = x[..., :total]
    rows = x.reshape(*lead, rows_needed, cfg.hop)
    segs = [rows[..., k : k + n_t, :] for k in range(k_seg)]
    frames = jnp.concatenate(segs, axis=-1)
    return frames[..., : cfg.n_fft]


def stream_istft(packed: jnp.ndarray, cfg: StftConfig, ola_tail: jnp.ndarray,
                 emit_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """iDFT + overlap-add ONE streaming chunk of packed spectra.

    packed: (B, T, 2F) with T·hop == emit_len; ola_tail: (B, n_fft − hop)
    carried from the previous chunk.  Returns (float samples (B, emit_len)
    normalised by the steady-state COLA divisor, new ola_tail).  Shared by
    every state-carry streaming model (identical tail logic — one place to
    fix OLA/divisor edge cases)."""
    ibasis = jnp.asarray(_istft_basis_np(cfg))
    frames = jnp.einsum("...tf,fn->...tn", packed, ibasis,
                        preferred_element_type=jnp.float32,
                        precision=_DFT_PRECISION)
    raw = overlap_add(frames, cfg.hop)  # (B, T·hop + n_fft − hop)
    carry = cfg.n_fft - cfg.hop
    raw = raw.at[:, :carry].add(ola_tail)
    divisor = jnp.tile(jnp.asarray(steady_cola_np(cfg)), emit_len // cfg.hop)
    return raw[:, :emit_len] * divisor, raw[:, emit_len:]


def steady_cola_np(cfg: StftConfig) -> np.ndarray:
    """Steady-state reciprocal COLA divisor: one hop of the hop-periodic
    window² overlap sum (the reference detects hop-periodicity and stores one
    hop of the static norm, /root/reference/GTCRN/STFT_Process.py:253-274).
    Streaming ISTFT paths tile this over emitted samples."""
    w2 = _window_np(cfg) ** 2
    k = -(-cfg.n_fft // cfg.hop)
    acc = np.zeros(cfg.hop)
    for i in range(k):
        seg = w2[i * cfg.hop : (i + 1) * cfg.hop]
        acc[: len(seg)] += seg
    return (1.0 / np.maximum(acc, 1e-12)).astype(np.float32)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add ``(..., T, N)`` frames at stride ``hop`` → ``(..., N + hop*(T-1))``.

    Static unrolled: K = ceil(N/hop) shifted adds on a ``(T+K-1, hop)`` grid.
    """
    *lead, n_t, n = frames.shape
    k_seg = -(-n // hop)
    pad = k_seg * hop - n
    if pad:
        frames = jnp.pad(frames, [(0, 0)] * len(lead) + [(0, 0), (0, pad)])
    fr = frames.reshape(*lead, n_t, k_seg, hop)
    out = jnp.zeros((*lead, n_t + k_seg - 1, hop), frames.dtype)
    for k in range(k_seg):
        out = out.at[..., k : k + n_t, :].add(fr[..., :, k, :])
    raw = out.reshape(*lead, (n_t + k_seg - 1) * hop)
    return raw[..., : n + hop * (n_t - 1)]


# ─────────────────────────────────────────────────────────────────────────────
# Public STFT / ISTFT
# ─────────────────────────────────────────────────────────────────────────────


def stft_packed(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """STFT of ``(..., L)`` → packed ``(..., T, 2F)`` with [real | imag] lanes.

    Equivalent to the reference's ``stft_B_packed`` channel-first output
    transposed to time-major (/root/reference/GTCRN/STFT_Process.py:303-316).
    """
    frames = frame_signal(x, cfg)
    basis = jnp.asarray(_stft_basis_np(cfg))
    return jnp.einsum("...tn,nf->...tf", frames, basis, preferred_element_type=jnp.float32, precision=_DFT_PRECISION)


def stft(x: jnp.ndarray, cfg: StftConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """STFT returning (real, imag), each ``(..., T, F)`` (reference ``stft_B``)."""
    packed = stft_packed(x, cfg)
    return packed[..., : cfg.f_bins], packed[..., cfg.f_bins :]


def stft_real(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """Real (cosine) projection only — reference ``stft_A``."""
    frames = frame_signal(x, cfg)
    basis = jnp.asarray(_stft_basis_np(cfg)[:, : cfg.f_bins])
    return jnp.einsum("...tn,nf->...tf", frames, basis, preferred_element_type=jnp.float32, precision=_DFT_PRECISION)


def istft_packed(
    spec: jnp.ndarray, cfg: StftConfig, out_length: int | None = None
) -> jnp.ndarray:
    """ISTFT of packed ``(..., T, 2F)`` → ``(..., L_out)``.

    iDFT matmul → overlap-add → static COLA reciprocal → centre trim
    (reference ``istft_B_packed``, /root/reference/GTCRN/STFT_Process.py:326-341,
    always in its ``static_norm`` form since our whole stack is static-shape).
    ``out_length`` additionally trims the tail (cf. SDAEC's exact
    ``output_length``, /root/reference/SDAEC/STFT_Process.py:157-178).
    """
    n_t = spec.shape[-2]
    ibasis = jnp.asarray(_istft_basis_np(cfg))
    frames = jnp.einsum("...tf,fn->...tn", spec, ibasis, preferred_element_type=jnp.float32, precision=_DFT_PRECISION)
    raw = overlap_add(frames, cfg.hop)
    start = cfg.half if cfg.center else 0
    if out_length is not None:
        # reference semantics (SDAEC/STFT_Process.py:178): exactly out_length
        # samples from out_start, extending into the right centre-pad region
        end = start + out_length
        if end > raw.shape[-1]:
            raise ValueError(
                f"out_length={out_length} exceeds the overlap-added signal: "
                f"{n_t} frames cover only {raw.shape[-1] - start} output "
                f"samples — the documented exactly-out_length contract "
                f"cannot be met (a silent short return would break "
                f"static-shape consumers)")
    else:
        end = raw.shape[-1] - start
    out = raw[..., start:end]
    inv = jnp.asarray(_inv_win_sum_np(cfg, n_t, out_length))
    return out * inv


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    cfg: StftConfig,
    out_length: int | None = None,
) -> jnp.ndarray:
    """ISTFT from rectangular form (reference ``istft_B``)."""
    return istft_packed(jnp.concatenate([real, imag], axis=-1), cfg, out_length)


def istft_polar(
    magnitude: jnp.ndarray,
    phase: jnp.ndarray,
    cfg: StftConfig,
    out_length: int | None = None,
) -> jnp.ndarray:
    """ISTFT from polar form (reference ``istft_A``)."""
    return istft(magnitude * jnp.cos(phase), magnitude * jnp.sin(phase), cfg, out_length)
