"""Serving session: manifest-driven windowing, batching, stitching, RTF.

Parity target: the reference inference template
(/root/reference/GTCRN/Inference_GTCRN_ONNX.py:260-344) — fixed-size window
slicing with tail zero-pad, optional RMS normalisation, PAD_HEAD warm-up
prefix, per-source output trimming, Hann-taper overlap-add for
super-resolution (/root/reference/MossFormer2_Super_Resolution/
Inference_MossFormer_SR_ONNX.py:280-338), and an RTF report.

TPU-native difference: instead of a host loop running one window per
``session.run``, ALL windows are stacked on the batch axis and processed in a
single jitted call — the window loop becomes device-side data parallelism
(and shards across chips via audiojax.parallel).  Note: under the axon tunnel
``block_until_ready`` is async; a host transfer is the only true sync, which
``np.asarray`` on the outputs provides.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import numpy as np

from .audio_io import normalise_rms
from .manifest import Manifest

__all__ = ["Session", "SessionResult"]


@dataclass
class SessionResult:
    outputs: tuple[np.ndarray, ...]  # per output source, int16 (n,)
    rtf: float
    elapsed_s: float
    audio_duration_s: float

    @property
    def audio(self) -> np.ndarray:
        return self.outputs[0]


class Session:
    """Runs ``model_fn(params, *audio_batches) -> out | (outs…)`` per manifest.

    With ``mesh`` (a ``jax.sharding.Mesh`` with a ``dp`` axis, see
    ``audiojax.parallel.make_mesh``) the window batch is sharded across chips:
    params are replicated once, every audio input's window axis is split over
    ``dp``, and the stitch consumes the gathered outputs — multi-chip
    throughput serving of the reference's batch-fold idea (SURVEY.md §2.0).
    """

    def __init__(self, model_fn, params, manifest: Manifest, *, jit: bool = True, mesh=None,
                 bucket_windows: bool = True):
        self.manifest = manifest
        self.cfg = manifest.runtime_config()
        self.mesh = mesh
        # Round the window batch up to a power of two so arbitrary clip
        # lengths reuse at most log2(max_windows) compiled shapes — the
        # static-shape answer to the reference's dynamic-axes plans
        # (Optimize_ONNX_Common.py DYNAMIC; MAX_DYNAMIC_AUDIO_SECONDS bounds).
        # Pad windows are all-zero and dropped again before stitching.
        self.bucket_windows = bucket_windows
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate

            self.params = replicate(mesh, params)
            k = self.cfg["NUM_AUDIO_INPUTS"]
            in_s = (NamedSharding(mesh, P()),) + (NamedSharding(mesh, P("dp")),) * k
            self.fn = jax.jit(model_fn, in_shardings=in_s,
                              out_shardings=NamedSharding(mesh, P("dp")))
            self._dp = mesh.shape["dp"]
            return
        self._dp = 1
        self.params = params
        self.fn = jax.jit(model_fn) if jit else model_fn

    # ── host-side conditioning ───────────────────────────────────────────

    def _condition(self, audio: np.ndarray) -> np.ndarray:
        audio = np.asarray(audio)
        if audio.ndim == 1:
            audio = audio[None]  # (channels, n)
        if audio.shape[0] != self.cfg["INPUT_CHANNELS"]:
            if self.cfg["INPUT_CHANNELS"] == 1:
                audio = np.round(audio.astype(np.float32).mean(0, keepdims=True)).astype(np.int16)
            else:
                raise ValueError(
                    f"model expects {self.cfg['INPUT_CHANNELS']} channels, got {audio.shape[0]}"
                )
        if self.cfg["NORMALIZE_AUDIO"]:
            audio = normalise_rms(audio, self.cfg["NORMALIZE_TARGET_RMS"])
        return audio

    def _window_geometry(self, n: int):
        w = self.cfg["INPUT_AUDIO_LENGTH"]
        overlap = self.cfg["OVERLAP_LENGTH"]
        if overlap and overlap >= w:
            raise ValueError(
                f"manifest OVERLAP_LENGTH ({overlap}) must be smaller than "
                f"INPUT_AUDIO_LENGTH ({w}) — window stride would be "
                f"{w - overlap}")
        stride = w - overlap if overlap else w
        num = 1 if n <= w else int(np.ceil((n - w) / stride)) + 1
        # dp sharding needs a whole number of windows per chip; the extra
        # all-zero tail windows are dropped again before stitching
        num_padded = -(-num // self._dp) * self._dp
        if self.bucket_windows and num_padded > 1:
            num_padded = self._dp * (1 << (num_padded // self._dp - 1).bit_length())
        return w, stride, num, num_padded

    # ── main entry ───────────────────────────────────────────────────────

    def process(self, *audios: np.ndarray) -> SessionResult:
        """Enhance one clip (AEC passes two clips: near_end, far_end)."""
        if len(audios) != self.cfg["NUM_AUDIO_INPUTS"]:
            raise ValueError(
                f"model expects {self.cfg['NUM_AUDIO_INPUTS']} audio inputs, got {len(audios)}"
            )
        conditioned = [self._condition(a) for a in audios]
        n = max(a.shape[-1] for a in conditioned)
        pad_head = self.cfg["PAD_HEAD"]
        prepped = []
        for a in conditioned:
            if a.shape[-1] < n:
                a = np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])])
            if pad_head:
                a = np.pad(a, [(0, 0)] * (a.ndim - 1) + [(pad_head, 0)])
            prepped.append(a)
        total = n + pad_head

        w, stride, num, num_padded = self._window_geometry(total)
        need = (num_padded - 1) * stride + w
        from . import native as _native

        batches = []
        for a in prepped:
            if a.ndim == 2 and a.shape[0] == 1 and _native.available():
                # native hot path: C++ window slicing (pads the tail itself)
                batches.append(_native.slice_windows(a[0], w, stride, 0, num_padded))
                continue
            if a.shape[-1] < need:
                a = np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, need - a.shape[-1])])
            wins = np.stack([a[..., s : s + w] for s in range(0, num_padded * stride, stride)])
            # (num, channels, w) → model contract is (batch, w) for mono
            batches.append(wins[:, 0] if wins.shape[1] == 1 else wins)

        start = time.perf_counter()
        out = self.fn(self.params, *[jax.numpy.asarray(b) for b in batches])
        outs = tuple(out) if isinstance(out, (tuple, list)) else (out,)
        outs = tuple(np.asarray(o)[:num] for o in outs)  # true sync; drop dp pad windows
        elapsed = time.perf_counter() - start

        scale = self.cfg["INPUT_TO_OUTPUT_SCALE"]
        out_total = int(round(n * scale))
        head_out = int(round(pad_head * scale))
        # trim on the TIME axis — outputs may be (num, w) or (num, ch, w)
        stitched = tuple(
            self._stitch(o, stride, scale)[..., head_out : head_out + out_total] for o in outs
        )

        duration = out_total / self.cfg["OUT_SAMPLE_RATE"]
        return SessionResult(
            outputs=stitched,
            rtf=elapsed / duration if duration > 0 else float("inf"),
            elapsed_s=elapsed,
            audio_duration_s=duration,
        )

    def _stitch(self, windows: np.ndarray, stride_in: int, scale: float) -> np.ndarray:
        """(num, [ch,] w_out) → ([ch,] n): butt-join, or Hann-taper OLA when
        overlapped; multi-channel outputs stitch per channel."""
        num, w_out = windows.shape[0], windows.shape[-1]
        stride_out = int(round(stride_in * scale))
        if num == 1:
            return windows[0]
        overlap = w_out - stride_out
        if overlap <= 0:
            # butt-join along TIME, preserving any channel axis:
            # (num, ..., w) → (..., num·w)
            return np.moveaxis(windows, 0, -2).reshape(*windows.shape[1:-1], num * w_out)
        if windows.ndim == 3:  # (num, ch, w): OLA each channel independently
            return np.stack(
                [self._stitch(windows[:, c], stride_in, scale) for c in range(windows.shape[1])]
            )
        from . import native as _native

        if windows.dtype == np.int16 and _native.available():
            return _native.ola_stitch(windows, stride_out)
        taper = np.ones(w_out, np.float32)
        ramp = 0.5 - 0.5 * np.cos(np.pi * (np.arange(overlap) + 1) / (overlap + 1))
        taper[:overlap] = ramp
        taper[-overlap:] = ramp[::-1]
        total = (num - 1) * stride_out + w_out
        acc = np.zeros(total, np.float32)
        norm = np.zeros(total, np.float32)
        for i in range(num):
            s = i * stride_out
            t = taper.copy()
            if i == 0:
                t[:overlap] = 1.0
            if i == num - 1:
                t[-overlap:] = 1.0
            acc[s : s + w_out] += windows[i].astype(np.float32) * t
            norm[s : s + w_out] += t
        out = acc / np.maximum(norm, 1e-7)
        if windows.dtype == np.int16:
            return np.clip(np.round(out), -32768, 32767).astype(np.int16)
        # float-output models keep their dtype through OLA (the single-window
        # and butt-join paths already do — dtype must not depend on clip length)
        return out.astype(windows.dtype)
