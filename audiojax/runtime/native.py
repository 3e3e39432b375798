"""ctypes bridge to the native (C++) runtime hot paths.

Builds ``native/audioio.cc`` with g++ on first use (cached as a .so beside
the source) and exposes WAV decoding and window slicing.  Everything here has
a pure-numpy fallback (audio_io.py / session.py), so the native layer is an
accelerator, never a hard dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = [
    "available",
    "decode_flac",
    "read_wav_mono16",
    "slice_windows",
    "encode_wav_pcm16",
    "resample_linear",
    "normalise_rms",
    "ola_stitch",
]

_SRC = Path(__file__).resolve().parents[2] / "native" / "audioio.cc"
_SO = _SRC.with_suffix(".so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            # build to a per-pid temp path and rename into place: rename is
            # atomic, so concurrent processes can never CDLL a half-written .so
            tmp = _SO.with_suffix(f".so.build{os.getpid()}")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(tmp)],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, _SO)
        lib = ctypes.CDLL(str(_SO))
        lib.wav_parse_header.restype = ctypes.c_int
        lib.wav_decode_mono16.restype = ctypes.c_int
        lib.slice_windows.restype = ctypes.c_int
        lib.wav_encode_pcm16.restype = ctypes.c_int64
        lib.resample_linear_i16.restype = ctypes.c_int
        lib.resample_linear_rows_i16.restype = ctypes.c_int
        lib.normalise_rms_i16.restype = ctypes.c_int
        lib.ola_stitch_i16.restype = ctypes.c_int
        lib.flac_parse_header.restype = ctypes.c_int
        lib.flac_decode_i16.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_wav_mono16(path) -> tuple[np.ndarray, int]:
    """Native WAV decode → (int16 mono samples, sample_rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio unavailable")
    data = np.frombuffer(Path(path).read_bytes(), dtype=np.uint8)
    ch = ctypes.c_int32()
    rate = ctypes.c_int32()
    bits = ctypes.c_int32()
    is_f = ctypes.c_int32()
    n = ctypes.c_int64()
    off = ctypes.c_int64()
    rc = lib.wav_parse_header(
        data.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(data.size),
        ctypes.byref(ch), ctypes.byref(rate), ctypes.byref(bits),
        ctypes.byref(is_f), ctypes.byref(n), ctypes.byref(off),
    )
    if rc != 0:
        raise ValueError(f"invalid WAV file ({rc}): {path}")
    # bound-check BEFORE handing the header-claimed frame count to C: a
    # truncated/malformed data chunk must not drive an out-of-bounds read,
    # and bits<8 would divide by zero in the frame-size computation
    if bits.value < 8:
        raise ValueError(f"unsupported WAV bit depth {bits.value}: {path}")
    frame_bytes = ch.value * (bits.value // 8)
    if off.value + n.value * frame_bytes > data.size:
        raise ValueError(
            f"truncated WAV: header claims {n.value} frames "
            f"({n.value * frame_bytes} bytes at offset {off.value}) but file "
            f"has {data.size} bytes: {path}")
    out = np.empty(n.value, np.int16)
    rc = lib.wav_decode_mono16(
        data.ctypes.data_as(ctypes.c_void_p), off, n,
        ch, bits, is_f, out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError(f"unsupported WAV payload ({rc}): {path}")
    return out, rate.value


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Native FLAC decode → (int16 samples ``(channels, n)``, sample_rate).

    Fail-closed: CRC or format errors raise (no partial output).  bps ≠ 16 is
    shifted to int16 range (lossless for 16-bit sources, which the speech
    corpora the reference targets all are)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio unavailable")
    buf = np.frombuffer(data, dtype=np.uint8)
    ch = ctypes.c_int32()
    rate = ctypes.c_int32()
    bits = ctypes.c_int32()
    total = ctypes.c_int64()
    rc = lib.flac_parse_header(
        buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(buf.size),
        ctypes.byref(ch), ctypes.byref(rate), ctypes.byref(bits), ctypes.byref(total),
    )
    if rc != 0:
        raise ValueError(f"invalid FLAC stream ({rc})")
    # total_samples may legally be 0 (unknown); start from a stream-size
    # heuristic and GROW on exhaustion — highly compressible streams
    # (silence) can exceed any fixed ratio, and a silent truncation would
    # violate the fail-closed contract above
    cap = total.value if total.value > 0 else max(buf.size * 4 // max(ch.value, 1), 4096)
    while True:
        out = np.empty((cap, ch.value), np.int16)
        n = lib.flac_decode_i16(
            buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(buf.size),
            out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(cap),
        )
        if n < 0:
            raise ValueError(f"FLAC decode failed ({n})")
        if n < cap or total.value > 0:
            break
        cap *= 4  # buffer filled exactly with unknown total: may be clipped
    return out[:n].T.copy(), rate.value


def slice_windows(audio: np.ndarray, window: int, stride: int, pad_head: int,
                  num_windows: int) -> np.ndarray:
    """Native fixed-window slicing with PAD_HEAD prefix and tail zero-pad."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio unavailable")
    audio = np.ascontiguousarray(audio, np.int16)
    out = np.empty((num_windows, window), np.int16)
    rc = lib.slice_windows(
        audio.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(audio.size),
        ctypes.c_int64(window), ctypes.c_int64(stride), ctypes.c_int64(pad_head),
        ctypes.c_int64(num_windows), out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError("slice_windows failed")
    return out


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Native PCM16 RIFF encode; ``samples`` is (channels, n) or (n,) int16."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio unavailable")
    samples = np.asarray(samples, np.int16)
    if samples.ndim == 1:
        samples = samples[None]
    channels, n = samples.shape
    interleaved = np.ascontiguousarray(samples.T)  # frame-major
    out = np.empty(44 + n * channels * 2, np.uint8)
    written = lib.wav_encode_pcm16(
        interleaved.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(n),
        ctypes.c_int32(channels), ctypes.c_int32(rate),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if written != out.size:
        raise ValueError("wav_encode_pcm16 failed")
    return out.tobytes()


def resample_linear(audio: np.ndarray, out_n: int) -> np.ndarray:
    """Native linear resample along the last axis, int16 → int16."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio unavailable")
    audio = np.ascontiguousarray(audio, np.int16)
    lead = audio.shape[:-1]
    flat = audio.reshape(-1, audio.shape[-1])
    out = np.empty((flat.shape[0], out_n), np.int16)
    rc = lib.resample_linear_rows_i16(
        flat.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(flat.shape[0]),
        ctypes.c_int64(flat.shape[1]),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(out_n),
    )
    if rc != 0:
        raise ValueError("resample_linear_rows_i16 failed")
    return out.reshape(*lead, out_n)


def normalise_rms(audio: np.ndarray, target_rms: float) -> np.ndarray:
    """Native int16 RMS normalisation (whole-tensor RMS, per the reference)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio unavailable")
    audio = np.ascontiguousarray(audio, np.int16)
    out = np.empty_like(audio)
    rc = lib.normalise_rms_i16(
        audio.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(audio.size),
        ctypes.c_double(target_rms), out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError("normalise_rms_i16 failed")
    return out


def ola_stitch(windows: np.ndarray, stride_out: int) -> np.ndarray:
    """Native Hann-taper overlap-add stitch of (num, w_out) int16 windows."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio unavailable")
    windows = np.ascontiguousarray(windows, np.int16)
    num, w_out = windows.shape
    total = (num - 1) * stride_out + w_out
    # zeros, not empty: for stride_out > w_out (gapped windows) the C fast
    # path writes only the window spans, and the gaps must be silence rather
    # than uninitialized memory
    out = np.zeros(total, np.int16)
    rc = lib.ola_stitch_i16(
        windows.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(num),
        ctypes.c_int64(w_out), ctypes.c_int64(stride_out),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError("ola_stitch_i16 failed")
    return out
