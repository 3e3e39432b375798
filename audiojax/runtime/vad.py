"""Host-side VAD post-processing: frame probabilities → speech timestamps.

Parity target: the timestamp conversion of the DFSMN-AEC inference script
(/root/reference/DFSMN_AEC/Inference_DFSMN_ONNX_AEC.py:345-463): per-frame
speech probabilities are thresholded with hysteresis, smoothed with a
look-ahead window so short dips don't split segments, and emitted as
(start_seconds, end_seconds) pairs.
"""
from __future__ import annotations

import numpy as np

__all__ = ["vad_timestamps"]


def vad_timestamps(
    probs: np.ndarray,
    *,
    hop: int,
    sample_rate: int,
    threshold: float = 0.5,
    look_ahead_s: float = 0.3,
    min_speech_s: float = 0.1,
) -> list[tuple[float, float]]:
    """Convert per-frame speech probabilities to merged speech segments.

    A frame counts as speech if its probability — or any probability within
    the look-ahead window after it — exceeds the threshold (dips shorter than
    the look-ahead are bridged).  Segments shorter than ``min_speech_s`` drop.
    """
    probs = np.asarray(probs).reshape(-1)
    frame_s = hop / sample_rate
    look = max(1, int(round(look_ahead_s / frame_s)))

    active = probs > threshold
    # bridge dips: a frame is kept active if speech resumes within `look`
    bridged = active.copy()
    n = len(active)
    last_true = -10**9
    next_true = np.full(n, 10**9)
    upcoming = 10**9
    for i in range(n - 1, -1, -1):
        if active[i]:
            upcoming = i
        next_true[i] = upcoming
    for i in range(n):
        if active[i]:
            last_true = i
        elif last_true >= 0 and next_true[i] - last_true <= look:
            bridged[i] = True

    segments = []
    start = None
    for i, flag in enumerate(bridged):
        if flag and start is None:
            start = i
        elif not flag and start is not None:
            segments.append((start, i))
            start = None
    if start is not None:
        segments.append((start, n))

    out = []
    for s, e in segments:
        t0, t1 = s * frame_s, e * frame_s
        if t1 - t0 >= min_speech_s:
            out.append((round(t0, 4), round(t1, 4)))
    return out
