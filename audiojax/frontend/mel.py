"""Slaney-scale mel filterbanks + HiFi-GAN-style log-mel.

Parity targets: ``torchaudio.functional.melscale_fbanks(..., norm='slaney',
mel_scale='slaney')`` as used by MossFormer2-SR
(/root/reference/MossFormer2_Super_Resolution/Export_MossFormer_SR.py:131-133)
and Mel-Band-Roformer's slaney bank
(/root/reference/Mel_Band_Roformer/Mono/Export_MelBandRoformer.py:418-434).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["slaney_mel_fbanks", "hz_to_mel_slaney", "mel_to_hz_slaney"]


def hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mel = 3.0 * f / 200.0
    log_region = f >= 1000.0
    mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) * (27.0 / np.log(6.4)), mel)
    return mel


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)
    return f


@lru_cache(maxsize=None)
def slaney_mel_fbanks(n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: float,
                      norm: str = "slaney") -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank, slaney scale + slaney area norm."""
    freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel_slaney(f_min), hz_to_mel_slaney(f_max), n_mels + 2)
    f_pts = mel_to_hz_slaney(m_pts)

    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.clip(np.minimum(down, up), 0.0, None)
    if norm == "slaney":
        fb = fb * (2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels]))[None, :]
    return fb.astype(np.float32)
