"""STFT/ISTFT golden tests vs torch.stft / torch.istft — mirrors the
self-validation strategy of the reference DSP layer
(/root/reference/GTCRN/STFT_Process.py:384-455)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audiojax.dsp import (
    StftConfig,
    istft,
    istft_packed,
    istft_polar,
    num_frames,
    stft,
    stft_packed,
    stft_real,
)
from audiojax.dsp.windows import get_window


# One config per distinct model geometry in the reference (SURVEY.md §2.3).
CONFIGS = {
    "canonical_hann_400_160": StftConfig(400, 160, window="hann", pad_mode="constant"),
    "gtcrn_hann_sqrt_512_256": StftConfig(512, 256, window="hann_sqrt", pad_mode="reflect"),
    "zip_hann_400_100": StftConfig(400, 100, window="hann", pad_mode="reflect"),
    "gan_hamming_400_100": StftConfig(400, 100, window="hamming", pad_mode="reflect"),
    "nkf_hann_1024_256": StftConfig(1024, 256, window="hann", pad_mode="constant"),
    "sdaec_odd_319_160": StftConfig(319, 160, window="hamming", pad_mode="constant"),
    "melband_2048_441": StftConfig(2048, 441, window="hann", pad_mode="reflect"),
    "dfsmn_uncentered_1920_960": StftConfig(1920, 960, window="hamming_periodic", center=False),
    "aec_sym_640_320": StftConfig(640, 320, window="hamming_symmetric", center=False),
    "short_win_400_in_512": StftConfig(512, 256, win_length=400, window="hann"),
}


def _audio(length, batch=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, length)).astype(np.float32)


def _torch_stft(x, cfg: StftConfig):
    win = torch.from_numpy(get_window(cfg.window, cfg.wl).astype(np.float32))
    out = torch.stft(
        torch.from_numpy(x),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop,
        win_length=cfg.wl,
        window=win,
        center=cfg.center,
        pad_mode=cfg.pad_mode,
        return_complex=True,
    )
    return out.numpy()  # (B, F, T)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_stft_matches_torch(name):
    cfg = CONFIGS[name]
    x = _audio(8000)
    ref = _torch_stft(x, cfg)
    re, im = stft(jnp.asarray(x), cfg)
    re, im = np.asarray(re), np.asarray(im)
    t = min(ref.shape[-1], re.shape[-2])
    assert num_frames(cfg, 8000) == re.shape[-2]
    scale = np.abs(ref).max()
    np.testing.assert_allclose(re[:, :t].transpose(0, 2, 1), ref.real[..., :t], atol=2e-4 * scale)
    np.testing.assert_allclose(im[:, :t].transpose(0, 2, 1), ref.imag[..., :t], atol=2e-4 * scale)


def test_stft_packed_and_real_consistent():
    cfg = CONFIGS["canonical_hann_400_160"]
    x = jnp.asarray(_audio(8000))
    packed = stft_packed(x, cfg)
    re, im = stft(x, cfg)
    np.testing.assert_array_equal(np.asarray(packed[..., : cfg.f_bins]), np.asarray(re))
    np.testing.assert_array_equal(np.asarray(packed[..., cfg.f_bins :]), np.asarray(im))
    np.testing.assert_allclose(np.asarray(stft_real(x, cfg)), np.asarray(re), atol=1e-4)


@pytest.mark.parametrize(
    "name", ["canonical_hann_400_160", "zip_hann_400_100", "gan_hamming_400_100"]
)
def test_istft_matches_torch(name):
    cfg = CONFIGS[name]
    x = _audio(8000)
    spec = _torch_stft(x, cfg)
    win = torch.from_numpy(get_window(cfg.window, cfg.wl).astype(np.float32))
    ref = torch.istft(
        torch.from_numpy(spec),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop,
        win_length=cfg.wl,
        window=win,
        center=cfg.center,
    ).numpy()
    ours = np.asarray(
        istft(
            jnp.asarray(spec.real.transpose(0, 2, 1)),
            jnp.asarray(spec.imag.transpose(0, 2, 1)),
            cfg,
        )
    )
    n = min(ref.shape[-1], ours.shape[-1])
    np.testing.assert_allclose(ours[:, :n], ref[:, :n], atol=2e-4)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_roundtrip_reconstruction(name):
    cfg = CONFIGS[name]
    x = _audio(8000, batch=2, seed=3)
    packed = stft_packed(jnp.asarray(x), cfg)
    recon = np.asarray(istft_packed(packed, cfg))
    n = min(x.shape[-1], recon.shape[-1])
    # skip edges where the COLA sum is partial/zero (reference round-trip test
    # does the same, /root/reference/GTCRN/STFT_Process.py:595-600)
    s, e = cfg.n_fft, n - cfg.n_fft
    err = np.abs(recon[:, s:e] - x[:, s:e])
    assert err.max() < 2e-3, f"max roundtrip err {err.max():.2e}"


def test_istft_polar_matches_rect():
    cfg = CONFIGS["canonical_hann_400_160"]
    x = jnp.asarray(_audio(8000))
    re, im = stft(x, cfg)
    mag = jnp.sqrt(re**2 + im**2)
    phase = jnp.arctan2(im, re)
    a = np.asarray(istft(re, im, cfg))
    b = np.asarray(istft_polar(mag, phase, cfg))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_out_length_trim_and_scales():
    cfg = StftConfig(400, 160, window="hann", input_scale=2.0, output_scale=0.5)
    base = StftConfig(400, 160, window="hann")
    x = jnp.asarray(_audio(8000))
    p1 = stft_packed(x, cfg)
    p0 = stft_packed(x, base)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(2.0 * p0), rtol=1e-5, atol=1e-4)
    out = istft_packed(p0, cfg, out_length=5000)
    ref = istft_packed(p0, base)
    assert out.shape[-1] == 5000
    np.testing.assert_allclose(np.asarray(out), np.asarray(0.5 * ref[..., :5000]), rtol=1e-5, atol=1e-5)


def test_batch_fold_shapes():
    """Batch-fold windows (SURVEY §2.0): (W*k,) folded to (k, W) must equal
    per-window STFT."""
    cfg = CONFIGS["gtcrn_hann_sqrt_512_256"]
    x = _audio(32000, seed=7)[0]
    folded = jnp.asarray(x.reshape(2, 16000))
    per = stft_packed(folded, cfg)
    single = stft_packed(jnp.asarray(x[:16000])[None], cfg)
    np.testing.assert_allclose(np.asarray(per[0:1]), np.asarray(single), atol=1e-5)
