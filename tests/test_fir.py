"""Banded-GEMM FIR (dsp.fir) vs numpy convolution goldens."""
import numpy as np
import pytest

import jax.numpy as jnp

from audiojax.dsp.fir import fir_gemm, upsample_zero_stuff


@pytest.mark.parametrize("k,left,block", [(7, 3, 16), (511, 0, 512), (97, 48, 128)])
def test_fir_gemm_matches_numpy(k, left, block):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    taps = rng.standard_normal(k).astype(np.float32)
    out = np.asarray(fir_gemm(jnp.asarray(x), taps, left=left, block=block))
    # y[n] = sum_t x[n + t - left] taps[t]  == correlate(x_padded, taps)
    xp = np.pad(x, [(0, 0), (left, k - 1 - left)])
    ref = np.stack([np.correlate(xp[b], taps, mode="valid") for b in range(2)])
    np.testing.assert_allclose(out, ref[:, : out.shape[-1]], atol=1e-4 * np.abs(ref).max())


def test_fir_gemm_out_len_extends_past_input():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 100)).astype(np.float32)
    taps = rng.standard_normal(9).astype(np.float32)
    out = np.asarray(fir_gemm(jnp.asarray(x), taps, left=4, out_len=120))
    xp = np.pad(x, [(0, 0), (4, 9 - 1 - 4 + 20)])
    ref = np.correlate(xp[0], taps, mode="valid")
    np.testing.assert_allclose(out[0], ref[:120], atol=1e-5)


def test_upsample_zero_stuff():
    x = jnp.asarray(np.arange(1, 5, dtype=np.float32)[None])
    out = np.asarray(upsample_zero_stuff(x, 3))
    np.testing.assert_array_equal(out[0], [1, 0, 0, 2, 0, 0, 3, 0, 0, 4])


def test_upsample_sinc_matches_conv_transpose():
    """The banded-GEMM polyphase upsampler must equal the ConvTranspose1d
    formulation it replaced (Export_MossFormer_SR.py:176-199 semantics)."""
    from audiojax.models.mossformer_sr import (MossFormerSrConfig, _upsample_kernel_np,
                                               upsample_sinc)
    from audiojax.nn import core

    cfg = MossFormerSrConfig()
    rng = np.random.default_rng(2)
    audio = jnp.asarray((rng.standard_normal((2, 1600)) * 8000).astype(np.int16))
    ours = np.asarray(upsample_sinc(audio, cfg))

    ratio, hw = cfg.upsample_ratio, cfg.resample_halfwidth
    k = _upsample_kernel_np(ratio, hw)
    ref = core.conv1d_transpose(
        {"w": jnp.asarray(k[:, None, None])}, audio.astype(jnp.float32)[..., None],
        stride=ratio, padding=ratio * hw, output_padding=ratio - 1,
    )[..., 0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, np.asarray(ref), atol=2e-5)
