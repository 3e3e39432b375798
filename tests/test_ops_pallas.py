"""Pallas fused STFT kernel vs the jnp reference path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from audiojax.dsp import StftConfig, istft_packed, stft_packed
from audiojax.ops.stft_pallas import istft_packed_pallas, stft_packed_pallas


@pytest.mark.parametrize("cfg,length", [
    (StftConfig(512, 256, window="hann_sqrt", pad_mode="reflect"), 16000),
    (StftConfig(400, 100, window="hann", pad_mode="reflect"), 8000),
    (StftConfig(1024, 256, window="hann", pad_mode="constant"), 9984),
])
def test_pallas_stft_matches_jnp(cfg, length):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, length)).astype(np.float32))
    ref = np.asarray(stft_packed(x, cfg))
    out = np.asarray(stft_packed_pallas(x, cfg, frames_per_block=32, interpret=True))
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=3e-4 * scale)


@pytest.mark.parametrize("cfg,length,out_length", [
    (StftConfig(512, 256, window="hann_sqrt", pad_mode="reflect"), 16000, None),
    (StftConfig(400, 100, window="hann", pad_mode="reflect"), 8000, 7900),
    (StftConfig(1024, 256, window="hann", pad_mode="constant"), 9984, None),
])
def test_pallas_istft_matches_jnp(cfg, length, out_length):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, length)).astype(np.float32))
    spec = stft_packed(x, cfg)
    ref = np.asarray(istft_packed(spec, cfg, out_length))
    out = np.asarray(istft_packed_pallas(spec, cfg, out_length=out_length,
                                         frames_per_block=32, interpret=True))
    assert out.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(out, ref, atol=3e-4 * scale)


@pytest.mark.parametrize("n,s,k,v,mask", [(7, 33, 16, 24, False), (4, 20, 8, 8, True)])
def test_pallas_quad_attention_matches_jnp(n, s, k, v, mask):
    from audiojax.ops.attention_pallas import quad_attention_jnp, quad_attention_pallas

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((n, s, k)).astype(np.float32))
    kk = jnp.asarray(rng.standard_normal((n, s, k)).astype(np.float32))
    vv = jnp.asarray(rng.standard_normal((n, s, v)).astype(np.float32))
    ref = np.asarray(quad_attention_jnp(q, kk, vv, scale=1.0 / s, mask_diag=mask))
    out = np.asarray(quad_attention_pallas(q, kk, vv, scale=1.0 / s, mask_diag=mask,
                                           block_rows=4, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4 * max(np.abs(ref).max(), 1.0))
