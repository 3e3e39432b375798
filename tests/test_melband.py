"""Mel-Band Roformer: band layout, overlap-average mask, mono/stereo e2e."""
import numpy as np

import jax
import jax.numpy as jnp

from audiojax.models.melband_roformer import (
    MelBandConfig,
    band_layout,
    init_melband,
    melband_forward,
)


def _tiny(ch=1):
    return MelBandConfig(n_fft=256, hop=64, num_bands=8, dim=32, depth=1, heads=2,
                         dim_head=16, mlp_expansion=2, channels=ch,
                         sample_rate=44100, in_sample_rate=44100, out_sample_rate=44100)


def test_band_layout_covers_all_bins():
    cfg = _tiny()
    idx, widths, counts = band_layout(cfg)
    f = cfg.f_bins
    assert idx.min() == 0 and idx.max() == f - 1
    # every bin belongs to at least one band (corners forced in)
    covered = np.zeros(f, bool)
    covered[idx] = True
    assert covered.all()
    assert sum(widths) == 2 * len(idx)
    # overlap is at most a couple of bands per bin for a mel layout
    assert counts.max() <= 4


def test_band_layout_stereo_interleave():
    cfg = _tiny(ch=2)
    idx, widths, _ = band_layout(cfg)
    assert idx.max() == 2 * cfg.f_bins - 1
    # stereo pairs are adjacent: for every even entry, its odd partner follows
    assert np.all(idx.reshape(-1, 2)[:, 1] == idx.reshape(-1, 2)[:, 0] + 1)


def test_forward_mono_contract():
    cfg = _tiny()
    params = init_melband(jax.random.PRNGKey(0), cfg)
    audio = jnp.asarray((np.random.default_rng(0).standard_normal(4410) * 8000).astype(np.int16)[None])
    out = melband_forward(params, audio, cfg)
    assert out.shape == (1, 4410)
    assert out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_forward_stereo_contract():
    cfg = _tiny(ch=2)
    params = init_melband(jax.random.PRNGKey(1), cfg)
    audio = jnp.asarray((np.random.default_rng(1).standard_normal((1, 2, 4410)) * 8000).astype(np.int16))
    out = melband_forward(params, audio, cfg)
    assert out.shape == (1, 2, 4410)
    assert out.dtype == jnp.int16
