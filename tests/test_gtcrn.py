"""GTCRN end-to-end: shape/dtype contract, jit, batch-fold equivalence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiojax.models.gtcrn import GtcrnConfig, gtcrn_forward, gtcrn_net, init_gtcrn
from audiojax.dsp import StftConfig, stft_packed


@pytest.fixture(scope="module")
def params():
    return init_gtcrn(jax.random.PRNGKey(0))


def _noisy_int16(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return (x * 32767).astype(np.int16)


def test_net_shapes(params):
    cfg = GtcrnConfig()
    spec = jnp.asarray(np.random.default_rng(1).standard_normal((2, 17, 514)).astype(np.float32))
    out = gtcrn_net(params, spec, cfg)
    assert out.shape == (2, 17, 514)
    assert bool(jnp.isfinite(out).all())


def test_forward_contract(params):
    cfg = GtcrnConfig()
    audio = jnp.asarray(_noisy_int16(8000)[None])
    out = jax.jit(lambda p, a: gtcrn_forward(p, a, cfg))(params, audio)
    assert out.dtype == jnp.int16
    assert out.shape == (1, 8000)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_forward_extreme_pcm(params):
    cfg = GtcrnConfig()
    audio = jnp.asarray(np.full((1, 8000), 32767, np.int16))
    out = gtcrn_forward(params, audio, cfg)
    a = np.asarray(out)
    assert a.min() >= -32768 and a.max() <= 32767


def test_batch_fold_matches_per_window(params):
    """Batch-fold (SURVEY §2.0.1): folding a 2-window clip must equal running
    the two windows as a batch."""
    w = 16128  # 63 hops * 256
    cfg_fold = GtcrnConfig(fold_window=w)
    cfg_plain = GtcrnConfig()
    audio = _noisy_int16(2 * w, seed=3)
    # DC removal differs between the paths (whole-clip vs per-window mean);
    # zero each window's mean so both see identical signals
    audio = audio.reshape(2, w)
    audio = (audio - audio.mean(axis=1, keepdims=True).round().astype(np.int16)).reshape(-1)
    folded_out = gtcrn_forward(params, jnp.asarray(audio[None]), cfg_fold)
    batched = jnp.asarray(audio.reshape(2, w))
    per_window = gtcrn_forward(params, batched, cfg_plain)
    # fold path removes DC over the whole clip, per-window path per window —
    # compare after matching the DC treatment by using zero-mean input
    np.testing.assert_allclose(
        np.asarray(folded_out).reshape(2, w).astype(np.int32),
        np.asarray(per_window).astype(np.int32),
        atol=2,
    )


def test_resample_sandwich(params):
    cfg = GtcrnConfig(in_sample_rate=48000, out_sample_rate=48000)
    audio = jnp.asarray(_noisy_int16(24000)[None])
    out = gtcrn_forward(params, audio, cfg)
    assert out.shape == (1, 24000)
