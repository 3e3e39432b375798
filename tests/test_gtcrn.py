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


# ── streaming (state-carry serving; SURVEY.md §5 north star) ──


def test_gtcrn_streaming_bit_exact_vs_zero_padded_offline():
    """Streaming must equal the offline center=False path on the
    zero-prepended signal from the first full-overlap sample onward: every
    temporal dependency (conv caches, TRA GRUs, dual-path inter GRUs, OLA
    tail) is carried exactly."""
    from audiojax.models.gtcrn import gtcrn_stream_init, gtcrn_stream_step

    cfg = GtcrnConfig(center=False)
    params = init_gtcrn(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    total = 16 * cfg.hop
    audio = rng.standard_normal(total) * 6000
    audio = np.round(audio - audio.mean()).astype(np.int16)
    audio[0] -= np.int16(audio.sum())  # exact zero mean → remove_dc is identity

    carry = cfg.n_fft - cfg.hop
    padded = np.concatenate([np.zeros(carry, np.int16), audio])
    offline = np.asarray(gtcrn_forward(params, jnp.asarray(padded[None]), cfg))[0]

    state = gtcrn_stream_init(cfg)
    outs = []
    for s in range(0, total, 4 * cfg.hop):
        state, out = gtcrn_stream_step(params, state, jnp.asarray(audio[None, s : s + 4 * cfg.hop]), cfg)
        outs.append(np.asarray(out)[0])
    streamed = np.concatenate(outs)

    np.testing.assert_allclose(
        streamed[cfg.hop : total].astype(np.int32),
        offline[cfg.hop : total].astype(np.int32),
        atol=1,
    )


def test_gtcrn_streaming_tracks_default_offline_interior():
    """Against the default (center=True, DC-removed) offline path the stream
    is delayed by n_fft − hop and converges as the GRU transients decay."""
    from audiojax.models.gtcrn import gtcrn_stream_init, gtcrn_stream_step

    cfg = GtcrnConfig()
    params = init_gtcrn(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    total = 32 * cfg.hop
    audio = rng.standard_normal(total) * 6000
    audio = np.round(audio - audio.mean()).astype(np.int16)
    audio[0] -= np.int16(audio.sum())

    offline = np.asarray(gtcrn_forward(params, jnp.asarray(audio[None]), cfg))[0]

    state = gtcrn_stream_init(cfg)
    outs = []
    for s in range(0, total, 4 * cfg.hop):
        state, out = gtcrn_stream_step(params, state, jnp.asarray(audio[None, s : s + 4 * cfg.hop]), cfg)
        outs.append(np.asarray(out)[0])
    streamed = np.concatenate(outs)

    delay = cfg.n_fft - cfg.hop
    lo, hi = 8 * cfg.n_fft, total - cfg.n_fft - delay
    a = offline[lo:hi].astype(np.float64)
    b = streamed[lo + delay : hi + delay].astype(np.float64)
    err = a - b
    snr = 10 * np.log10(np.sum(a * a) / max(np.sum(err * err), 1e-9))
    assert snr > 35, f"interior SNR {snr:.1f} dB too low"
