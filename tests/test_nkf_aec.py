"""NKF-AEC: scan vs unrolled-loop golden, zero-reference identity, contract."""
import numpy as np

import jax
import jax.numpy as jnp

from audiojax.models.nkf_aec import (
    NkfConfig,
    _cdot,
    _cmul,
    init_nkf,
    kg_net,
    nkf_forward,
    nkf_scan,
)


def _unrolled_reference(params, ref_spec, mic_spec, cfg):
    """Direct Python unroll of the Kalman recurrence (reference semantics,
    /root/reference/NKF_AEC/Export_NKF_AEC.py:309-377) for a golden check."""
    b, t_frames, f_bins, _ = ref_spec.shape
    filter_l = cfg.filter_order
    n = b * f_bins
    padded = jnp.pad(ref_spec, [(0, 0), (filter_l - 1, 0), (0, 0), (0, 0)])
    h_prior = jnp.zeros((b, f_bins, filter_l, 2))
    h_post = jnp.zeros_like(h_prior)
    z = jnp.zeros((n, cfg.rnn_dim))
    grus = (z, z, z, z)
    echoes = []
    for t in range(t_frames):
        xt = jnp.stack([padded[:, t + k] for k in range(filter_l)], axis=-2)
        mic_t = mic_spec[:, t]
        dh = h_post - h_prior
        h_prior, h_post = h_post, h_prior
        e = mic_t - _cdot(xt, h_prior)
        feat = jnp.concatenate([xt, e[..., None, :], dh], axis=-2)
        kg, grus = kg_net(params, feat.reshape(n, 2 * filter_l + 1, 2), grus)
        kg = kg.reshape(b, f_bins, filter_l, 2)
        h_post = h_prior + _cmul(kg, e[..., None, :])
        echoes.append(_cdot(xt, h_post))
    return jnp.stack(echoes, axis=1)


def test_scan_matches_unrolled():
    cfg = NkfConfig(n_fft=64, hop=16)  # tiny bins for speed
    params = init_nkf(jax.random.PRNGKey(0), cfg)
    # damp the Kalman gain so the feedback loop is contractive — with raw
    # random weights the recurrence is chaotic and amplifies f32 reassociation
    # noise between the two compilations (trained weights are contractive)
    params["fc_out"] = jax.tree.map(lambda a: a * 0.05, params["fc_out"])
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.standard_normal((1, 12, cfg.f_bins, 2)).astype(np.float32))
    mic = jnp.asarray(rng.standard_normal((1, 12, cfg.f_bins, 2)).astype(np.float32))
    fast = nkf_scan(params, ref, mic, cfg)
    slow = _unrolled_reference(params, ref, mic, cfg)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-4)


def test_zero_far_end_passes_mic_through():
    """x_t = 0 ⇒ echo = ⟨0, h⟩ = 0 ⇒ output = ISTFT(STFT(near))."""
    cfg = NkfConfig()
    params = init_nkf(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    near = (rng.standard_normal(8192) * 8000).astype(np.int16)
    near = near - np.int16(round(near.astype(np.float64).mean()))
    far = np.zeros_like(near)
    out = np.asarray(nkf_forward(params, jnp.asarray(far[None]), jnp.asarray(near[None]), cfg))[0]
    s, e = cfg.n_fft, 8192 - cfg.n_fft
    err = out[s:e].astype(np.float64) - near[s:e].astype(np.float64)
    snr = 10 * np.log10((near[s:e].astype(np.float64) ** 2).sum() / np.maximum((err**2).sum(), 1e-9))
    assert snr > 40, f"pass-through SNR {snr:.1f} dB"


def test_forward_contract_and_fold():
    cfg = NkfConfig(fold_window=4096)
    params = init_nkf(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    far = (rng.standard_normal(10000) * 5000).astype(np.int16)
    near = (rng.standard_normal(10000) * 5000).astype(np.int16)
    out = nkf_forward(params, jnp.asarray(far[None]), jnp.asarray(near[None]), cfg)
    assert out.shape == (1, 10000)
    assert out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_nkf_streaming_exact_vs_prefixed_offline():
    """The Kalman scan carry + delay-line history stream exactly: against the
    offline path on a 1-hop-zero-prefixed pair (whose center pad lines up
    with the stream's zero prefix on the frame grid), the stream matches
    with a 2-hop output delay to <=1 LSB."""
    from audiojax.models.nkf_aec import (NkfConfig, init_nkf, nkf_forward,
                                         nkf_stream_init, nkf_stream_step)

    cfg = NkfConfig()
    params = init_nkf(jax.random.PRNGKey(0), cfg)
    # damp fc_out: random-weight Kalman gains are chaotic and amplify f32
    # reassociation (same convention as the scan-vs-unrolled test)
    params["fc_out"]["r"]["w"] = params["fc_out"]["r"]["w"] * 0.05
    params["fc_out"]["i"]["w"] = params["fc_out"]["i"]["w"] * 0.05

    rng = np.random.default_rng(5)
    total = 16 * cfg.hop

    def zmean(x):
        x = x - x.mean()
        x = np.round(x).astype(np.int16)
        x[0] -= np.int16(x.sum())
        return x

    near = zmean(rng.standard_normal(total) * 6000)
    far = zmean(rng.standard_normal(total) * 6000)

    zp = np.zeros(cfg.hop, np.int16)
    prefixed = np.asarray(nkf_forward(params, jnp.asarray(np.concatenate([zp, far])[None]),
                                      jnp.asarray(np.concatenate([zp, near])[None]), cfg))[0]

    state = nkf_stream_init(cfg)
    outs = []
    for s in range(0, total, 4 * cfg.hop):
        state, out = nkf_stream_step(params, state, jnp.asarray(near[None, s : s + 4 * cfg.hop]),
                                     jnp.asarray(far[None, s : s + 4 * cfg.hop]), cfg)
        outs.append(np.asarray(out)[0])
    streamed = np.concatenate(outs)

    delay = 2 * cfg.hop  # streamed[i + 2·hop] == prefixed_offline[i]
    lo, hi = cfg.n_fft, total - cfg.n_fft - delay
    np.testing.assert_allclose(prefixed[lo:hi].astype(np.int32),
                               streamed[lo + delay : hi + delay].astype(np.int32), atol=1)
