"""UL-UNAS: block shapes, causality, end-to-end contract."""
import numpy as np

import jax
import jax.numpy as jnp

from audiojax.models.ul_unas import (
    UlUnasConfig,
    init_ul_unas,
    shuffle_channels,
    ul_unas_forward,
    ul_unas_net,
)


def test_shuffle_interleaves():
    x = jnp.arange(8, dtype=jnp.float32)[None, None, None, :]
    y = shuffle_channels(x)
    np.testing.assert_array_equal(np.asarray(y)[0, 0, 0], [0, 4, 1, 5, 2, 6, 3, 7])


def test_net_shapes():
    cfg = UlUnasConfig()
    params = init_ul_unas(jax.random.PRNGKey(0), cfg)
    spec = jnp.asarray(np.random.default_rng(0).standard_normal((1, 13, 514)).astype(np.float32))
    out = ul_unas_net(params, spec, cfg)
    assert out.shape == (1, 13, 514)
    assert bool(jnp.isfinite(out).all())


def test_forward_contract():
    cfg = UlUnasConfig()
    params = init_ul_unas(jax.random.PRNGKey(1), cfg)
    audio = jnp.asarray(
        (np.random.default_rng(1).standard_normal(16000) * 6000).astype(np.int16)[None]
    )
    out = jax.jit(lambda p, a: ul_unas_forward(p, a, cfg))(params, audio)
    assert out.shape == (1, 16000)
    assert out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_temporal_causality_of_network():
    """The mask network is causal in time: changing late frames must not
    change early mask frames (conv pads are causal, inter-GRU runs forward)."""
    cfg = UlUnasConfig()
    params = init_ul_unas(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    spec = rng.standard_normal((1, 20, 514)).astype(np.float32)
    spec2 = spec.copy()
    spec2[:, 15:] += rng.standard_normal((1, 5, 514)).astype(np.float32)
    a = np.asarray(ul_unas_net(params, jnp.asarray(spec), cfg))
    b = np.asarray(ul_unas_net(params, jnp.asarray(spec2), cfg))
    np.testing.assert_allclose(a[:, :15], b[:, :15], atol=1e-5)
    assert np.abs(a[:, 15:] - b[:, 15:]).max() > 1e-4  # late frames did change


def test_ul_unas_streaming_bit_exact_and_interior():
    """Streaming must be bit-exact against the offline center=False path on
    the zero-prepended signal, and match the default offline path at a
    (n_fft − hop)-sample delay once past the GRU transient."""
    from audiojax.models.ul_unas import (ul_unas_stream_init, ul_unas_stream_step)

    cfg = UlUnasConfig(center=False)
    params = init_ul_unas(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    total = 16 * cfg.hop
    audio = (rng.standard_normal(total) * 6000).astype(np.int16)

    carry = cfg.n_fft - cfg.hop
    padded = np.concatenate([np.zeros(carry, np.int16), audio])
    offline = np.asarray(ul_unas_forward(params, jnp.asarray(padded[None]), cfg))[0]

    state = ul_unas_stream_init(cfg)
    outs = []
    for s in range(0, total, 4 * cfg.hop):
        state, out = ul_unas_stream_step(params, state, jnp.asarray(audio[None, s : s + 4 * cfg.hop]), cfg)
        outs.append(np.asarray(out)[0])
    streamed = np.concatenate(outs)

    np.testing.assert_allclose(streamed[cfg.hop : total].astype(np.int32),
                               offline[cfg.hop : total].astype(np.int32), atol=1)

    # and vs the default (center=True) offline path, delayed
    default = np.asarray(ul_unas_forward(params, jnp.asarray(audio[None]), UlUnasConfig()))[0]
    lo, hi = 6 * cfg.n_fft, total - cfg.n_fft - carry
    np.testing.assert_allclose(default[lo:hi].astype(np.int32),
                               streamed[lo + carry : hi + carry].astype(np.int32), atol=2)
