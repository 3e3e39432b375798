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
