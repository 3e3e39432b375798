"""ZipEnhancer: Zipformer2 primitives + flagship e2e contract."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from audiojax.nn.zipformer import (
    _rel_shift,
    bias_norm,
    simple_downsample,
    simple_upsample,
    swoosh_l,
    swoosh_r,
    zipformer_layer,
    init_zipformer_layer,
    compact_rel_pos,
)
from audiojax.models.zipenhancer import (
    ZipEnhancerConfig,
    init_zipenhancer,
    instance_norm_tf,
    zipenhancer_forward,
    zipenhancer_net,
)


def test_swoosh_formulas():
    x = jnp.linspace(-5, 5, 41)
    l = np.asarray(swoosh_l(x))
    r = np.asarray(swoosh_r(x))
    xs = np.asarray(x)
    np.testing.assert_allclose(l, np.logaddexp(0, xs - 4) - 0.08 * xs - 0.035, atol=1e-5)
    np.testing.assert_allclose(r, np.logaddexp(0, xs - 1) - 0.08 * xs - 0.313261687, atol=1e-5)


def test_bias_norm_semantics():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    p = {"bias": jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1),
         "log_scale": jnp.asarray(0.3, jnp.float32)}
    y = np.asarray(bias_norm(p, x))
    ref = np.asarray(x) / np.sqrt(((np.asarray(x) - np.asarray(p["bias"])) ** 2).mean(-1, keepdims=True)) * np.exp(0.3)
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_rel_shift_indexing():
    """out[..., i, j] must equal pos_scores[..., i, S-1-i+j]."""
    s = 6
    rng = np.random.default_rng(1)
    ps = rng.standard_normal((1, 2, s, 2 * s - 1)).astype(np.float32)
    out = np.asarray(_rel_shift(jnp.asarray(ps), s))
    for i in range(s):
        for j in range(s):
            assert abs(out[0, 0, i, j] - ps[0, 0, i, s - 1 - i + j]) < 1e-6


def test_downsample_upsample():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 7, 8)).astype(np.float32))
    y = simple_downsample({"bias": jnp.zeros((2,))}, x, 2)
    assert y.shape == (3, 4, 8)
    # uniform softmax weights -> plain mean of each pair (last frame replicated)
    ref0 = (np.asarray(x)[0, 0] + np.asarray(x)[0, 1]) / 2
    np.testing.assert_allclose(np.asarray(y)[0, 0], ref0, atol=1e-6)
    z = simple_upsample(y, 2)
    assert z.shape == (3, 8, 8)
    np.testing.assert_array_equal(np.asarray(z)[:, 0], np.asarray(z)[:, 1])


def test_zipformer_layer_runs():
    p = init_zipformer_layer(jax.random.PRNGKey(0), 32, num_heads=2, query_head_dim=8,
                             pos_head_dim=4, value_head_dim=8, ff_hidden=48,
                             nonlin_hidden=24, conv_kernel=7, pos_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 32))
    y = zipformer_layer(p, x, compact_rel_pos(10, 16), num_heads=2, query_head_dim=8, pos_head_dim=4)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 6, 10, 8)).astype(np.float32)
    g = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    b = rng.uniform(-0.1, 0.1, 8).astype(np.float32)
    ours = np.asarray(instance_norm_tf({"g": jnp.asarray(g), "b": jnp.asarray(b)}, jnp.asarray(x)))
    ref = torch.nn.functional.instance_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), weight=torch.from_numpy(g),
        bias=torch.from_numpy(b), use_input_stats=True, eps=1e-5,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def _tiny_cfg(**kw):
    base = dict(channels=16, num_heads=2, query_head_dim=8, pos_head_dim=4,
                value_head_dim=8, ff_hidden=24, nonlin_hidden=12, conv_kernel=7,
                pos_dim=16, encoder_downsample=((1, 1), (2, 2)), fold_window=0)
    base.update(kw)
    return ZipEnhancerConfig(**base)


def test_net_shapes():
    cfg = _tiny_cfg()
    params = init_zipenhancer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    mag = jnp.asarray(np.abs(rng.standard_normal((1, 9, 201))).astype(np.float32))
    pha = jnp.asarray(rng.uniform(-np.pi, np.pi, (1, 9, 201)).astype(np.float32))
    mask, phase_ri = zipenhancer_net(params, mag, pha, cfg)
    assert mask.shape == (1, 9, 201)
    assert phase_ri.shape == (1, 9, 201, 2)
    assert bool(jnp.isfinite(mask).all() and jnp.isfinite(phase_ri).all())


def test_forward_contract():
    cfg = _tiny_cfg()
    params = init_zipenhancer(jax.random.PRNGKey(1), cfg)
    audio = jnp.asarray((np.random.default_rng(5).standard_normal(4000) * 6000).astype(np.int16)[None])
    out = zipenhancer_forward(params, audio, cfg)
    assert out.shape == (1, 4000)
    assert out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_pre_gather_equals_skew_trick():
    """The (S,S) pre-gathered positional contraction must equal the reference
    skew-trick rel-shift."""
    import jax.numpy as jnp
    from audiojax.nn.zipformer import _rel_index_np, _rel_shift

    rng = np.random.default_rng(9)
    n, h, s, p = 2, 3, 7, 4
    pp = jnp.asarray(rng.standard_normal((n, h, s, p)).astype(np.float32))
    pe = jnp.asarray(rng.standard_normal((2 * s - 1, h, p)).astype(np.float32))
    skew = _rel_shift(jnp.einsum("nhip,rhp->nhir", pp, pe), s)
    direct = jnp.einsum("nhip,ijhp->nhij", pp, pe[jnp.asarray(_rel_index_np(s))])
    np.testing.assert_allclose(np.asarray(direct), np.asarray(skew), atol=1e-5)
