"""SDAEC / Deep-Echo: ICCRN LayerNorm & cepstral-basis goldens, echo-path
semantics, e2e contracts."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from audiojax.nn.cfb import _ceps_bases, iccrn_layer_norm
from audiojax.models.sdaec import SdaecConfig, alpha_align, init_sdaec, sdaec_forward
from audiojax.models.deep_echo import (
    DeepEchoConfig,
    apply_echo_path,
    deep_echo_forward,
    init_deep_echo,
)


def test_iccrn_layer_norm_matches_reference_semantics():
    """(x−μ)/sqrt(unbiased_var + eps)·w + b over the (F, C) plane."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 160, 20)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (160, 20)).astype(np.float32)
    b = rng.uniform(-0.1, 0.1, (160, 20)).astype(np.float32)
    ours = np.asarray(iccrn_layer_norm({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x), 1e-6))
    xt = torch.from_numpy(x)
    mu = xt.mean(dim=(2, 3), keepdim=True)
    var_u = xt.var(dim=(2, 3), keepdim=True, unbiased=True)
    ref = ((xt - mu) / torch.sqrt(var_u + 1e-6) * torch.from_numpy(w) + torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_ceps_bases_roundtrip():
    """inverse(pinv) ∘ forward must reconstruct the frequency axis exactly."""
    fwd, inv = _ceps_bases(160)
    assert fwd.shape == (160, 162) and inv.shape == (162, 160)
    x = np.random.default_rng(1).standard_normal((5, 160)).astype(np.float32)
    recon = (x @ fwd) @ inv
    np.testing.assert_allclose(recon, x, atol=1e-4)


def test_alpha_align_causal():
    """alpha at frame t must not depend on future powers."""
    p = {"w": jnp.asarray(np.random.default_rng(2).standard_normal((10, 2, 1)).astype(np.float32)),
         "b": jnp.zeros((1,))}
    rng = np.random.default_rng(3)
    mp = rng.standard_normal((1, 30)).astype(np.float32)
    fp = rng.standard_normal((1, 30)).astype(np.float32)
    a1 = np.asarray(alpha_align(p, jnp.asarray(mp), jnp.asarray(fp), 10))
    mp2, fp2 = mp.copy(), fp.copy()
    mp2[:, 20:] += 1.0
    fp2[:, 20:] -= 1.0
    a2 = np.asarray(alpha_align(p, jnp.asarray(mp2), jnp.asarray(fp2), 10))
    np.testing.assert_allclose(a1[:, :20], a2[:, :20], atol=1e-6)
    assert np.abs(a1[:, 20:] - a2[:, 20:]).max() > 1e-4


def test_echo_path_matches_torch_delay_bank():
    """Delay-bank semantics vs the reference's grouped identity conv
    (Export_Deep_Echo.py:303-311)."""
    order, b, t, f = 4, 1, 9, 6
    rng = np.random.default_rng(4)
    far_cf = rng.standard_normal((b, 2, f, t)).astype(np.float32)  # torch layout
    path_cf = rng.standard_normal((b, 2, order, f, t)).astype(np.float32)

    kernel = torch.eye(order).repeat(2, 1).reshape(2 * order, 1, 1, order)
    pad = torch.zeros(b, 2, f, order - 1)
    padded = torch.cat([pad, torch.from_numpy(far_cf)], dim=-1)
    delayed = torch.nn.functional.conv2d(padded, kernel, groups=2).reshape(b, 2, order, f, t)
    fr, fi = delayed[:, 0], delayed[:, 1]
    pr, pi = torch.from_numpy(path_cf[:, 0]), torch.from_numpy(path_cf[:, 1])
    ref_re = (fr * pr - fi * pi).sum(dim=1)
    ref_im = (fr * pi + fi * pr).sum(dim=1)

    far_cl = jnp.asarray(far_cf.transpose(0, 3, 2, 1))  # (B, T, F, 2)
    path_cl = jnp.asarray(path_cf.transpose(0, 4, 3, 1, 2))  # (B, T, F, 2, order)
    echo = np.asarray(apply_echo_path(far_cl, path_cl, order))
    np.testing.assert_allclose(echo[..., 0].transpose(0, 2, 1), ref_re.numpy(), atol=1e-5)
    np.testing.assert_allclose(echo[..., 1].transpose(0, 2, 1), ref_im.numpy(), atol=1e-5)


def test_sdaec_forward_contract():
    cfg = SdaecConfig(channels=8)
    params = init_sdaec(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    near = jnp.asarray((rng.standard_normal(6400) * 5000).astype(np.int16)[None])
    far = jnp.asarray((rng.standard_normal(6400) * 5000).astype(np.int16)[None])
    out = sdaec_forward(params, near, far, cfg)
    assert out.shape == (1, 6400) and out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_deep_echo_forward_contract():
    cfg = DeepEchoConfig(channels=8)
    params = init_deep_echo(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(6)
    near = jnp.asarray((rng.standard_normal(6400) * 5000).astype(np.int16)[None])
    far = jnp.asarray((rng.standard_normal(6400) * 5000).astype(np.int16)[None])
    out = deep_echo_forward(params, near, far, cfg)
    assert out.shape == (1, 6400) and out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


# ── streaming AEC (state-carry; SURVEY.md §5 north star) ──


def _zero_mean_int16(rng, n, scale=6000):
    x = rng.standard_normal(n) * scale
    x = np.round(x - x.mean()).astype(np.int16)
    x[0] -= np.int16(x.sum())
    return x


def test_sdaec_streaming_exact_vs_offline():
    """SDAEC's constant center pad equals the stream's zero prefix, so the
    stream matches the DEFAULT offline path exactly (≤1 LSB) at a
    (n_fft − hop)-sample delay — all time state (two LSTM stacks, alpha power
    cache, framing + OLA tails) is carried."""
    from audiojax.models.sdaec import (SdaecConfig, init_sdaec, sdaec_forward,
                                       sdaec_stream_init, sdaec_stream_step)

    cfg = SdaecConfig()
    params = init_sdaec(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    total = 16 * cfg.hop
    near = _zero_mean_int16(rng, total)
    far = _zero_mean_int16(rng, total)

    offline = np.asarray(sdaec_forward(params, jnp.asarray(near[None]), jnp.asarray(far[None]), cfg))[0]

    state = sdaec_stream_init(cfg)
    outs = []
    for s in range(0, total, 4 * cfg.hop):
        state, out = sdaec_stream_step(params, state, jnp.asarray(near[None, s : s + 4 * cfg.hop]),
                                       jnp.asarray(far[None, s : s + 4 * cfg.hop]), cfg)
        outs.append(np.asarray(out)[0])
    streamed = np.concatenate(outs)

    delay = cfg.n_fft - cfg.hop  # 159
    lo, hi = cfg.n_fft, total - cfg.n_fft - delay
    np.testing.assert_allclose(offline[lo:hi].astype(np.int32),
                               streamed[lo + delay : hi + delay].astype(np.int32), atol=1)


def test_deep_echo_streaming_exact_vs_offline():
    from audiojax.models.deep_echo import (DeepEchoConfig, deep_echo_forward,
                                           deep_echo_stream_init, deep_echo_stream_step,
                                           init_deep_echo)

    cfg = DeepEchoConfig()
    params = init_deep_echo(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    total = 16 * cfg.hop
    near = _zero_mean_int16(rng, total)
    far = _zero_mean_int16(rng, total)

    offline = np.asarray(deep_echo_forward(params, jnp.asarray(near[None]), jnp.asarray(far[None]), cfg))[0]

    state = deep_echo_stream_init(cfg)
    outs = []
    for s in range(0, total, 4 * cfg.hop):
        state, out = deep_echo_stream_step(params, state, jnp.asarray(near[None, s : s + 4 * cfg.hop]),
                                           jnp.asarray(far[None, s : s + 4 * cfg.hop]), cfg)
        outs.append(np.asarray(out)[0])
    streamed = np.concatenate(outs)

    delay = cfg.n_fft - cfg.hop
    lo, hi = cfg.n_fft, total - cfg.n_fft - delay
    np.testing.assert_allclose(offline[lo:hi].astype(np.int32),
                               streamed[lo + delay : hi + delay].astype(np.int32), atol=1)
