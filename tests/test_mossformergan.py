"""MossFormerGAN-SE: GAU cross-attention masking, SE layer, e2e contract."""
import numpy as np

import jax
import jax.numpy as jnp

from audiojax.models.mossformergan_se import (
    MossFormerGanConfig,
    init_mossformergan,
    mossformergan_forward,
    mossformergan_net,
    se_layer,
)


def _tiny():
    return MossFormerGanConfig(
        emb_dim=16, emb_ks=2, uv_channels=24, n_blocks=1, dense_depth=2, lorder=4,
        mf_hidden=32, mf_vdim=16, mf_qk=16, mf_rot=8, dw_kernel=7,
        attn_heads=2, attn_q_ch=2, attn_v_ch=4, fold_window=0,
    )


def test_se_layer_gains():
    p = {
        "avg1": {"w": jnp.eye(8, 2), "b": jnp.zeros(2)},
        "avg2": {"w": jnp.zeros((2, 8)), "b": jnp.full((8,), 10.0)},  # gate ≈ 1
        "max1": {"w": jnp.eye(8, 2), "b": jnp.zeros(2)},
        "max2": {"w": jnp.zeros((2, 8)), "b": jnp.full((8,), -10.0)},  # gate ≈ 0
    }
    x = jnp.ones((1, 3, 4, 8))
    y = se_layer(p, x)
    np.testing.assert_allclose(np.asarray(y), np.ones((1, 3, 4, 8)), atol=1e-3)


def test_net_shapes():
    cfg = _tiny()
    params = init_mossformergan(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mag = jnp.asarray(np.abs(rng.standard_normal((1, 8, 201))).astype(np.float32))
    spec = jnp.asarray(rng.standard_normal((1, 8, 201, 2)).astype(np.float32))
    out = mossformergan_net(params, mag, spec, cfg)
    assert out.shape == (1, 8, 402)
    assert bool(jnp.isfinite(out).all())


def test_forward_contract():
    cfg = _tiny()
    params = init_mossformergan(jax.random.PRNGKey(1), cfg)
    audio = jnp.asarray((np.random.default_rng(1).standard_normal(3200) * 6000).astype(np.int16)[None])
    out = mossformergan_forward(params, audio, cfg)
    assert out.shape == (1, 3200)
    assert out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_mossformergan_bf16_close_to_f32():
    """bf16 compute (f32 STFT/decompress islands) must stay close to f32 —
    the analog of the reference's fp16 plan with its f32 block list."""
    import dataclasses

    cfg = _tiny()
    params = init_mossformergan(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    t = np.arange(3200) / 16000.0
    wave = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(3200)
    audio = jnp.asarray((wave * 20000).astype(np.int16)[None])

    f32 = np.asarray(mossformergan_forward(params, audio, cfg)).astype(np.float64)
    bf16 = np.asarray(mossformergan_forward(
        params, audio, dataclasses.replace(cfg, compute_dtype="bfloat16"))).astype(np.float64)
    err = bf16 - f32
    snr = 10 * np.log10(np.sum(f32 * f32) / max(np.sum(err * err), 1e-12))
    assert snr > 15, f"bf16 drifted too far from f32: {snr:.1f} dB"
