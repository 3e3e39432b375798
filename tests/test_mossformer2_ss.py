"""MossFormer2-SS: RMS normalisation algebra, length exactness, contract."""
import numpy as np

import jax
import jax.numpy as jnp

from audiojax.models.mossformer2_ss import (
    MossFormer2SsConfig,
    init_mossformer2_ss,
    mossformer2_ss_forward,
    norm_audio,
)


def test_norm_audio_two_stage():
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((2, 8000)) * 0.1).astype(np.float32))
    normed, rms_in = norm_audio(x, 10 ** (-25 / 20))
    # after stage 1 the RMS is ~norm_factor; stage 2 renormalises by the
    # high-energy subset, so the final RMS is below the stage-1 target
    r = np.sqrt(np.mean(np.asarray(normed) ** 2, axis=-1))
    assert np.all(r < 10 ** (-25 / 20) * 1.05)
    # rms_in restores the original int16-domain level
    np.testing.assert_allclose(
        np.asarray(rms_in)[:, 0],
        np.sqrt(np.mean(np.asarray(x) ** 2, axis=-1)) * 32767.0,
        rtol=1e-3,
    )


def test_forward_contract_two_sources():
    cfg = MossFormer2SsConfig(dim=64, depth=2, group_size=16, qk_dim=32, vu_dim=96,
                              fsmn_inner=32, dw_kernel=5, rot_dim=8, lorder=5)
    params = init_mossformer2_ss(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    mix = jnp.asarray((rng.standard_normal(16000) * 8000).astype(np.int16)[None])
    outs = mossformer2_ss_forward(params, mix, cfg)
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (1, 16000)
        assert o.dtype == jnp.int16
        assert bool(jnp.isfinite(o.astype(jnp.float32)).all())


def test_silence_maps_to_silence():
    cfg = MossFormer2SsConfig(dim=64, depth=1, group_size=16, qk_dim=32, vu_dim=96,
                              fsmn_inner=32, dw_kernel=5, rot_dim=8, lorder=5)
    params = init_mossformer2_ss(jax.random.PRNGKey(2), cfg)
    mix = jnp.zeros((1, 8000), jnp.int16)
    outs = mossformer2_ss_forward(params, mix, cfg)
    for o in outs:
        assert int(jnp.abs(o).max()) == 0  # zero rms_in ⇒ zero restore gain


def test_mossformer2_ss_bf16_close_to_f32():
    import dataclasses

    cfg = dataclasses.replace(MossFormer2SsConfig(), dim=32, depth=2, group_size=16,
                              qk_dim=8, vu_dim=64, fsmn_inner=16, lorder=4,
                              dw_kernel=5, rot_dim=8, mem_depth=2)
    params = init_mossformer2_ss(jax.random.PRNGKey(0), cfg)
    audio = jnp.asarray((np.random.default_rng(0).standard_normal(16000) * 6000).astype(np.int16)[None])

    # jit both paths: ONE executable each — op-by-op eager execution compiles
    # hundreds of mini-executables per forward, and the suite's cumulative
    # executable count can crash XLA:CPU's JIT late in a long process
    from functools import partial

    refs = jax.jit(partial(mossformer2_ss_forward, cfg=cfg))(params, audio)
    bf_cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    bfs = jax.jit(partial(mossformer2_ss_forward, cfg=bf_cfg))(params, audio)
    for ref, bf in zip(refs, bfs):
        a = np.asarray(ref).astype(np.float64)
        b = np.asarray(bf).astype(np.float64)
        err = a - b
        snr = 10 * np.log10(max(np.sum(a * a), 1e-9) / max(np.sum(err * err), 1e-9))
        assert snr > 15, f"bf16 drifted too far from f32: {snr:.1f} dB"
