"""Multi-chip sharding on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiojax.parallel import make_mesh, replicate, shard_batch, sharded_model_fn


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_dp_sharded_gtcrn_matches_single_device():
    from audiojax.models.gtcrn import GtcrnConfig, gtcrn_forward, init_gtcrn

    cfg = GtcrnConfig()
    params = init_gtcrn(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((8, 4096)) * 6000).astype(np.int16))

    ref = np.asarray(gtcrn_forward(params, audio, cfg))

    mesh = make_mesh(8, tp=1)
    fn = sharded_model_fn(mesh, lambda p, a: gtcrn_forward(p, a, cfg))
    out = np.asarray(fn(replicate(mesh, params), shard_batch(mesh, audio)))
    np.testing.assert_allclose(out.astype(np.int32), ref.astype(np.int32), atol=1)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_dp_tp_mesh_shapes():
    mesh = make_mesh(8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(7, tp=2)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_dp_sharded_zipenhancer_net():
    """The flagship's window batch shards across dp chips: the dp-sharded
    Zipformer2 net must equal the single-device run.

    The comparison is at the NET level (compressed mag/phase in, mask/phase
    out): sharding re-partitions the DFT matmuls (~2e-5 STFT reassociation),
    and the phase input atan2 is discontinuous at near-zero bins, so an
    end-to-end int16 comparison is dominated by a few ±π phase flips — an
    inherent property of phase features, not a sharding defect."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from audiojax.dsp import stft
    from audiojax.models.zipenhancer import (ZipEnhancerConfig, init_zipenhancer,
                                             zipenhancer_net)

    cfg = dataclasses.replace(
        ZipEnhancerConfig(), channels=16, dense_depth=2, num_heads=2,
        query_head_dim=4, pos_head_dim=2, value_head_dim=4, ff_hidden=24,
        nonlin_hidden=12, conv_kernel=5, pos_dim=8,
        encoder_downsample=((1, 1), (2, 2)), fold_window=0)
    params = init_zipenhancer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 2000)).astype(np.float32))
    re, im = stft(x, cfg.stft)
    mag = jnp.power(re * re + im * im + 1e-9, cfg.compress * 0.5)
    pha = jnp.arctan2(im, re + 1e-5)

    m_ref, p_ref = jax.jit(lambda pp, a, b: zipenhancer_net(pp, a, b, cfg))(params, mag, pha)

    mesh = make_mesh(8, tp=1)
    rs, ds = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    fn = jax.jit(lambda pp, a, b: zipenhancer_net(pp, a, b, cfg),
                 in_shardings=(rs, ds, ds), out_shardings=(ds, ds))
    m_sh, p_sh = fn(jax.device_put(params, rs), jax.device_put(mag, ds), jax.device_put(pha, ds))

    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_mesh_session_matches_plain_session():
    """Session(mesh=…) dp-shards the window batch (padding to a whole number
    of windows per chip) and must reproduce the plain Session bit-exactly,
    for both butt-joined and overlapped (SR-style) stitching."""
    from audiojax.runtime.manifest import Manifest
    from audiojax.runtime.session import Session

    def neg_model(params, audio):
        return (-audio).astype(audio.dtype)

    mesh = make_mesh(8, tp=1)
    for overlap in (0, 1000):
        m = Manifest(model_name="t", task="denoise", model_family="T",
                     in_sample_rate=16000, out_sample_rate=16000,
                     model_sample_rate=16000, input_audio_length=4000,
                     overlap_length=overlap)
        x = (np.arange(10_500) % 2000 - 1000).astype(np.int16)
        ref = Session(neg_model, {}, m, jit=False).process(x)
        out = Session(neg_model, {}, m, mesh=mesh).process(x)
        assert out.outputs[0].shape == ref.outputs[0].shape == (10_500,)
        np.testing.assert_array_equal(out.outputs[0], ref.outputs[0])


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_dp_tp_spectral_sharding_matches_single_device():
    """(dp=4, tp=2): batch over dp AND frequency axis of the spectrum over tp
    via sharding constraints (XLA inserts the collectives) must equal the
    unsharded run — the __graft_entry__.dryrun_multichip layout as a pytest."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audiojax.dsp import istft_packed, stft_packed
    from audiojax.dsp.pcm import pcm_in, pcm_out
    from audiojax.models.gtcrn import GtcrnConfig, gtcrn_net, init_gtcrn

    cfg = GtcrnConfig()
    params = init_gtcrn(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((4, 4096)) * 6000).astype(np.int16))

    def step(p, a, spec_sharding=None):
        x = pcm_in(a)
        spec = stft_packed(x, cfg.stft)
        if spec_sharding is not None:
            spec = jax.lax.with_sharding_constraint(spec, spec_sharding)
        enhanced = gtcrn_net(p, spec, cfg)
        if spec_sharding is not None:
            enhanced = jax.lax.with_sharding_constraint(enhanced, spec_sharding)
        return pcm_out(istft_packed(enhanced, cfg.stft))

    ref = np.asarray(jax.jit(step)(params, audio))

    mesh = make_mesh(8, tp=2)
    sharding = NamedSharding(mesh, P("dp", None, "tp"))
    fn = jax.jit(
        lambda p, a: step(p, a, sharding),
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))),
        out_shardings=NamedSharding(mesh, P("dp")),
    )
    out = np.asarray(fn(replicate(mesh, params), shard_batch(mesh, audio)))
    np.testing.assert_allclose(out.astype(np.int32), ref.astype(np.int32), atol=1)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_tp_in_model_zipenhancer_matches_single_device():
    """(dp=4, tp=2) with IN-MODEL sharding constraints: ZipEnhancer's dual-path
    folds carry shard_hint(("dp","tp")) annotations, so tp partitions each
    window's frames/frequencies WITHIN the net (not just at the STFT
    boundary); the sharded run must equal the unsharded one."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from audiojax.dsp import stft
    from audiojax.models.zipenhancer import (ZipEnhancerConfig, init_zipenhancer,
                                             zipenhancer_net)
    from audiojax.parallel import spmd_mesh

    cfg = dataclasses.replace(
        ZipEnhancerConfig(), channels=16, dense_depth=2, num_heads=2,
        query_head_dim=4, pos_head_dim=2, value_head_dim=4, ff_hidden=24,
        nonlin_hidden=12, conv_kernel=5, pos_dim=8,
        encoder_downsample=((1, 1), (2, 2)), fold_window=0)
    params = init_zipenhancer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 2000)).astype(np.float32))
    re, im = stft(x, cfg.stft)
    mag = jnp.power(re * re + im * im + 1e-9, cfg.compress * 0.5)
    pha = jnp.arctan2(im, re + 1e-5)

    m_ref, p_ref = jax.jit(lambda pp, a, b: zipenhancer_net(pp, a, b, cfg))(params, mag, pha)

    mesh = make_mesh(8, tp=2)
    rs, ds = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    with spmd_mesh(mesh):
        fn = jax.jit(lambda pp, a, b: zipenhancer_net(pp, a, b, cfg),
                     in_shardings=(rs, ds, ds), out_shardings=(ds, ds))
        m_sh, p_sh = fn(jax.device_put(params, rs), jax.device_put(mag, ds),
                        jax.device_put(pha, ds))

    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=1e-4)


def test_shard_hint_identity_without_mesh():
    """shard_hint is a no-op outside spmd_mesh, and degrades unknown axis
    names to replicated under a mesh that lacks them."""
    from audiojax.parallel import shard_hint

    x = jnp.arange(8.0).reshape(2, 4)
    np.testing.assert_array_equal(np.asarray(shard_hint(x, ("dp", "tp"))), np.asarray(x))


def test_graft_entry_dryrun_multichip_end_to_end():
    """The driver's multi-chip check, verbatim: __graft_entry__.dryrun_multichip(8)
    must re-exec itself onto a virtual 8-device CPU mesh and run one sharded
    step + one Session request (MULTICHIP_r0N.json must be green)."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location("__graft_entry__", root / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # raises on child failure


def test_make_mesh_too_few_devices_fails_loudly():
    with pytest.raises(ValueError, match="requested a 64-device mesh"):
        make_mesh(64)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_tp_in_model_melband_matches_single_device():
    """(dp=4, tp=2) with IN-MODEL sharding constraints: Mel-Band's axial
    transformer folds carry shard_hint(("dp","tp")) on the nb·B / t·B token
    batches, so tp partitions the transformer stack WITHIN a window; the
    sharded run must equal the unsharded one."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from audiojax.models.melband_roformer import (MelBandConfig, init_melband,
                                                  melband_forward)
    from audiojax.parallel import spmd_mesh

    cfg = dataclasses.replace(MelBandConfig(), num_bands=12, dim=32, depth=2,
                              heads=2, dim_head=8, n_fft=512, hop=256)
    params = init_melband(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.integers(-8000, 8000, (4, 4096), dtype=np.int16))

    ref = jax.jit(lambda pp, a: melband_forward(pp, a, cfg))(params, audio)

    mesh = make_mesh(8, tp=2)
    rs, ds = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    with spmd_mesh(mesh):
        fn = jax.jit(lambda pp, a: melband_forward(pp, a, cfg),
                     in_shardings=(rs, ds), out_shardings=ds)
        sh = fn(jax.device_put(params, rs), jax.device_put(audio, ds))

    # sharded reductions reassociate f32 sums; at the int16 output boundary
    # that can flip a sample by 1 LSB (same tolerance as the native-IO tests)
    diff = np.abs(np.asarray(sh, np.int32) - np.asarray(ref, np.int32))
    assert diff.max() <= 1, f"max |diff| = {diff.max()}"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_sp_in_model_mossformer2_ss_matches_single_device():
    """(dp=4, tp=2) sequence parallelism: MossFormer2-SS shards the frame axis
    over tp inside the FLASH stack (psum for the global linear-attention kv,
    halo exchange for the FSMN convs); sharded == unsharded within 1 LSB."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from audiojax.models.mossformer2_ss import (MossFormer2SsConfig,
                                                init_mossformer2_ss,
                                                mossformer2_ss_forward)
    from audiojax.parallel import spmd_mesh

    cfg = dataclasses.replace(MossFormer2SsConfig(), dim=32, depth=2,
                              group_size=16, qk_dim=16, vu_dim=32, rot_dim=8,
                              fsmn_inner=16, lorder=4, dw_kernel=5)
    params = init_mossformer2_ss(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    audio = jnp.asarray(rng.integers(-8000, 8000, (4, 4000), dtype=np.int16))

    ref = jax.jit(lambda pp, a: mossformer2_ss_forward(pp, a, cfg))(params, audio)

    mesh = make_mesh(8, tp=2)
    rs, ds = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    with spmd_mesh(mesh):
        fn = jax.jit(lambda pp, a: mossformer2_ss_forward(pp, a, cfg),
                     in_shardings=(rs, ds), out_shardings=ds)
        sh = fn(jax.device_put(params, rs), jax.device_put(audio, ds))

    diff = np.abs(np.asarray(sh, np.int32) - np.asarray(ref, np.int32))
    assert diff.max() <= 1, f"max |diff| = {diff.max()}"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_sp_in_model_mossformer2_se_matches_single_device():
    """(dp=4, tp=2) sequence parallelism through MossFormer2-SE's FLASH stack
    (same layout as the SS test, at the net level: fbank in, mask out)."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from audiojax.models.mossformer2_se import (MossFormer2SeConfig,
                                                init_mossformer2_se,
                                                mossformer2_se_net)
    from audiojax.parallel import spmd_mesh

    cfg = dataclasses.replace(MossFormer2SeConfig(), dim=32, depth=2,
                              group_size=16, qk_dim=16, vu_dim=32, rot_dim=8,
                              fsmn_inner=16, lorder=4, dw_kernel=5)
    params = init_mossformer2_se(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    fbank = jnp.asarray(rng.standard_normal((4, 48, 180)).astype(np.float32))

    ref = jax.jit(lambda pp, a: mossformer2_se_net(pp, a, cfg))(params, fbank)

    mesh = make_mesh(8, tp=2)
    rs, ds = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    with spmd_mesh(mesh):
        fn = jax.jit(lambda pp, a: mossformer2_se_net(pp, a, cfg),
                     in_shardings=(rs, ds), out_shardings=ds)
        sh = fn(jax.device_put(params, rs), jax.device_put(fbank, ds))

    np.testing.assert_allclose(np.asarray(sh), np.asarray(ref), atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_tp_in_model_mossformergan_matches_single_device():
    """(dp=4, tp=2) in-model tp through MossFormerGAN's SyncANet dual-path
    folds (B·T / B·F fold batches split over (dp, tp))."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from audiojax.models.mossformergan_se import (MossFormerGanConfig,
                                                  init_mossformergan,
                                                  mossformergan_forward)
    from audiojax.parallel import spmd_mesh

    cfg = dataclasses.replace(MossFormerGanConfig(), emb_dim=8, uv_channels=16,
                              n_blocks=2, dense_depth=2, lorder=4,
                              mf_hidden=16, mf_vdim=8, mf_qk=16, mf_rot=8,
                              dw_kernel=5, attn_heads=2, attn_q_ch=2,
                              attn_v_ch=4, fold_window=0)
    params = init_mossformergan(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    audio = jnp.asarray(rng.integers(-8000, 8000, (4, 2000), dtype=np.int16))

    ref = jax.jit(lambda pp, a: mossformergan_forward(pp, a, cfg))(params, audio)

    mesh = make_mesh(8, tp=2)
    rs, ds = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    with spmd_mesh(mesh):
        fn = jax.jit(lambda pp, a: mossformergan_forward(pp, a, cfg),
                     in_shardings=(rs, ds), out_shardings=ds)
        sh = fn(jax.device_put(params, rs), jax.device_put(audio, ds))

    diff = np.abs(np.asarray(sh, np.int32) - np.asarray(ref, np.int32))
    assert diff.max() <= 1, f"max |diff| = {diff.max()}"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_pp_stack_matches_sequential():
    """Pipeline parallelism: a depth-8 FLASH stack staged over pp=4 chips
    (microbatched ppermute schedule) must equal the sequential loop."""
    from functools import partial

    from jax.sharding import Mesh

    from audiojax.nn.mossformer import flash_layer, init_flash_layer
    from audiojax.parallel.pipeline import pp_stack, stack_layer_params

    dim, depth = 16, 8
    layer = partial(flash_layer, group_size=8, qk_dim=8, rot_dim=4)
    keys = jax.random.split(jax.random.PRNGKey(0), depth)
    per_layer = [init_flash_layer(k, dim, vu_dim=16, qk_dim=8, dw_kernel=3)
                 for k in keys]

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((8, 24, dim)).astype(np.float32))

    ref = x
    for p in per_layer:
        ref = layer(p, ref)

    mesh = Mesh(np.array(jax.devices()[:4]), ("pp",))
    staged = stack_layer_params(per_layer, 4)
    out = pp_stack(layer, mesh, staged, x, microbatches=4)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_pp_stack_rejects_bad_shapes():
    from jax.sharding import Mesh

    from audiojax.parallel.pipeline import pp_stack, stack_layer_params

    with pytest.raises(ValueError, match="not divisible"):
        stack_layer_params([{"w": jnp.ones((2, 2))}] * 3, 2)

    mesh = Mesh(np.array(jax.devices()[:4]), ("pp",))
    staged = stack_layer_params([{"w": jnp.ones((2, 2))}] * 4, 4)
    with pytest.raises(ValueError, match="not divisible"):
        pp_stack(lambda p, h: h, mesh, staged, jnp.ones((6, 2, 2)), microbatches=4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_pp_stack_rejects_stage_mesh_mismatch():
    """Stage count != mesh size must fail loudly (a[0] would silently drop
    every chunk after the first), and microbatches=0 is rejected."""
    from jax.sharding import Mesh

    from audiojax.parallel.pipeline import pp_stack, pp_stack_fn, stack_layer_params

    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    staged4 = stack_layer_params([{"w": jnp.ones((2, 2))}] * 8, 4)
    with pytest.raises(ValueError, match="4 stages but mesh"):
        pp_stack(lambda p, h: h, mesh, staged4, jnp.ones((4, 2, 2)))
    with pytest.raises(ValueError, match="microbatches must be >= 1"):
        pp_stack_fn(lambda p, h: h, mesh, microbatches=0)
