"""utils: SNR parity math + RTF measurement."""
import numpy as np

from audiojax.utils import measure_rtf, output_snr, parity_report


def test_output_snr():
    ref = (np.sin(np.arange(4000) / 10) * 10000).astype(np.int16)
    assert output_snr(ref, ref) == float("inf")
    noisy = ref + np.random.default_rng(0).integers(-3, 4, ref.shape).astype(np.int16)
    snr = output_snr(ref, noisy)
    assert 60 < snr < 90
    rep = parity_report(ref, noisy)
    assert rep["passed"] and rep["snr_db"] == round(snr, 2)
    bad = parity_report(ref, np.zeros_like(ref))
    assert not bad["passed"]


def test_measure_rtf_shapes():
    calls = []

    def fn(params, audio):
        calls.append(1)
        return audio

    audio = np.zeros((1, 16000), np.int16)
    out = measure_rtf(fn, {}, audio, sample_rate=16000, iters=3, settle=0)
    assert out["audio_s"] == 1.0
    assert out["rtf"] > 0
    assert len(calls) == 4  # warmup + 3

    calls.clear()
    measure_rtf(fn, {}, audio, sample_rate=16000, iters=3)  # default settle=12
    assert len(calls) == 16  # warmup + settle + 3


def test_measure_rtf_multi_output_models():
    """Separation/AEC+VAD forwards return tuples; the first output carries
    the execution chain (regression: the MossFormer2-SS stage profiler
    crashed feeding a tuple back as audio)."""

    def fn(params, audio):
        return audio, np.zeros((1, 3), np.float32)

    audio = np.zeros((1, 16000), np.int16)
    out = measure_rtf(fn, {}, audio, sample_rate=16000, iters=3, settle=0)
    assert out["rtf"] > 0


def test_quantize_roundtrip_and_size():
    import jax.numpy as jnp
    from audiojax.utils.quantize import dequantize_tree, quantize_tree, quantized_bytes

    rng = np.random.default_rng(0)
    params = {
        "big": {"w": jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32))},
        "small": {"b": jnp.asarray(rng.standard_normal(64).astype(np.float32))},
    }
    q = quantize_tree(params)
    assert "q8" in q["big"]["w"] and hasattr(q["small"]["b"], "dtype")  # bias untouched
    d = dequantize_tree(q)
    w = np.asarray(params["big"]["w"])
    err = np.abs(np.asarray(d["big"]["w"]) - w).max()
    assert err <= np.abs(w).max() / 127.0 + 1e-6  # one quantization step
    qb, fb = quantized_bytes(q)
    assert qb < 0.3 * fb


def test_quantized_melband_runs():
    import jax, jax.numpy as jnp
    from audiojax.models.melband_roformer import MelBandConfig, init_melband, melband_forward
    from audiojax.utils.quantize import dequantize_tree, quantize_tree

    cfg = MelBandConfig(n_fft=256, hop=64, num_bands=8, dim=32, depth=1, heads=2,
                        dim_head=16, mlp_expansion=2)
    params = init_melband(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params)
    audio = jnp.asarray((np.random.default_rng(1).standard_normal(4410) * 8000).astype(np.int16)[None])
    ref = np.asarray(melband_forward(params, audio, cfg)).astype(np.float64)
    out = np.asarray(melband_forward(dequantize_tree(qparams), audio, cfg)).astype(np.float64)
    # q8f32 outputs track the float model closely
    snr = 10 * np.log10(np.sum(ref**2) / max(np.sum((ref - out) ** 2), 1e-9))
    assert snr > 20, snr


def test_dyn_int8_dense_matches_manual():
    """core.dense on a {'q8','scale'} weight must equal the manual dynamic
    int8 pipeline (per-row activation scales, int8 dot, rescale)."""
    import jax, jax.numpy as jnp
    from audiojax.nn import core

    rng = np.random.default_rng(0)
    w = rng.standard_normal((96, 160)).astype(np.float32)
    x = rng.standard_normal((2, 11, 96)).astype(np.float32)
    amax = np.abs(w).max(axis=0, keepdims=True)
    scale = (amax / 127.0).astype(np.float32)
    q8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    p = {"w": {"q8": jnp.asarray(q8), "scale": jnp.asarray(scale)}}
    y = np.asarray(jax.jit(core.dense)(p, jnp.asarray(x)), np.float64)

    xs = np.maximum(np.abs(x).max(axis=-1, keepdims=True), np.finfo(np.float32).tiny) / 127.0
    xq = np.round(x / xs).astype(np.int8)
    manual = (xq.astype(np.int32) @ q8.astype(np.int32)).astype(np.float64) * xs * scale
    np.testing.assert_allclose(y, manual, rtol=1e-5, atol=1e-5)

    ref = (x @ w).astype(np.float64)
    snr = 10 * np.log10(np.sum(ref**2) / np.sum((ref - y) ** 2))
    assert snr > 30, snr  # 8-bit weights + 8-bit dynamic activations


def test_q8dyn_melband_runs():
    """Mel-Band served directly on quantized params (q8dyn plan): core.dense
    takes the int8 MXU path, convs/einsums dequantize fused — output must
    track the float model."""
    import jax, jax.numpy as jnp
    from audiojax.models.melband_roformer import MelBandConfig, init_melband, melband_forward
    from audiojax.utils.quantize import quantize_tree

    cfg = MelBandConfig(n_fft=256, hop=64, num_bands=8, dim=32, depth=1, heads=2,
                        dim_head=16, mlp_expansion=2)
    params = init_melband(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params)
    audio = jnp.asarray((np.random.default_rng(1).standard_normal(4410) * 8000).astype(np.int16)[None])
    ref = np.asarray(melband_forward(params, audio, cfg)).astype(np.float64)
    out = np.asarray(melband_forward(qparams, audio, cfg)).astype(np.float64)
    snr = 10 * np.log10(np.sum(ref**2) / max(np.sum((ref - out) ** 2), 1e-9))
    assert snr > 15, snr


def test_inspect_model_report():
    from audiojax.utils.inspect_model import inspect_model

    rep = inspect_model("gtcrn")
    assert rep["params"] == 23314  # the reference GTCRN parameter class (~24k)
    assert rep["gflops_per_chunk"] > 0
    assert rep["num_audio_inputs"] == 1
    rep2 = inspect_model("nkf_aec")
    assert rep2["num_audio_inputs"] == 2


def test_stage_ablation_mechanism():
    """ablate() stubs one stage at a time (restoring it), re-traces the
    forward fresh each time, and attributes latency per stage."""
    import jax
    import jax.numpy as jnp

    import audiojax.nn.mossformer as mf
    from audiojax.utils.ablation import Stage, ablate, stubbed

    calls = {"real": 0, "stub": 0}
    real_flash = mf.flash_layer

    def counting_flash(p, x, **kw):
        calls["real"] += 1
        return real_flash(p, x, **kw)

    def stub_flash(p, x, **kw):
        calls["stub"] += 1
        return x

    params = mf.init_flash_layer(jax.random.PRNGKey(0), 16, vu_dim=16,
                                 qk_dim=8, dw_kernel=3)
    audio = jnp.zeros((1, 32, 16), jnp.float32)

    with stubbed(mf, "flash_layer", counting_flash):
        def fwd(p, x):
            return mf.flash_layer(p, x, group_size=8, qk_dim=8, rot_dim=4)

        report = ablate(
            make_fn=lambda: jax.jit(fwd), params=params, audio=audio,
            sample_rate=16000, iters=2, settle=0,
            stages=[Stage("flash", mf, "flash_layer", stub_flash)],
        )

    assert mf.flash_layer is real_flash  # restored
    assert calls["real"] >= 1 and calls["stub"] >= 1  # both traces happened
    (row,) = report["stages"]
    assert row["name"] == "flash"
    assert row["latency_s"] > 0 and report["baseline"]["latency_s"] > 0
    assert abs(row["attributed_pct"]
               - 100.0 * row["attributed_s"] / report["baseline"]["latency_s"]) < 1e-9


def test_stage_ablation_rejects_unintercepted_stub():
    """A Stage whose stub never runs (wrong module targeted) must raise, not
    report ~0 attribution."""
    import jax
    import jax.numpy as jnp
    import pytest

    import audiojax.nn.mossformer as mf
    from audiojax.utils.ablation import Stage, ablate

    def fwd(p, x):
        return x * p["s"]  # never touches mf.flash_layer

    with pytest.raises(ValueError, match="never called"):
        ablate(make_fn=lambda: jax.jit(fwd), params={"s": jnp.float32(2)},
               audio=jnp.zeros((1, 8), jnp.float32), sample_rate=16000,
               iters=1, settle=0,
               stages=[Stage("flash", mf, "flash_layer", lambda p, x, **k: x)])


def test_q8dyn_gru_model_serves():
    """q8dyn artifacts quantize RNN weights too; rnn.py consumes them via
    as_weight (fused dequant), so an RNN-bearing model must serve unwrapped
    (it crashed with a TypeError before the as_weight route)."""
    import jax
    import jax.numpy as jnp

    from audiojax.models.gtcrn import GtcrnConfig, gtcrn_forward, init_gtcrn
    from audiojax.utils.quantize import quantize_tree

    cfg = GtcrnConfig()
    params = init_gtcrn(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params, min_size=256)  # small floor: hit GRU leaves
    from audiojax.nn.core import is_q8
    q_leaves = [l for l in jax.tree.leaves(
        qparams, is_leaf=is_q8) if is_q8(l)]
    assert q_leaves, "expected quantized leaves"

    audio = jnp.zeros((1, 4096), jnp.int16)
    out = gtcrn_forward(qparams, audio, cfg)  # must trace + run, not TypeError
    assert out.shape == (1, 4096)


def test_ss_profile_stage_targets_exist():
    """ss_profile's stage map must point at live bindings: every (module,
    attr) pair resolves to a callable whose stub accepts the same leading
    (params, x) shape, so a rename can't silently break the profiler."""
    import audiojax.models.mossformer2_ss as SS
    from audiojax.utils.ss_profile import build_stages

    stages = build_stages(SS.MossFormer2SsConfig())
    assert {s.name for s in stages} == {
        "flash_layers", "fsmn_layers", "dw_convs", "scale_norms",
        "instance_norms"}
    for st in stages:
        assert callable(getattr(st.module, st.attr)), st.name
