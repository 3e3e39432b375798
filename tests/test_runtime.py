"""Runtime layer: manifest contract, wav IO, session windowing, checkpoint."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiojax.runtime import (
    Manifest,
    Session,
    load_artifact,
    read_wav,
    resample_np,
    save_artifact,
    to_mono,
    write_wav,
)
from audiojax.runtime.manifest import REQUIRED_KEYS, validate_manifest_dict
from audiojax.runtime import registry


def _manifest(**kw):
    base = dict(
        model_name="test",
        task="denoise",
        model_family="T",
        in_sample_rate=16000,
        out_sample_rate=16000,
        model_sample_rate=16000,
        input_audio_length=4000,
    )
    base.update(kw)
    return Manifest(**base)


def test_manifest_roundtrip(tmp_path):
    m = _manifest(hop_length=256, fold_window_length=24064)
    p = m.save(tmp_path / "manifest.json")
    m2 = Manifest.load(p)
    assert m2 == m
    cfg = m2.runtime_config()
    assert cfg["FOLD_WINDOW_LENGTH"] == 24064
    assert cfg["INPUT_TO_OUTPUT_SCALE"] == 1.0


def test_manifest_fail_closed():
    data = {k: "x" for k in REQUIRED_KEYS}
    del data["task"]
    with pytest.raises(KeyError, match="task"):
        validate_manifest_dict(data)
    with pytest.raises(ValueError, match="unknown task"):
        _manifest(task="nope")


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 5000)) * 8000).astype(np.int16)
    p = write_wav(tmp_path / "x.wav", audio, 16000)
    back, rate = read_wav(p)
    assert rate == 16000
    np.testing.assert_array_equal(back, audio)
    mono = to_mono(back)
    assert mono.shape == (5000,)


def test_resample_np_lengths():
    x = (np.sin(np.arange(16000) / 30) * 10000).astype(np.int16)
    y = resample_np(x, 16000, 48000)
    assert y.shape[-1] == 48000
    z = resample_np(y, 48000, 16000)
    assert z.shape[-1] == 16000
    # energy roughly preserved through the round trip
    assert abs(float(np.abs(z.astype(float)).mean()) / float(np.abs(x.astype(float)).mean()) - 1) < 0.05


def _echo_model(params, audio):
    """Deterministic toy model: negate samples (shape-preserving, int16)."""
    return (-audio).astype(audio.dtype)


def test_session_windowing_and_stitch():
    m = _manifest(input_audio_length=4000)
    s = Session(_echo_model, {}, m, jit=False)
    x = (np.arange(10_500) % 2000 - 1000).astype(np.int16)
    res = s.process(x)
    assert res.outputs[0].shape == (10_500,)
    np.testing.assert_array_equal(res.outputs[0], -x)
    assert res.rtf > 0


def test_session_pad_head_trim():
    m = _manifest(input_audio_length=4000, pad_head=500)
    s = Session(_echo_model, {}, m, jit=False)
    x = (np.ones(6000) * 100).astype(np.int16)
    res = s.process(x)
    assert res.outputs[0].shape == (6000,)
    np.testing.assert_array_equal(res.outputs[0], -x)


def test_session_input_count_check():
    s = Session(_echo_model, {}, _manifest(), jit=False)
    with pytest.raises(ValueError, match="audio inputs"):
        s.process(np.zeros(100, np.int16), np.zeros(100, np.int16))


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": {"w": np.ones((3, 4), np.float32)}, "b": np.zeros(5, np.float32)}
    m = _manifest()
    save_artifact(tmp_path / "art", params, m)
    p2, m2 = load_artifact(tmp_path / "art")
    assert m2 == m
    np.testing.assert_array_equal(np.asarray(p2["a"]["w"]), params["a"]["w"])


def test_registry_has_gtcrn():
    assert "gtcrn" in registry.names()
    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    man = spec.make_manifest(cfg)
    assert man.task == "denoise"
    assert man.nfft == 512


def test_cli_end_to_end(tmp_path):
    from audiojax.runtime.cli import main

    rng = np.random.default_rng(1)
    noisy = (rng.standard_normal(20000) * 6000).astype(np.int16)
    inp = write_wav(tmp_path / "noisy.wav", noisy, 16000)
    out = tmp_path / "clean.wav"
    rc = main(["--model", "gtcrn", "--input", str(inp), "--output", str(out)])
    assert rc == 0
    cleaned, rate = read_wav(out)
    assert rate == 16000
    assert cleaned.shape[-1] == 20000


# ── optimizer pipeline (Optimize_ONNX_Common.py Plan/process_model analog) ──


def test_optimize_q8_artifact_roundtrip(tmp_path):
    """save → optimize(q8f32) → load → serve must stay close to f32 serving,
    with the audit report and manifest extra recording the plan."""
    import json

    from audiojax.runtime import Plan, Session, optimize_artifact, wrap_forward

    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(0), cfg)
    manifest = spec.make_manifest(cfg)
    src = save_artifact(tmp_path / "src", params, manifest)

    # GTCRN is a 23.7k-param model — lower the size floor so leaves qualify
    dst = optimize_artifact(src, tmp_path / "dst", Plan("q8f32", quantize="q8f32", q8_min_size=256))
    report = json.loads((dst / "optimize_report.json").read_text())
    assert report["leaves_quantized"] > 0
    # GTCRN is tiny: biases and norm affines are never quantized (only
    # w/w_i/w_h keys are — anything else is consumed by raw arithmetic and
    # must stay float); big-dense models compress ~3.9x
    assert report["compression"] > 1.5

    qparams, qmanifest = load_artifact(dst)
    assert qmanifest.extra["optimize"]["quantize"] == "q8f32"

    audio = (np.random.default_rng(0).standard_normal(16000) * 8000).astype(np.int16)[None]
    ref = Session(spec.make_forward(cfg), params, manifest).process(audio).audio
    out = Session(wrap_forward(spec.make_forward(cfg), qmanifest), qparams, qmanifest).process(audio).audio
    assert out.shape == ref.shape
    # weight-only int8 is lossy but must stay in the same ballpark
    err = np.abs(out.astype(np.int32) - ref.astype(np.int32)).mean()
    assert err < 2000, f"q8 output drifted too far from f32 (mean |Δ| = {err})"


def test_optimize_q8dyn_artifact_roundtrip(tmp_path):
    """q8dyn: identical artifact bytes to q8f32, but serving consumes the
    quantized leaves natively (dynamic int8 dense; no dequant wrapper)."""
    import json

    from audiojax.runtime import Plan, Session, optimize_artifact, wrap_forward

    spec = registry.get("melband_roformer")
    cfg = spec.make_config()
    # shrink the net so the test compiles fast; keep dims quantization-eligible
    cfg = dataclasses.replace(cfg, n_fft=256, hop=64, num_bands=8, dim=64, depth=1,
                              heads=2, dim_head=32, mlp_expansion=2)
    params = spec.init_params(jax.random.PRNGKey(0), cfg)
    manifest = spec.make_manifest(cfg)
    src = save_artifact(tmp_path / "src", params, manifest)

    dst = optimize_artifact(src, tmp_path / "dst", Plan("q8dyn", quantize="q8dyn", q8_min_size=1024))
    report = json.loads((dst / "optimize_report.json").read_text())
    assert report["leaves_quantized"] > 0

    qparams, qmanifest = load_artifact(dst)
    assert qmanifest.extra["optimize"]["quantize"] == "q8dyn"
    fwd = spec.make_forward(cfg)
    assert wrap_forward(fwd, qmanifest) is fwd  # no wrapper: core consumes q8 leaves

    audio = (np.random.default_rng(0).standard_normal(44100) * 8000).astype(np.int16)[None]
    ref = Session(fwd, params, manifest).process(audio).audio
    out = Session(fwd, qparams, qmanifest).process(audio).audio
    assert out.shape == ref.shape
    err = np.abs(out.astype(np.int32) - ref.astype(np.int32)).mean()
    assert err < 2000, f"q8dyn output drifted too far from f32 (mean |Δ| = {err})"


def test_optimize_bf16_artifact_roundtrip(tmp_path):
    import json

    from audiojax.runtime import PLANS, Session, optimize_artifact, wrap_forward

    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(0), cfg)
    manifest = spec.make_manifest(cfg)
    src = save_artifact(tmp_path / "src", params, manifest)

    dst = optimize_artifact(src, tmp_path / "dst", PLANS["bf16"])
    report = json.loads((dst / "optimize_report.json").read_text())
    assert report["leaves_cast_bf16"] > 0

    bparams, bmanifest = load_artifact(dst)
    audio = (np.random.default_rng(1).standard_normal(16000) * 8000).astype(np.int16)[None]
    ref = Session(spec.make_forward(cfg), params, manifest).process(audio).audio
    out = Session(wrap_forward(spec.make_forward(cfg), bmanifest), bparams, bmanifest).process(audio).audio
    err = np.abs(out.astype(np.int32) - ref.astype(np.int32)).mean()
    assert err < 2000, f"bf16 output drifted too far from f32 (mean |Δ| = {err})"


def test_optimize_plans_fail_closed():
    """Contract drift aborts: dead block patterns, invalid plan combinations."""
    from audiojax.runtime import Plan, apply_plan

    with pytest.raises(ValueError, match="mutually exclusive"):
        Plan("bad", quantize="q8f32", compute_dtype="bf16")
    with pytest.raises(ValueError, match="unknown quantize"):
        Plan("bad", quantize="int4")

    params = {"lin": {"w": jax.numpy.ones((128, 128)), "b": jax.numpy.ones((128,))}}
    with pytest.raises(ValueError, match="matched nothing"):
        apply_plan(params, Plan("bad", compute_dtype="bf16", fp32_block=("no_such_layer",)))
    # q8 with nothing big enough to quantize must abort, not silently no-op
    with pytest.raises(ValueError, match="ZERO leaves"):
        apply_plan(params, Plan("bad", quantize="q8f32", q8_min_size=1 << 20))


def test_prepare_compute_params_matches_in_jit_cast():
    """Host-side pre-cast (registry.prepare_compute_params) must be exactly
    the cast the net applies in-jit — bit-identical outputs — so serving
    paths can hoist it out of the per-call graph (measured 0.76 ms/call of
    pure convert traffic on MossFormer2-SE, v5e)."""
    import dataclasses

    from audiojax.models.mossformer2_se import (MossFormer2SeConfig, init_mossformer2_se,
                                                make_mossformer2_se)
    from audiojax.runtime.registry import prepare_compute_params

    cfg = dataclasses.replace(MossFormer2SeConfig(), depth=1, compute_dtype="bfloat16")
    params = init_mossformer2_se(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((1, 4 * cfg.hop)) * 8000).astype(np.int16))
    fn = jax.jit(make_mossformer2_se(cfg))
    ref = np.asarray(fn(params, audio))
    pre = prepare_compute_params(params, cfg)
    assert all(a.dtype == jnp.bfloat16 for a in jax.tree.leaves(pre)
               if a.dtype in (jnp.float32, jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(fn(pre, audio)), ref)

    # f32 configs and quantized trees pass through untouched
    f32cfg = dataclasses.replace(cfg, compute_dtype="float32")
    assert prepare_compute_params(params, f32cfg) is params
    qtree = {"lin": {"w": {"q8": jnp.ones((8, 8), jnp.int8),
                           "scale": jnp.ones((1, 8), jnp.float32)}}}
    assert prepare_compute_params(qtree, cfg) is qtree


def test_prepare_params_sr_keeps_generator_f32():
    """MossFormer-SR's prepare_params must not cast the HiFi-GAN generator
    (deliberate f32 island) while casting the masknet."""
    from audiojax.runtime import registry

    spec = registry.get("mossformer2_sr")
    assert spec.prepare_params is not None
    import dataclasses

    cfg = dataclasses.replace(spec.make_config(), compute_dtype="bfloat16")
    params = {"gen": {"w": jnp.ones((4, 4), jnp.float32)},
              "front": {"w": jnp.ones((4, 4), jnp.float32)}}
    out = registry.prepare_compute_params(params, cfg, spec)
    assert out["gen"]["w"].dtype == jnp.float32
    assert out["front"]["w"].dtype == jnp.bfloat16


def test_experimental_plan_warns_at_apply_time():
    """q8dyn measured 32.3 dB vs f32 on Mel-Band — below the 40 dB gate — so
    applying it must warn (a user can't pick a below-gate plan silently)."""
    import warnings

    from audiojax.runtime import PLANS, apply_plan

    assert PLANS["q8dyn"].experimental
    params = {"lin": {"w": jax.numpy.ones((128, 128))}}
    with pytest.warns(UserWarning, match="EXPERIMENTAL"):
        out, report = apply_plan(params, PLANS["q8dyn"])
    assert report["experimental"] is True
    # the recommended plans stay warning-free
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        apply_plan(params, PLANS["q8f32"])


def test_optimize_block_list_keeps_f32():
    from audiojax.runtime import Plan, apply_plan

    params = {
        "stft": {"w": jax.numpy.ones((64, 64))},
        "net": {"w": jax.numpy.ones((64, 64))},
    }
    out, report = apply_plan(params, Plan("p", compute_dtype="bf16", fp32_block=(r"^stft/",)))
    assert out["stft"]["w"].dtype == jax.numpy.float32
    assert out["net"]["w"].dtype == jax.numpy.bfloat16
    assert report["leaves_blocked_f32"] == 1


def test_checkpoint_roundtrip_restores_lists(tmp_path):
    """Params trees with per-layer LISTS must survive the msgpack round-trip
    (msgpack stores lists as string-keyed dicts)."""
    params = {"layers": [{"w": jax.numpy.ones((3, 3))}, {"w": jax.numpy.zeros((3, 3))}],
              "head": {"w": jax.numpy.ones((3, 2))}}
    save_artifact(tmp_path / "a", params, _manifest())
    loaded, _ = load_artifact(tmp_path / "a")
    assert jax.tree.structure(loaded) == jax.tree.structure(params)
    np.testing.assert_array_equal(np.asarray(loaded["layers"][1]["w"]), 0)


# ── streaming serving (StreamingSession; SURVEY.md §5 north star) ──


def test_streaming_session_arbitrary_chunks_match_oneshot():
    """Irregular mic-style pushes must produce exactly the same stream as one
    big push, total output length == total input length."""
    from audiojax.runtime import StreamingSession

    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    total = 20 * cfg.hop
    audio = (rng.standard_normal(total) * 6000).astype(np.int16)

    s1 = StreamingSession(spec, params, cfg, jit=False)
    parts, pos = [], 0
    for size in (300, 777, 1024, 5, 2048, 931):
        parts.append(s1.push(audio[pos : pos + size]))
        pos += size
    parts.append(s1.push(audio[pos:]))
    parts.append(s1.flush())
    chunked = np.concatenate(parts)

    s2 = StreamingSession(spec, params, cfg, jit=False)
    oneshot = np.concatenate([s2.push(audio), s2.flush()])

    assert chunked.shape == (total,)
    np.testing.assert_array_equal(chunked, oneshot)


def test_streaming_session_aligns_with_raw_stream():
    """Session output is the raw model stream with the warm-up delay dropped."""
    from audiojax.models.gtcrn import gtcrn_stream_init, gtcrn_stream_step
    from audiojax.runtime import StreamingSession

    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    total = 16 * cfg.hop
    audio = (rng.standard_normal(total) * 6000).astype(np.int16)

    sess = StreamingSession(spec, params, cfg, block_hops=4, jit=False)
    out = np.concatenate([sess.push(audio), sess.flush()])

    state = gtcrn_stream_init(cfg)
    raws = []
    padded = np.concatenate([audio, np.zeros(cfg.n_fft - cfg.hop + 4 * cfg.hop, np.int16)])
    n_blocks = -(-(total + cfg.n_fft - cfg.hop) // (4 * cfg.hop))
    for i in range(n_blocks):
        block = padded[i * 4 * cfg.hop : (i + 1) * 4 * cfg.hop]
        state, o = gtcrn_stream_step(params, state, jax.numpy.asarray(block[None]), cfg)
        raws.append(np.asarray(o)[0])
    raw = np.concatenate(raws)
    delay = cfg.n_fft - cfg.hop
    np.testing.assert_array_equal(out, raw[delay : delay + total])


def test_streaming_session_unsupported_model():
    from audiojax.runtime import StreamingSession

    spec = registry.get("zipenhancer")
    with pytest.raises(ValueError, match="does not support streaming"):
        StreamingSession(spec, {}, None)


def test_export_artifact_end_to_end(tmp_path):
    """Export call stack (SURVEY §3.1): checkpoint → fail-closed import →
    artifact + import report → inference smoke test."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_importers import _gtcrn_state_dict

    from audiojax.runtime.export import export_artifact

    report = export_artifact("gtcrn", _gtcrn_state_dict(), tmp_path / "art")
    assert report["smoke"]["outputs"] == 1
    assert report["smoke"]["out_samples"] > 0
    imp = json.loads((tmp_path / "art" / "import_report.json").read_text())
    assert imp["unconsumed"] == []
    # the exported artifact serves through the CLI
    from audiojax.runtime.cli import main as cli_main

    rng = np.random.default_rng(2)
    inp = write_wav(tmp_path / "noisy.wav", (rng.standard_normal(16000) * 6000).astype(np.int16), 16000)
    rc = cli_main(["--model", "gtcrn", "--artifact", str(tmp_path / "art"),
                   "--input", str(inp), "--output", str(tmp_path / "clean.wav")])
    assert rc == 0


def test_streaming_session_two_input_aec():
    """SDAEC streams through the session with (near, far) chunk pairs."""
    from audiojax.runtime import StreamingSession

    spec = registry.get("sdaec")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    total = 12 * cfg.hop
    near = (rng.standard_normal(total) * 6000).astype(np.int16)
    far = (rng.standard_normal(total) * 6000).astype(np.int16)

    sess = StreamingSession(spec, params, cfg, jit=False)
    parts = [sess.push(near[:700], far[:700])]

    # input-contract checks happen on a live (un-flushed) lane
    with pytest.raises(ValueError, match="expects 2 chunk"):
        sess.push(near[:100])
    with pytest.raises(ValueError, match="equal length"):
        sess.push(near[:100], far[:99])

    parts += [sess.push(near[700:], far[700:]), sess.flush()]
    out = np.concatenate(parts)
    assert out.shape == (total,)
    assert np.isfinite(out.astype(np.float64)).all()

    # flush() consumed zero padding: further pushes would be time-misaligned
    with pytest.raises(ValueError, match="was flushed"):
        sess.push(near[:100], far[:100])


def test_example_audio_paths_exist():
    """Every registry demo-audio entry must point at a real reference wav
    (Example_Audio.py parity); skips when the reference tree is absent."""
    from pathlib import Path

    if not Path("/root/reference/Test_Examples").exists():
        pytest.skip("reference Test_Examples not mounted")
    for name in registry.names():
        paths = registry.example_audio(name)
        assert paths is not None and all(p.exists() for p in paths), (
            f"{name}: example audio missing: {paths}"
        )


def test_export_records_activation_compute_dtype(tmp_path):
    """--compute-dtype is recorded in the artifact manifest and reproduced at
    serve time (the analog of deploying the reference's fp16 ONNX file)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_melband import _tiny, _upstream_sd

    from audiojax.models.melband_roformer import band_layout
    from audiojax.runtime.export import export_artifact

    cfg = _tiny()
    _, widths, _ = band_layout(cfg)
    sd = _upstream_sd(cfg, widths)
    export_artifact("melband_roformer", sd, tmp_path / "art", cfg=cfg,
                    compute_dtype="bfloat16", smoke=False)
    _, manifest = load_artifact(tmp_path / "art")
    assert manifest.extra["activation_compute_dtype"] == "bfloat16"

    # a model without the knob fails closed
    from test_importers import _gtcrn_state_dict

    with pytest.raises(ValueError, match="compute_dtype"):
        export_artifact("gtcrn", _gtcrn_state_dict(), tmp_path / "art2",
                        compute_dtype="bfloat16", smoke=False)


def test_session_window_bucketing():
    """Window batches round up to power-of-two buckets (bounded compile
    shapes for arbitrary clip lengths); outputs are unaffected."""
    m = _manifest(input_audio_length=4000)
    s = Session(_echo_model, {}, m, jit=False)
    # 3 real windows -> bucket 4; 5 real windows -> bucket 8
    assert s._window_geometry(10_500)[2:] == (3, 4)
    assert s._window_geometry(18_100)[2:] == (5, 8)
    # same bucket for different lengths => same compiled shape
    assert s._window_geometry(9_000)[3] == s._window_geometry(12_000)[3] == 4

    for n in (9_000, 10_500, 18_100):
        x = (np.arange(n) % 1000 - 500).astype(np.int16)
        res = s.process(x)
        assert res.outputs[0].shape == (n,)
        np.testing.assert_array_equal(res.outputs[0], -x)

    off = Session(_echo_model, {}, m, jit=False, bucket_windows=False)
    assert off._window_geometry(18_100)[2:] == (5, 5)


def test_export_artifact_aec_two_inputs(tmp_path):
    """Export call stack for a two-input AEC family (SDAEC): import →
    artifact → smoke with (near, far) inputs."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_importers import _sdaec_state_dict

    from audiojax.runtime.export import export_artifact

    report = export_artifact("sdaec", _sdaec_state_dict(), tmp_path / "art")
    assert report["smoke"]["outputs"] == 1
    assert report["smoke"]["out_samples"] > 0


def test_session_stereo_multiwindow_stitch():
    """Multi-window STEREO outputs stitch along time per channel (previously
    reshape(-1) interleaved windows and channels — scrambled audio)."""
    m = _manifest(input_audio_length=4000, input_channels=2, output_channels=2)
    s = Session(_echo_model, {}, m, jit=False)
    x = np.stack([np.arange(10_500) % 2000 - 1000,
                  np.arange(10_500) % 1500 - 750]).astype(np.int16)
    res = s.process(x)
    assert res.outputs[0].shape == (2, 10_500)
    np.testing.assert_array_equal(res.outputs[0], -x)

    # single-window stereo: trim must hit the time axis, not channels
    y = x[:, :3000]
    res1 = s.process(y)
    assert res1.outputs[0].shape == (2, 3000)
    np.testing.assert_array_equal(res1.outputs[0], -y)

    # overlapped stereo (SR-style OLA) stitches per channel
    mo = _manifest(input_audio_length=4000, input_channels=2, output_channels=2,
                   overlap_length=1000)
    so = Session(_echo_model, {}, mo, jit=False)
    reso = so.process(x)
    assert reso.outputs[0].shape == (2, 10_500)
    np.testing.assert_array_equal(reso.outputs[0], -x)


def test_optimize_bf16_audit_counts_only_converted_leaves():
    """Pre-existing bf16 leaves must not satisfy the fail-closed zero-cast
    check: re-applying a bf16 plan to an already-bf16 tree aborts."""
    import jax.numpy as jnp
    import pytest

    from audiojax.runtime import Plan, apply_plan

    params = {"stft": {"w": jnp.ones((4, 4), jnp.float32)},
              "net": {"w": jnp.ones((64, 64), jnp.float32)}}
    plan = Plan("p", compute_dtype="bf16", fp32_block=(r"^stft/",))
    out, report = apply_plan(params, plan)
    assert report["leaves_cast_bf16"] == 1
    with pytest.raises(ValueError, match="ZERO leaves"):
        apply_plan(out, plan)


def test_manifest_from_dict_does_not_alias_extra():
    d = dataclasses.asdict(_manifest())
    d = {k: v for k, v in d.items() if v not in (None, {},)}
    d["extra"] = {"a": 1}
    d["custom_key"] = 2
    m = Manifest.from_dict(d)
    assert m.extra["custom_key"] == 2
    assert "custom_key" not in d["extra"], "caller's dict was mutated"
    m.extra["later"] = 3
    assert "later" not in d["extra"], "Manifest.extra aliases caller's dict"


def test_session_rejects_overlap_ge_window():
    import pytest

    m = Manifest(model_name="t", task="denoise", model_family="T",
                 in_sample_rate=16000, out_sample_rate=16000,
                 model_sample_rate=16000, input_audio_length=4000,
                 overlap_length=4000)
    s = Session(lambda p, a: a, {}, m, jit=False)
    with pytest.raises(ValueError, match="OVERLAP_LENGTH"):
        s.process(np.zeros(10_000, np.int16))


def test_save_artifact_rejects_unroundtrippable_trees(tmp_path):
    import pytest

    m = Manifest(model_name="t", task="denoise", model_family="T",
                 in_sample_rate=16000, out_sample_rate=16000,
                 model_sample_rate=16000, input_audio_length=4000)
    with pytest.raises(ValueError, match="digit keys"):
        save_artifact(tmp_path / "a", {"0": np.zeros(4), "1": np.zeros(4)}, m)
    with pytest.raises(ValueError, match="empty list"):
        save_artifact(tmp_path / "b", {"layers": []}, m)
