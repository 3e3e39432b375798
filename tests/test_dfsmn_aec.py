"""DFSMN-AEC cascade + VAD timestamps."""
import numpy as np

import jax
import jax.numpy as jnp

from audiojax.models.dfsmn_aec import DfsmnAecConfig, dfsmn_aec_forward, init_dfsmn_aec
from audiojax.runtime.vad import vad_timestamps


def test_cascade_contract_with_vad():
    cfg = DfsmnAecConfig(backend="deep_echo", depth=2, hidden=64, output_vad=True)
    params = init_dfsmn_aec(jax.random.PRNGKey(0), cfg)
    # shrink the backend for test speed
    from audiojax.models.deep_echo import DeepEchoConfig, init_deep_echo
    rng = np.random.default_rng(0)
    near = jnp.asarray((rng.standard_normal(6400) * 5000).astype(np.int16)[None])
    far = jnp.asarray((rng.standard_normal(6400) * 5000).astype(np.int16)[None])
    out, vad = dfsmn_aec_forward(params, near, far, cfg)
    assert out.shape == (1, 6400) and out.dtype == jnp.int16
    assert vad.shape[0] == 1 and vad.shape[1] > 0
    v = np.asarray(vad)
    assert np.all((v >= 0) & (v <= 1))


def test_backend_selection_errors():
    import pytest

    with pytest.raises(ValueError, match="unknown backend"):
        init_dfsmn_aec(jax.random.PRNGKey(0), DfsmnAecConfig(backend="nope"))


def test_vad_timestamps_bridging():
    probs = np.zeros(100)
    probs[10:30] = 0.9
    probs[33:50] = 0.9   # 3-frame dip -> absorbed by the look-ahead mean
    probs[80:82] = 0.9   # 2-frame blip: look-ahead mean never confirms speech
    ts = vad_timestamps(probs, hop=320, sample_rate=16000, look_ahead_s=0.3)
    assert len(ts) == 1
    s, e = ts[0]
    assert abs(s - 10 * 0.02) < 1e-6
    # reference semantics: end = first silent frame time + one frame
    assert abs(e - (50 * 0.02 + 0.02)) < 1e-6


def test_vad_matches_reference_state_machine():
    """Golden: our probabilities_to_silence / fusion must equal the
    reference's own probabilities_to_silence + vad_to_timestamps +
    process_timestamps on random inputs
    (/root/reference/DFSMN_AEC/Inference_DFSMN_ONNX_AEC.py:383-443)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from reference_loader import load_reference

    from audiojax.runtime.vad import (fuse_timestamps,
                                      probabilities_to_silence)

    ns = load_reference("DFSMN_AEC/Inference_DFSMN_ONNX_AEC.py")
    rng = np.random.default_rng(0)
    for trial in range(10):
        probs = rng.random(200)
        look = int(rng.integers(1, 30))
        speak = float(rng.uniform(0.3, 0.7))
        sil = float(rng.uniform(0.3, 0.7))
        ref_states = ns["probabilities_to_silence"](probs, speak, sil, look)
        ours = probabilities_to_silence(
            probs, speaking_score=speak, silence_score=sil, look_ahead_frames=look)
        assert list(ref_states) == list(ours), f"trial {trial}"

        frame_s = 0.02
        ref_ts = ns["process_timestamps"](
            ns["vad_to_timestamps"](ref_states, frame_s), 0.3, 0.2)
        seg, start = [], None
        for i, silent in enumerate(ours):
            if silent and start is not None:
                seg.append((start, i * frame_s + frame_s)); start = None
            elif not silent and start is None:
                start = i * frame_s
        if start is not None:
            seg.append((start, (len(ours) - 1) * frame_s + frame_s))
        ours_ts = fuse_timestamps(seg, fusion_threshold_s=0.3, min_speech_s=0.2)
        assert np.allclose(np.asarray(ref_ts).reshape(-1, 2) if ref_ts else np.zeros((0, 2)),
                           np.asarray(ours_ts).reshape(-1, 2) if ours_ts else np.zeros((0, 2)))


def test_dfsmn_aec_streaming_cascade_matches_offline_interior():
    """Full cascade streaming (backend stream -> hop re-alignment -> streaming
    mask net): 2*hop total delay, interior <=1 LSB past the stage-2 FSMN
    receptive field (the backend stage is exact)."""
    import dataclasses

    from audiojax.models.dfsmn_aec import (dfsmn_aec_stream_init, dfsmn_aec_stream_step)

    cfg = dataclasses.replace(DfsmnAecConfig(), depth=2, hidden=32, lorder=4)
    params = init_dfsmn_aec(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    total = 32 * cfg.hop

    def zmean(x):
        x = x - x.mean()
        x = np.round(x).astype(np.int16)
        x[0] -= np.int16(x.sum())
        return x

    near = zmean(rng.standard_normal(total) * 6000)
    far = zmean(rng.standard_normal(total) * 6000)

    offline = np.asarray(dfsmn_aec_forward(params, jnp.asarray(near[None]), jnp.asarray(far[None]), cfg))[0]

    state = dfsmn_aec_stream_init(cfg)
    outs = []
    for s in range(0, total, 2 * cfg.hop):
        state, out = dfsmn_aec_stream_step(params, state, jnp.asarray(near[None, s : s + 2 * cfg.hop]),
                                           jnp.asarray(far[None, s : s + 2 * cfg.hop]), cfg)
        outs.append(np.asarray(out)[0])
    streamed = np.concatenate(outs)

    delay = 2 * cfg.hop
    rf = 1 + cfg.depth * (cfg.lorder - 1)
    lo = (rf + 4) * cfg.hop + cfg.frame_len
    hi = total - cfg.frame_len - delay
    np.testing.assert_allclose(offline[lo:hi].astype(np.int32),
                               streamed[lo + delay : hi + delay].astype(np.int32), atol=1)


def test_dfsmn_aec_streaming_with_vad():
    import dataclasses

    from audiojax.models.dfsmn_aec import (dfsmn_aec_stream_init, dfsmn_aec_stream_step)

    cfg = dataclasses.replace(DfsmnAecConfig(), depth=2, hidden=32, lorder=4, output_vad=True)
    params = init_dfsmn_aec(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(4)
    near = (rng.standard_normal(4 * cfg.hop) * 5000).astype(np.int16)
    far = (rng.standard_normal(4 * cfg.hop) * 5000).astype(np.int16)

    state = dfsmn_aec_stream_init(cfg)
    state, (out, vad) = dfsmn_aec_stream_step(params, state, jnp.asarray(near[None]),
                                              jnp.asarray(far[None]), cfg)
    assert out.shape == (1, 4 * cfg.hop)
    assert vad.shape == (1, 4)  # one probability per emitted frame
    assert bool(jnp.isfinite(vad).all())
