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
    probs[33:50] = 0.9   # 3-frame dip -> bridged by 0.3 s look-ahead (15 frames)
    probs[80:82] = 0.9   # 2 frames = 40 ms < min_speech -> dropped
    ts = vad_timestamps(probs, hop=320, sample_rate=16000, look_ahead_s=0.3)
    assert len(ts) == 1
    s, e = ts[0]
    assert abs(s - 10 * 0.02) < 1e-6
    assert abs(e - 50 * 0.02) < 1e-6
