"""StreamingServer: batched multi-stream serving vs independent sessions."""
import numpy as np
import pytest

import jax

from audiojax.runtime import StreamingServer, StreamingSession, registry


def _clips(n, length, seed):
    rng = np.random.default_rng(seed)
    return [(rng.standard_normal(length) * 6000).astype(np.int16) for _ in range(n)]


def test_server_matches_independent_sessions_gtcrn():
    """Two concurrent gtcrn streams with interleaved, irregular pushes must
    equal two independent StreamingSessions bit-exactly."""
    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(0), cfg)

    clips = _clips(2, 3 * 1024, seed=0)
    refs = []
    for c in clips:
        s = StreamingSession(spec, params, cfg, block_hops=2, jit=False)
        refs.append(np.concatenate([s.push(c), s.flush()]))

    srv = StreamingServer(spec, params, cfg, max_streams=4, block_hops=2, jit=False)
    s0, s1 = srv.open(), srv.open()
    outs = {s0: [], s1: []}
    # irregular interleaved pushes
    cuts = [0, 700, 1100, 2048, 3 * 1024]
    for a, b in zip(cuts[:-1], cuts[1:]):
        outs[s0].append(srv.push(s0, clips[0][a:b]))
        outs[s1].append(srv.push(s1, clips[1][a:b]))
    outs[s0].append(srv.flush(s0))
    outs[s1].append(srv.flush(s1))

    for sid, ref in zip((s0, s1), refs):
        got = np.concatenate(outs[sid])
        assert got.shape == ref.shape
        # batched vs single-lane matmuls reassociate f32 sums: allow 1 LSB
        np.testing.assert_allclose(got.astype(np.int32), ref.astype(np.int32), atol=1)


def test_server_aec_two_inputs():
    spec = registry.get("sdaec")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(1), cfg)
    hop = cfg.hop
    near, far = _clips(2, 4 * hop, seed=1)

    ref_s = StreamingSession(spec, params, cfg, block_hops=2, jit=False)
    ref = np.concatenate([ref_s.push(near, far), ref_s.flush()])

    srv = StreamingServer(spec, params, cfg, max_streams=2, block_hops=2, jit=False)
    sid = srv.open()
    got = np.concatenate([srv.push(sid, near, far), srv.flush(sid)])
    np.testing.assert_array_equal(got, ref)


def test_server_lane_reuse_resets_state():
    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(2), cfg)
    clip = _clips(1, 2 * 1024, seed=2)[0]

    srv = StreamingServer(spec, params, cfg, max_streams=1, block_hops=2, jit=False)
    sid = srv.open()
    first = np.concatenate([srv.push(sid, clip), srv.flush(sid)])
    srv.close(sid)
    with pytest.raises(RuntimeError, match="busy"):
        srv.open(), srv.open()  # only one lane
    srv.close(0)

    sid2 = srv.open()  # reused lane must behave like a fresh stream
    second = np.concatenate([srv.push(sid2, clip), srv.flush(sid2)])
    np.testing.assert_array_equal(first, second)


def test_server_errors():
    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(3), cfg)
    srv = StreamingServer(spec, params, cfg, max_streams=1, jit=False)
    with pytest.raises(KeyError, match="not open"):
        srv.push(0, np.zeros(10, np.int16))
    sid = srv.open()
    with pytest.raises(ValueError, match="chunk"):
        srv.push(sid, np.zeros(4, np.int16), np.zeros(4, np.int16))
    ns = registry.get("zipenhancer")
    with pytest.raises(ValueError, match="streaming"):
        StreamingServer(ns, {}, ns.make_config())


def test_push_many_single_step_per_block_round():
    """push_many advances all ready lanes in ONE device step per block round
    (the multi-tenant hot path), and matches independent sessions."""
    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(4), cfg)
    clips = _clips(3, 512, seed=4)  # exactly one block at block_hops=2 (2·256)

    refs = []
    for c in clips:
        s = StreamingSession(spec, params, cfg, block_hops=2, jit=False)
        refs.append(np.concatenate([s.push(c), s.flush()]))

    srv = StreamingServer(spec, params, cfg, max_streams=4, block_hops=2, jit=False)
    sids = [srv.open() for _ in range(3)]
    steps = {"n": 0}
    inner = srv._step

    def counting_step(*a, **k):
        steps["n"] += 1
        return inner(*a, **k)

    srv._step = counting_step
    outs = srv.push_many({sid: c for sid, c in zip(sids, clips)})
    assert steps["n"] == 1  # 3 streams, 1 block each -> ONE batched step
    for sid, ref in zip(sids, refs):
        tail = srv.flush(sid)
        got = np.concatenate([outs.get(sid, np.zeros(0, np.int16)), tail])
        np.testing.assert_allclose(got.astype(np.int32), ref.astype(np.int32), atol=1)


@pytest.mark.parametrize("name", ["gtcrn", "ul_unas", "dfsmn", "nkf_aec", "sdaec",
                                  "deep_echo", "dfsmn_aec"])
def test_lane_isolation_all_streaming_models(name):
    """verify_lane_isolation proves the lane-axis inference (batch-major state
    folds) for every streaming model — the contract ADVICE.md flagged as
    implicit is now an executable invariant."""
    spec = registry.get(name)
    if spec.make_stream is None:
        pytest.skip(f"{name} is not a streaming model")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(1), cfg)
    srv = StreamingServer(spec, params, cfg, max_streams=3, block_hops=1, jit=False)
    srv.verify_lane_isolation()


def test_push_after_flush_rejected():
    """flush() consumes zero padding into the model state; a later push on
    the same lane would emit time-shifted audio and must raise."""
    import pytest

    from audiojax.runtime import registry
    from audiojax.runtime.streaming import StreamingServer

    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(0), cfg)
    srv = StreamingServer(spec, params, cfg, max_streams=2, block_hops=1)
    sid = srv.open()
    srv.push(sid, np.zeros(cfg.hop * 4, np.int16))
    srv.flush(sid)
    with pytest.raises(ValueError, match="flushed"):
        srv.push(sid, np.zeros(cfg.hop, np.int16))
    srv.close(sid)
    sid2 = srv.open()  # lane is reusable after close
    out = srv.push(sid2, np.zeros(cfg.hop * 4, np.int16))
    assert out.dtype == np.int16


def test_push_many_validates_before_buffering():
    """A bad entry in push_many must not leave earlier lanes buffered (a
    retry would double-buffer their audio)."""
    import pytest

    from audiojax.runtime import registry
    from audiojax.runtime.streaming import StreamingServer

    spec = registry.get("gtcrn")
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(0), cfg)
    srv = StreamingServer(spec, params, cfg, max_streams=2, block_hops=1)
    a, b = srv.open(), srv.open()
    chunk = np.zeros(cfg.hop, np.int16)
    with pytest.raises(ValueError, match="expects 1 chunk"):
        srv.push_many({a: chunk, b: (chunk, chunk)})
    assert srv._lanes[a].residuals[0].shape[0] == 0, "lane a was buffered"
