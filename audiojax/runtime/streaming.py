"""Low-latency streaming serving: state-carry chunks instead of windows.

The reference serves every model stateless-per-window (its inference template
slides fixed INPUT_AUDIO_LENGTH windows, /root/reference/GTCRN/
Inference_GTCRN_ONNX.py:279-298) even for models whose structure is causal.
``StreamingSession`` upgrades serving for models that register a
``make_stream`` hook (GTCRN, DFSMN, SDAEC): a persistent carried state
replaces the window, so latency drops from INPUT_AUDIO_LENGTH (2 s) to
n_fft − hop (16 ms for GTCRN) — the SURVEY.md §5 "north star".

Feed ``push`` arbitrary-sized int16 chunks (mic callbacks are rarely
aligned); AEC models take one chunk per input (near, far).  The session
buffers to a fixed block of ``block_hops`` hops so jit compiles ONE step
shape, emits whatever is ready, and ``flush`` drains the residual +
synthesis delay so the total output length equals the total input length,
time-aligned with the input (the ``delay``-sample warm-up is dropped).
"""
from __future__ import annotations

import numpy as np

__all__ = ["StreamingSession", "StreamingServer"]


class StreamingSession:
    """Chunked serving around a registered model's (init, step, delay).

    A single-lane view over :class:`StreamingServer` — one shared
    implementation of the residual/flush/delay-alignment bookkeeping."""

    def __init__(self, spec, params, cfg=None, *, block_hops: int = 4, jit: bool = True):
        self._srv = StreamingServer(spec, params, cfg, max_streams=1,
                                    block_hops=block_hops, jit=jit)
        self._sid = self._srv.open()
        self.cfg = self._srv.cfg
        self.params = params
        self.hop = self._srv.hop
        self.block = self._srv.block
        self.delay = self._srv.delay
        self.n_inputs = self._srv.n_inputs

    @property
    def latency_samples(self) -> int:
        """Worst-case algorithmic latency: block buffering + synthesis delay."""
        return self._srv.latency_samples

    def push(self, *chunks: np.ndarray) -> np.ndarray:
        """Feed int16 samples (one equally-sized chunk per model input, any
        length ≥ 0); returns whatever enhanced samples are ready."""
        return self._srv.push(self._sid, *chunks)

    def flush(self) -> np.ndarray:
        """Drain the residual buffer and the synthesis delay with zero
        padding; afterwards total output length == total input length."""
        return self._srv.flush(self._sid)


class _Lane:
    """Per-stream bookkeeping inside a StreamingServer batch lane."""

    __slots__ = ("residuals", "pushed", "raw_out", "aligned_out", "flushed")

    def __init__(self, n_inputs: int):
        self.residuals = [np.zeros(0, np.int16) for _ in range(n_inputs)]
        self.pushed = 0
        self.raw_out = 0
        self.aligned_out = 0
        self.flushed = False


class StreamingServer:
    """Serve up to ``max_streams`` CONCURRENT independent streams of one model
    with a single compiled step: stream states stack on the batch axis and
    every tick advances the whole batch, with a per-lane active mask selecting
    between the stepped and the previous state — the TPU-native multi-tenant
    form of the reference's one-process-per-client serving.  One fixed
    ``(max_streams, block)`` step shape ⇒ one XLA executable regardless of how
    many calls are live.

    API: ``sid = open()`` → ``push(sid, chunk[, far_chunk]) -> ready samples``
    → ``flush(sid)`` → ``close(sid)`` (the lane is reset and reusable).
    """

    def __init__(self, spec, params, cfg=None, *, max_streams: int = 8,
                 block_hops: int = 4, jit: bool = True):
        import jax
        import jax.numpy as jnp

        if spec.make_stream is None:
            raise ValueError(f"model {spec.name!r} does not support streaming serving")
        self.cfg = cfg if cfg is not None else spec.make_config()
        init_fn, step_fn, self.delay = spec.make_stream(self.cfg)
        self.params = params
        self.hop = self.cfg.hop
        self.block = block_hops * self.hop
        self.max_streams = max_streams
        self.n_inputs = spec.make_manifest(self.cfg).num_audio_inputs
        self._init_fn = init_fn
        self._state = init_fn(max_streams)
        self._lanes: list[_Lane | None] = [None] * max_streams

        # Per-leaf batch-axis metadata: some models fold the batch into an
        # inner axis (e.g. grouped dual-path GRU states (G, B·F, H), per-
        # frequency LSTM states (B·F, H)). Locate each leaf's batch axis by
        # comparing the batch-1 and batch-K state shapes; folds are B-major,
        # so viewing that axis as (K, sub) recovers the lane dimension.
        self._fresh1 = init_fn(1)  # cached batch-1 state for lane resets
        ref1 = jax.tree_util.tree_leaves(self._fresh1)
        refk = jax.tree_util.tree_leaves(self._state)
        self._treedef = jax.tree_util.tree_structure(self._state)
        self._bmeta = []
        k = max_streams
        for l1, lk in zip(ref1, refk):
            axis = None
            for j in range(lk.ndim):
                if (lk.shape[j] == k * l1.shape[j]
                        and lk.shape[:j] == l1.shape[:j]
                        and lk.shape[j + 1 :] == l1.shape[j + 1 :]):
                    axis = j
                    break
            if axis is None:
                raise ValueError(
                    f"cannot locate the stream-batch axis of a state leaf: "
                    f"batch-1 shape {l1.shape} vs batch-{k} shape {lk.shape}"
                )
            self._bmeta.append((axis, l1.shape[axis]))

        def _lane_view(leaf, axis, sub):
            shp = leaf.shape
            return leaf.reshape(shp[:axis] + (k, sub) + shp[axis + 1 :])

        def masked_step(params, state, active, *blocks):
            new_state, out = step_fn(params, state, *blocks)
            new_leaves = jax.tree_util.tree_leaves(new_state)
            old_leaves = jax.tree_util.tree_leaves(state)
            kept = []
            for n, o, (axis, sub) in zip(new_leaves, old_leaves, self._bmeta):
                nv, ov = _lane_view(n, axis, sub), _lane_view(o, axis, sub)
                mask = active.reshape((1,) * axis + (k,) + (1,) * (nv.ndim - axis - 1))
                kept.append(jnp.where(mask, nv, ov).reshape(n.shape))
            state = jax.tree_util.tree_unflatten(self._treedef, kept)
            out_mask = active.reshape((-1,) + (1,) * (out.ndim - 1))
            out = jnp.where(out_mask, out, jnp.zeros_like(out))
            return state, out

        self._lane_view = _lane_view
        self._raw_step = step_fn
        self._step = jax.jit(masked_step) if jit else masked_step

    @property
    def latency_samples(self) -> int:
        return self.block + self.delay

    def verify_lane_isolation(self, seed: int = 0, rtol: float = 1e-4) -> None:
        """Prove the inferred per-leaf lane axes are correct for this model.

        The lane-axis inference in ``__init__`` assumes every state fold is
        batch-MAJOR (viewing the located axis as ``(K, sub)`` recovers the
        lane dimension).  A model whose ``make_stream`` folds the batch
        batch-minor would satisfy the shape comparison yet interleave lanes —
        silent cross-stream state corruption.  This check steps all lanes
        together with DISTINCT random blocks from fresh state and asserts
        each lane's slice of the batched new state matches an independent
        batch-1 step on the same input; any mixing raises.  Called by the
        test-suite for every streaming model (cheap: two eager steps).
        """
        import jax
        import jax.numpy as jnp

        k = self.max_streams
        rng = np.random.default_rng(seed)
        blocks = [
            jnp.asarray(rng.integers(-8000, 8000, (k, self.block)).astype(np.int16))
            for _ in range(self.n_inputs)
        ]
        state_k, _ = self._raw_step(self.params, self._init_fn(k), *blocks)
        leaves_k = jax.tree_util.tree_leaves(state_k)
        for j in range(k):
            s1, _ = self._raw_step(self.params, self._init_fn(1), *[b[j : j + 1] for b in blocks])
            for li, (lk, l1, (axis, sub)) in enumerate(
                zip(leaves_k, jax.tree_util.tree_leaves(s1), self._bmeta)
            ):
                got = np.take(np.asarray(self._lane_view(lk, axis, sub)), j, axis=axis)
                want = np.asarray(l1)
                # lane MIXING lands at signal scale; batch-K vs batch-1 runs
                # legitimately differ by float-vectorization noise (and 1 LSB
                # after int rounding), so tolerate scale-relative error
                tol = rtol * max(1.0, float(np.max(np.abs(want))) if want.size else 1.0)
                if np.issubdtype(want.dtype, np.integer):
                    tol = max(tol, 1.0)
                if got.shape != want.shape or not np.allclose(
                    got.astype(np.float64), want.astype(np.float64), atol=tol
                ):
                    raise AssertionError(
                        f"lane-isolation check failed: state leaf {li} lane {j} "
                        f"(axis {axis}, sub {sub}) diverges from an independent "
                        f"batch-1 step — the state fold is not batch-major"
                    )

    def open(self) -> int:
        """Allocate a stream lane (fresh state) → stream id."""
        for i, lane in enumerate(self._lanes):
            if lane is None:
                self._reset_lane(i)
                self._lanes[i] = _Lane(self.n_inputs)
                return i
        raise RuntimeError(f"all {self.max_streams} stream lanes are busy")

    def close(self, sid: int) -> None:
        self._lanes[sid] = None

    def push(self, sid: int, *chunks: np.ndarray) -> np.ndarray:
        """Feed int16 samples for stream ``sid``; returns ready samples.

        Each full block runs one batch step with only this lane active — fine
        for a single live stream.  With several concurrent streams use
        :meth:`push_many`, which advances ALL ready lanes in one step.
        """
        lane = self._buffer(sid, chunks)
        outs = []
        while lane.residuals[0].shape[0] >= self.block:
            outs.append(self._tick({sid: [r[: self.block] for r in lane.residuals]})[sid])
            lane.residuals = [r[self.block :] for r in lane.residuals]
        if not outs:
            return np.zeros(0, np.int16)
        return self._align(lane, np.concatenate(outs))

    def push_many(self, chunks_by_sid: dict) -> dict:
        """Feed several streams at once; ALL lanes with a full block advance
        together in one batched device step per block round — the multi-
        tenant hot path (one (max_streams, block) executable, shared ticks).

        ``chunks_by_sid``: {sid: chunk} for one-input models or
        {sid: (chunk, far_chunk)} for AEC.  Returns {sid: ready samples} for
        every lane that produced output this call.
        """
        normalized = {
            sid: (chunks if isinstance(chunks, (tuple, list)) else (chunks,))
            for sid, chunks in chunks_by_sid.items()
        }
        # validate EVERYTHING before buffering anything: a mid-loop failure
        # must not leave earlier lanes double-buffered on the caller's retry
        for sid, chunks in normalized.items():
            lane = self._require(sid)
            if lane.flushed:
                raise ValueError(f"stream {sid} was flushed; close() it first")
            if len(chunks) != self.n_inputs:
                raise ValueError(f"push expects {self.n_inputs} chunk(s), got {len(chunks)}")
        for sid, chunks in normalized.items():
            self._buffer(sid, chunks)
        pending: dict[int, list] = {}
        while True:
            ready = {
                sid: lane
                for sid, lane in enumerate(self._lanes)
                if lane is not None and lane.residuals[0].shape[0] >= self.block
            }
            if not ready:
                break
            tick_in = {sid: [r[: self.block] for r in lane.residuals]
                       for sid, lane in ready.items()}
            res = self._tick(tick_in)
            for sid, lane in ready.items():
                lane.residuals = [r[self.block :] for r in lane.residuals]
                pending.setdefault(sid, []).append(res[sid])
        return {
            sid: self._align(self._lanes[sid], np.concatenate(parts))
            for sid, parts in pending.items()
        }

    def _buffer(self, sid: int, chunks) -> "_Lane":
        lane = self._require(sid)
        if lane.flushed:
            raise ValueError(
                f"stream {sid} was flushed: its state consumed the zero "
                f"padding and further pushes would be time-misaligned; "
                f"close() the lane and open() a fresh stream")
        if len(chunks) != self.n_inputs:
            raise ValueError(f"push expects {self.n_inputs} chunk(s), got {len(chunks)}")
        arrs = [np.asarray(c, np.int16).reshape(-1) for c in chunks]
        if len({a.shape[0] for a in arrs}) != 1:
            raise ValueError("all input chunks must have equal length")
        lane.pushed += arrs[0].shape[0]
        lane.residuals = [np.concatenate([r, a]) for r, a in zip(lane.residuals, arrs)]
        return lane

    def flush(self, sid: int) -> np.ndarray:
        """Drain stream ``sid`` (zero padding); total out length == total in."""
        lane = self._require(sid)
        owed = lane.pushed - lane.aligned_out
        outs = []
        while lane.raw_out < lane.pushed + self.delay:
            blocks = []
            for i, r in enumerate(lane.residuals):
                block = np.zeros(self.block, np.int16)
                take = min(r.shape[0], self.block)
                if take:
                    block[:take] = r[:take]
                    lane.residuals[i] = r[take:]
                blocks.append(block)
            outs.append(self._tick({sid: blocks})[sid])
        out = self._align(lane, np.concatenate(outs)) if outs else np.zeros(0, np.int16)
        lane.aligned_out = lane.pushed
        lane.flushed = True  # zero padding consumed by the model state:
        # further pushes would emit time-shifted audio — close() the lane
        return out[:owed]

    # ── internals ────────────────────────────────────────────────────────

    def _require(self, sid: int) -> _Lane:
        lane = self._lanes[sid]
        if lane is None:
            raise KeyError(f"stream {sid} is not open")
        return lane

    def _reset_lane(self, i: int) -> None:
        import jax

        fresh_leaves = jax.tree_util.tree_leaves(self._fresh1)
        state_leaves = jax.tree_util.tree_leaves(self._state)
        out = []
        for s, f, (axis, sub) in zip(state_leaves, fresh_leaves, self._bmeta):
            sv = self._lane_view(s, axis, sub)
            fl = f.reshape(f.shape[:axis] + (1, sub) + f.shape[axis + 1 :])
            idx = (slice(None),) * axis + (i,)
            out.append(sv.at[idx].set(fl[(slice(None),) * axis + (0,)]).reshape(s.shape))
        self._state = jax.tree_util.tree_unflatten(self._treedef, out)

    def _tick(self, ready: dict[int, list[np.ndarray]]) -> dict[int, np.ndarray]:
        """Advance the whole batch one block; only ``ready`` lanes keep state."""
        import jax.numpy as jnp

        k = self.max_streams
        active = np.zeros(k, bool)
        batches = [np.zeros((k, self.block), np.int16) for _ in range(self.n_inputs)]
        for sid, blocks in ready.items():
            active[sid] = True
            for j, b in enumerate(blocks):
                batches[j][sid] = b
        self._state, out = self._step(
            self.params, self._state, jnp.asarray(active), *[jnp.asarray(b) for b in batches]
        )
        out = np.asarray(out)
        result = {}
        for sid in ready:
            self._lanes[sid].raw_out += self.block
            result[sid] = out[sid]
        return result

    def _align(self, lane: _Lane, out: np.ndarray) -> np.ndarray:
        already = lane.raw_out - out.shape[0]
        drop = max(0, min(self.delay - already, out.shape[0]))
        out = out[drop:]
        lane.aligned_out += out.shape[0]
        return out
