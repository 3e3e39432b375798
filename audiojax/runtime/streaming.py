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

__all__ = ["StreamingSession"]


class StreamingSession:
    """Chunked serving around a registered model's (init, step, delay)."""

    def __init__(self, spec, params, cfg=None, *, block_hops: int = 4, jit: bool = True):
        if spec.make_stream is None:
            raise ValueError(f"model {spec.name!r} does not support streaming serving")
        self.cfg = cfg if cfg is not None else spec.make_config()
        init_fn, step_fn, self.delay = spec.make_stream(self.cfg)
        self.params = params
        self.hop = self.cfg.hop
        self.block = block_hops * self.hop
        self.n_inputs = spec.make_manifest(self.cfg).num_audio_inputs
        if jit:
            import jax

            step_fn = jax.jit(step_fn)
        self._step = step_fn
        self._state = init_fn(1)
        self._residuals = [np.zeros(0, np.int16) for _ in range(self.n_inputs)]
        self._pushed = 0  # int16 samples accepted via push()
        self._raw_out = 0  # raw samples emitted by the model step
        self._aligned_out = 0  # samples returned to the caller

    @property
    def latency_samples(self) -> int:
        """Worst-case algorithmic latency: block buffering + synthesis delay."""
        return self.block + self.delay

    def push(self, *chunks: np.ndarray) -> np.ndarray:
        """Feed int16 samples (one equally-sized chunk per model input, any
        length ≥ 0); returns whatever enhanced samples are ready."""
        if len(chunks) != self.n_inputs:
            raise ValueError(f"push expects {self.n_inputs} chunk(s), got {len(chunks)}")
        arrs = [np.asarray(c, np.int16).reshape(-1) for c in chunks]
        if len({a.shape[0] for a in arrs}) != 1:
            raise ValueError("all input chunks must have equal length")
        self._pushed += arrs[0].shape[0]
        self._residuals = [np.concatenate([r, a]) for r, a in zip(self._residuals, arrs)]
        outs = []
        while self._residuals[0].shape[0] >= self.block:
            outs.append(self._run([r[: self.block] for r in self._residuals]))
            self._residuals = [r[self.block :] for r in self._residuals]
        if not outs:
            return np.zeros(0, np.int16)
        return self._align(np.concatenate(outs))

    def flush(self) -> np.ndarray:
        """Drain the residual buffer and the synthesis delay with zero
        padding; afterwards total output length == total input length."""
        owed = self._pushed - self._aligned_out
        outs = []
        while self._raw_out < self._pushed + self.delay:
            blocks = []
            for i, r in enumerate(self._residuals):
                block = np.zeros(self.block, np.int16)
                take = min(r.shape[0], self.block)
                if take:
                    block[:take] = r[:take]
                    self._residuals[i] = r[take:]
                blocks.append(block)
            outs.append(self._run(blocks))
        out = self._align(np.concatenate(outs)) if outs else np.zeros(0, np.int16)
        self._aligned_out = self._pushed  # fully drained
        return out[:owed]

    # ── internals ────────────────────────────────────────────────────────

    def _run(self, blocks) -> np.ndarray:
        self._state, out = self._step(self.params, self._state, *[b[None] for b in blocks])
        self._raw_out += self.block
        return np.asarray(out)[0]

    def _align(self, out: np.ndarray) -> np.ndarray:
        """Drop any remaining warm-up samples so output[i] tracks input[i]."""
        already = self._raw_out - out.shape[0]  # raw samples before this batch
        drop = max(0, min(self.delay - already, out.shape[0]))
        out = out[drop:]
        self._aligned_out += out.shape[0]
        return out
