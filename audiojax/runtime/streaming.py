"""Low-latency streaming serving: state-carry chunks instead of windows.

The reference serves every model stateless-per-window (its inference template
slides fixed INPUT_AUDIO_LENGTH windows, /root/reference/GTCRN/
Inference_GTCRN_ONNX.py:279-298) even for models whose structure is causal.
``StreamingSession`` upgrades serving for models that register a
``make_stream`` hook (GTCRN, DFSMN): a persistent carried state replaces the
window, so latency drops from INPUT_AUDIO_LENGTH (2 s) to n_fft − hop
(16 ms for GTCRN) — the SURVEY.md §5 "north star".

Feed ``push`` arbitrary-sized int16 chunks (mic callbacks are rarely aligned);
the session buffers to a fixed block of ``block_hops`` hops so jit compiles
ONE step shape, emits whatever is ready, and ``flush`` drains the residual +
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
        if jit:
            import jax

            step_fn = jax.jit(step_fn)
        self._step = step_fn
        self._state = init_fn(1)
        self._residual = np.zeros(0, np.int16)
        self._pushed = 0  # int16 samples accepted via push()
        self._raw_out = 0  # raw samples emitted by the model step
        self._aligned_out = 0  # samples returned to the caller

    @property
    def latency_samples(self) -> int:
        """Worst-case algorithmic latency: block buffering + synthesis delay."""
        return self.block + self.delay

    def push(self, chunk: np.ndarray) -> np.ndarray:
        """Feed int16 samples (any length ≥ 0); returns whatever enhanced
        samples are ready (possibly empty)."""
        chunk = np.asarray(chunk, np.int16).reshape(-1)
        self._pushed += chunk.shape[0]
        self._residual = np.concatenate([self._residual, chunk])
        outs = []
        while self._residual.shape[0] >= self.block:
            outs.append(self._run(self._residual[: self.block]))
            self._residual = self._residual[self.block :]
        if not outs:
            return np.zeros(0, np.int16)
        return self._align(np.concatenate(outs))

    def flush(self) -> np.ndarray:
        """Drain the residual buffer and the synthesis delay with zero
        padding; afterwards total output length == total input length."""
        owed = self._pushed - self._aligned_out
        outs = []
        while self._raw_out < self._pushed + self.delay:
            block = np.zeros(self.block, np.int16)
            take = min(self._residual.shape[0], self.block)
            if take:
                block[:take] = self._residual[:take]
                self._residual = self._residual[take:]
            outs.append(self._run(block))
        out = self._align(np.concatenate(outs)) if outs else np.zeros(0, np.int16)
        self._aligned_out = self._pushed  # fully drained
        return out[:owed]

    # ── internals ────────────────────────────────────────────────────────

    def _run(self, block: np.ndarray) -> np.ndarray:
        self._state, out = self._step(self.params, self._state, block[None])
        self._raw_out += self.block
        return np.asarray(out)[0]

    def _align(self, out: np.ndarray) -> np.ndarray:
        """Drop any remaining warm-up samples so output[i] tracks input[i]."""
        already = self._raw_out - out.shape[0]  # raw samples before this batch
        drop = max(0, min(self.delay - already, out.shape[0]))
        out = out[drop:]
        self._aligned_out += out.shape[0]
        return out
