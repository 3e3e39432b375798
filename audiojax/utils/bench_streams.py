"""Multi-stream serving capacity benchmark (StreamingServer device ticks).

    /opt/venv/bin/python -m audiojax.utils.bench_streams \
        [--model gtcrn] [--lanes 8,64,256] [--block-hops 4]

Measures the DEVICE cost of one batched StreamingServer tick (all lanes
active, inputs pre-staged on device, state chained) and reports how many
real-time streams one chip sustains: lanes × block_seconds / tick_seconds.
Host I/O is excluded deliberately — through the remote-dispatch tunnel the
per-tick host upload dominates and says nothing about chip capability.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_streams(model: str = "gtcrn", lanes: int = 64, block_hops: int = 4,
                  iters: int = 30) -> dict:
    import jax
    import jax.numpy as jnp

    from ..runtime import registry
    from ..runtime.streaming import StreamingServer

    spec = registry.get(model)
    cfg = spec.make_config()
    params = spec.init_params(jax.random.PRNGKey(0), cfg)
    srv = StreamingServer(spec, params, cfg, max_streams=lanes, block_hops=block_hops)
    rc = spec.make_manifest(cfg).runtime_config()
    rate = rc["IN_SAMPLE_RATE"]
    block = srv.block

    rng = np.random.default_rng(0)
    active = jnp.ones(lanes, bool)
    blocks = [jnp.asarray((rng.standard_normal((lanes, block)) * 6000).astype(np.int16))
              for _ in range(srv.n_inputs)]
    state = srv._state
    state, out = srv._step(params, state, active, *blocks)  # compile
    np.asarray(out.ravel()[:4])
    for _ in range(12):  # settle the dispatch pipeline
        state, out = srv._step(params, state, active, *blocks)
    np.asarray(out.ravel()[:4])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = srv._step(params, state, active, *blocks)
    np.asarray(out.ravel()[:4])
    tick = (time.perf_counter() - t0) / iters

    budget = block / rate
    return {
        "model": model,
        "lanes": lanes,
        "block_ms": round(budget * 1e3, 1),
        "device_tick_ms": round(tick * 1e3, 3),
        "realtime_streams_per_chip": int(lanes * budget / tick),
        "realtime": tick < budget,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="gtcrn")
    ap.add_argument("--lanes", default="8,64,256", help="comma-separated lane counts")
    ap.add_argument("--block-hops", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args(argv)
    for k in (int(x) for x in args.lanes.split(",")):
        print(json.dumps(bench_streams(args.model, k, args.block_hops, args.iters)),
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
