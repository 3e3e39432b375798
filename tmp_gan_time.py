"""Time the MossFormerGAN f32 forward after the GAU einsum/projection fixes."""
import time
import jax, jax.numpy as jnp

import audiojax.models.mossformergan_se as MG
from audiojax.utils.bench_all import _clip

cfg = MG.MossFormerGanConfig()
params = MG.init_mossformergan(jax.random.PRNGKey(0), cfg)
n = 6 * cfg.in_sample_rate // cfg.fold_window * cfg.fold_window
audio = jnp.asarray(_clip((1, n), cfg.in_sample_rate))
fn = jax.jit(MG.make_mossformergan(cfg))
out = fn(params, audio)
for _ in range(12):
    out = fn(params, audio)
float(jnp.sum(out[0, :8]))
t0 = time.perf_counter()
for _ in range(20):
    out = fn(params, audio)
float(jnp.sum(out[0, :8]))
t = (time.perf_counter() - t0) / 20
print(f"gan f32: {t*1e3:.3f} ms  RTF {t/6:.6f}", flush=True)
