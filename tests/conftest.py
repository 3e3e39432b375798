"""Test harness configuration (CPU).

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic can be
exercised without TPU hardware (the driver separately dry-run-compiles the
multi-chip path and benches on the real chip).

The container globally registers the axon TPU PJRT plugin via sitecustomize
with remote compilation enabled — with it registered, *every* XLA compile
(CPU included) round-trips through the TPU relay at 10-100 s per compile.
That registration happens at interpreter start, before pytest imports this
file, so the only reliable way to get a clean CPU test process is to re-exec
pytest once with the plugin env disabled.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache keeps repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/audiojax_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables after each test module.

    Eager-mode model tests compile hundreds of mini-executables per forward;
    the cumulative in-process executable count eventually segfaults XLA:CPU's
    JIT (observed deterministically ~70 tests in).  Clearing per module keeps
    the count bounded; the persistent on-disk compilation cache keeps repeat
    compiles cheap.
    """
    yield
    import jax

    jax.clear_caches()
