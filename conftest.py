"""Root pytest conftest: escape the axon TPU tunnel for CPU test runs.

The container's sitecustomize registers the axon TPU PJRT plugin in every
Python process and routes the default JAX backend (and every XLA compile)
through a remote TPU relay — fine for benching on the real chip, but it makes
CPU unit tests take minutes per compile.  The registration happens at
interpreter start, so the only clean fix is to re-exec pytest once in a child
process with the plugin env disabled.  Global fd-capture must be suspended
first or the child's output lands in pytest's capture tempfile and is lost.
"""
import os
import subprocess
import sys


def pytest_configure(config):
    if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("AUDIOJAX_TEST_REEXEC") != "1":
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.suspend_global_capture(in_=True)
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize skips axon register()
        env["AUDIOJAX_TEST_REEXEC"] = "1"
        rc = subprocess.call([sys.executable, "-m", "pytest", *config.invocation_params.args], env=env)
        os._exit(rc)
