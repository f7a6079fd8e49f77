"""Test configuration: run everything on a virtual 8-device CPU mesh.

In this environment jax is pre-imported at interpreter startup with a TPU
plugin that ignores JAX_PLATFORMS, so plain env vars are too late. Instead we
flip the platform with ``jax.config.update`` (honored post-import) and extend
XLA_FLAGS before the lazily-created CPU client first initializes.

float64 is enabled so oracle tests can compare against numpy references at
full precision; library code never assumes x64.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True)
def _hang_guard():
    """Best-effort watchdog: the Pallas TPU interpreter has a known
    timing-dependent cross-device-callback deadlock (documented in
    tests/test_rdma.py) — if it ever resurfaces, fail the one test after
    10 minutes instead of hanging the whole suite. Python-level waits
    (threading.Condition) are signal-interruptible in the main thread;
    C-level blocks may not be, so this is a net, not a guarantee."""
    import signal

    if not hasattr(signal, "SIGALRM"):
        yield
        return

    def _raise(signum, frame):
        raise TimeoutError("test exceeded the 600 s hang guard "
                           "(tests/conftest.py::_hang_guard)")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(600)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
