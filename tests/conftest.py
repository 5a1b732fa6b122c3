"""Test harness: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip hardware is unavailable in CI; sharding is validated on virtual
host devices, mirroring how the driver dry-runs the multi-chip path.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize imports jax (axon TPU plugin) before this
# file runs, so the env vars alone don't take effect — update the already-
# loaded config too (safe: the backend isn't initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

_last_module = [None]


@pytest.fixture(autouse=True)
def _jax_cache_guard(request):
    """Release compiled executables when crossing test-module boundaries.

    The one-process suite JIT-compiles hundreds of programs; after the
    speculative-decoding suite added ~20 more large ones, XLA:CPU began
    SEGFAULTING deterministically inside an unrelated later compile
    (LLVM JIT resource exhaustion — reproduced at
    test_tools.py::test_native_checkpoint_roundtrip, gone when the
    speculative module is excluded). Dropping each module's executables
    before the next module starts caps the accumulation; cross-module
    cache reuse is minor for these tiny test models."""
    mod = request.module.__name__
    if _last_module[0] not in (None, mod):
        jax.clear_caches()
    _last_module[0] = mod
    yield


def pytest_collection_modifyitems(config, items):
    """Mark the measured-slow tests (tests/slow_tests.txt) so the dev
    loop can run `-m "not slow"` in minutes while CI and end-of-round
    runs stay full. The list is duration-data, not judgment — see the
    file header for how to regenerate."""
    slow_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "slow_tests.txt")
    with open(slow_file) as f:
        slow = {ln.strip() for ln in f
                if ln.strip() and not ln.startswith("#")}
    for item in items:
        name = item.nodeid.split("/")[-1]
        if name in slow:
            item.add_marker(pytest.mark.slow)
