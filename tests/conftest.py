"""Test configuration: force CPU with 8 virtual devices BEFORE jax backend init.

Mirrors SURVEY.md §4's "multi-host without a pod" strategy: shard_map logic
is exercised on a virtual 8-device CPU mesh; TPU-only paths (compiled Pallas)
are covered via interpret mode.

NOTE: this environment's jaxlib ignores the JAX_PLATFORMS env var (the axon
TPU plugin overrides it), so we must ALSO call jax.config.update. XLA_FLAGS
still must be set before the CPU client is created.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (every test
# retraces render passes); caching XLA executables across runs/processes
# cuts repeat wall time dramatically. The directory is keyed by a CPU
# fingerprint: XLA:CPU AOT artifacts from a previous VM (different CPU
# flags) SEGFAULT when loaded (utils/jaxcache.py).
from mitsuba2_tpu.utils import jaxcache  # noqa: E402

jaxcache.configure(jax)



# The full suite compiles hundreds of XLA programs in one process; on
# single-core VMs the run intermittently SEGFAULTs inside
# backend_compile_and_load late in the suite (crash point varies,
# standalone reruns of the same files pass — cumulative in-process
# state). Dropping the in-memory executable caches between test MODULES
# bounds that accumulation; the persistent disk cache (fingerprinted
# above) makes reloads cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
