"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is validated on a fake 8-device CPU mesh — the
JAX-idiomatic way to test mesh code without a pod. NOTE: in this image the
axon TPU plugin overrides the ``JAX_PLATFORMS`` env var, so the platform
must be forced through ``jax.config`` before any device query.
"""

import os
import sys

# Make the repo root importable regardless of invocation directory.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: the suite's cost on this 1-core host is almost
# entirely XLA compiles; cache them across tests AND across pytest runs
# (same dir as __graft_entry__.py so the driver-contract subprocesses hit
# the same entries). Override/disable with SHOTVAE_COMPILE_CACHE.
_cache = os.environ.get("SHOTVAE_COMPILE_CACHE", "/tmp/shotvae_jax_cache")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
