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
