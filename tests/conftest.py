"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is validated on a fake 8-device CPU mesh
(``xla_force_host_platform_device_count``) — the JAX-idiomatic way to test
mesh code without a pod. Must run before the first ``import jax``.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of invocation directory.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
