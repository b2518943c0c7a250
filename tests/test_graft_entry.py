"""Regression tests for the driver contract entry points.

Round-1 failure mode (VERDICT.md "What's weak" #1): the driver invoked
``dryrun_multichip(8)`` in a process whose JAX backend was already
initialised with 1 device, ``_ensure_devices`` silently passed, and the mesh
assert blew up with ``AssertionError: (1, 8)``. The fix re-executes the
dryrun in a clean subprocess when the in-process platform can't be forced;
this test reproduces the driver's context (pre-initialised 1-device backend)
and requires the dryrun to still succeed.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PREINIT_THEN_DRYRUN = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
assert len(jax.devices()) == 1  # backend now initialised, 1 device only
import sys
sys.path.insert(0, {repo!r})
import __graft_entry__
__graft_entry__.dryrun_multichip(4)
print("DRYRUN_AFTER_PREINIT_OK")
"""


def test_dryrun_multichip_survives_preinitialized_backend():
    env = dict(os.environ)
    env.pop("SHOTVAE_GRAFT_REEXEC", None)
    proc = subprocess.run(
        [sys.executable, "-c", _PREINIT_THEN_DRYRUN.format(repo=REPO)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "DRYRUN_AFTER_PREINIT_OK" in proc.stdout


def test_dryrun_multichip_inline_when_devices_suffice():
    # conftest forces 8 CPU devices in this process -> no subprocess needed
    import __graft_entry__

    __graft_entry__.dryrun_multichip(4)
