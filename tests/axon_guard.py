"""Early-loaded pytest plugin (see pytest.ini `-p tests.axon_guard`).

The harness environment routes every Python process through a remote TPU
tunnel: sitecustomize registers the 'axon' PJRT plugin whenever
PALLAS_AXON_POOL_IPS is set, which (a) serializes concurrent processes on
the device claim, (b) breaks jax.pure_callback, and (c) slows CPU-only
test runs by >10x. Unit tests must run on the local CPU backend with 8
virtual devices.

This module is imported during pytest's early plugin loading — BEFORE
output capture redirects fd1/fd2 — so the re-exec below preserves the
test report on the original stdout. (Doing this from conftest.py is too
late: global capture is already active and the child's report would land
in an orphaned temp file.)
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""   # sitecustomize skips the tunnel hook
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
