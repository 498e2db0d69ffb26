"""Test configuration: everything runs on a virtual 8-device CPU mesh.

The reference has no distributed tests at all (SURVEY.md §4); we test
multi-chip sharding on host CPU with XLA's virtual device count, which is
how JAX code is validated without a pod. The re-exec that disables the
harness's TPU tunnel for unit tests lives in tests/axon_guard.py (loaded
early via pytest.ini) — by conftest time those env vars are already clean.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
