"""Test configuration: everything runs on a virtual 8-device CPU mesh.

The reference has no distributed tests at all (SURVEY.md §4); we test
multi-chip sharding on host CPU with XLA's virtual device count, which is
how JAX code is validated without a pod. The re-exec that disables the
harness's TPU tunnel for unit tests lives in tests/axon_guard.py (loaded
early via pytest.ini) — by conftest time those env vars are already clean.

Tiers (round-4 VERDICT weak #7): the default `pytest -q` is the fast gate
(<10 min on this 1-core host). `heavy`-marked files — the multi-minute
torch-parity suites — need `--runheavy`; `slow`-marked tests (real-chip
perf assertions etc.) need `--runslow`. `--runall` enables both.
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
    parser.addoption("--runheavy", action="store_true", default=False,
                     help="run heavy (multi-minute torch-parity) tests")
    parser.addoption("--runall", action="store_true", default=False,
                     help="run every tier (slow + heavy)")


def pytest_collection_modifyitems(config, items):
    run_all = config.getoption("--runall")
    run_slow = run_all or config.getoption("--runslow")
    run_heavy = run_all or config.getoption("--runheavy")
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    skip_heavy = pytest.mark.skip(reason="need --runheavy option to run")
    for item in items:
        if not run_slow and "slow" in item.keywords:
            item.add_marker(skip_slow)
        if not run_heavy and "heavy" in item.keywords:
            item.add_marker(skip_heavy)
