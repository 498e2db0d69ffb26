"""Driver-contract smoke tests (round-4 VERDICT #3).

Round 4 shipped TWO broken driver artifacts — bench.py crashed with a
NameError that the driver recorded as 0.0 FPS, and dryrun_multichip blew
the wall-clock budget — and nothing in the suite executed either entry
point. These tests run the same code paths the driver runs, at tiny
shapes on CPU, so a regression in either artifact fails the fast suite
instead of a round.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _cpu_env(**extra):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""   # sitecustomize skips the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra)
    return env


_TINY = dict(MO_YOLO_BENCH_TINY="1",
             MO_YOLO_BENCH_YAML="tests/tiny_track.yaml")


def test_bench_measure_path_emits_fps():
    """The exact worker invocation the bench parent spawns; the round-4
    NameError lived here and would have been caught by this line."""
    out = subprocess.run(
        [sys.executable, "bench.py", "--_measure", "64", "64", "1"],
        cwd=ROOT, env=_cpu_env(**_TINY), capture_output=True, text=True,
        timeout=900)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "_FPS_" in out.stdout, out.stdout[-2000:]


def test_bench_main_emits_json_line():
    """The parent orchestration: arg parsing, subprocess plumbing, JSON
    emission (the round-4 silent-zero path lived in main/_measure_subprocess).
    Shares the persistent compile cache with the worker test, so the XLA
    compile here is warm whenever that test ran first."""
    out = subprocess.run(
        [sys.executable, "bench.py", "--imgsz", "64"],
        cwd=ROOT, env=_cpu_env(**_TINY), capture_output=True, text=True,
        timeout=900)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["value"] > 0, rec
    assert rec["unit"] == "frames/s"
    assert "vs_baseline" in rec and "baseline_resolution_matched" in rec


def test_bench_crash_is_not_reported_as_timeout():
    """round-4 VERDICT weak #1: a worker crash must surface as a CRASH
    note with the child's output, never as value 0.0/'timed out'."""
    env = _cpu_env(**_TINY)
    env["MO_YOLO_BENCH_YAML"] = "does/not/exist.yaml"
    out = subprocess.run(
        [sys.executable, "bench.py", "--imgsz", "64"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode != 0
    blob = out.stdout + out.stderr
    assert "CRASHED" in blob, blob[-2000:]
    assert "timed out" not in blob, blob[-2000:]


def test_graft_entry_lowers_at_tiny_shape():
    """entry() must build and its fn must trace + lower under jit — the
    driver's single-chip compile check, minus the backend compile."""
    import jax

    sys.path.insert(0, str(ROOT))
    import __graft_entry__ as g

    fn, example_args = g.entry(image_size=(64, 64))
    lowered = jax.jit(fn).lower(*example_args)   # tracing errors raise here
    assert lowered.as_text(dialect="stablehlo")


@pytest.mark.slow
def test_dryrun_multichip_within_budget():
    """The full multi-chip dry run, exactly as the driver invokes it, must
    exit 0 — and the function itself asserts its internal wall-clock
    budget (round-4 VERDICT #2: rc=124 at 7m06s)."""
    sys.path.insert(0, str(ROOT))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bench_arg_parsing():
    """`--streams N` must not be eaten by the legacy positional-size
    branch (round-5: `bench.py --streams 4` measured a 4x4 image)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert bench._parse_args([]) == (None, 1, [])   # driver default
    assert bench._parse_args(["--streams", "4"]) == (None, 4, [])
    assert bench._parse_args(["--streams", "2", "--imgsz", "1536x800"]) \
        == ((800, 1536), 2, [])
    assert bench._parse_args(["640"]) == ((640, 640), 1, [])
    assert bench._parse_args(["--imgsz", "[320, 640]"]) == ((320, 640), 1, [])
    assert bench._parse_args(["--xla", "--f32"])[2] == ["--xla", "--f32"]
