"""Profiling and timing utilities.

Equivalents of the reference's `ops.Profile` CUDA-synced context timer
(`utils/ops.py:23-60`), the per-layer FLOPs profile
(`nn/tasks.py:97-120`), and the MOTR FPS harness (`MOTR/benchmark.py:37-48`)
— adapted to JAX: device sync via a real host fetch (the axon relay acks
`block_until_ready` early, see .claude/skills/verify/SKILL.md), FLOPs via
XLA cost analysis, traces via jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np


class Profile(contextlib.ContextDecorator):
    """Accumulating context timer: `with p: ...` then `p.t` (seconds).
    Pass a jax array getter for device-synced timing."""

    def __init__(self, sync: Optional[Callable] = None):
        self.t = 0.0
        self.n = 0
        self._sync = sync

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            out = self._sync()
            if out is not None:
                np.asarray(out).ravel()[:1]  # real host fetch = device sync
        self.t += time.perf_counter() - self._start
        self.n += 1
        return False

    @property
    def ms(self) -> float:
        return 1e3 * self.t / max(self.n, 1)


def xla_flops(fn, *args) -> Optional[float]:
    """Total FLOPs of a jitted function per XLA's cost analysis."""
    import jax

    try:
        comp = jax.jit(fn).lower(*args).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops")) if ca else None
    except Exception:
        return None


def model_info(model, variables, example_input) -> Dict[str, float]:
    """Parameter count + FLOPs summary (reference `model.info()` shape)."""
    import jax

    n_params = sum(x.size for x in jax.tree.leaves(variables.get("params", {})))
    flops = xla_flops(lambda v, x: model.apply(v, x), variables, example_input)
    return {"params": n_params,
            "gflops": (flops or 0.0) / 1e9}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (open in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(fn, *args, n_warmup: int = 5, n_iter: int = 50,
                 fetch: Optional[Callable] = None) -> Dict[str, float]:
    """Average steady-state latency of a jitted callable (the MOTR
    `benchmark.py` harness shape: warmup, N iterations, sync, FPS)."""
    out = None
    for _ in range(n_warmup):
        out = fn(*args)
    (fetch or (lambda o: np.asarray(o).ravel()[:1]))(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    (fetch or (lambda o: np.asarray(o).ravel()[:1]))(out)
    dt = (time.perf_counter() - t0) / n_iter
    return {"latency_ms": dt * 1e3, "fps": 1.0 / dt}


def profile_layers(backbone, variables, images, n_iter: int = 5):
    """Per-layer time + FLOPs over the CNN graph (reference
    `BaseModel._profile_one_layer` / `predict(profile=True)`,
    `nn/tasks.py:97-120`): jit growing graph prefixes, report the
    per-node delta. `backbone` is a BackboneNeck, `variables` its own
    subtree ({'params': ..., 'batch_stats': ...}).

    Per-node ms is a steady-state prefix difference, measured jitted
    (XLA may fuse differently inside the full graph — treat as a layer
    cost ranking, as with the reference's eager per-layer timer)."""
    import jax

    rows = []
    prev_ms = prev_fl = 0.0
    for node in backbone.spec.nodes:
        fn = jax.jit(lambda v, x, i=node.index: backbone.apply(
            v, x, upto=i))
        res = benchmark_fn(fn, variables, images,
                           n_warmup=2, n_iter=n_iter)
        fl = xla_flops(fn, variables, images) or 0.0
        rows.append({"index": node.index, "module": node.module,
                     "ms": max(res["latency_ms"] - prev_ms, 0.0),
                     "cum_ms": res["latency_ms"],
                     "gflops": max(fl - prev_fl, 0.0) / 1e9})
        prev_ms, prev_fl = res["latency_ms"], fl
    return rows
