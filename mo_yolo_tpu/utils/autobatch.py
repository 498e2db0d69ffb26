"""Automatic stream-batch sizing from device memory.

Equivalent of the reference's `check_train_batch_size`/autobatch
(`utils/autobatch.py`, CUDA-memory based): on TPU we size the number of
parallel video streams per chip from HBM capacity and the per-stream
activation footprint estimated via XLA's compile-time memory analysis.
"""

from __future__ import annotations

from typing import Optional


def device_memory_bytes() -> Optional[int]:
    import jax

    d = jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    return None


def auto_streams(step_fn, make_args, candidates=(1, 2, 4, 8, 16),
                 mem_fraction: float = 0.9) -> int:
    """Largest stream count whose compiled step fits in device memory.

    step_fn(batch) and make_args(batch) -> jit args; uses XLA's
    compile-time memory analysis (no OOM-probing allocation loop like the
    CUDA reference needs).
    """
    import jax

    limit = device_memory_bytes()
    best = candidates[0]
    for b in candidates:
        try:
            lowered = jax.jit(step_fn).lower(*make_args(b))
            mem = lowered.compile().memory_analysis()
            need = getattr(mem, "temp_size_in_bytes", 0) + \
                getattr(mem, "argument_size_in_bytes", 0) + \
                getattr(mem, "output_size_in_bytes", 0)
            if limit is None or need <= mem_fraction * limit:
                best = b
            else:
                break
        except Exception:
            break
    return best
