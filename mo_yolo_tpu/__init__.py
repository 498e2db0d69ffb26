"""mo_yolo_tpu — a TPU-native (JAX/XLA/Pallas) multi-object-tracking framework.

Re-implements the capabilities of MO-YOLO / DecoderTracker (arXiv:2310.17170):
a YOLOv8 CNN backbone+neck feeding a MOTR-style decoder-only deformable
transformer whose query set is the union of detect queries (top-k selected
from dense encoder features) and track queries (carried across frames).
Track identity emerges from query persistence — no Kalman filter or IoU
association at inference time.

Design stance (TPU-first, not a port):
  * every per-frame computation is a single jit-compiled step with fixed
    shapes; the tracker state is a fixed-size (N-slot) pytree, never a
    dynamically sized container;
  * training scans the per-frame step over a video clip with `jax.lax.scan`;
  * multi-chip scale-out shards independent video streams over a
    `jax.sharding.Mesh` data axis;
  * the deformable-attention gather is a Pallas kernel with a pure-XLA
    reference implementation as the test oracle.

Reference layer map: see /root/repo/SURVEY.md (reference repo liaopan-lp/MO-YOLO).
"""

__version__ = "0.1.0"

__all__ = ["MOTRTrack", "YOLO", "RTDETR", "SAM", "FastSAM", "NAS",
           "__version__"]


def __getattr__(name):
    # lazy: keep `import mo_yolo_tpu.ops` cheap (no jax tracing at import)
    if name in ("MOTRTrack", "YOLO", "RTDETR"):
        from mo_yolo_tpu import api
        return getattr(api, name)
    if name == "NAS":
        from mo_yolo_tpu.models.nas import NAS
        return NAS
    if name == "SAM":
        from mo_yolo_tpu.models.sam import SAM
        return SAM
    if name == "FastSAM":
        from mo_yolo_tpu.models.fastsam import FastSAM
        return FastSAM
    raise AttributeError(name)
