"""Core tensor ops: boxes, embeddings, deformable attention, matching."""

from mo_yolo_tpu.ops.boxes import (  # noqa: F401
    xywh2xyxy, xyxy2xywh, box_area, elementwise_iou, pairwise_iou,
    pairwise_giou, scale_boxes, clip_boxes,
)
from mo_yolo_tpu.ops.embed import (  # noqa: F401
    inverse_sigmoid, pos2posemb, generate_anchors,
)
from mo_yolo_tpu.ops.deform_attn import ms_deform_attn, ms_deform_attn_xla  # noqa: F401
