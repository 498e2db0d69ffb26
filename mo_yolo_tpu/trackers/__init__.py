from mo_yolo_tpu.trackers.byte_tracker import (  # noqa: F401
    BOTSORT, BYTETracker, ByteTrackerConfig, GMC, STrack,
)
from mo_yolo_tpu.trackers.kalman import KalmanFilterXYAH  # noqa: F401
