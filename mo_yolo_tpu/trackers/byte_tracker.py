"""BYTETracker + BOTSORT — classic detection-box trackers (host-side).

Equivalents of the reference `BYTETracker` (`trackers/byte_tracker.py:167`)
and `BOTSORT` (`trackers/bot_sort.py:101`): two-stage IoU association of
high/low-confidence detections with Kalman-predicted tracks, a lost-track
buffer, and (BOTSORT) camera-motion compensation. These attach to plain
DETECTION outputs (the reference hooks them onto detect predictors via
callbacks, `trackers/track.py:16-62`) — the MOTR-style query tracker in
`mo_yolo_tpu.models.tracker` is the flagship path; these cover the classic
API surface.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
from scipy.optimize import linear_sum_assignment

from mo_yolo_tpu.metrics.detection import box_iou_np
from mo_yolo_tpu.trackers.kalman import KalmanFilterXYAH


def xyxy2xyah(b: np.ndarray) -> np.ndarray:
    w = b[2] - b[0]
    h = b[3] - b[1]
    return np.array([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2,
                     w / max(h, 1e-6), h])


def xyah2xyxy(m: np.ndarray) -> np.ndarray:
    h = m[3]
    w = m[2] * h
    return np.array([m[0] - w / 2, m[1] - h / 2, m[0] + w / 2, m[1] + h / 2])


class STrack:
    def __init__(self, xyxy, score, cls):
        self.kf = KalmanFilterXYAH()
        self.mean, self.cov = self.kf.initiate(xyxy2xyah(np.asarray(xyxy, float)))
        self.score = float(score)
        self.cls = int(cls)
        self.track_id = -1
        self.state = "new"          # new | tracked | lost | removed
        self.frames_lost = 0
        # reference STrack.is_activated: a new track stays unconfirmed for
        # one frame (unless born on frame 1) and only emits an ID once
        # re-matched — suppresses one-frame false-positive IDs.
        self.confirmed = False

    @property
    def xyxy(self) -> np.ndarray:
        return xyah2xyxy(self.mean[:4])

    def predict(self):
        self.mean, self.cov = self.kf.predict(self.mean, self.cov)

    def update(self, xyxy, score, cls):
        self.mean, self.cov = self.kf.update(self.mean, self.cov,
                                             xyxy2xyah(np.asarray(xyxy, float)))
        self.score = float(score)
        self.cls = int(cls)
        self.state = "tracked"
        self.frames_lost = 0

    def apply_gmc(self, warp: np.ndarray):
        """Warp state by an estimated camera motion (2x3 similarity, or a
        legacy (dx, dy) pair).

        Reference `STrack.multi_gmc` (`trackers/byte_tracker.py:48-62`)
        applies kron(I4, R) to the whole xyah state — i.e. it ROTATES the
        (aspect, height) pair, which sends the aspect negative as soon as
        sin(angle)*h is O(1) (any rotation beyond a fraction of a degree).
        That stays latent on its MOT GMC files (tiny rotations) but is
        geometrically wrong; here position/velocity rotate and height
        scales by the similarity scale, aspect is invariant.
        """
        warp = np.asarray(warp, float)
        if warp.shape == (2,):                      # translation only
            self.mean[0] += warp[0]
            self.mean[1] += warp[1]
            return
        R = warp[:2, :2]
        scale = np.sqrt(max(np.linalg.det(R), 1e-12))
        T = np.eye(8)
        T[0:2, 0:2] = R
        T[3, 3] = scale
        T[4:6, 4:6] = R
        T[7, 7] = scale
        self.mean = T @ self.mean
        self.mean[:2] += warp[:2, 2]
        self.cov = T @ self.cov @ T.T


def _iou_assign(tracks: List[STrack], dets: np.ndarray,
                thresh: float):
    """Hungarian IoU matching; returns (pairs, unmatched_t, unmatched_d)."""
    if not tracks or not len(dets):
        return [], list(range(len(tracks))), list(range(len(dets)))
    t_boxes = np.stack([t.xyxy for t in tracks])
    iou = box_iou_np(t_boxes, dets[:, :4])
    r, c = linear_sum_assignment(-iou)
    pairs, ut, ud = [], set(range(len(tracks))), set(range(len(dets)))
    for i, j in zip(r, c):
        if iou[i, j] >= thresh:
            pairs.append((i, j))
            ut.discard(i)
            ud.discard(j)
    return pairs, sorted(ut), sorted(ud)


@dataclasses.dataclass
class ByteTrackerConfig:
    """Defaults of the reference `cfg/trackers/bytetrack.yaml`."""
    track_high_thresh: float = 0.5
    track_low_thresh: float = 0.1
    new_track_thresh: float = 0.6
    match_thresh: float = 0.8    # 1 - iou cost gate for first association
    track_buffer: int = 30


class BYTETracker:
    """Update with per-frame detections [n, 6] = xyxy, conf, cls; returns
    [m, 7] = xyxy, track_id, conf, cls for active tracks."""

    def __init__(self, cfg: Optional[ByteTrackerConfig] = None):
        self.cfg = cfg or ByteTrackerConfig()
        self.tracked: List[STrack] = []
        self.lost: List[STrack] = []
        self._next_id = 1
        self._frame = 0

    def reset(self):
        self.tracked, self.lost, self._next_id = [], [], 1
        self._frame = 0

    def update(self, dets: np.ndarray, img: Optional[np.ndarray] = None
               ) -> np.ndarray:
        dets = np.asarray(dets, float).reshape(-1, 6)
        c = self.cfg
        self._frame += 1
        high = dets[dets[:, 4] >= c.track_high_thresh]
        low = dets[(dets[:, 4] >= c.track_low_thresh) &
                   (dets[:, 4] < c.track_high_thresh)]

        unconfirmed = [t for t in self.tracked if not t.confirmed]
        pool = [t for t in self.tracked if t.confirmed] + self.lost
        for t in pool + unconfirmed:
            t.predict()
        self._motion_hook(pool + unconfirmed, img)

        # stage 1: high-confidence detections vs confirmed tracks
        pairs, ut, ud = _iou_assign(pool, high, 1.0 - c.match_thresh)
        for i, j in pairs:
            pool[i].update(high[j, :4], high[j, 4], high[j, 5])
        # stage 2: low-confidence detections vs remaining tracked-state tracks
        rem = [pool[i] for i in ut if pool[i].state == "tracked"]
        pairs2, ut2, _ = _iou_assign(rem, low, 0.5)
        for i, j in pairs2:
            rem[i].update(low[j, :4], low[j, 4], low[j, 5])
        # unmatched tracks -> lost
        matched2 = {id(rem[i]) for i, _ in pairs2}
        for i in ut:
            t = pool[i]
            if id(t) in matched2:
                continue
            if t.state == "tracked":
                t.state = "lost"
            t.frames_lost += 1
        # stage 3: last frame's unconfirmed tracks vs leftover high
        # detections (tight IoU gate, reference byte_tracker.py unconfirmed
        # association) — matched ones confirm, unmatched ones are dropped.
        high_rem = high[ud] if len(ud) else np.zeros((0, 6))
        pairs3, ut3, ud3 = _iou_assign(unconfirmed, high_rem, 0.3)
        for i, j in pairs3:
            unconfirmed[i].update(high_rem[j, :4], high_rem[j, 4],
                                  high_rem[j, 5])
            unconfirmed[i].confirmed = True
            pool.append(unconfirmed[i])
        # new tracks from still-unmatched high detections: unconfirmed for
        # one frame unless this is the first frame of the stream
        for j3 in ud3:
            if high_rem[j3, 4] >= c.new_track_thresh:
                t = STrack(high_rem[j3, :4], high_rem[j3, 4], high_rem[j3, 5])
                t.track_id = self._next_id
                self._next_id += 1
                t.state = "tracked"
                t.confirmed = self._frame == 1
                pool.append(t)
        # prune
        self.tracked = [t for t in pool if t.state == "tracked"]
        self.lost = [t for t in pool
                     if t.state == "lost" and t.frames_lost <= c.track_buffer]
        out = [np.concatenate([t.xyxy, [t.track_id, t.score, t.cls]])
               for t in self.tracked if t.confirmed]
        return np.stack(out) if out else np.zeros((0, 7))

    def _motion_hook(self, pool, img):
        pass


# GMC moved to its own module (sparse-flow + RANSAC similarity estimation,
# reference `trackers/utils/gmc.py:11-80`); re-exported here for
# backwards compatibility.
from mo_yolo_tpu.trackers.gmc import GMC  # noqa: E402


class BOTSORT(BYTETracker):
    """BYTETracker + camera-motion compensation (reference
    `trackers/bot_sort.py:101`; ReID branch is off by default there and not
    implemented here)."""

    def __init__(self, cfg: Optional[ByteTrackerConfig] = None):
        super().__init__(cfg)
        self.gmc = GMC()

    def _motion_hook(self, pool, img):
        if img is None:
            return
        warp = self.gmc.apply(img)
        for t in pool:
            t.apply_gmc(warp)
