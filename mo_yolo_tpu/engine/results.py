"""Result containers for detection + tracking outputs.

Host-side equivalents of the reference `Results`/`TrackResults`
(`engine/results.py:66,366-511`): per-frame boxes with class, confidence and
track id, original-image coordinates, plotting and txt export.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class TrackResults:
    """One frame of tracking output in original-image pixel coordinates."""

    boxes_xyxy: np.ndarray          # [n, 4]
    conf: np.ndarray                # [n]
    cls: np.ndarray                 # [n] int
    track_id: np.ndarray            # [n] int (-1 for pure detections)
    orig_shape: tuple               # (h, w)
    path: str = ""
    names: Optional[Dict[int, str]] = None
    orig_img: Optional[np.ndarray] = None
    # task extras (reference Results.masks/.keypoints/.probs):
    masks: Optional[np.ndarray] = None       # [n, h, w] bool/float, orig res
    keypoints: Optional[np.ndarray] = None   # [n, K, 3] x,y px + conf/vis
    probs: Optional[np.ndarray] = None       # [nc] classify probabilities

    def __len__(self):
        return len(self.boxes_xyxy)

    @property
    def boxes_xywhn(self) -> np.ndarray:
        h, w = self.orig_shape
        b = self.boxes_xyxy
        cx = (b[:, 0] + b[:, 2]) / 2 / w
        cy = (b[:, 1] + b[:, 3]) / 2 / h
        bw = (b[:, 2] - b[:, 0]) / w
        bh = (b[:, 3] - b[:, 1]) / h
        return np.stack([cx, cy, bw, bh], 1)

    def save_txt(self, txt_file, save_conf: bool = False) -> None:
        """Write label txt lines (normalized), following the reference
        `Results.save_txt` per task (`results.py:475-511`):
        track rows `track_id cls cx cy w h [conf]`; with masks, segment
        rows `cls x1 y1 x2 y2 ... [conf]` (largest mask contour); with
        keypoints, pose rows `cls cx cy w h kx ky kv ... [conf]`."""
        lines = []
        for i, b in enumerate(self.boxes_xywhn):
            if self.masks is not None:
                poly = _mask_to_poly_n(self.masks[i])
                vals = [int(self.cls[i]), *poly.reshape(-1).tolist()]
            elif self.keypoints is not None:
                h, w = self.orig_shape
                kp = np.asarray(self.keypoints[i], np.float32).copy()
                kp[:, 0] /= w
                kp[:, 1] /= h
                vals = [int(self.cls[i]), *b.tolist(),
                        *kp.reshape(-1).tolist()]
            else:
                vals = [int(self.track_id[i]), int(self.cls[i]),
                        *b.tolist()]
            if save_conf:
                vals.append(float(self.conf[i]))
            lines.append(" ".join(f"{v:g}" if not isinstance(v, int) else str(v)
                                  for v in vals))
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        with open(txt_file, "a") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))

    def plot(self, img: Optional[np.ndarray] = None,
             line_width: int = 2, show_labels: bool = True,
             show_conf: bool = True, boxes: bool = True,
             masks: bool = True, kpt_radius: int = 3,
             kpt_line: bool = True) -> np.ndarray:
        """Draw boxes + `id:N cls conf` labels, mask overlays, keypoint
        dots/skeleton, classify top-5; returns HWC uint8.

        Follows the reference `Results.plot` keyword surface
        (`engine/results.py:366-470`: labels/conf/boxes/masks/
        kpt_radius/kpt_line)."""
        from PIL import Image, ImageDraw
        base = img if img is not None else self.orig_img
        if base is None:
            base = np.zeros((*self.orig_shape, 3), np.uint8)
        base = base.astype(np.uint8)
        palette = [(255, 56, 56), (56, 168, 255), (72, 249, 10),
                   (255, 178, 29), (207, 210, 49), (26, 147, 52),
                   (61, 219, 134), (255, 112, 31)]
        if masks and self.masks is not None and len(self.masks):
            # alpha-blend each instance mask (reference Annotator.masks)
            over = base.astype(np.float32)
            for i, mk in enumerate(self.masks):
                if mk.shape != base.shape[:2]:
                    from PIL import Image as _I
                    mk = np.asarray(_I.fromarray(
                        (np.asarray(mk) > 0.5).astype(np.uint8) * 255
                    ).resize((base.shape[1], base.shape[0]))) > 127
                else:
                    mk = np.asarray(mk) > 0.5
                color = np.asarray(palette[i % len(palette)], np.float32)
                over[mk] = over[mk] * 0.6 + color * 0.4
            base = over.astype(np.uint8)
        im = Image.fromarray(base)
        dr = ImageDraw.Draw(im)
        for i, b in enumerate(self.boxes_xyxy):
            tid = int(self.track_id[i])
            color = palette[tid % len(palette)] if tid >= 0 else (200, 200, 200)
            if boxes:
                dr.rectangle(b.tolist(), outline=color, width=line_width)
            if show_labels:
                name = (self.names or {}).get(int(self.cls[i]),
                                              str(int(self.cls[i])))
                label = f"id:{tid} {name}" if tid >= 0 else name
                if show_conf:
                    label += f" {self.conf[i]:.2f}"
                dr.text((b[0], max(0, b[1] - 12)), label, fill=color)
        if self.keypoints is not None and len(self.keypoints):
            # COCO-17 skeleton (reference `utils/plotting.py` Annotator)
            skel = [(15, 13), (13, 11), (16, 14), (14, 12), (11, 12),
                    (5, 11), (6, 12), (5, 6), (5, 7), (6, 8), (7, 9),
                    (8, 10), (1, 2), (0, 1), (0, 2), (1, 3), (2, 4),
                    (3, 5), (4, 6)]
            for i, kp in enumerate(self.keypoints):
                color = palette[i % len(palette)]
                ok = kp[:, 2] > 0.5 if kp.shape[-1] == 3 else \
                    np.ones(len(kp), bool)
                if kpt_line and len(kp) == 17:
                    for a, bb2 in skel:
                        if ok[a] and ok[bb2]:
                            dr.line([tuple(kp[a, :2]), tuple(kp[bb2, :2])],
                                    fill=color, width=max(line_width, 1))
                for k in np.where(ok)[0]:
                    x, y = float(kp[k, 0]), float(kp[k, 1])
                    dr.ellipse([x - kpt_radius, y - kpt_radius,
                                x + kpt_radius, y + kpt_radius], fill=color)
        if self.probs is not None:
            top = np.argsort(-np.asarray(self.probs))[:5]
            txt = ", ".join(
                f"{(self.names or {}).get(int(c), int(c))} "
                f"{float(self.probs[c]):.2f}" for c in top)
            dr.text((2, 2), txt, fill=(255, 255, 255))
        return np.asarray(im)

    def save(self, filename, **plot_kw) -> str:
        """Render the annotated frame to `filename` (reference
        `Results.save`)."""
        from PIL import Image
        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(self.plot(**plot_kw)).save(str(filename))
        return str(filename)

    def save_crop(self, save_dir, file_name: Optional[str] = None) -> None:
        """Save one cropped image per box under `save_dir/<class name>/`,
        reference `Results.save_crop` (`engine/results.py:528-556`) — crops
        padded by 2% of the box size, clipped to the image."""
        if self.orig_img is None or not len(self):
            return
        from PIL import Image
        stem = file_name or (Path(self.path).stem if self.path else "crop")
        h, w = self.orig_img.shape[:2]
        for i, b in enumerate(self.boxes_xyxy):
            bw, bh = b[2] - b[0], b[3] - b[1]
            x1 = int(max(0, b[0] - 0.02 * bw))
            y1 = int(max(0, b[1] - 0.02 * bh))
            x2 = int(min(w, b[2] + 0.02 * bw))
            y2 = int(min(h, b[3] + 0.02 * bh))
            if x2 <= x1 or y2 <= y1:
                continue
            name = (self.names or {}).get(int(self.cls[i]),
                                          str(int(self.cls[i])))
            d = Path(save_dir) / str(name)
            d.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                self.orig_img[y1:y2, x1:x2].astype(np.uint8)
            ).save(str(d / f"{stem}_{i}.jpg"))


def _mask_to_poly_n(mask: np.ndarray) -> np.ndarray:
    """Binary mask -> largest-contour polygon, NORMALIZED xy [M,2]
    (reference `ops.masks2segments` + `Masks.xyn`, `utils/ops.py`). cv2
    contour when available, bounding-box corners otherwise."""
    m8 = (np.asarray(mask) > 0.5).astype(np.uint8)
    h, w = m8.shape
    try:
        import cv2
        cs = cv2.findContours(m8, cv2.RETR_EXTERNAL,
                              cv2.CHAIN_APPROX_SIMPLE)[0]
        if cs:
            poly = max(cs, key=len).reshape(-1, 2).astype(np.float32)
            return poly / np.asarray([w, h], np.float32)
    except ImportError:
        pass
    ys, xs = np.nonzero(m8)
    if not len(xs):
        return np.zeros((0, 2), np.float32)
    x1, x2, y1, y2 = xs.min(), xs.max() + 1, ys.min(), ys.max() + 1
    return np.asarray([[x1, y1], [x2, y1], [x2, y2], [x1, y2]],
                      np.float32) / np.asarray([w, h], np.float32)
