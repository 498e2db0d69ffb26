"""Tracking dataset: 6-column labels, video grouping, clip sampling.

Host-side equivalent of the reference `YOLOTrackDataset` +
`build_track_dataloader`/`MultiPairedDataset`
(`data/dataset.py:204-425`, `data/build.py:135-198`):

  * label files are 6 columns `cls cx cy w h track_id`, normalized
    (`data/utils.py:180`), one txt per image under a parallel `labels/` tree;
  * dataset yamls (`MOT.yaml`, `dancetracker.yaml`, `KITTI.yaml`) give
    train/val image lists;
  * frames group into videos by filename prefix, chunked into clips of
    `clip_len` consecutive frames; train shuffles clips, val is sequential.

TPU-first: batches are PADDED to static shapes — images to a fixed size,
GT to `max_gt` with a mask — so the jitted train step never recompiles.
Clips stack to [T, B, ...] with B = streams per step (one per chip on the
data mesh axis).
"""

from __future__ import annotations

import dataclasses
import os
import random
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import yaml

from mo_yolo_tpu.data.letterbox import letterbox
from mo_yolo_tpu.data.loaders import load_image


def img2label_path(img_path: str) -> str:
    """images/... -> labels/....txt (reference `data/utils.py:33-38`)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return sb.join(img_path.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"


def load_track_label(path: str) -> np.ndarray:
    """Parse a 6-column track label file -> [n, 6] float array
    (cls cx cy w h track_id). Missing file = empty."""
    if not os.path.isfile(path):
        return np.zeros((0, 6), np.float32)
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 6:
                rows.append([float(v) for v in parts[:6]])
            elif len(parts) == 5:  # detection-only label: synthesize id -1
                rows.append([*map(float, parts), -1.0])
    return np.asarray(rows, np.float32) if rows else np.zeros((0, 6), np.float32)


def verify_image(path: str) -> bool:
    """True when the image decodes cleanly (reference corrupt-image check,
    `data/utils.py:148-160`: verify + size>=10px + JPEG EOI marker)."""
    from PIL import Image
    try:
        with Image.open(path) as im:
            im.verify()
            w, h = im.size
        if w < 10 or h < 10:
            return False
        if path.lower().endswith((".jpg", ".jpeg")):
            with open(path, "rb") as f:
                f.seek(-2, 2)
                if f.read() != b"\xff\xd9":  # truncated JPEG
                    return False
        return True
    except Exception:
        return False


def video_key(img_path: str) -> str:
    """Group frames into videos by filename prefix (reference groups by the
    part of the stem before the frame counter, `build.py:149-162` /
    `val.py:271-286`). MOT-style trees keep frames of one sequence in one
    directory, so the parent directory is the key; a trailing frame number
    in the stem is stripped as a fallback."""
    p = Path(img_path)
    stem = p.stem
    digits = len(stem) - len(stem.rstrip("0123456789"))
    prefix = stem[: len(stem) - digits] if digits else stem
    return f"{p.parent}/{prefix}"


@dataclasses.dataclass
class TrackSample:
    image: np.ndarray      # [H, W, 3] float32 in [0,1], letterboxed
    cls: np.ndarray        # [G] int32
    boxes: np.ndarray      # [G, 4] cxcywh normalized (to letterboxed frame)
    track_id: np.ndarray   # [G] int32
    mask: np.ndarray       # [G] bool
    path: str = ""
    # letterbox meta for mapping predictions back to ORIGINAL image
    # pixels (reference scale_boxes before pred_to_json)
    orig_hw: Tuple[int, int] = (0, 0)
    gain: float = 1.0
    pad: Tuple[float, float] = (0.0, 0.0)


class TrackDataset:
    """Image-list dataset with clip grouping and static-shape padding.

    `augmenter` (a `data.augment.ClipAugmenter`) is applied to raw
    image+labels before letterboxing; geometric parameters are frozen per
    clip so track ids stay coherent across frames (the reference composes
    transforms into the dataset, `data/dataset.py:335-353`)."""

    def __init__(self, img_files: Sequence[str], imgsz: int = 640,
                 max_gt: int = 64, clip_len: int = 5, augmenter=None,
                 verify: bool = False, cache_labels: bool = True,
                 cache_images: bool = False, cache_limit_gb: float = 4.0,
                 single_cls: bool = False, mosaic_p: float = 0.0,
                 mixup_p: float = 0.0, copy_paste_p: float = 0.0,
                 aug_seed: int = 0):
        self.files = list(img_files)
        if verify:  # drop corrupt images (reference `data/utils.py:148-160`)
            ok = [f for f in self.files if verify_image(f)]
            if len(ok) < len(self.files):
                from mo_yolo_tpu.utils.logging import LOGGER
                LOGGER.warning(
                    f"dropped {len(self.files) - len(ok)} corrupt image(s)")
            self.files = ok
        from mo_yolo_tpu.data.letterbox import to_hw
        self.in_h, self.in_w = to_hw(imgsz)   # rect-capable (reference
        self.imgsz = max(self.in_h, self.in_w)  # `rect` / imgsz=[h,w])
        self.max_gt = max_gt
        self.clip_len = clip_len
        self.augmenter = augmenter
        # reference `single_cls`: train every label as class 0
        self.single_cls = single_cls
        # detection-style multi-image augs (reference Mosaic/MixUp) —
        # OFF for clip tracking (they decohere track geometry); the
        # detect trainer enables them and zeroes mosaic_p for the
        # close_mosaic tail epochs
        self.mosaic_p = mosaic_p
        self.mixup_p = mixup_p
        self.copy_paste_p = copy_paste_p
        self.aug_seed = aug_seed
        # label cache: parse each 6-col txt once, not once per epoch
        # (reference np-caches labels, `data/dataset.py:258-260`)
        self._labels: Dict[int, np.ndarray] = {} if cache_labels else None
        # RAM image cache (reference BaseDataset cache='ram'): decoded
        # uint8 frames, capped by estimated size. The device step is
        # single-digit ms on TPU, so per-epoch re-decode dominates training
        # wall-clock without this.
        self._images: Dict[int, np.ndarray] = {} if cache_images else None
        self._cache_budget = int(cache_limit_gb * 1e9)
        self._cache_used = 0
        # group into videos preserving order
        groups: Dict[str, List[int]] = {}
        for i, f in enumerate(self.files):
            groups.setdefault(video_key(f), []).append(i)
        self.videos = {k: sorted(v, key=lambda i: self.files[i])
                       for k, v in groups.items()}
        # chunk each video into clips of clip_len consecutive frames
        self.clips: List[List[int]] = []
        for idxs in self.videos.values():
            for s in range(0, len(idxs) - clip_len + 1, clip_len):
                self.clips.append(idxs[s:s + clip_len])

    def _image(self, i: int) -> np.ndarray:
        if self._images is None:
            return load_image(self.files[i])
        img = self._images.get(i)
        if img is None:
            img = load_image(self.files[i])
            if self._cache_used + img.nbytes <= self._cache_budget:
                self._images[i] = img
                self._cache_used += img.nbytes
        return img

    def __len__(self):
        return len(self.files)

    def _label(self, i: int) -> np.ndarray:
        if self._labels is None:
            lab = load_track_label(img2label_path(self.files[i]))
        else:
            if i not in self._labels:
                self._labels[i] = load_track_label(
                    img2label_path(self.files[i]))
            lab = self._labels[i]
        if self.single_cls and len(lab):
            lab = lab.copy()
            lab[:, 0] = 0
        return lab

    def load_frame(self, i: int, augment: bool = False,
                   aug_index: Optional[int] = None) -> TrackSample:
        img = self._image(i)
        lab = self._label(i)
        if augment and (self.mosaic_p > 0 or self.mixup_p > 0
                        or self.copy_paste_p > 0):
            from mo_yolo_tpu.data.augment import copy_paste, mixup, mosaic4
            # aug_index varies per epoch (trainer passes epoch*len+i) so
            # mosaic partners / mixup draws differ between epochs; a bare
            # frame index would freeze the composite across the whole run
            rng = np.random.default_rng(
                (self.aug_seed * 1_000_003
                 + (i if aug_index is None else aug_index)) % (2 ** 31))
            if rng.random() < self.mosaic_p and len(self.files) >= 4:
                js = rng.integers(0, len(self.files), 3)
                imgs = [img] + [self._image(int(j)) for j in js]
                labs = [lab] + [self._label(int(j)) for j in js]
                img, lab = mosaic4(imgs, labs, rng, size=self.imgsz)
            if self.copy_paste_p > 0:   # reference order: Mosaic→CopyPaste
                img, lab = copy_paste(img, lab, rng, p=self.copy_paste_p)
            if rng.random() < self.mixup_p and len(self.files) >= 2:
                j = int(rng.integers(0, len(self.files)))
                im2, lb2 = self._image(j), self._label(j)
                if im2.shape == img.shape:
                    img, lab = mixup(img, lab, im2, lb2, rng)
        if augment and self.augmenter is not None:
            img, lab = self.augmenter(img, lab)
        h0, w0 = img.shape[:2]
        out, (gain, _), (px, py) = letterbox(img, (self.in_h, self.in_w),
                                             scaleup=False)
        G = self.max_gt
        cls = np.zeros(G, np.int32)
        boxes = np.zeros((G, 4), np.float32)
        tid = np.full(G, -1, np.int32)
        mask = np.zeros(G, bool)
        n = min(len(lab), G)
        if n:
            l = lab[:n]
            # labels are normalized to the ORIGINAL image; remap to the
            # letterboxed frame
            cx = (l[:, 1] * w0 * gain + px) / self.in_w
            cy = (l[:, 2] * h0 * gain + py) / self.in_h
            bw = l[:, 3] * w0 * gain / self.in_w
            bh = l[:, 4] * h0 * gain / self.in_h
            boxes[:n] = np.stack([cx, cy, bw, bh], 1)
            cls[:n] = l[:, 0].astype(np.int32)
            tid[:n] = l[:, 5].astype(np.int32)
            mask[:n] = True
        return TrackSample(out.astype(np.float32) / 255.0, cls, boxes, tid,
                           mask, self.files[i], orig_hw=(h0, w0), gain=gain,
                           pad=(px, py))

    def load_clip(self, clip: List[int],
                  clip_index: int = -1) -> Dict[str, np.ndarray]:
        augment = self.augmenter is not None and clip_index >= 0
        if augment:
            self.augmenter.begin_clip(clip_index)
        frames = [self.load_frame(i, augment=augment) for i in clip]
        return {
            "images": np.stack([f.image for f in frames]),      # [T,H,W,3]
            "gt_cls": np.stack([f.cls for f in frames]),
            "gt_boxes": np.stack([f.boxes for f in frames]),
            "gt_track_id": np.stack([f.track_id for f in frames]),
            "gt_mask": np.stack([f.mask for f in frames]),
        }


def clip_loader(ds: TrackDataset, batch: int, shuffle: bool = True,
                seed: int = 0, drop_last: bool = True,
                ) -> Iterator[Dict[str, np.ndarray]]:
    """Yields batched clips [T, B, ...] (reference
    `build_track_dataloader`, `build.py:135-198`; B parallel streams
    replace its batch=1 restriction)."""
    order = list(range(len(ds.clips)))
    if shuffle:
        random.Random(seed).shuffle(order)
    for s in range(0, len(order) - (batch - 1 if drop_last else 0), batch):
        chunk = order[s:s + batch]
        if drop_last and len(chunk) < batch:
            break
        clips = [ds.load_clip(ds.clips[c], clip_index=seed * 1000003 + c)
                 for c in chunk]
        yield {k: np.stack([c[k] for c in clips], axis=1) for k in clips[0]}


def load_dataset_yaml(path: str) -> Dict:
    """Parse a dataset yaml (MOT.yaml-style: path/train/val txt lists,
    names). Returns dict with resolved train/val image lists."""
    with open(path) as f:
        cfg = yaml.safe_load(f)
    root = Path(cfg.get("path", Path(path).parent))

    def resolve(split):
        v = cfg.get(split)
        if v is None:
            return []
        p = root / v if not os.path.isabs(str(v)) else Path(v)
        if str(p).endswith(".txt"):
            base = p.parent
            return [str((base / line.strip()).resolve())
                    if not os.path.isabs(line.strip()) else line.strip()
                    for line in open(p) if line.strip()]
        from mo_yolo_tpu.data.loaders import list_images
        return list_images(str(p))

    names = cfg.get("names", {})
    if isinstance(names, list):
        names = dict(enumerate(names))
    return {"train": resolve("train"), "val": resolve("val"),
            "test": resolve("test"),
            "names": names, "nc": cfg.get("nc", len(names) or 80)}
