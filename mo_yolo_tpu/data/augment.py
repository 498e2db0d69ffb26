"""Training-time image/label augmentations (host-side numpy).

Equivalents of the reference transforms (`ultralytics/data/augment.py`):
Mosaic, RandomPerspective (affine), MixUp, RandomHSV, RandomFlip, and the
composed `v8_transforms` pipeline — re-implemented track-aware: labels are
`[cls, cx, cy, w, h, track_id]` (normalized) and every geometric transform
preserves track ids. PIL supplies resampling (no cv2 in this image).

Note on video clips: geometric augmentations must be SAMPLED ONCE PER CLIP
and applied to every frame, or track geometry decoheres across time — the
`ClipAugmenter` below freezes parameters per clip (the reference trains
with augmentation mostly off for tracking: mosaic/perspective disabled in
its track configs, but the components exist for detection training).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image


def _xywhn_to_xyxy_px(lab: np.ndarray, w: int, h: int) -> np.ndarray:
    b = lab[:, 1:5].copy()
    out = np.empty_like(b)
    out[:, 0] = (b[:, 0] - b[:, 2] / 2) * w
    out[:, 1] = (b[:, 1] - b[:, 3] / 2) * h
    out[:, 2] = (b[:, 0] + b[:, 2] / 2) * w
    out[:, 3] = (b[:, 1] + b[:, 3] / 2) * h
    return out


def _xyxy_px_to_xywhn(xyxy: np.ndarray, w: int, h: int) -> np.ndarray:
    out = np.empty_like(xyxy)
    out[:, 0] = (xyxy[:, 0] + xyxy[:, 2]) / 2 / w
    out[:, 1] = (xyxy[:, 1] + xyxy[:, 3]) / 2 / h
    out[:, 2] = (xyxy[:, 2] - xyxy[:, 0]) / w
    out[:, 3] = (xyxy[:, 3] - xyxy[:, 1]) / h
    return out


def random_hsv(img: np.ndarray, rng: np.random.Generator,
               hgain: float = 0.015, sgain: float = 0.7,
               vgain: float = 0.4) -> np.ndarray:
    """HSV jitter (reference `RandomHSV`). img uint8 RGB."""
    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hsv = np.asarray(Image.fromarray(img).convert("HSV"), np.float32)
    hsv[..., 0] = (hsv[..., 0] * r[0]) % 256
    hsv[..., 1] = np.clip(hsv[..., 1] * r[1], 0, 255)
    hsv[..., 2] = np.clip(hsv[..., 2] * r[2], 0, 255)
    return np.asarray(Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB"))


def random_flip_lr(img: np.ndarray, lab: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Horizontal flip; cx -> 1 - cx."""
    img = img[:, ::-1].copy()
    lab = lab.copy()
    if len(lab):
        lab[:, 1] = 1.0 - lab[:, 1]
    return img, lab


def random_flip_ud(img: np.ndarray, lab: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vertical flip (reference `flipud`); cy -> 1 - cy."""
    img = img[::-1].copy()
    lab = lab.copy()
    if len(lab):
        lab[:, 2] = 1.0 - lab[:, 2]
    return img, lab


def random_affine(img: np.ndarray, lab: np.ndarray, rng: np.random.Generator,
                  degrees: float = 0.0, translate: float = 0.1,
                  scale: float = 0.5, shear: float = 0.0,
                  perspective: float = 0.0,
                  border: int = 0, min_box: float = 2.0,
                  params: Optional[dict] = None):
    """Random projective warp (the reference `RandomPerspective`:
    rotation/scale/shear/translation + the `perspective` homography row,
    `data/augment.py` P matrix).

    Returns (img, labels, params) — pass `params` back in to re-apply the
    SAME warp to another frame of the clip.
    """
    h, w = img.shape[:2]
    if params is None:
        a = rng.uniform(-degrees, degrees)
        s = rng.uniform(1 - scale, 1 + scale)
        shx = np.tan(np.radians(rng.uniform(-shear, shear)))
        shy = np.tan(np.radians(rng.uniform(-shear, shear)))
        tx = rng.uniform(0.5 - translate, 0.5 + translate) * w - w / 2
        ty = rng.uniform(0.5 - translate, 0.5 + translate) * h - h / 2
        px = rng.uniform(-perspective, perspective)
        py = rng.uniform(-perspective, perspective)
        params = {"a": a, "s": s, "shx": shx, "shy": shy, "tx": tx,
                  "ty": ty, "px": px, "py": py}
    a, s = params["a"], params["s"]
    px, py = params.get("px", 0.0), params.get("py", 0.0)
    ca, sa = np.cos(np.radians(a)) * s, np.sin(np.radians(a)) * s
    # forward matrix (centered rotation/scale + shear + translation
    # + perspective bottom row)
    cx0, cy0 = w / 2, h / 2
    M = np.array([
        [ca + params["shx"] * sa, -sa + params["shx"] * ca, 0],
        [sa + params["shy"] * ca, ca - params["shy"] * sa, 0],
        [px, py, 1]], np.float64)
    M[0, 2] = cx0 - M[0, 0] * cx0 - M[0, 1] * cy0 + params["tx"]
    M[1, 2] = cy0 - M[1, 0] * cx0 - M[1, 1] * cy0 + params["ty"]
    # PIL wants the inverse mapping
    Mi = np.linalg.inv(M)
    if px == 0.0 and py == 0.0:
        warped = Image.fromarray(img).transform(
            (w, h), Image.AFFINE,
            (Mi[0, 0], Mi[0, 1], Mi[0, 2], Mi[1, 0], Mi[1, 1], Mi[1, 2]),
            resample=Image.BILINEAR, fillcolor=(114, 114, 114))
    else:
        Mi = Mi / Mi[2, 2]
        warped = Image.fromarray(img).transform(
            (w, h), Image.PERSPECTIVE,
            (Mi[0, 0], Mi[0, 1], Mi[0, 2], Mi[1, 0], Mi[1, 1], Mi[1, 2],
             Mi[2, 0], Mi[2, 1]),
            resample=Image.BILINEAR, fillcolor=(114, 114, 114))
    img = np.asarray(warped)

    if len(lab):
        xyxy = _xywhn_to_xyxy_px(lab, w, h)
        corners = np.stack([
            xyxy[:, [0, 1]], xyxy[:, [2, 1]], xyxy[:, [0, 3]], xyxy[:, [2, 3]]],
            axis=1)  # [n,4,2]
        ones = np.ones((*corners.shape[:2], 1))
        tc = np.concatenate([corners, ones], -1) @ M.T
        tc = tc[..., :2] / np.maximum(np.abs(tc[..., 2:]), 1e-9) * \
            np.sign(tc[..., 2:])
        new = np.concatenate([tc.min(1), tc.max(1)], 1)  # [n,4] xyxy
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
        keep = ((new[:, 2] - new[:, 0]) > min_box) & \
               ((new[:, 3] - new[:, 1]) > min_box)
        lab = lab[keep].copy()
        if len(lab):
            lab[:, 1:5] = _xyxy_px_to_xywhn(new[keep], w, h)
    return img, lab, params


def mosaic4(imgs: List[np.ndarray], labs: List[np.ndarray],
            rng: np.random.Generator, size: int = 640):
    """4-image mosaic (reference `Mosaic`): 2x2 grid around a random
    center on a 2*size canvas, then center-crop to size."""
    s2 = size * 2
    canvas = np.full((s2, s2, 3), 114, np.uint8)
    cx = int(rng.uniform(size * 0.5, size * 1.5))
    cy = int(rng.uniform(size * 0.5, size * 1.5))
    out_labs = []
    placements = [(0, 0, cx, cy), (cx, 0, s2, cy), (0, cy, cx, s2),
                  (cx, cy, s2, s2)]
    for (x1, y1, x2, y2), img, lab in zip(placements, imgs, labs):
        tw, th = x2 - x1, y2 - y1
        if tw <= 0 or th <= 0:
            continue
        h, w = img.shape[:2]
        g = min(tw / w, th / h)
        nw, nh = max(int(w * g), 1), max(int(h * g), 1)
        rs = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
        canvas[y1:y1 + nh, x1:x1 + nw] = rs[:th, :tw]
        if len(lab):
            l2 = lab.copy()
            l2[:, 1] = (lab[:, 1] * nw + x1) / s2
            l2[:, 2] = (lab[:, 2] * nh + y1) / s2
            l2[:, 3] = lab[:, 3] * nw / s2
            l2[:, 4] = lab[:, 4] * nh / s2
            out_labs.append(l2)
    lab = np.concatenate(out_labs, 0) if out_labs else np.zeros((0, 6), np.float32)
    # center crop back to size
    off = size // 2
    crop = canvas[off:off + size, off:off + size]
    if len(lab):
        xyxy = _xywhn_to_xyxy_px(lab, s2, s2) - off
        xyxy[:, [0, 2]] = xyxy[:, [0, 2]].clip(0, size)
        xyxy[:, [1, 3]] = xyxy[:, [1, 3]].clip(0, size)
        keep = ((xyxy[:, 2] - xyxy[:, 0]) > 2) & ((xyxy[:, 3] - xyxy[:, 1]) > 2)
        lab = lab[keep]
        if len(lab):
            lab[:, 1:5] = _xyxy_px_to_xywhn(xyxy[keep], size, size)
    return crop, lab


def mixup(img1, lab1, img2, lab2, rng: np.random.Generator):
    """MixUp (reference `MixUp`): beta(32,32) blend, labels concatenated."""
    r = rng.beta(32.0, 32.0)
    img = (img1.astype(np.float32) * r + img2.astype(np.float32) * (1 - r))
    return img.astype(np.uint8), np.concatenate([lab1, lab2], 0)


def copy_paste(img: np.ndarray, lab: np.ndarray, rng: np.random.Generator,
               p: float = 0.5, ioa_thresh: float = 0.30):
    """Box-level Copy-Paste (reference `CopyPaste`, `data/augment.py`).

    The reference pastes flip-lr *segment* instances wherever the pasted
    instance's IoA with every existing box stays < 0.30 (box-only labels
    make it a no-op there). This TPU stack's labels are box-only, so the
    same recipe runs on box crops: each object is duplicated with prob
    `p` at the horizontally-mirrored x position (= where its flip-lr
    instance lands) under the same IoA gate. Pasted copies carry
    track_id -1 — they are new objects, not continuations."""
    if p <= 0 or not len(lab):
        return img, lab
    h, w = img.shape[:2]
    img = img.copy()
    xyxy = _xywhn_to_xyxy_px(lab, w, h)
    occupied = [xyxy]
    new_rows = []
    for j in range(len(lab)):
        if rng.random() >= p:
            continue
        x1, y1, x2, y2 = (int(round(v)) for v in xyxy[j])
        x1, x2 = max(x1, 0), min(x2, w)
        y1, y2 = max(y1, 0), min(y2, h)
        if (x2 - x1) < 2 or (y2 - y1) < 2:
            continue
        nx1, nx2 = w - x2, w - x1     # mirrored-x paste location
        cand = np.array([nx1, y1, nx2, y2], float)
        boxes = np.concatenate(occupied, 0)
        ix1 = np.maximum(boxes[:, 0], cand[0])
        iy1 = np.maximum(boxes[:, 1], cand[1])
        ix2 = np.minimum(boxes[:, 2], cand[2])
        iy2 = np.minimum(boxes[:, 3], cand[3])
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        area = np.maximum((boxes[:, 2] - boxes[:, 0]) *
                          (boxes[:, 3] - boxes[:, 1]), 1e-9)
        if len(inter) and (inter / area).max() >= ioa_thresh:
            continue
        img[y1:y2, nx1:nx2] = img[y1:y2, x1:x2][:, ::-1]
        row = lab[j].copy()
        row[1] = (nx1 + nx2) / 2 / w
        if row.shape[0] >= 6:
            row[5] = -1
        occupied.append(cand[None])
        new_rows.append(row)
    if new_rows:
        lab = np.concatenate([lab, np.stack(new_rows)], 0)
    return img, lab


# ---------------------------------------------------------------------------
# Photometric transforms — the reference's Albumentations block
# (`ultralytics/data/augment.py:648-668`: Blur p=.01, MedianBlur p=.01,
# ToGray p=.01, CLAHE p=.01, RandomBrightnessContrast p=0, RandomGamma p=0,
# ImageCompression p=0), re-implemented in numpy/PIL since the package does
# not exist in this image. Label-free (photometric only), so they slot in
# ahead of the geometric chain exactly like the reference composition
# (`v8_transforms`, augment.py:803).
# ---------------------------------------------------------------------------

def blur(img: np.ndarray, k: int = 5) -> np.ndarray:
    """Box blur with an odd kernel (A.Blur semantics)."""
    from PIL import ImageFilter
    return np.asarray(Image.fromarray(img).filter(
        ImageFilter.BoxBlur((k - 1) // 2)))


def median_blur(img: np.ndarray, k: int = 5) -> np.ndarray:
    from PIL import ImageFilter
    return np.asarray(Image.fromarray(img).filter(
        ImageFilter.MedianFilter(size=k)))


def to_gray(img: np.ndarray) -> np.ndarray:
    g = np.asarray(Image.fromarray(img).convert("L"))
    return np.repeat(g[..., None], 3, axis=2)


def clahe(img: np.ndarray, clip_limit: float = 4.0,
          tiles: int = 8) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization on the luma channel
    (A.CLAHE defaults: clip_limit 4.0, 8x8 tile grid): per-tile clipped
    histogram -> CDF mapping, bilinearly interpolated between tile centers
    (the standard CLAHE recipe cv2 implements)."""
    ycc = np.asarray(Image.fromarray(img).convert("YCbCr"), np.float32)
    y = ycc[..., 0].astype(np.uint8)
    h, w = y.shape
    th, tw = max(h // tiles, 1), max(w // tiles, 1)
    ny, nx = (h + th - 1) // th, (w + tw - 1) // tw
    # per-tile clipped-CDF LUTs [ny, nx, 256]
    luts = np.empty((ny, nx, 256), np.float32)
    clip_at = max(clip_limit * th * tw / 256.0, 1.0)
    for i in range(ny):
        for j in range(nx):
            tile = y[i * th:(i + 1) * th, j * tw:(j + 1) * tw]
            hist = np.bincount(tile.ravel(), minlength=256).astype(np.float32)
            excess = np.clip(hist - clip_at, 0, None).sum()
            hist = np.minimum(hist, clip_at) + excess / 256.0
            cdf = hist.cumsum()
            cdf = cdf / max(cdf[-1], 1e-9) * 255.0
            luts[i, j] = cdf
    # bilinear interpolation between the four surrounding tile mappings
    yy = (np.arange(h, dtype=np.float32) - th / 2) / th
    xx = (np.arange(w, dtype=np.float32) - tw / 2) / tw
    y0 = np.clip(np.floor(yy).astype(int), 0, ny - 1)
    x0 = np.clip(np.floor(xx).astype(int), 0, nx - 1)
    y1 = np.minimum(y0 + 1, ny - 1)
    x1 = np.minimum(x0 + 1, nx - 1)
    fy = np.clip(yy - y0, 0, 1)[:, None]
    fx = np.clip(xx - x0, 0, 1)[None, :]
    v = y.astype(int)
    g00 = luts[y0[:, None], x0[None, :], v]
    g01 = luts[y0[:, None], x1[None, :], v]
    g10 = luts[y1[:, None], x0[None, :], v]
    g11 = luts[y1[:, None], x1[None, :], v]
    out_y = (g00 * (1 - fy) * (1 - fx) + g01 * (1 - fy) * fx +
             g10 * fy * (1 - fx) + g11 * fy * fx)
    ycc[..., 0] = np.clip(out_y, 0, 255)
    return np.asarray(Image.fromarray(ycc.astype(np.uint8), "YCbCr")
                      .convert("RGB"))


def brightness_contrast(img: np.ndarray, brightness: float,
                        contrast: float) -> np.ndarray:
    """A.RandomBrightnessContrast: x*(1+contrast) + brightness*255."""
    x = img.astype(np.float32) * (1.0 + contrast) + brightness * 255.0
    return np.clip(x, 0, 255).astype(np.uint8)


def gamma(img: np.ndarray, g: float) -> np.ndarray:
    lut = (np.linspace(0, 1, 256) ** g * 255.0).astype(np.uint8)
    return lut[img]


def jpeg_compression(img: np.ndarray, quality: int) -> np.ndarray:
    import io
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=int(quality))
    return np.asarray(Image.open(buf).convert("RGB"))


@dataclasses.dataclass
class Photometrics:
    """The reference Albumentations composition with its shipped
    probabilities; each transform fires independently. `sample(rng)`
    freezes one draw (clip coherence), `apply` runs it on a frame."""

    blur_p: float = 0.01
    median_p: float = 0.01
    gray_p: float = 0.01
    clahe_p: float = 0.01
    bc_p: float = 0.0          # RandomBrightnessContrast (reference p=0)
    gamma_p: float = 0.0       # RandomGamma (reference p=0)
    compression_p: float = 0.0  # ImageCompression (reference p=0)

    def sample(self, rng: np.random.Generator) -> dict:
        return {
            "blur_k": int(rng.choice([3, 5, 7]))
            if rng.random() < self.blur_p else 0,
            "median_k": int(rng.choice([3, 5]))
            if rng.random() < self.median_p else 0,
            "gray": rng.random() < self.gray_p,
            "clahe": rng.random() < self.clahe_p,
            "bc": (float(rng.uniform(-0.2, 0.2)),
                   float(rng.uniform(-0.2, 0.2)))
            if rng.random() < self.bc_p else None,
            "gamma": float(rng.uniform(0.8, 1.2))
            if rng.random() < self.gamma_p else None,
            "jpeg_q": int(rng.integers(75, 101))
            if rng.random() < self.compression_p else 0,
        }

    @staticmethod
    def apply(img: np.ndarray, d: dict) -> np.ndarray:
        if d["blur_k"]:
            img = blur(img, d["blur_k"])
        if d["median_k"]:
            img = median_blur(img, d["median_k"])
        if d["gray"]:
            img = to_gray(img)
        if d["clahe"]:
            img = clahe(img)
        if d["bc"] is not None:
            img = brightness_contrast(img, *d["bc"])
        if d["gamma"] is not None:
            img = gamma(img, d["gamma"])
        if d["jpeg_q"]:
            img = jpeg_compression(img, d["jpeg_q"])
        return img


@dataclasses.dataclass
class ClipAugmenter:
    """Per-clip frozen augmentation for video training: geometric params are
    sampled once per clip and reused on every frame (ids stay coherent)."""

    hsv: bool = True
    hsv_h: float = 0.015   # gain magnitudes (reference hsv_h/hsv_s/hsv_v)
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    fliplr_p: float = 0.5
    flipud_p: float = 0.0
    degrees: float = 0.0
    translate: float = 0.05
    scale: float = 0.2
    shear: float = 0.0
    perspective: float = 0.0
    seed: int = 0
    # reference pipeline order: Albumentations(p=1) runs before HSV/flips
    # (`v8_transforms`, reference augment.py:803); frozen per clip here
    photometrics: Optional[Photometrics] = dataclasses.field(
        default_factory=Photometrics)

    def begin_clip(self, clip_index: int):
        self._rng = np.random.default_rng(self.seed * 100003 + clip_index)
        self._photo = (self.photometrics.sample(self._rng)
                       if self.photometrics is not None else None)
        self._flip = self._rng.uniform() < self.fliplr_p
        self._flipud = self._rng.uniform() < self.flipud_p
        self._affine_params = None
        self._hsv_rng_state = self._rng.integers(0, 2 ** 31)

    def __call__(self, img: np.ndarray, lab: np.ndarray):
        rng = np.random.default_rng(self._hsv_rng_state)
        if self._photo is not None:
            img = Photometrics.apply(img, self._photo)
        if self.hsv and (self.hsv_h or self.hsv_s or self.hsv_v):
            img = random_hsv(img, rng, hgain=self.hsv_h,
                             sgain=self.hsv_s, vgain=self.hsv_v)
        if self._flip:
            img, lab = random_flip_lr(img, lab)
        if self._flipud:
            img, lab = random_flip_ud(img, lab)
        img, lab, self._affine_params = random_affine(
            img, lab, self._rng, degrees=self.degrees,
            translate=self.translate, scale=self.scale,
            shear=self.shear, perspective=self.perspective,
            params=self._affine_params)
        return img, lab
