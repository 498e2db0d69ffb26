"""Camera/global motion compensation (GMC) — similarity-transform
estimation from sparse feature flow.

Numpy re-design of the reference's `trackers/utils/gmc.py:11-80`
`sparseOptFlow` pipeline (cv2.goodFeaturesToTrack ->
cv2.calcOpticalFlowPyrLK -> cv2.estimateAffinePartial2D(RANSAC)):

  1. Shi-Tomasi corners (min eigenvalue of the box-filtered structure
     tensor, grid non-max suppression) on the downscaled grayscale frame,
     borders masked like the reference's 2% frame margin;
  2. pyramidal iterative Lucas-Kanade flow for each corner (vectorized
     over corners — one gather per iteration, no per-corner python loop);
  3. RANSAC similarity fit (2-point minimal solve, inlier consensus,
     least-squares refit on inliers) — the same 4-DOF scale+rotation+
     translation model `estimateAffinePartial2D` fits.

Falls back to FFT phase correlation (translation-only) when too few
corners track — e.g. featureless frames — so `apply` always returns a
2x3 warp. All coordinates are in FULL-RESOLUTION pixels.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _grayscale(img: np.ndarray) -> np.ndarray:
    g = img.mean(axis=2) if img.ndim == 3 else img
    return g.astype(np.float32)


def _box_filter(x: np.ndarray, r: int) -> np.ndarray:
    """(2r+1)^2 box sum via integral image."""
    ii = np.zeros((x.shape[0] + 1, x.shape[1] + 1), np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(x, 0), 1)
    h, w = x.shape
    y0 = np.clip(np.arange(h) - r, 0, h)
    y1 = np.clip(np.arange(h) + r + 1, 0, h)
    x0 = np.clip(np.arange(w) - r, 0, w)
    x1 = np.clip(np.arange(w) + r + 1, 0, w)
    return (ii[y1][:, x1] - ii[y1][:, x0] - ii[y0][:, x1] + ii[y0][:, x0])


def shi_tomasi_corners(g: np.ndarray, max_corners: int = 200,
                       quality: float = 0.01, min_dist: int = 8,
                       border: float = 0.02) -> np.ndarray:
    """Corner detection: returns [n, 2] (x, y) float coordinates.

    Reference analog: `cv2.goodFeaturesToTrack(maxCorners=1000,
    qualityLevel=0.01, minDistance=1)` at `gmc.py:37-43`; the 2% border
    mask mirrors `applySparseOptFlow`'s keypoint mask.
    """
    gy, gx = np.gradient(g)
    ixx = _box_filter(gx * gx, 1)
    iyy = _box_filter(gy * gy, 1)
    ixy = _box_filter(gx * gy, 1)
    tr = ixx + iyy
    det_root = np.sqrt((ixx - iyy) ** 2 + 4.0 * ixy ** 2)
    lam_min = 0.5 * (tr - det_root)

    h, w = g.shape
    by, bx = int(border * h) + 2, int(border * w) + 2
    mask = np.zeros_like(lam_min, bool)
    mask[by:h - by, bx:w - bx] = True
    lam_min = np.where(mask, lam_min, 0.0)
    thresh = quality * lam_min.max()
    if thresh <= 0:
        return np.zeros((0, 2), np.float32)

    # grid NMS: strongest response per (min_dist x min_dist) cell
    gh, gw = -(-h // min_dist), -(-w // min_dist)
    cell = ((np.arange(h)[:, None] // min_dist) * gw +
            (np.arange(w)[None, :] // min_dist))
    flat = lam_min.ravel()
    order = np.argsort(flat)          # ascending; later wins in put
    best = np.zeros(gh * gw, np.int64)
    np.put(best, cell.ravel()[order], order)
    cand = best[flat[best] >= thresh]
    if len(cand) > max_corners:
        cand = cand[np.argsort(flat[cand])[::-1][:max_corners]]
    ys, xs = np.unravel_index(cand, g.shape)
    return np.stack([xs, ys], 1).astype(np.float32)


def _bilinear(g: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Sample g at float coords (same shapes); clamps to the border."""
    h, w = g.shape
    xs = np.clip(xs, 0.0, w - 1.001)
    ys = np.clip(ys, 0.0, h - 1.001)
    x0 = xs.astype(np.int32)
    y0 = ys.astype(np.int32)
    tx = xs - x0
    ty = ys - y0
    v00 = g[y0, x0]
    v01 = g[y0, x0 + 1]
    v10 = g[y0 + 1, x0]
    v11 = g[y0 + 1, x0 + 1]
    return ((1 - ty) * ((1 - tx) * v00 + tx * v01) +
            ty * ((1 - tx) * v10 + tx * v11))


def _pyr_down(g: np.ndarray) -> np.ndarray:
    h, w = (g.shape[0] // 2) * 2, (g.shape[1] // 2) * 2
    g = g[:h, :w]
    return 0.25 * (g[0::2, 0::2] + g[0::2, 1::2] + g[1::2, 0::2] +
                   g[1::2, 1::2])


def lk_flow(prev: np.ndarray, cur: np.ndarray, pts: np.ndarray,
            win: int = 7, iters: int = 8, levels: int = 3
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Pyramidal Lucas-Kanade: track `pts` [n,2] from prev to cur.

    Returns (new_pts [n,2], ok [n] bool). Vectorized over corners: the
    per-iteration work is one bilinear gather of all n patches.
    Reference analog: `cv2.calcOpticalFlowPyrLK` at `gmc.py:233`.
    """
    n = len(pts)
    if n == 0:
        return pts.copy(), np.zeros(0, bool)
    pyr_p, pyr_c = [prev], [cur]
    for _ in range(levels - 1):
        pyr_p.append(_pyr_down(pyr_p[-1]))
        pyr_c.append(_pyr_down(pyr_c[-1]))

    off = np.arange(-win, win + 1, dtype=np.float32)
    oy, ox = np.meshgrid(off, off, indexing="ij")
    ox = ox.ravel()[None, :]          # [1, K]
    oy = oy.ravel()[None, :]

    d = np.zeros((n, 2), np.float32)  # displacement at full resolution
    for lv in range(levels - 1, -1, -1):
        sc = 2.0 ** lv
        gp, gc = pyr_p[lv], pyr_c[lv]
        p = pts / sc                                    # [n, 2]
        px = p[:, 0:1] + ox                             # [n, K]
        py = p[:, 1:2] + oy
        t = _bilinear(gp, px, py)                       # template patches
        gxp = 0.5 * (_bilinear(gp, px + 1, py) - _bilinear(gp, px - 1, py))
        gyp = 0.5 * (_bilinear(gp, px, py + 1) - _bilinear(gp, px, py - 1))
        g11 = (gxp * gxp).sum(1)
        g12 = (gxp * gyp).sum(1)
        g22 = (gyp * gyp).sum(1)
        det = g11 * g22 - g12 * g12
        ok_g = det > 1e-6
        det = np.where(ok_g, det, 1.0)
        dl = d / sc
        for _ in range(iters):
            e = _bilinear(gc, px + dl[:, 0:1], py + dl[:, 1:2]) - t
            b1 = (gxp * e).sum(1)
            b2 = (gyp * e).sum(1)
            dl[:, 0] -= np.where(ok_g, (g22 * b1 - g12 * b2) / det, 0.0)
            dl[:, 1] -= np.where(ok_g, (g11 * b2 - g12 * b1) / det, 0.0)
        d = dl * sc

    new_pts = pts + d
    # validity: well-conditioned gradient, in-bounds, residual below the
    # patch contrast (rejects occluded / divergent tracks)
    px = pts[:, 0:1] + ox
    py = pts[:, 1:2] + oy
    t0 = _bilinear(prev, px, py)
    res = _bilinear(cur, px + d[:, 0:1], py + d[:, 1:2]) - t0
    contrast = t0.std(1) + 1e-3
    ok = (ok_g & (res.std(1) < 0.8 * contrast + 2.0) &
          (new_pts[:, 0] > 0) & (new_pts[:, 0] < cur.shape[1] - 1) &
          (new_pts[:, 1] > 0) & (new_pts[:, 1] < cur.shape[0] - 1))
    return new_pts, ok


def _fit_similarity(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Least-squares 4-DOF similarity q ~= sR p + t -> 2x3 matrix.

    Linear in (a, b, tx, ty) with sR = [[a, -b], [b, a]].
    """
    n = len(p)
    A = np.zeros((2 * n, 4))
    A[0::2, 0] = p[:, 0]
    A[0::2, 1] = -p[:, 1]
    A[0::2, 2] = 1.0
    A[1::2, 0] = p[:, 1]
    A[1::2, 1] = p[:, 0]
    A[1::2, 3] = 1.0
    rhs = q.reshape(-1)
    sol, *_ = np.linalg.lstsq(A, rhs, rcond=None)
    a, b, tx, ty = sol
    return np.array([[a, -b, tx], [b, a, ty]])


def ransac_similarity(p: np.ndarray, q: np.ndarray, iters: int = 100,
                      thresh: float = 3.0, seed: int = 0
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """RANSAC similarity fit; returns (2x3 warp, inlier mask).

    Reference analog: `cv2.estimateAffinePartial2D(prev, curr,
    cv2.RANSAC)` at `gmc.py:232-236`.
    """
    n = len(p)
    if n < 2:
        return np.eye(2, 3), np.zeros(n, bool)
    rng = np.random.default_rng(seed)
    best_mask = np.zeros(n, bool)
    for _ in range(iters):
        i, j = rng.choice(n, 2, replace=False)
        dp = p[j] - p[i]
        dq = q[j] - q[i]
        den = dp @ dp
        if den < 1e-9:
            continue
        # exact 2-point similarity: complex division q_vec / p_vec
        a = (dp[0] * dq[0] + dp[1] * dq[1]) / den
        b = (dp[0] * dq[1] - dp[1] * dq[0]) / den
        t = q[i] - np.array([a * p[i, 0] - b * p[i, 1],
                             b * p[i, 0] + a * p[i, 1]])
        pred = np.stack([a * p[:, 0] - b * p[:, 1] + t[0],
                         b * p[:, 0] + a * p[:, 1] + t[1]], 1)
        mask = np.linalg.norm(pred - q, axis=1) < thresh
        if mask.sum() > best_mask.sum():
            best_mask = mask
    if best_mask.sum() < 2:
        return np.eye(2, 3), best_mask
    return _fit_similarity(p[best_mask], q[best_mask]), best_mask


def phase_correlation(prev: np.ndarray, cur: np.ndarray) -> np.ndarray:
    """Translation-only fallback: (dx, dy) moving prev -> cur."""
    f1 = np.fft.rfft2(prev)
    f2 = np.fft.rfft2(cur)
    cross = f1 * np.conj(f2)
    cross /= np.abs(cross) + 1e-9
    corr = np.fft.irfft2(cross, s=prev.shape)
    dy, dx = np.unravel_index(np.argmax(corr), corr.shape)
    h, w = corr.shape
    if dy > h // 2:
        dy -= h
    if dx > w // 2:
        dx -= w
    return -np.array([dx, dy], float)


class GMC:
    """Per-stream camera-motion estimator.

    `apply(img)` returns a 2x3 similarity warp H mapping PREVIOUS-frame
    pixel coordinates to CURRENT-frame coordinates (the convention of the
    reference's `estimateAffinePartial2D(prevPoints, currPoints)`), at
    full image resolution. First frame returns identity.
    """

    def __init__(self, downscale: int = 2, max_corners: int = 200,
                 min_track: int = 10):
        self.downscale = max(1, int(downscale))
        self.max_corners = max_corners
        self.min_track = min_track
        self._prev: Optional[np.ndarray] = None
        self._prev_pts: Optional[np.ndarray] = None

    def reset(self):
        self._prev = None
        self._prev_pts = None

    def apply(self, img: np.ndarray) -> np.ndarray:
        s = self.downscale
        g = _grayscale(img)[::s, ::s]
        if self._prev is None or self._prev.shape != g.shape:
            self._prev = g
            self._prev_pts = shi_tomasi_corners(g, self.max_corners)
            return np.eye(2, 3)

        H = np.eye(2, 3)
        pts = self._prev_pts
        if pts is not None and len(pts) >= self.min_track:
            new_pts, ok = lk_flow(self._prev, g, pts)
            if ok.sum() >= self.min_track:
                Hs, inl = ransac_similarity(pts[ok], new_pts[ok])
                if inl.sum() >= self.min_track:
                    H = Hs.copy()
                    H[:, 2] *= s          # translation back to full res
        if np.allclose(H, np.eye(2, 3)):
            d = phase_correlation(self._prev, g) * s
            H = np.eye(2, 3)
            H[:, 2] = d
        self._prev = g
        self._prev_pts = shi_tomasi_corners(g, self.max_corners)
        return H
