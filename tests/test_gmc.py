"""GMC similarity-transform estimation tests (round-4 VERDICT item #9).

Recovers a KNOWN synthetic rotation+scale+translation warp from textured
frames — the capability the reference's sparseOptFlow+
estimateAffinePartial2D pipeline provides (`trackers/utils/gmc.py:11-80`)
and the previous translation-only phase correlation could not.
"""

from __future__ import annotations

import numpy as np
import pytest

from mo_yolo_tpu.trackers.byte_tracker import BOTSORT
from mo_yolo_tpu.trackers.gmc import (
    GMC, lk_flow, ransac_similarity, shi_tomasi_corners)


def _texture(rng, h, w):
    """Smooth random texture with strong corners (blurred noise + blobs)."""
    img = rng.uniform(0, 64, (h, w)).astype(np.float32)
    for _ in range(3):  # cheap separable smoothing
        img = (np.roll(img, 1, 0) + img + np.roll(img, -1, 0)) / 3.0
        img = (np.roll(img, 1, 1) + img + np.roll(img, -1, 1)) / 3.0
    for _ in range(60):  # bright square blobs -> trackable corners
        y = rng.integers(8, h - 16)
        x = rng.integers(8, w - 16)
        s = rng.integers(4, 10)
        img[y:y + s, x:x + s] += rng.uniform(80, 160)
    return np.clip(img, 0, 255)


def _warp_image(img, H):
    """Inverse-warp: out(p) = img(H^-1 p) with bilinear sampling."""
    h, w = img.shape
    A = np.vstack([H, [0, 0, 1]])
    Ainv = np.linalg.inv(A)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    sx = Ainv[0, 0] * xs + Ainv[0, 1] * ys + Ainv[0, 2]
    sy = Ainv[1, 0] * xs + Ainv[1, 1] * ys + Ainv[1, 2]
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
    tx = np.clip(sx - x0, 0, 1)
    ty = np.clip(sy - y0, 0, 1)
    out = ((1 - ty) * ((1 - tx) * img[y0, x0] + tx * img[y0, x0 + 1]) +
           ty * ((1 - tx) * img[y0 + 1, x0] + tx * img[y0 + 1, x0 + 1]))
    return out.astype(np.float32)


def _similarity(deg, scale, tx, ty):
    c = scale * np.cos(np.radians(deg))
    s = scale * np.sin(np.radians(deg))
    return np.array([[c, -s, tx], [s, c, ty]])


def test_corners_found_on_texture():
    rng = np.random.default_rng(0)
    img = _texture(rng, 240, 320)
    pts = shi_tomasi_corners(img, max_corners=150)
    assert len(pts) >= 50
    # respect the border mask
    assert pts[:, 0].min() >= 0.02 * 320
    assert pts[:, 1].min() >= 0.02 * 240


def test_lk_recovers_pure_translation():
    rng = np.random.default_rng(1)
    img = _texture(rng, 240, 320)
    H = _similarity(0.0, 1.0, 3.0, -2.0)
    img2 = _warp_image(img, H)
    pts = shi_tomasi_corners(img, max_corners=100)
    new_pts, ok = lk_flow(img, img2, pts)
    assert ok.sum() >= 30
    d = (new_pts - pts)[ok]
    med = np.median(d, axis=0)
    np.testing.assert_allclose(med, [3.0, -2.0], atol=0.35)


def test_ransac_similarity_exact_with_outliers():
    rng = np.random.default_rng(2)
    H = _similarity(7.0, 1.05, 4.0, -3.0)
    p = rng.uniform(20, 280, (60, 2))
    q = p @ H[:2, :2].T + H[:, 2]
    # 25% gross outliers
    q[::4] += rng.uniform(20, 60, (15, 2))
    Hs, inl = ransac_similarity(p, q, iters=200, thresh=1.0)
    np.testing.assert_allclose(Hs, H, atol=1e-6)
    assert inl.sum() == 45


@pytest.mark.parametrize("deg,scale,tx,ty", [
    (2.0, 1.0, 5.0, -4.0),           # rotation + translation
    (-1.5, 1.03, -6.0, 3.0),         # rotation + zoom + translation
    (0.0, 1.0, 11.0, 7.0),           # large pure translation
])
def test_gmc_recovers_known_warp(deg, scale, tx, ty):
    rng = np.random.default_rng(3)
    img = _texture(rng, 300, 400)
    H = _similarity(deg, scale, tx, ty)
    img2 = _warp_image(img, H)

    gmc = GMC(downscale=1)
    H0 = gmc.apply(img)
    np.testing.assert_allclose(H0, np.eye(2, 3))          # first frame
    Hest = gmc.apply(img2)
    np.testing.assert_allclose(Hest[:2, :2], H[:2, :2], atol=0.01)
    np.testing.assert_allclose(Hest[:, 2], H[:, 2], atol=1.2)


def test_gmc_downscale_translation_units():
    """Warp estimated on the downscaled frame must come back in full-res
    pixels."""
    rng = np.random.default_rng(4)
    img = _texture(rng, 300, 400)
    H = _similarity(0.0, 1.0, 8.0, -6.0)
    img2 = _warp_image(img, H)
    gmc = GMC(downscale=2)
    gmc.apply(img)
    Hest = gmc.apply(img2)
    np.testing.assert_allclose(Hest[:, 2], [8.0, -6.0], atol=2.0)


def test_botsort_tracks_through_camera_rotation():
    """Rotating camera: static objects sweep across the image; BOTSORT
    with affine GMC must keep their IDs stable (the translation-only
    fallback would mispredict the outer object's arc)."""
    rng = np.random.default_rng(5)
    h, w = 320, 320
    base = _texture(rng, h, w)
    # two static "objects" in world space, one near the rotation center,
    # one far (large arc per frame under rotation)
    world_boxes = np.array([
        [150.0, 150.0, 180.0, 180.0],
        [40.0, 150.0, 70.0, 185.0],
    ])
    tracker = BOTSORT()
    ids_per_frame = []
    total_rot = 0.0
    for t in range(8):
        deg = 2.2 * t
        H = _similarity(deg, 1.0, 0.0, 0.0)
        # rotate around image center, not origin
        c = np.array([w / 2, h / 2])
        H[:, 2] = c - H[:2, :2] @ c
        frame = _warp_image(base, H)
        boxes = []
        for bx in world_boxes:
            p1 = H[:2, :2] @ bx[:2] + H[:, 2]
            p2 = H[:2, :2] @ bx[2:] + H[:, 2]
            lo = np.minimum(p1, p2)
            hi = np.maximum(p1, p2)
            boxes.append([lo[0], lo[1], hi[0], hi[1], 0.9, 0])
        out = tracker.update(np.array(boxes), img=np.stack([frame] * 3, -1))
        if len(out):
            ids_per_frame.append(set(out[:, 4].astype(int)))
        total_rot = deg
    assert total_rot > 10
    # after confirmation (frame 1), the same two IDs persist to the end
    assert ids_per_frame[-1] == ids_per_frame[1]
    assert len(ids_per_frame[-1]) == 2
