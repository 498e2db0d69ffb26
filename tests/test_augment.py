"""Augmentation unit tests: geometry preserved, track ids preserved,
clip-frozen parameters."""

import numpy as np

from mo_yolo_tpu.data.augment import (
    ClipAugmenter, mixup, mosaic4, random_affine, random_flip_lr, random_hsv,
)


def _img(h=96, w=128, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), np.uint8)


def _lab():
    # cls cx cy w h tid
    return np.array([[0, 0.3, 0.4, 0.2, 0.2, 7],
                     [1, 0.7, 0.6, 0.1, 0.3, 9]], np.float32)


def test_flip_lr():
    img, lab = random_flip_lr(_img(), _lab())
    assert abs(lab[0, 1] - 0.7) < 1e-6
    assert lab[0, 5] == 7 and lab[1, 5] == 9  # ids preserved


def test_hsv_preserves_shape_and_range():
    rng = np.random.default_rng(0)
    out = random_hsv(_img(), rng)
    assert out.shape == (96, 128, 3) and out.dtype == np.uint8


def test_affine_identity_when_zero():
    rng = np.random.default_rng(0)
    img, lab, p = random_affine(_img(), _lab(), rng, degrees=0, translate=0,
                                scale=0, shear=0)
    np.testing.assert_allclose(lab[:, 1:5], _lab()[:, 1:5], atol=0.02)
    assert (lab[:, 5] == [7, 9]).all()


def test_affine_params_reusable_across_frames():
    rng = np.random.default_rng(1)
    img1, lab1, p = random_affine(_img(), _lab(), rng, translate=0.2, scale=0.3)
    img2, lab2, _ = random_affine(_img(seed=2), _lab(), rng, translate=0.2,
                                  scale=0.3, params=p)
    # same warp -> same label geometry
    np.testing.assert_allclose(lab1[:, 1:5], lab2[:, 1:5], atol=1e-6)


def test_mosaic4_output_and_ids():
    rng = np.random.default_rng(0)
    imgs = [_img(seed=i) for i in range(4)]
    labs = [_lab() for _ in range(4)]
    out, lab = mosaic4(imgs, labs, rng, size=128)
    assert out.shape == (128, 128, 3)
    if len(lab):
        assert set(np.unique(lab[:, 5])) <= {7.0, 9.0}
        assert (lab[:, 1:5] >= 0).all() and (lab[:, 1:5] <= 1).all()


def test_mixup_concats_labels():
    rng = np.random.default_rng(0)
    img, lab = mixup(_img(seed=0), _lab(), _img(seed=1), _lab(), rng)
    assert img.shape == (96, 128, 3)
    assert len(lab) == 4


def test_clip_augmenter_consistent_within_clip():
    aug = ClipAugmenter(hsv=False, fliplr_p=1.0, translate=0.1, scale=0.2)
    aug.begin_clip(3)
    _, lab1 = aug(_img(seed=1), _lab())
    _, lab2 = aug(_img(seed=2), _lab())
    np.testing.assert_allclose(lab1[:, 1:5], lab2[:, 1:5], atol=1e-6)
    aug.begin_clip(4)
    _, lab3 = aug(_img(seed=1), _lab())
    assert not np.allclose(lab1[:, 1:5], lab3[:, 1:5])


def test_dataset_applies_clip_frozen_augmentation(tmp_path):
    """Train-path integration (VERDICT round-1 #5): TrackDataset with a
    ClipAugmenter must (a) actually augment pixels+labels, (b) freeze the
    geometry across all frames of a clip so track ids stay coherent, and
    (c) leave the validation path (no clip_index) untouched."""
    from PIL import Image
    from mo_yolo_tpu.data.dataset import TrackDataset

    img_dir = tmp_path / "images" / "seq01"
    lab_dir = tmp_path / "labels" / "seq01"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    files = []
    img = _img(96, 96, seed=0)
    for t in range(2):  # identical frames + identical labels
        p = img_dir / f"{t:06d}.png"
        Image.fromarray(img).save(p)
        (lab_dir / f"{t:06d}.txt").write_text(
            "0 0.400 0.400 0.200 0.200 7\n1 0.700 0.600 0.150 0.250 9\n")
        files.append(str(p))

    aug = ClipAugmenter(hsv=True, fliplr_p=1.0, translate=0.1, scale=0.3,
                        seed=0)
    ds = TrackDataset(files, imgsz=96, max_gt=4, clip_len=2, augmenter=aug)
    plain = ds.load_clip(ds.clips[0])                 # no clip_index: no aug
    auged = ds.load_clip(ds.clips[0], clip_index=11)

    # (a) augmentation applied: geometry moved vs plain load
    assert not np.allclose(plain["gt_boxes"][0], auged["gt_boxes"][0])
    assert not np.allclose(plain["images"][0], auged["images"][0])
    # (b) frozen per clip: identical input frames -> identical augmented
    # geometry and images on every frame, ids preserved in order
    np.testing.assert_allclose(auged["gt_boxes"][0], auged["gt_boxes"][1],
                               atol=1e-6)
    np.testing.assert_array_equal(auged["gt_track_id"][0],
                                  auged["gt_track_id"][1])
    kept = auged["gt_mask"][0]
    assert set(auged["gt_track_id"][0][kept]) <= {7, 9}
    # different clip_index -> different geometry
    auged2 = ds.load_clip(ds.clips[0], clip_index=12)
    assert not np.allclose(auged["gt_boxes"][0], auged2["gt_boxes"][0])


def test_flipud():
    import pytest

    from mo_yolo_tpu.data.augment import ClipAugmenter, random_flip_ud

    img = np.zeros((32, 32, 3), np.uint8)
    img[0, :] = 255
    lab = np.array([[0, 0.5, 0.25, 0.2, 0.2, 3]], np.float32)
    out, l2 = random_flip_ud(img, lab)
    assert (out[-1] == 255).all() and (out[0] == 0).all()
    assert l2[0, 2] == pytest.approx(0.75)
    assert l2[0, 5] == 3           # track id preserved
    aug = ClipAugmenter(hsv=False, fliplr_p=0.0, flipud_p=1.0,
                        degrees=0.0, translate=0.0, scale=0.0, seed=0)
    aug.begin_clip(0)
    o1, m1 = aug(img, lab)
    assert m1[0, 2] == pytest.approx(0.75)


def test_dataset_mosaic_mixup_path(tmp_path):
    """Mosaic/MixUp reach training through TrackDataset(mosaic_p/mixup_p)
    (reference v8_transforms; wired by the detect trainer, OFF for clip
    tracking). Deterministic per (aug_seed, index)."""
    from PIL import Image

    from mo_yolo_tpu.data.dataset import TrackDataset

    files = []
    for i in range(4):
        img = np.full((64, 64, 3), 40 * (i + 1), np.uint8)
        img[8:24, 8:24] = 255
        p = tmp_path / f"seq00/{i:06d}.jpg"
        p.parent.mkdir(exist_ok=True)
        Image.fromarray(img).save(p)
        lp = tmp_path / f"seq00/{i:06d}.txt"
        lp.write_text(f"0 0.25 0.25 0.25 0.25 {i}\n")
        files.append(str(p))
    # labels live beside images here; dataset expects labels/ mapping —
    # use img2label_path convention
    ds = TrackDataset(files, imgsz=64, max_gt=8, clip_len=1,
                      mosaic_p=1.0, mixup_p=0.0, aug_seed=3)
    s_plain = ds.load_frame(0, augment=False)
    s_mosaic = ds.load_frame(0, augment=True)
    assert not np.allclose(s_plain.image, s_mosaic.image)
    # deterministic
    s_mosaic2 = ds.load_frame(0, augment=True)
    np.testing.assert_array_equal(s_mosaic.image, s_mosaic2.image)
    # close_mosaic semantics: zeroing the prob restores the plain path
    ds.mosaic_p = 0.0
    s_off = ds.load_frame(0, augment=True)
    np.testing.assert_array_equal(s_off.image, s_plain.image)


def test_copy_paste_box_level():
    """copy_paste duplicates objects at the mirrored-x location under the
    IoA<0.3 gate (reference CopyPaste semantics on box crops); pasted
    labels get track_id -1; crowded mirrors are rejected."""
    from mo_yolo_tpu.data.augment import copy_paste

    img = np.full((64, 64, 3), 30, np.uint8)
    img[24:40, 4:20] = 200        # object at x [4,20)
    lab = np.array([[0, 12 / 64, 32 / 64, 16 / 64, 16 / 64, 7]], np.float32)
    rng = np.random.default_rng(0)
    out, lab2 = copy_paste(img, lab, rng, p=1.0)
    assert len(lab2) == 2
    # mirrored x-center: w - cx
    assert abs(lab2[1, 1] - (1 - 12 / 64)) < 1e-6
    assert lab2[1, 5] == -1 and lab2[1, 0] == lab[0, 0]
    # pixels actually pasted (mirrored columns 44..60)
    assert out[32, 52, 0] == 200
    # occupied mirror location -> rejected
    img2 = img.copy()
    lab_c = np.array([[0, 0.5, 0.5, 0.9, 0.5, 1]], np.float32)
    _, lab3 = copy_paste(img2, lab_c, rng, p=1.0)
    assert len(lab3) == 1          # mirror overlaps itself, IoA ~ 1


def test_affine_perspective_moves_boxes_consistently():
    """perspective>0 engages the homography path: image warps, labels
    follow the projective corner transform, params re-apply bitwise."""
    from mo_yolo_tpu.data.augment import random_affine

    img = np.full((64, 64, 3), 50, np.uint8)
    img[16:48, 16:48] = 220
    lab = np.array([[0, 0.5, 0.5, 0.5, 0.5, 3]], np.float32)
    rng = np.random.default_rng(1)
    out, lab2, params = random_affine(img, lab, rng, perspective=0.002)
    assert abs(params["px"]) > 0 or abs(params["py"]) > 0
    assert len(lab2) == 1
    assert not np.array_equal(out, img)
    # frozen params reproduce the identical warp (clip coherence)
    out2, lab3, _ = random_affine(img, lab, rng, perspective=0.002,
                                  params=params)
    np.testing.assert_array_equal(out, out2)
    np.testing.assert_allclose(lab2, lab3, atol=1e-7)


def test_hsv_gains_scale_jitter():
    """hsv_h/hsv_s/hsv_v are continuous magnitudes (regression: hsv_v was
    consumed as a bool, so the tuner's sampled value had no effect)."""
    from mo_yolo_tpu.data.augment import ClipAugmenter

    img = _img(48, 48, seed=4)
    lab = _lab()
    base = ClipAugmenter(hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, fliplr_p=0.0,
                         flipud_p=0.0, degrees=0.0, translate=0.0,
                         scale=0.0, seed=0)
    big = ClipAugmenter(hsv_h=0.0, hsv_s=0.0, hsv_v=0.9, fliplr_p=0.0,
                        flipud_p=0.0, degrees=0.0, translate=0.0,
                        scale=0.0, seed=0)
    small = ClipAugmenter(hsv_h=0.0, hsv_s=0.0, hsv_v=0.05, fliplr_p=0.0,
                          flipud_p=0.0, degrees=0.0, translate=0.0,
                          scale=0.0, seed=0)
    for a in (base, big, small):
        a.begin_clip(7)
    o0, _ = base(img.copy(), lab.copy())
    ob, _ = big(img.copy(), lab.copy())
    os_, _ = small(img.copy(), lab.copy())
    np.testing.assert_array_equal(o0, img)   # zero gains: no-op
    d_big = np.abs(ob.astype(int) - img.astype(int)).mean()
    d_small = np.abs(os_.astype(int) - img.astype(int)).mean()
    assert d_big > d_small, (d_big, d_small)  # magnitude actually matters


def test_mosaic_varies_across_epochs(tmp_path):
    """aug_index (epoch*len+i) varies the mosaic/mixup draws per epoch
    (regression: seeding by frame index alone froze the composite for the
    whole run)."""
    from PIL import Image
    from mo_yolo_tpu.data.dataset import TrackDataset

    img_dir = tmp_path / "images" / "s"
    lab_dir = tmp_path / "labels" / "s"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    files = []
    for t in range(6):
        p = img_dir / f"{t:06d}.png"
        Image.fromarray(_img(64, 64, seed=t)).save(p)
        (lab_dir / f"{t:06d}.txt").write_text(
            "0 0.500 0.500 0.300 0.300 1\n")
        files.append(str(p))
    ds = TrackDataset(files, imgsz=64, max_gt=8, clip_len=1,
                      mosaic_p=1.0, aug_seed=0)
    e0 = ds.load_frame(0, augment=True, aug_index=0 * len(ds) + 0)
    e1 = ds.load_frame(0, augment=True, aug_index=1 * len(ds) + 0)
    e0b = ds.load_frame(0, augment=True, aug_index=0 * len(ds) + 0)
    np.testing.assert_array_equal(e0.image, e0b.image)  # deterministic
    assert not np.array_equal(e0.image, e1.image)       # varies per epoch


def test_photometrics_suite():
    """The reference Albumentations block rebuilt in numpy/PIL
    (ultralytics/data/augment.py:648-668): every transform changes the
    image photometrically, keeps shape/dtype, and never touches labels."""
    from mo_yolo_tpu.data.augment import (
        Photometrics, blur, brightness_contrast, clahe, gamma,
        jpeg_compression, median_blur, to_gray)

    img = _img(96, 128)
    for out in (blur(img, 5), median_blur(img, 3), to_gray(img),
                clahe(img), brightness_contrast(img, 0.1, 0.1),
                gamma(img, 1.2), jpeg_compression(img, 80)):
        assert out.shape == img.shape and out.dtype == np.uint8
        assert not np.array_equal(out, img)
    # gray really is gray; blur really smooths
    g = to_gray(img)
    assert np.array_equal(g[..., 0], g[..., 1])
    assert np.abs(np.diff(blur(img, 7).astype(int), axis=1)).mean() < \
        np.abs(np.diff(img.astype(int), axis=1)).mean()
    # CLAHE spreads a low-contrast histogram (noisy fixture: uniform tiles
    # hit the clip floor and map near-identity, as in cv2)
    rng2 = np.random.default_rng(1)
    low = rng2.normal(110, 6, (128, 128)).clip(90, 130).astype(np.uint8)
    low = np.repeat(low[..., None], 3, axis=2)
    assert clahe(low).std() > 2 * low.std()
    # deterministic per-draw; p=1 fires, p=0 never does
    rng = np.random.default_rng(0)
    d = Photometrics(blur_p=1, median_p=1, gray_p=1, clahe_p=1,
                     bc_p=1, gamma_p=1, compression_p=1).sample(rng)
    assert d["blur_k"] and d["gray"] and d["bc"] is not None
    d0 = Photometrics(blur_p=0, median_p=0, gray_p=0, clahe_p=0).sample(rng)
    assert not (d0["blur_k"] or d0["median_k"] or d0["gray"] or d0["clahe"])
    assert np.array_equal(Photometrics.apply(img, d0), img)


def test_photometrics_clip_frozen():
    """ClipAugmenter freezes the photometric draw per clip: identical
    frames inside one clip get identical photometric treatment."""
    from mo_yolo_tpu.data.augment import ClipAugmenter, Photometrics

    aug = ClipAugmenter(hsv=False, fliplr_p=0.0, translate=0, scale=0,
                        photometrics=Photometrics(blur_p=1.0, gray_p=1.0),
                        seed=3)
    aug.begin_clip(0)
    img = _img(64, 64)
    a1, _ = aug(img, _lab())
    a2, _ = aug(img, _lab())
    np.testing.assert_array_equal(a1, a2)
    g = a1
    assert np.array_equal(g[..., 0], g[..., 1])  # gray fired clip-wide
