"""Deterministic synthetic MOT dataset renderer.

Renders multi-sequence video of textured objects moving over a cluttered
static background, with MOT-style 6-column labels
(`cls cx cy w h track_id`, normalized) in a parallel labels/ tree and a
dataset yaml — the "real-ish fixture" for end-to-end HOTA/MOTA/IDF1
evidence (the reference evaluates on MOT17/DanceTrack via `run_test.py` /
`MOTR/submit.py:374-419`; this stands in for those on an offline box).

Objects bounce off frame edges, cross (occlude) each other, and vary in
size/velocity/appearance. Everything derives from a single seed.

Usage: python scripts/make_synth_mot.py [out_dir] [--size 320] [--frames 80]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _background(rng: np.random.Generator, size: int) -> np.ndarray:
    """Smooth colored clutter: low-frequency noise + a few soft blobs."""
    small = rng.uniform(40, 120, (8, 8, 3))
    # bilinear upsample to size
    idx = np.linspace(0, 7, size)
    i0 = np.floor(idx).astype(int)
    i1 = np.minimum(i0 + 1, 7)
    f = idx - i0
    rows = small[i0] * (1 - f)[:, None, None] + small[i1] * f[:, None, None]
    bg = (rows[:, i0] * (1 - f)[None, :, None] +
          rows[:, i1] * f[None, :, None])                # [size, size, 3]
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(6):
        cx, cy = rng.uniform(0, size, 2)
        r = rng.uniform(size / 12, size / 5)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r)))
        bg += blob[..., None] * rng.uniform(-35, 35, 3)
    return np.clip(bg, 0, 255)


_CLASS_PALETTE = np.array([   # class-correlated base colors so a
    [220, 80, 80], [80, 200, 90], [90, 110, 230],   # multi-class model has
    [220, 200, 70], [200, 90, 210]], float)          # something to learn


def _object_patch(rng: np.random.Generator, w: int, h: int,
                  cls: int = -1) -> np.ndarray:
    """Textured elliptical object patch + alpha mask. cls >= 0 draws the
    base color near the class palette entry (appearance ~ class)."""
    if cls >= 0:
        base = _CLASS_PALETTE[cls % len(_CLASS_PALETTE)] + \
            rng.uniform(-25, 25, 3)
    else:
        base = rng.uniform(100, 255, 3)
    tex = rng.uniform(-30, 30, (h, w, 3))
    patch = np.clip(base + tex, 0, 255)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((xx - w / 2) / (w / 2)) ** 2 +
            ((yy - h / 2) / (h / 2)) ** 2) <= 1.0
    return patch, mask


def render_sequence(seed: int, size: int, n_frames: int, n_obj: int,
                    out_img_dir: str, out_lab_dir: str,
                    nc: int = 1) -> None:
    rng = np.random.default_rng(seed)
    bg = _background(rng, size)
    objs = []
    for k in range(n_obj):
        w = int(rng.uniform(size * 0.10, size * 0.22))
        h = int(rng.uniform(size * 0.10, size * 0.22))
        patch, mask = _object_patch(rng, w, h,
                                    cls=(k % nc) if nc > 1 else -1)
        objs.append({
            "w": w, "h": h, "patch": patch, "mask": mask,
            "x": rng.uniform(w, size - w), "y": rng.uniform(h, size - h),
            "vx": rng.uniform(-3.0, 3.0) * size / 320,
            "vy": rng.uniform(-3.0, 3.0) * size / 320,
        })
    os.makedirs(out_img_dir, exist_ok=True)
    os.makedirs(out_lab_dir, exist_ok=True)
    from PIL import Image
    for t in range(n_frames):
        frame = bg.copy()
        lines = []
        for k, o in enumerate(objs):
            # integrate motion with edge bounce
            o["x"] += o["vx"]
            o["y"] += o["vy"]
            if o["x"] < o["w"] / 2 or o["x"] > size - o["w"] / 2:
                o["vx"] *= -1
                o["x"] = np.clip(o["x"], o["w"] / 2, size - o["w"] / 2)
            if o["y"] < o["h"] / 2 or o["y"] > size - o["h"] / 2:
                o["vy"] *= -1
                o["y"] = np.clip(o["y"], o["h"] / 2, size - o["h"] / 2)
            x1 = int(round(o["x"] - o["w"] / 2))
            y1 = int(round(o["y"] - o["h"] / 2))
            region = frame[y1:y1 + o["h"], x1:x1 + o["w"]]
            m = o["mask"][:region.shape[0], :region.shape[1]]
            region[m] = o["patch"][:region.shape[0], :region.shape[1]][m]
            lines.append(f"{k % nc} {o['x']/size:.6f} {o['y']/size:.6f} "
                         f"{o['w']/size:.6f} {o['h']/size:.6f} {k}")
        img = np.clip(frame, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(out_img_dir, f"{t:06d}.png"))
        with open(os.path.join(out_lab_dir, f"{t:06d}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


def make_mot_fixture(root: str, n_seq: int = 2, size: int = 96,
                     n_frames: int = 10, n_obj: int = 3, seed: int = 0,
                     split: str = "train") -> str:
    """Render synthetic sequences in the REAL MOT-challenge directory
    layout (`<root>/images/<split>/<seq>/img1/000001.png` + `gt/gt.txt` +
    `seqinfo.ini` — the tree `MOTR/submit.py:381` / `util/evaluation.py:126`
    consume), 1-indexed frames, pixel-space gt rows
    `frame,id,x,y,w,h,1,1,1`. Returns the split root."""
    from mo_yolo_tpu.data.mot_challenge import write_mot_gt
    base = os.path.join(root, "images", split)
    for s in range(n_seq):
        seq = f"MOT17-{s + 1:02d}"
        seq_dir = os.path.join(base, seq)
        img1 = os.path.join(seq_dir, "img1")
        lab_tmp = os.path.join(seq_dir, "_labels_tmp")
        render_sequence(seed * 1009 + s, size, n_frames, n_obj,
                        img1, lab_tmp, nc=1)
        rows = []
        # re-index 0-based render output to MOT's 1-based frames; highest
        # first, else 000000->000001 overwrites the real frame 1
        for t in range(n_frames - 1, -1, -1):
            os.replace(os.path.join(img1, f"{t:06d}.png"),
                       os.path.join(img1, f"{t + 1:06d}.png"))
        for t in range(n_frames):
            lab = np.loadtxt(os.path.join(lab_tmp, f"{t:06d}.txt"),
                             ndmin=2)
            for cls, cx, cy, w, h, tid in lab:
                rows.append([t + 1, int(tid) + 1, (cx - w / 2) * size,
                             (cy - h / 2) * size, w * size, h * size,
                             1, 1, 1.0])
            os.remove(os.path.join(lab_tmp, f"{t:06d}.txt"))
        os.rmdir(lab_tmp)
        write_mot_gt(os.path.join(seq_dir, "gt", "gt.txt"), rows)
        with open(os.path.join(seq_dir, "seqinfo.ini"), "w") as f:
            f.write(f"[Sequence]\nname={seq}\nimDir=img1\nframeRate=30\n"
                    f"seqLength={n_frames}\nimWidth={size}\n"
                    f"imHeight={size}\nimExt=.png\n")
    return base


def make_dataset(root: str, size: int = 320, n_frames: int = 80,
                 n_train_seq: int = 4, n_val_seq: int = 2,
                 n_obj: int = 4, seed: int = 0, nc: int = 1) -> str:
    """Renders train/val sequence trees + dataset yaml. Returns yaml path."""
    train_files, val_files = [], []
    for s in range(n_train_seq + n_val_seq):
        name = f"seq{s:02d}"
        img_dir = os.path.join(root, "images", name)
        lab_dir = os.path.join(root, "labels", name)
        render_sequence(seed * 1009 + s, size, n_frames, n_obj,
                        img_dir, lab_dir, nc=nc)
        files = [os.path.join(img_dir, f"{t:06d}.png")
                 for t in range(n_frames)]
        (train_files if s < n_train_seq else val_files).extend(files)
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(train_files) + "\n")
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(val_files) + "\n")
    yaml_path = os.path.join(root, "synth_mot.yaml")
    names = "\n".join(f"  {i}: class{i}" for i in range(nc))
    with open(yaml_path, "w") as f:
        f.write(f"path: {root}\ntrain: train.txt\nval: val.txt\n"
                f"nc: {nc}\nnames:\n{names}\n")
    return yaml_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_mot"
    size, frames, n_obj, nc = 320, 80, 4, 1
    for i, a in enumerate(sys.argv):
        if a == "--size":
            size = int(sys.argv[i + 1])
        if a == "--frames":
            frames = int(sys.argv[i + 1])
        if a == "--objects":
            n_obj = int(sys.argv[i + 1])
        if a == "--nc":
            nc = int(sys.argv[i + 1])
    print(make_dataset(out, size=size, n_frames=frames, n_obj=n_obj, nc=nc))
