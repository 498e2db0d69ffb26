"""Training/eval plotting (reference `utils/plotting.py`, 527 LoC —
the subset that matters for a headless TPU stack: results curves, label
stats, and annotated image grids; the reference's interactive windows and
font machinery are out of scope).

matplotlib is used with the Agg backend so nothing here ever needs a
display. All functions are best-effort: callers may fire them from
callbacks and must never crash training on a plotting failure.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


_show_warned = False


def show_image(img: np.ndarray, title: str = "mo_yolo_tpu") -> bool:
    """Display one annotated HWC-uint8 frame (reference `show=True`,
    `engine/predictor.py show window`). cv2 window when available, PIL
    viewer when a DISPLAY exists; headless hosts get ONE warning and
    the stream continues. Returns whether anything was shown."""
    global _show_warned
    import os
    # cv2.imshow on a headless build aborts the process (C++ abort, not a
    # catchable exception) — never touch a GUI backend without a display
    if os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY"):
        try:
            import cv2
            cv2.imshow(title, np.ascontiguousarray(img[..., ::-1]))
            cv2.waitKey(1)
            return True
        except Exception:
            pass
        try:
            from PIL import Image
            Image.fromarray(img).show(title=title)
            return True
        except Exception:
            pass
    if not _show_warned:
        _show_warned = True
        from mo_yolo_tpu.utils.logging import LOGGER
        LOGGER.warning("show=True: no display backend available on this "
                       "host (no cv2 window, no DISPLAY); frames not shown")
    return False


def plot_results(csv_path: str, out_png: Optional[str] = None) -> str:
    """Training curves from a results.csv (reference `plot_results`).
    Plots every numeric column except epoch/step against step index."""
    plt = _plt()
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        raise ValueError(f"empty results csv: {csv_path}")
    cols = [c for c in rows[0] if c not in ("epoch", "step")]
    n = len(cols)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3.2), squeeze=False)
    x = np.arange(len(rows))
    for ax, c in zip(axes[0], cols):
        y = np.array([float(r[c]) for r in rows])
        ax.plot(x, y, marker=".", lw=1)
        ax.set_title(c, fontsize=10)
        ax.set_xlabel("log step")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    out = out_png or str(Path(csv_path).with_name("results.png"))
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_labels(cls: np.ndarray, boxes_xywhn: np.ndarray,
                out_png: str, names: Optional[Dict[int, str]] = None) -> str:
    """Label statistics (reference `plot_labels`): class histogram +
    box-center heatmap + w/h scatter."""
    plt = _plt()
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.6))
    cls = np.asarray(cls).astype(int).ravel()
    b = np.asarray(boxes_xywhn).reshape(-1, 4)
    axes[0].hist(cls, bins=np.arange(cls.max() + 2) - 0.5, rwidth=0.8)
    axes[0].set_title("classes")
    if names:
        axes[0].set_xticks(sorted(names))
        axes[0].set_xticklabels([names[k] for k in sorted(names)],
                                rotation=45, fontsize=8)
    axes[1].hist2d(b[:, 0], b[:, 1], bins=32, range=[[0, 1], [0, 1]])
    axes[1].set_title("xy centers")
    axes[2].scatter(b[:, 2], b[:, 3], s=3, alpha=0.4)
    axes[2].set_title("w/h")
    axes[2].set_xlim(0, 1)
    axes[2].set_ylim(0, 1)
    fig.tight_layout()
    Path(out_png).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png


def plot_image_grid(images: Sequence[np.ndarray],
                    boxes_per_image: Sequence[np.ndarray],
                    out_png: str,
                    ids_per_image: Optional[Sequence[np.ndarray]] = None,
                    max_images: int = 16) -> str:
    """Annotated image mosaic (reference `plot_images`): images are HWC
    uint8 or [0,1] float; boxes are xyxy pixels; optional per-box ids."""
    plt = _plt()
    n = min(len(images), max_images)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i >= n:
            continue
        img = np.asarray(images[i])
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ax.imshow(img)
        bx = np.asarray(boxes_per_image[i]).reshape(-1, 4)
        ids = (np.asarray(ids_per_image[i]).ravel()
               if ids_per_image is not None else [None] * len(bx))
        for k, (x1, y1, x2, y2) in enumerate(bx):
            ax.add_patch(plt.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                       fill=False, lw=1.2,
                                       color=f"C{k % 10}"))
            if ids[k] is not None:
                ax.text(x1, y1 - 2, f"id:{int(ids[k])}", fontsize=7,
                        color=f"C{k % 10}")
    fig.tight_layout()
    Path(out_png).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    return out_png


def plot_labels_correlogram(boxes_xywhn: np.ndarray, out_png: str) -> str:
    """Pairwise x/y/w/h distribution matrix (reference `plot_labels`'s
    seaborn-pairplot `labels_correlogram.jpg`, plotting.py:241-262):
    histograms on the diagonal, 2-D density off it."""
    plt = _plt()
    b = np.asarray(boxes_xywhn, np.float32).reshape(-1, 4)
    names = ["x", "y", "width", "height"]
    fig, axes = plt.subplots(4, 4, figsize=(9, 9))
    for i in range(4):
        for j in range(4):
            ax = axes[i][j]
            if i == j:
                ax.hist(b[:, i], bins=40, range=(0, 1), color="C0")
            else:
                ax.hist2d(b[:, j], b[:, i], bins=40,
                          range=[[0, 1], [0, 1]], cmap="Blues")
            if i == 3:
                ax.set_xlabel(names[j], fontsize=9)
            if j == 0:
                ax.set_ylabel(names[i], fontsize=9)
            ax.set_xticks([])
            ax.set_yticks([])
    fig.tight_layout()
    Path(out_png).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png


def save_train_batch(images: np.ndarray, boxes_cxcywhn: np.ndarray,
                     out_png: str, ids: Optional[np.ndarray] = None,
                     mask: Optional[np.ndarray] = None,
                     max_images: int = 16) -> str:
    """Annotated train-batch mosaic (reference `plot_images` as fired from
    `plot_training_samples` -> runs/train_batch{N}.jpg): images [N,H,W,3]
    float[0,1] or uint8, boxes [N,G,4] normalized cxcywh, optional track
    ids [N,G] and validity mask [N,G] (padded GT rows dropped)."""
    imgs = np.asarray(images)
    h, w = imgs.shape[1:3]
    bxs, idl = [], []
    for k in range(len(imgs)):
        b = np.asarray(boxes_cxcywhn[k]).reshape(-1, 4)
        m = (np.asarray(mask[k]).ravel().astype(bool) if mask is not None
             else b.any(axis=1))
        b = b[m]
        xy = np.stack([(b[:, 0] - b[:, 2] / 2) * w,
                       (b[:, 1] - b[:, 3] / 2) * h,
                       (b[:, 0] + b[:, 2] / 2) * w,
                       (b[:, 1] + b[:, 3] / 2) * h], 1)
        bxs.append(xy)
        idl.append(np.asarray(ids[k]).ravel()[m] if ids is not None
                   else np.zeros(len(xy), int) - 1)
    use_ids = ids is not None
    return plot_image_grid(list(imgs), bxs, out_png,
                           ids_per_image=idl if use_ids else None,
                           max_images=max_images)


def plot_confusion_matrix(matrix: np.ndarray, out_png: str,
                          names: Optional[List[str]] = None) -> str:
    """Confusion-matrix heatmap (reference `ConfusionMatrix.plot`)."""
    plt = _plt()
    m = np.asarray(matrix, float)
    fig, ax = plt.subplots(figsize=(5, 4.2))
    im = ax.imshow(m / np.maximum(m.sum(0, keepdims=True), 1e-9),
                   cmap="Blues", vmin=0, vmax=1)
    fig.colorbar(im)
    n = m.shape[0]
    labels = (names or [str(i) for i in range(n - 1)]) + ["background"]
    ax.set_xticks(range(n))
    ax.set_yticks(range(n))
    ax.set_xticklabels(labels, rotation=60, fontsize=7)
    ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel("true")
    ax.set_ylabel("predicted")
    fig.tight_layout()
    Path(out_png).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png


def feature_visualization(feats: Sequence[np.ndarray], save_dir: str,
                          n: int = 32, prefix: str = "stage") -> List[str]:
    """Save per-stage feature-map grids during inference (reference
    `feature_visualization`, `utils/plotting.py:497-524`: first batch
    element, up to n channels, 8-wide grid, one PNG per stage).

    feats: list of [B, H, W, C] arrays (NHWC — the TPU layout; the
    reference is NCHW). Returns the written paths."""
    from PIL import Image

    out_dir = Path(save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for stage, f in enumerate(feats):
        a = np.asarray(f)
        if a.ndim != 4 or a.shape[1] < 2 or a.shape[2] < 2:
            continue
        a = a[0]                                  # [H, W, C]
        h, w, c = a.shape
        k = min(n, c)
        cols, rows = 8, int(np.ceil(k / 8))
        canvas = np.zeros((rows * h, cols * w), np.uint8)
        for i in range(k):
            ch = a[..., i].astype(np.float32)
            lo, hi = float(ch.min()), float(ch.max())
            ch8 = ((ch - lo) / (hi - lo + 1e-9) * 255).astype(np.uint8)
            r, col = divmod(i, cols)
            canvas[r * h:(r + 1) * h, col * w:(col + 1) * w] = ch8
        p = out_dir / f"{prefix}{stage}_features.png"
        Image.fromarray(canvas).save(p)
        paths.append(str(p))
    return paths


def plot_tune_results(trials: List[Dict], out_png: str) -> Optional[str]:
    """Fitness-vs-hyperparameter scatter grid from Tuner trial dicts
    (reference tune artifact `tune_scatter_plots.png`, and the fitness
    panel of `ray`'s result plots). Best trial marked. Returns None when
    matplotlib is unavailable (plots are best-effort everywhere)."""
    try:
        plt = _plt()
    except Exception:
        return None
    done = [t for t in trials if np.isfinite(t.get("fitness", -np.inf))]
    if not done:
        return None
    keys = sorted({k for t in done for k in t["hyp"]
                   if isinstance(t["hyp"][k], (int, float))})
    if not keys:
        return None
    fit = np.array([t["fitness"] for t in done])
    best = int(np.argmax(fit))
    n = len(keys)
    cols = min(n, 4)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 2.8 * rows),
                             squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        x = np.array([float(t["hyp"][k]) for t in done])
        ax.scatter(x, fit, s=14, alpha=0.7)
        ax.scatter([x[best]], [fit[best]], s=60, marker="*", color="red")
        ax.set_title(k, fontsize=9)
        ax.grid(alpha=0.3)
        if x.min() > 0 and x.max() / max(x.min(), 1e-12) > 50:
            ax.set_xscale("log")
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.suptitle("fitness vs hyperparameter (red star = best)", fontsize=10)
    fig.tight_layout()
    Path(out_png).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png
