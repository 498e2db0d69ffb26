"""MOT-challenge directory-layout ingestion (MOT15/16/17/20, DanceTrack).

The reference consumes this layout in two places:
  * `MOTR/submit.py:381-383` / `MOTR/eval.py:271-296` iterate
    `<mot_path>/MOT17/images/{train,test}/<seq>/img1/*.jpg` and read the
    per-sequence ground truth from `<seq>/gt/gt.txt`
    (`MOTR/util/evaluation.py:126`);
  * the ultralytics-side `TrackValidator` consumes a YOLO-converted tree
    (6-col labels, flat `VVVV_FFFFFF.jpg` filenames whose first 4 stem
    chars are the video id — `models/MOTRtrack/val.py:255,277`) listed by
    a dataset yaml (`MOT.yaml:11-12`).

This module bridges both: parse the raw MOT-challenge tree (seqinfo.ini +
gt.txt) and convert it to the 6-column normalized label tree our
`TrackDataset` (and the reference's own YOLO pipeline) consume — per-seq
directories by default, or the reference's flat 4+6-digit naming with
`flat=True`. gt.txt columns are the MOT-challenge standard
`frame,id,x,y,w,h,conf,class,visibility` with 1-indexed frames and
top-left pixel boxes.
"""

from __future__ import annotations

import configparser
import os
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "parse_seqinfo", "read_mot_gt", "write_mot_gt", "find_sequences",
    "convert_mot_to_yolo",
]


def parse_seqinfo(seq_dir: str) -> Dict[str, object]:
    """Read `<seq>/seqinfo.ini` (the MOT-challenge sequence metadata file).

    Returns name/imDir/frameRate/seqLength/imWidth/imHeight/imExt with
    sane defaults derived from the directory when the ini is absent
    (some DanceTrack drops omit it)."""
    seq = Path(seq_dir)
    info: Dict[str, object] = {
        "name": seq.name, "imDir": "img1", "frameRate": 30,
        "seqLength": 0, "imWidth": 0, "imHeight": 0, "imExt": ".jpg",
    }
    ini = seq / "seqinfo.ini"
    if ini.is_file():
        cp = configparser.ConfigParser()
        cp.read(ini)
        sec = cp["Sequence"] if cp.has_section("Sequence") else cp[cp.sections()[0]]
        for k in info:
            if k in sec:
                v = sec[k]
                info[k] = int(v) if str(v).lstrip("-").isdigit() else v
    img_dir = seq / str(info["imDir"])
    if img_dir.is_dir():
        frames = sorted(p for p in img_dir.iterdir()
                        if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp"))
        if frames:
            info["imExt"] = frames[0].suffix
            if not info["seqLength"]:
                info["seqLength"] = len(frames)
            if not info["imWidth"] or not info["imHeight"]:
                from PIL import Image
                with Image.open(frames[0]) as im:
                    info["imWidth"], info["imHeight"] = im.size
    return info


def read_mot_gt(gt_path: str, min_visibility: float = 0.0,
                keep_classes: Optional[Sequence[int]] = None,
                require_conf: bool = True) -> Dict[int, np.ndarray]:
    """Parse a MOT-challenge `gt/gt.txt` into {frame: [n, 9] float rows}.

    Row columns (standard order): frame,id,x,y,w,h,conf,class,visibility;
    files with fewer columns (MOT15 has 7, results files have conf only)
    are padded with the conventional defaults (conf=1, class=1, vis=1).
    `require_conf` drops rows whose conf/active flag is 0 (ignored boxes —
    the MOT17 convention the reference's Evaluator applies via
    `motmetrics ... gt.txt` loading); `keep_classes` keeps only the given
    MOT class ids (MOT17 pedestrians = {1}); `min_visibility` drops
    heavily-occluded boxes the way TrackEval's default does."""
    out: Dict[int, List[List[float]]] = {}
    if not os.path.isfile(gt_path):
        return {}
    with open(gt_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = [p for p in line.replace(",", " ").split() if p]
            vals = [float(v) for v in parts[:9]]
            vals += [1.0] * (9 - len(vals))
            frame = int(vals[0])
            if require_conf and vals[6] == 0:
                continue
            if keep_classes is not None and int(vals[7]) not in keep_classes:
                continue
            if vals[8] < min_visibility:
                continue
            out.setdefault(frame, []).append(vals)
    return {k: np.asarray(v, np.float32) for k, v in sorted(out.items())}


def write_mot_gt(gt_path: str, rows: Iterable[Sequence[float]]) -> None:
    """Write MOT-challenge gt.txt rows (frame,id,x,y,w,h,conf,cls,vis)."""
    os.makedirs(os.path.dirname(gt_path), exist_ok=True)
    with open(gt_path, "w") as f:
        for r in rows:
            frame, tid = int(r[0]), int(r[1])
            x, y, w, h = (float(v) for v in r[2:6])
            conf = int(r[6]) if len(r) > 6 else 1
            cls = int(r[7]) if len(r) > 7 else 1
            vis = float(r[8]) if len(r) > 8 else 1.0
            f.write(f"{frame},{tid},{x:g},{y:g},{w:g},{h:g},"
                    f"{conf},{cls},{vis:g}\n")


def find_sequences(mot_root: str, split: str = "train") -> List[str]:
    """Locate sequence dirs for a split, tolerating both on-disk layouts:
    the MOTR tree `<root>/images/<split>/<seq>` (`submit.py:381`) and the
    raw MOT-challenge download `<root>/<split>/<seq>`."""
    root = Path(mot_root)
    for base in (root / "images" / split, root / split):
        if base.is_dir():
            seqs = [str(p) for p in sorted(base.iterdir())
                    if p.is_dir() and ((p / "img1").is_dir()
                                       or (p / "gt" / "gt.txt").is_file())]
            if seqs:
                return seqs
    return []


def _link_or_copy(src: str, dst: str, link: bool) -> None:
    if os.path.lexists(dst):
        os.remove(dst)
    if link:
        try:
            os.symlink(os.path.abspath(src), dst)
            return
        except OSError:
            pass
    import shutil
    shutil.copyfile(src, dst)


def convert_mot_to_yolo(mot_root: str, out_root: Optional[str] = None,
                        splits: Sequence[str] = ("train",),
                        val_split: Optional[str] = None,
                        min_visibility: float = 0.0,
                        keep_classes: Optional[Sequence[int]] = None,
                        class_id: int = 0, link: bool = True,
                        flat: bool = False) -> str:
    """Convert a MOT-challenge tree to the 6-column YOLO-track layout.

    Emits `out_root/images/...` (symlinks by default) + parallel
    `labels/...` txts (`cls cx cy w h track_id`, normalized — the format
    of the reference's converted MOT17 tree, `data/utils.py:180`),
    per-split file lists, and a dataset yaml; returns the yaml path.

    `flat=True` names files `VVVV_FFFFFF<ext>` (4-digit video id +
    6-digit frame) so `im_file[-15:-4]` parses to video+frame exactly as
    the reference validator expects (`models/MOTRtrack/val.py:255,277`);
    the default keeps per-sequence directories, which our `TrackDataset`
    groups by parent dir (`data/dataset.py:video_key`). MOT gt classes
    all map to `class_id` (MOT17 is single-class pedestrian training in
    the reference; pass `keep_classes={1}` to drop distractor classes).

    When `val_split` is None the last sequence of each split doubles as
    val (a fixture-friendly default; real MOT17 training uses half-frame
    splits which callers get by passing explicit file lists instead)."""
    mot_root = str(mot_root)
    out = Path(out_root or os.path.join(mot_root, "yolo"))
    out.mkdir(parents=True, exist_ok=True)
    split_lists: Dict[str, List[str]] = {}
    for split in splits:
        seq_dirs = find_sequences(mot_root, split)
        if not seq_dirs:
            raise FileNotFoundError(
                f"no MOT sequences under {mot_root!r} split {split!r}")
        files: List[str] = []
        for vi, seq_dir in enumerate(seq_dirs):
            info = parse_seqinfo(seq_dir)
            W, H = float(info["imWidth"]), float(info["imHeight"])
            gt = read_mot_gt(os.path.join(seq_dir, "gt", "gt.txt"),
                             min_visibility=min_visibility,
                             keep_classes=keep_classes)
            img_dir = Path(seq_dir) / str(info["imDir"])
            if flat:
                idir = out / "images" / split
                ldir = out / "labels" / split
            else:
                idir = out / "images" / split / info["name"]
                ldir = out / "labels" / split / info["name"]
            idir.mkdir(parents=True, exist_ok=True)
            ldir.mkdir(parents=True, exist_ok=True)
            frames = sorted(p for p in img_dir.iterdir()
                            if p.suffix.lower() in (".jpg", ".jpeg",
                                                    ".png", ".bmp"))
            for p in frames:
                frame_no = int(p.stem)
                stem = (f"{vi:04d}_{frame_no:06d}" if flat
                        else f"{frame_no:06d}")
                dst = idir / (stem + p.suffix)
                _link_or_copy(str(p), str(dst), link)
                rows = []
                for r in gt.get(frame_no, np.zeros((0, 9), np.float32)):
                    tid, x, y, w, h = int(r[1]), r[2], r[3], r[4], r[5]
                    cx, cy = (x + w / 2) / W, (y + h / 2) / H
                    rows.append(f"{class_id} {cx:.6f} {cy:.6f} "
                                f"{w / W:.6f} {h / H:.6f} {tid}")
                (ldir / (stem + ".txt")).write_text(
                    "\n".join(rows) + ("\n" if rows else ""))
                files.append(str(dst))
        split_lists[split] = files
        with open(out / f"{split}.txt", "w") as f:
            f.write("\n".join(files) + "\n")
    train_key = splits[0]
    if val_split and val_split in split_lists:
        val_txt = f"{val_split}.txt"
    elif len(splits) > 1:
        val_txt = f"{splits[-1]}.txt"
    else:
        # fixture default: last sequence of the train split doubles as val
        files = split_lists[train_key]
        last_seq_dir = os.path.dirname(files[-1])
        val_files = ([f for f in files if os.path.dirname(f) == last_seq_dir]
                     if not flat else files)
        with open(out / "val.txt", "w") as f:
            f.write("\n".join(val_files) + "\n")
        val_txt = "val.txt"
    yaml_path = out / "mot_challenge.yaml"
    with open(yaml_path, "w") as f:
        f.write(f"path: {out}\ntrain: {train_key}.txt\nval: {val_txt}\n"
                f"nc: 1\nnames:\n  0: pedestrian\n")
    return str(yaml_path)
