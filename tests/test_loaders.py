"""Frame-source sniffing tests (reference `data/build.py:201-224` +
`data/loaders.py:31-307` source matrix, minus webcam/screenshot)."""

import numpy as np
import pytest
from PIL import Image

from mo_yolo_tpu.data.loaders import (ArraySource, ImageFolderSource,
                                      make_source)


@pytest.fixture()
def img_dir(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for t in range(3):
        img = rng.integers(0, 255, (32, 48, 3), np.uint8)
        p = tmp_path / f"f{t:03d}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    return tmp_path, paths


def test_source_directory(img_dir):
    d, paths = img_dir
    src = make_source(str(d))
    assert isinstance(src, ImageFolderSource)
    out = list(src)
    assert [p for p, _ in out] == paths
    assert out[0][1].shape == (32, 48, 3)


def test_source_path_list(img_dir):
    _, paths = img_dir
    src = make_source(paths)
    assert isinstance(src, ImageFolderSource)
    assert len(list(src)) == 3


def test_source_txt_list(img_dir, tmp_path):
    _, paths = img_dir
    txt = tmp_path / "list.txt"
    txt.write_text("\n".join(paths))
    assert len(list(make_source(str(txt)))) == 3


def test_source_arrays_and_pil():
    img = np.zeros((16, 16, 3), np.uint8)
    assert len(list(make_source(np.stack([img] * 4)))) == 4
    assert len(list(make_source(img))) == 1          # single HWC array
    assert len(list(make_source([img, img]))) == 2
    pil = Image.fromarray(img)
    assert len(list(make_source(pil))) == 1
    assert len(list(make_source([pil, pil, pil]))) == 3
    src = make_source([img])
    assert isinstance(src, ArraySource)


def test_source_unsupported():
    with pytest.raises(TypeError):
        make_source(12345)


def test_video_source_gated():
    import shutil
    from mo_yolo_tpu.data.loaders import VideoSource
    if shutil.which("ffmpeg") is None:
        with pytest.raises(RuntimeError):
            VideoSource("x.mp4")
    else:  # pragma: no cover - env has no ffmpeg
        pytest.skip("ffmpeg present; decode covered by integration use")
