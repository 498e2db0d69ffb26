"""Segment / Pose / Classify host trainers: one epoch on a tiny disk
dataset must run, checkpoint, and produce finite decreasing-ish loss."""

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_spec():
    from mo_yolo_tpu.models.graph import parse_model_yaml
    return parse_model_yaml("tests/tiny_track.yaml", nc=2)


def _write_dataset(tmp_path, label_rows):
    from PIL import Image
    (tmp_path / "images").mkdir(exist_ok=True)
    (tmp_path / "labels").mkdir(exist_ok=True)
    files = []
    for i in range(4):
        p = tmp_path / "images" / f"{i}.jpg"
        img = np.full((64, 64, 3), 60, np.uint8)
        img[16:48, 16:48] = 200
        Image.fromarray(img).save(p)
        files.append(f"images/{i}.jpg")
        (tmp_path / "labels" / f"{i}.txt").write_text(label_rows)
    (tmp_path / "train.txt").write_text("\n".join(files))
    y = tmp_path / "d.yaml"
    y.write_text(yaml.safe_dump({
        "path": str(tmp_path), "train": "train.txt", "val": "train.txt",
        "names": {0: "a", 1: "b"}}))
    return str(y)


def test_seg_trainer_one_epoch(tmp_path):
    import jax
    import jax.numpy as jnp
    from mo_yolo_tpu.models.heads_extra import SegmentationModel
    from mo_yolo_tpu.train.task_trainers import SegTrainer

    data = _write_dataset(
        tmp_path, "0 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\n")
    model = SegmentationModel(spec=tiny_spec_v(), max_det=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    t = SegTrainer(model, v, data, epochs=1, batch=2, imgsz=64, max_gt=4,
                   save_dir=str(tmp_path / "run"), log_every=1)
    out = t.run()
    assert np.isfinite(out["final_loss"])
    assert (tmp_path / "run" / "last").exists()
    # val_every default = auto: with a val split present, training
    # validates per epoch, selects `best` by box+mask fitness, and
    # final-evals the best checkpoint (reference behavior)
    assert "mAP50(M)" in out, out
    assert (tmp_path / "run" / "best").exists()


def test_pose_trainer_one_epoch(tmp_path):
    import jax
    import jax.numpy as jnp
    from mo_yolo_tpu.models.heads_extra import PoseModel
    from mo_yolo_tpu.train.task_trainers import PoseTrainer

    data = _write_dataset(
        tmp_path, "0 0.5 0.5 0.5 0.5 0.3 0.3 2 0.7 0.7 2\n")
    model = PoseModel(spec=tiny_spec_v(), kpt_shape=(2, 3), max_det=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    t = PoseTrainer(model, v, data, epochs=1, batch=2, imgsz=64, max_gt=4,
                    save_dir=str(tmp_path / "run"), log_every=1)
    out = t.run()
    assert np.isfinite(out["final_loss"])
    assert "mAP50(P)" in out, out         # auto in-train val (see seg test)
    assert (tmp_path / "run" / "best").exists()


def test_classify_trainer_converges(tmp_path):
    """2-class color classification must drop loss within a few epochs."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from mo_yolo_tpu.models.heads_extra import ClassifyModel
    from mo_yolo_tpu.train.task_trainers import ClassifyTrainer

    for ci, color in enumerate([(255, 0, 0), (0, 0, 255)]):
        (tmp_path / "tree" / f"c{ci}").mkdir(parents=True)
        for i in range(4):
            img = np.zeros((64, 64, 3), np.uint8)
            img[...] = color
            Image.fromarray(img).save(tmp_path / "tree" / f"c{ci}" /
                                      f"{i}.jpg")
    model = ClassifyModel(spec=tiny_spec_v(), nc=2, c_=64)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    t = ClassifyTrainer(model, v, str(tmp_path / "tree"), epochs=4,
                        batch=4, imgsz=64, lr=1e-3,
                        save_dir=str(tmp_path / "run"), log_every=1)
    out = t.run()
    assert out["final_loss"] < 0.69   # below ln(2) = learned something


def tiny_spec_v():
    from mo_yolo_tpu.models.graph import parse_model_yaml
    return parse_model_yaml("tests/tiny_track.yaml", nc=2)


def test_classify_dropout_and_split_key():
    """dropout>0 (reference Classify.drop / `dropout` train key) is
    stochastic across rng keys in train mode and a deterministic no-op in
    eval mode; load_dataset_yaml resolves the `test` split (reference
    `split` val key)."""
    import jax
    import jax.numpy as jnp
    from mo_yolo_tpu.models.heads_extra import ClassifyModel

    model = ClassifyModel(spec=tiny_spec_v(), nc=2, c_=64, dropout=0.5)
    x = jnp.linspace(0, 1, 1 * 64 * 64 * 3).reshape(1, 64, 64, 3)
    v = model.init(jax.random.PRNGKey(0), x)
    e1 = model.apply(v, x, False)
    e2 = model.apply(v, x, False)
    assert np.allclose(e1, e2), "eval mode must be deterministic"
    t1 = model.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(1)},
                     mutable=["batch_stats"])[0]
    t2 = model.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(2)},
                     mutable=["batch_stats"])[0]
    assert not np.allclose(np.asarray(t1), np.asarray(t2)), \
        "train mode with different keys must differ under dropout"


def test_dataset_yaml_test_split(tmp_path):
    from PIL import Image
    from mo_yolo_tpu.data.dataset import load_dataset_yaml

    (tmp_path / "images").mkdir()
    for n in ("a", "b", "c"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "images" / f"{n}.png")
    (tmp_path / "train.txt").write_text("images/a.png\n")
    (tmp_path / "val.txt").write_text("images/b.png\n")
    (tmp_path / "test.txt").write_text("images/c.png\n")
    (tmp_path / "d.yaml").write_text(
        f"path: {tmp_path}\ntrain: train.txt\nval: val.txt\n"
        "test: test.txt\nnc: 1\nnames:\n  0: x\n")
    d = load_dataset_yaml(str(tmp_path / "d.yaml"))
    assert len(d["train"]) == 1 and len(d["val"]) == 1
    assert len(d["test"]) == 1 and d["test"][0].endswith("c.png")


def test_classify_split_tree_trains_and_validates(tmp_path):
    """Reference classify layout: root/train + root/test class trees ->
    train on train/, validate top1/top5 on test/ each epoch, select best
    by (top1+top5)/2, and final-eval the best checkpoint."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from mo_yolo_tpu.models.heads_extra import ClassifyModel
    from mo_yolo_tpu.train.task_trainers import ClassifyTrainer

    for split in ("train", "test"):
        for ci, color in enumerate([(255, 0, 0), (0, 0, 255)]):
            d = tmp_path / "tree" / split / f"c{ci}"
            d.mkdir(parents=True)
            for i in range(3):
                img = np.zeros((64, 64, 3), np.uint8)
                img[...] = color
                Image.fromarray(img).save(d / f"{i}.jpg")
    model = ClassifyModel(spec=tiny_spec_v(), nc=2, c_=64)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    t = ClassifyTrainer(model, v, str(tmp_path / "tree"), epochs=2,
                        batch=3, imgsz=64, lr=1e-3,
                        save_dir=str(tmp_path / "run"), log_every=1)
    out = t.run()
    assert "accuracy_top1" in out and out["n"] == 6, out
    assert (tmp_path / "run" / "best").exists()
    # the facade validator understands the split tree too (evaluates the
    # held-out test/ subtree, not the split dirs as classes)
    from mo_yolo_tpu.api import _TaskModel
    m = _TaskModel("classify", "tests/tiny_track.yaml", nc=2, imgsz=64)
    vm = m.val(str(tmp_path / "tree"))
    assert vm["n"] == 6, vm
