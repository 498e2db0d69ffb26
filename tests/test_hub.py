"""HUB client tests (reference `ultralytics/hub/`)."""

import json
import os

import pytest


@pytest.fixture()
def hub_env(tmp_path, monkeypatch):
    monkeypatch.setenv("MO_YOLO_SETTINGS", str(tmp_path / "settings.json"))
    monkeypatch.setenv("MO_YOLO_REGISTRY", str(tmp_path / "registry"))
    # re-resolve module-level SETTINGS_FILE
    import importlib
    import mo_yolo_tpu.hub.auth as auth
    importlib.reload(auth)
    yield tmp_path
    importlib.reload(auth)


def test_auth_login_logout(hub_env):
    from mo_yolo_tpu.hub import auth
    with pytest.raises(ValueError):
        auth.login("")
    a = auth.login("key123")
    assert a.authenticated
    assert auth.Auth().api_key == "key123"       # persisted
    auth.logout()
    assert not auth.Auth().authenticated


def test_registry_push_pull_verify(hub_env, tmp_path):
    from mo_yolo_tpu.hub.registry import Registry
    reg = Registry()
    # file artifact
    f = tmp_path / "weights.bin"
    f.write_bytes(b"abc123")
    reg.push("m1", str(f))
    assert "m1" in reg.list()
    p = reg.pull("m1")
    assert p.read_bytes() == b"abc123"
    # directory artifact (orbax-style)
    d = tmp_path / "ckpt"
    (d / "sub").mkdir(parents=True)
    (d / "sub" / "x").write_text("1")
    reg.push("m2", str(d))
    out = reg.pull("m2", dest=str(tmp_path / "out"))
    assert (out / "sub" / "x").read_text() == "1"
    # corruption must fail loudly
    (reg.root / "m1").write_bytes(b"tampered")
    with pytest.raises(IOError):
        reg.pull("m1")
    # delete
    reg.delete("m2")
    assert "m2" not in reg.list()
    with pytest.raises(FileNotFoundError):
        reg.pull("m2")


def test_registry_rejects_http(hub_env):
    from mo_yolo_tpu.hub.registry import Registry
    with pytest.raises(ValueError):
        Registry("https://example.com/zoo")
    r = Registry("file://" + str(hub_env / "reg2"))
    assert r.root.exists()


def test_training_session_journals(hub_env):
    from mo_yolo_tpu.hub import Registry, TrainingSession
    from mo_yolo_tpu.utils.callbacks import CallbackBus
    reg = Registry()
    s = TrainingSession(reg, model_id="t1", heartbeat_s=0.0)
    bus = CallbackBus()
    s.attach(bus)
    bus.fire("on_train_batch_end", step=1, metrics={"loss": 2.0})
    bus.fire("on_train_epoch_end", epoch=0, metrics={"loss": 1.5})
    bus.fire("on_train_end", metrics={"final_loss": 1.0})
    beats = (reg.root / "runs" / "t1" / "heartbeat.jsonl").read_text()
    mets = [json.loads(x) for x in
            (reg.root / "runs" / "t1" / "metrics.jsonl").read_text()
            .splitlines()]
    assert json.loads(beats.splitlines()[0])["step"] == 1
    assert mets[0]["metrics"]["loss"] == 1.5 and mets[1]["final"]


def test_check_dataset_and_fmts(hub_env, tmp_path):
    import yaml
    from mo_yolo_tpu import hub
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    # dataset yaml with explicit (empty-ish) splits
    from PIL import Image
    import numpy as np
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_dir / "0.jpg")
    y = tmp_path / "d.yaml"
    y.write_text(yaml.safe_dump({
        "path": str(tmp_path), "train": "images", "val": "images",
        "names": {0: "thing"}}))
    st = hub.check_dataset(str(y))
    assert st["ok"] and st["nc"] == 1 and st["train"] == 1
    assert "jaxexport" in hub.export_fmts_hub()


def test_export_model_roundtrip(hub_env):
    """Registry push (weights + sibling meta) -> pull -> rebuild ->
    export: the full hub export_model path (caught a dropped-meta bug)."""
    from mo_yolo_tpu.api import MOTRTrack
    from mo_yolo_tpu.hub import Registry, TrainingSession, export_model

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=4)
    sess = TrainingSession(Registry(), model_id="m1")
    sess.upload_final(m)
    reg = Registry()
    assert "m1.weights" in reg.list()
    assert "m1.weights.meta.json" in reg.list()
    out = export_model("m1.weights", format="stablehlo")
    import pathlib
    assert pathlib.Path(out).stat().st_size > 1000


def test_settings_persistence(tmp_path, monkeypatch):
    """Persisted SETTINGS (reference utils/__init__.py:716-797): save,
    reload, version-reset semantics, unknown-key rejection."""
    import pytest

    monkeypatch.setenv("MO_YOLO_TPU_CONFIG_DIR", str(tmp_path))
    from mo_yolo_tpu.utils import settings as S

    s = S.load_settings()
    assert s.tensorboard is True
    s.update(runs_dir="custom_runs", wandb=False)
    s.save()

    s2 = S.load_settings()
    assert s2.runs_dir == "custom_runs" and s2.wandb is False

    with pytest.raises(KeyError):
        s2.update(no_such_key=1)

    # schema version change: surviving keys preserved, file rewritten
    monkeypatch.setattr(S, "SETTINGS_VERSION", "9.9.9")
    s3 = S.load_settings()
    assert s3.runs_dir == "custom_runs"
    import yaml
    on_disk = yaml.safe_load(open(s3.path))
    assert on_disk["settings_version"] == "0.1.0"  # defaults carry version

    s3.reset()
    assert S.load_settings().runs_dir == "runs"
