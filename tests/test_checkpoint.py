"""Checkpoint round-trips + torch weight-import mapping."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_orbax_trainstate_roundtrip(tmp_path):
    from mo_yolo_tpu.models.graph import parse_model_yaml
    from mo_yolo_tpu.models.tracking_model import TrackingModel
    from mo_yolo_tpu.models.tracker import TrackerConfig, init_track_state
    from mo_yolo_tpu.train.losses import LossConfig
    from mo_yolo_tpu.train.train_step import TrainConfig, make_train_step
    from mo_yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    spec = parse_model_yaml("tests/tiny_track.yaml")
    model = TrackingModel(spec=spec, tracker=TrackerConfig(n_slots=6), nq=8,
                          ndl=1, d_ffn=16, hd=32, num_denoising=4)
    state = init_track_state(1, 6, 32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), state)
    init_fn, _ = make_train_step(model, LossConfig(nc=spec.nc),
                                 TrainConfig(clip_len=1))
    ts = init_fn(v)
    save_checkpoint(str(tmp_path / "ck"), ts, config={"note": "test"})
    restored = load_checkpoint(str(tmp_path / "ck"), target=ts)
    a = jax.tree.leaves(ts.params)[0]
    b = jax.tree.leaves(restored["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (tmp_path / "ck.config.json").exists()


def test_torch_key_mapping():
    from mo_yolo_tpu.utils.checkpoint import _map_torch_key

    assert _map_torch_key("model.0.conv.weight") == \
        "params/backbone/n0/conv/kernel"
    assert _map_torch_key("model.0.bn.weight") == \
        "params/backbone/n0/bn/scale"
    assert _map_torch_key("model.0.bn.running_mean") == \
        "batch_stats/backbone/n0/bn/mean"
    assert _map_torch_key("model.2.cv1.conv.weight") == \
        "params/backbone/n2/cv1/conv/kernel"
    assert _map_torch_key("model.2.m.0.cv1.conv.weight") == \
        "params/backbone/n2/m0/cv1/conv/kernel"
    assert _map_torch_key("anchors") is None


def test_torch_import_backbone_conv():
    torch = pytest.importorskip("torch")
    from mo_yolo_tpu.models.graph import BackboneNeck, parse_model_yaml
    from mo_yolo_tpu.utils.checkpoint import import_torch_weights
    import tempfile, os

    spec = parse_model_yaml("tests/tiny_track.yaml")
    m = BackboneNeck(spec)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    # synthetic torch state_dict matching ultralytics naming for row 0
    w = torch.randn(8, 3, 3, 3)
    sd = {"model.0.conv.weight": w,
          "model.0.bn.weight": torch.ones(8) * 2,
          "model.0.bn.bias": torch.zeros(8),
          "model.0.bn.running_mean": torch.zeros(8),
          "model.0.bn.running_var": torch.ones(8)}
    with tempfile.TemporaryDirectory() as d:
        pt = os.path.join(d, "w.pt")
        torch.save(sd, pt)
        # wrap variables under the API layout used by the full model
        wrapped = {"params": {"backbone": v["params"]},
                   "batch_stats": {"backbone": v["batch_stats"]}}
        out = import_torch_weights(pt, wrapped)
    got = np.asarray(out["params"]["backbone"]["n0"]["conv"]["kernel"])
    want = w.numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["params"]["backbone"]["n0"]["bn"]["scale"]), 2.0)
