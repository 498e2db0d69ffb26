"""Model-graph parser tests: all shipped yaml variants build and forward,
including the HGNetV2+AIFI rt-detr-style graph; reference yamls parse
unmodified (row-format parity with `nn/tasks.py:parse_model`)."""

import jax
import jax.numpy as jnp
import pytest

from mo_yolo_tpu.models.graph import BackboneNeck, parse_model_yaml

VARIANTS = [
    ("mo_yolo_tpu/cfg/models/yolo_track.yaml", "MOTRTrack", (256, 512, 512)),
    ("mo_yolo_tpu/cfg/models/detr_track.yaml", "MOTRTrack", (256, 256, 256)),
    ("mo_yolo_tpu/cfg/models/yolo_mot.yaml", "RTDETRDecoder", (256, 512, 512)),
    ("mo_yolo_tpu/cfg/models/yolo_track_rare.yaml", "MOTRTrack",
     (256, 512, 1024)),
]


@pytest.mark.parametrize("path,head,chans", VARIANTS)
def test_variant_parses(path, head, chans):
    spec = parse_model_yaml(path)
    assert spec.head_module == head
    assert spec.out_channels == chans
    assert spec.out_strides == (8, 16, 32)


def test_negative_from_indices_resolve():
    """detr_track uses [[-2, -1], ...] concat rows; they must resolve to
    absolute node indices."""
    spec = parse_model_yaml("mo_yolo_tpu/cfg/models/detr_track.yaml")
    for node in spec.nodes:
        assert all(f >= -1 for f in node.frm)
        if node.module == "Concat":
            assert all(f >= 0 for f in node.frm)


def test_hg_aifi_graph_forwards():
    """HGStem/HGBlock/DWConv/AIFI/RepC3 graph builds and produces the three
    stride-8/16/32 taps."""
    spec = parse_model_yaml("mo_yolo_tpu/cfg/models/detr_track.yaml")
    bb = BackboneNeck(spec)
    x = jnp.zeros((1, 64, 64, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    feats = bb.apply(v, x)
    assert [f.shape for f in feats] == [(1, 8, 8, 256), (1, 4, 4, 256),
                                        (1, 2, 2, 256)]


def test_aifi_layer_shapes_and_pos():
    from mo_yolo_tpu.models.layers import AIFI, sincos_pos_2d

    pos = sincos_pos_2d(4, 3, 16)
    assert pos.shape == (1, 12, 16)
    m = AIFI(cm=32, num_heads=2)
    x = jnp.ones((2, 3, 4, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape


def test_c3_and_repc3_layers():
    from mo_yolo_tpu.models.layers import C3, RepC3

    x = jnp.ones((1, 8, 8, 32))
    for M in (C3(32, n=2), RepC3(32, n=2)):
        v = M.init(jax.random.PRNGKey(0), x)
        y = M.apply(v, x)
        assert y.shape == (1, 8, 8, 32)


def test_conv_primitive_variants():
    """ConvTranspose / Focus / GhostConv forward shapes (reference
    `conv.py` primitives) + graph rows parse."""
    from mo_yolo_tpu.models.layers import ConvTranspose, Focus, GhostConv

    x = jnp.ones((1, 8, 8, 16))
    ct = ConvTranspose(8)
    y = ct.apply(ct.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 16, 16, 8)
    f = Focus(24)
    y = f.apply(f.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 4, 4, 24)
    g = GhostConv(32)
    y = g.apply(g.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 8, 8, 32)

    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Focus", [16]],
            [-1, 1, "GhostConv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [
            [-1, 1, "ConvTranspose", [16]],
            [[1, 2, 3], 1, "Detect", ["nc"]],
        ],
    }
    spec = parse_model_yaml(cfg)
    assert spec.out_strides == (4, 8, 16)
    bb = BackboneNeck(spec)
    xx = jnp.zeros((1, 32, 32, 3))
    feats = bb.apply(bb.init(jax.random.PRNGKey(0), xx), xx)
    assert [f.shape[-1] for f in feats] == [32, 32, 32]
