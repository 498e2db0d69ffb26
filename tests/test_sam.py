"""SAM family tests (reference `ultralytics/models/sam/`): tiny configs,
prompt packing, decode semantics, everything-grid generator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mo_yolo_tpu.models.sam import (
    BOX_BR, BOX_TL, PAD, POS, SAM, SAMModel)


def tiny_sam(**kw):
    return SAM(img_size=64, max_points=4, seed=0,
               dim=32, depth=2, num_heads=2, global_idx=(1,), window=4,
               **kw)


@pytest.fixture(scope="module")
def sam():
    return tiny_sam()


def test_shapes_and_embed_reuse(sam):
    img = (np.random.default_rng(0).uniform(0, 1, (48, 40, 3)) * 255
           ).astype(np.uint8)
    out = sam(img, points=[[20, 20]])
    assert out["masks"].shape == (1, 64, 64)
    assert out["low_res"].shape == (1, 16, 16)
    assert out["iou"].shape == (1,)
    # embedding is cached: prompting again without an image must reuse it
    out2 = sam(points=[[20, 20]], bboxes=[[4, 4, 30, 30]])
    assert out2["masks"].shape == (1, 64, 64)


def test_prompt_packing(sam):
    # box -> two corner tokens; extra points merge into the box row
    p, l = sam._pack(points=[[10, 12]], labels=[1],
                     boxes=[[1, 2, 3, 4], [5, 6, 7, 8]])
    assert p.shape == (2, 4, 2) and l.shape == (2, 4)
    assert list(l[0]) == [BOX_TL, BOX_BR, POS, PAD]
    np.testing.assert_allclose(p[1, :2], [[5, 6], [7, 8]])
    # points only -> one prompt row, padded
    p, l = sam._pack(points=[[1, 1], [2, 2]], labels=[1, 0], boxes=None)
    assert p.shape == (1, 4, 2)
    assert list(l[0]) == [1, 0, PAD, PAD]


def test_multimask_slots_differ(sam):
    """The 4 mask tokens are distinct hypernetworks: slot outputs must not
    be identical (decoders.py:41-55 token design)."""
    img = np.full((64, 64, 3), 128, np.uint8)
    sam.embed_image(img)
    emb, _ = sam._emb_cache
    p = jnp.asarray(np.array([[[32, 32], [0, 0], [0, 0], [0, 0]]],
                             np.float32))
    l = jnp.asarray(np.array([[POS, PAD, PAD, PAD]], np.int32))
    masks, iou = sam._decode(sam.variables, emb, p, l)
    masks = np.asarray(masks)
    assert masks.shape == (1, 4, 16, 16) and iou.shape == (1, 4)
    assert np.abs(masks[0, 0] - masks[0, 1]).max() > 1e-6


def test_mask_prompt_gating(sam):
    """has_mask=False must equal the no-mask dense embedding path."""
    model, v = sam.model, sam.variables
    emb = jnp.zeros((4, 4, 256))          # grid = img_size/16 = 4
    p = jnp.zeros((1, 4, 2))
    l = jnp.full((1, 4), PAD, jnp.int32)
    m_in = jnp.ones((1, 16, 16, 1))       # mask input is 4x the grid
    a, _ = model.apply(v, emb, p, l, None, None, method=model.decode)
    b, _ = model.apply(v, emb, p, l, m_in, jnp.asarray([False]),
                       method=model.decode)
    c, _ = model.apply(v, emb, p, l, m_in, jnp.asarray([True]),
                       method=model.decode)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6


def test_generate_everything(sam):
    img = (np.random.default_rng(1).uniform(0, 1, (64, 64, 3)) * 255
           ).astype(np.uint8)
    out = sam.generate(img, grid=2, iou_thresh=-10.0,
                       stability_thresh=0.0, nms_iou=0.99)
    # untrained net: no guarantees on count, only on consistency
    assert out["masks"].dtype == bool
    assert len(out["masks"]) == len(out["scores"])
    assert out["masks"].shape[1:] == (16, 16)


def test_variant_table():
    from mo_yolo_tpu.models.sam import _VARIANTS, build_sam
    assert _VARIANTS["b"]["depth"] == 12
    assert _VARIANTS["l"]["depth"] == 24
    assert _VARIANTS["h"]["dim"] == 1280
    m = build_sam("vit_b", img_size=64)
    assert isinstance(m, SAMModel) and m.dim == 768


def test_mobile_sam_tinyvit_encoder():
    """TinyViT (MobileSAM) produces the same embedding contract as the ViT
    encoder and drives the same decoders (`build.py:55-64`)."""
    from mo_yolo_tpu.models.sam import SAM, build_sam

    m = build_sam("mobile", img_size=64)
    assert m.encoder == "tiny"
    sam = SAM(img_size=64, max_points=4, encoder="tiny")
    img = (np.random.default_rng(2).uniform(0, 1, (64, 64, 3)) * 255
           ).astype(np.uint8)
    out = sam(img, points=[[32, 32]])
    assert out["masks"].shape == (1, 64, 64)
    emb, _ = sam._emb_cache
    assert emb.shape == (4, 4, 256)   # img/16 grid, 256ch — ViT contract


def test_generate_crop_layers(sam):
    """Multi-crop everything sweep (amg.py crop layers): crops paste back
    into full-frame low-res coords; output contract unchanged."""
    img = (np.random.default_rng(3).uniform(0, 1, (64, 80, 3)) * 255
           ).astype(np.uint8)
    base = sam.generate(img, grid=2, iou_thresh=-10.0, stability_thresh=0.0,
                        nms_iou=1.1)           # nms off: count all
    crop = sam.generate(img, grid=2, iou_thresh=-10.0, stability_thresh=0.0,
                        nms_iou=1.1, crop_layers=1)
    # layer 1 adds 4 crops x grid^2 points x 3 masks candidates
    assert len(crop["masks"]) > len(base["masks"])
    assert crop["masks"].shape[1:] == base["masks"].shape[1:]
    assert len(crop["masks"]) == len(crop["scores"])


def test_build_sam_tiny_aliases():
    """Round-2 advisor: 't'/'tiny'/'vit_t' must build the TinyViT
    MobileSAM encoder (the old lstrip('vit_') stripped {v,i,t,_} chars)."""
    from mo_yolo_tpu.models.sam import build_sam

    for alias in ("t", "tiny", "vit_t", "mobile"):
        m = build_sam(alias, img_size=64)
        assert m.encoder == "tiny", alias
    assert build_sam("vit_b", img_size=64).encoder != "tiny"


def test_prompt_letterbox_transform(sam):
    """Round-2 advisor: prompts are given in ORIGINAL-image pixels and
    must be mapped through the embed letterbox (coord*gain+pad) before
    hitting the prompt encoder."""
    img = np.full((32, 64, 3), 128, np.uint8)     # wide: gain=1, y-pad
    sam.embed_image(img)
    _, meta = sam._emb_cache
    g = meta["gain"][0]
    px, py = meta["pad"]
    p, l = sam._pack(points=[[10, 12]], labels=[1], boxes=[[4, 4, 30, 30]],
                     meta=meta)
    np.testing.assert_allclose(p[0, 0], [4 * g + px, 4 * g + py], atol=1e-5)
    np.testing.assert_allclose(p[0, 2], [10 * g + px, 12 * g + py],
                               atol=1e-5)
    # PAD slots stay zero (not shifted by pad)
    assert (p[0, 3] == 0).all() and l[0, 3] == PAD


def test_sam_text_prompt_mock_embedder(sam, monkeypatch):
    """SAM.text_prompt: everything-mode masks scored against text via the
    pluggable embedder; the best-scoring mask is returned."""
    from tests.test_fastsam import MeanColorEmbedder

    H = W = sam.img_size
    image = np.zeros((H, W, 3), np.uint8)
    image[4:20, 4:20, 0] = 220           # red region
    image[36:60, 36:60, 1] = 220         # green region

    g4 = (sam.img_size // 16) * 4
    masks = np.zeros((2, g4, g4), bool)
    s16 = g4 / sam.img_size
    masks[0, int(4*s16):int(20*s16), int(4*s16):int(20*s16)] = True
    masks[1, int(36*s16):int(60*s16), int(36*s16):int(60*s16)] = True
    fake = {"masks": masks, "scores": np.array([0.9, 0.8]),
            "meta": {"gain": (1.0, 1.0), "pad": (0.0, 0.0),
                     "orig_shape": (H, W), "scale_fill": False}}
    monkeypatch.setattr(sam, "generate", lambda img, **kw: dict(fake))

    out = sam.text_prompt(image, "green", embedder=MeanColorEmbedder())
    assert out["masks"].shape[0] == 1
    assert (out["masks"][0] == masks[1]).all()
    assert out["text_scores"].argmax() == 1
