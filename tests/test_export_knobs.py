"""Reference export knobs (`cfg/default.yaml:71-79`): half / int8 /
dynamic / keras wired into `MOTRTrack.export`."""


import pytest

pytestmark = pytest.mark.heavy  # multi-minute TF/TFLite conversions
import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _tiny():
    from mo_yolo_tpu.api import MOTRTrack
    return MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                     nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=4)


def test_half_bakes_bf16_params(tmp_path):
    import jax.numpy as jnp
    from mo_yolo_tpu.utils.checkpoint import load_params
    m = _tiny()
    m.export("params", str(tmp_path / "w"), half=True)
    # the ARTIFACT carries bf16 weights...
    saved = jax.tree.leaves(load_params(str(tmp_path / "w")))
    assert all(x.dtype != jnp.float32 for x in saved if hasattr(x, "dtype")
               and jnp.issubdtype(x.dtype, jnp.floating))
    # ...but the LIVE model keeps its float32 weights (regression: export
    # used to reassign self.variables to the downcast tree)
    live = jax.tree.leaves(m.variables)
    assert any(hasattr(x, "dtype") and x.dtype == jnp.float32 for x in live)


def test_tflite_half_smaller_than_f32(tmp_path):
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    from pathlib import Path
    m = _tiny()
    p32 = m.export("tflite", str(tmp_path / "f32"))
    m2 = _tiny()
    p16 = m2.export("tflite", str(tmp_path / "f16"), half=True)
    assert Path(p16).stat().st_size < Path(p32).stat().st_size * 0.8


def test_dynamic_batch_saved_model(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from mo_yolo_tpu.models.tracker import init_track_state
    m = _tiny()
    out_dir = m.export("saved_model", str(tmp_path / "dyn"), dynamic=True)
    mod = tf.saved_model.load(out_dir)
    for b in (1, 2):
        state = init_track_state(b, m.model.tracker.n_slots, m.model.hd)
        st = tuple(tf.constant(np.asarray(x, np.float32)
                               if x.dtype.name.startswith("float")
                               else np.asarray(x)) for x in state)
        _, out = mod.f(st, tf.zeros((b, 64, 64, 3)))
        assert out.shape[0] == b


def test_tflite_int8_quantizes_weights(tmp_path):
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    from pathlib import Path
    m = _tiny()
    p32 = m.export("tflite", str(tmp_path / "f32"))
    m2 = _tiny()
    p8 = m2.export("tflite", str(tmp_path / "i8"), int8=True)
    # dynamic-range PTQ: int8 weights shrink the flatbuffer (the tiny
    # test model is mostly non-weight content, so well under 1x but not
    # the asymptotic 4x a full-size model shows)
    assert Path(p8).stat().st_size < Path(p32).stat().st_size * 0.8


def test_keras_export(tmp_path):
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    from pathlib import Path
    m = _tiny()
    p = m.export("saved_model", str(tmp_path / "k"), keras=True)
    assert p.endswith(".keras") and Path(p).exists()


def test_inert_knobs_warn_but_export(tmp_path):
    m = _tiny()
    p = m.export("stablehlo", str(tmp_path / "m"), simplify=True, nms=True,
                 optimize=True, workspace=8)
    assert p.endswith(".stablehlo.txt")
