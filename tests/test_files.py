"""File helpers + run-dir incrementing (reference `utils/files.py` and
the `project`/`name`/`exist_ok` save-dir semantics)."""

from pathlib import Path

from mo_yolo_tpu.utils.files import file_age, file_size, increment_path


def test_increment_path(tmp_path):
    d = tmp_path / "exp"
    assert increment_path(d) == d                 # absent: unchanged
    d.mkdir()
    assert increment_path(d) == tmp_path / "exp2"
    (tmp_path / "exp2").mkdir()
    assert increment_path(d) == tmp_path / "exp3"
    assert increment_path(d, exist_ok=True) == d  # exist_ok: reuse
    f = tmp_path / "r.txt"
    f.write_text("x")
    assert increment_path(f) == tmp_path / "r2.txt"  # suffix preserved
    made = increment_path(tmp_path / "mk" / "sub", mkdir=True)
    assert made.is_dir()


def test_route_kwargs_exist_ok(tmp_path):
    from mo_yolo_tpu.cli import route_kwargs

    def facade(data, save_dir="runs"):
        pass

    (tmp_path / "n").mkdir(parents=True)
    out = route_kwargs({"project": str(tmp_path), "name": "n"}, facade)
    assert out["save_dir"] == str(tmp_path / "n2")    # never overwrite
    out2 = route_kwargs({"project": str(tmp_path), "name": "n",
                         "exist_ok": True}, facade)
    assert out2["save_dir"] == str(tmp_path / "n")    # reuse requested
    assert "exist_ok" not in out2                     # consumed, no warn


def test_file_age_and_size(tmp_path):
    f = tmp_path / "a.bin"
    f.write_bytes(b"0" * (1 << 20))
    assert 0 <= file_age(f) < 1
    assert abs(file_size(f) - 1.0) < 1e-6
    assert abs(file_size(tmp_path) - 1.0) < 1e-6      # dir recurses
    assert file_size(tmp_path / "missing") == 0.0
