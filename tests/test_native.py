"""Native I/O extension vs the pure-Python writers: byte-identical
output, same validation behaviour."""

import numpy as np
import pytest

from lbm_tpu.params import Params
from lbm_tpu.state import initial_state_np

native = pytest.importorskip("lbm_tpu._native")

import lbm_tpu.io as lio


@pytest.fixture
def scene():
    p = Params(nx=64, ny=32, max_iters=10, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    rng = np.random.default_rng(11)
    cells = rng.uniform(0.01, 0.2, (9, p.ny, p.nx)).astype(np.float32)
    obstacles = np.zeros((p.ny, p.nx), dtype=bool)
    obstacles[0, :] = obstacles[-1, :] = True
    obstacles[3, 7] = True
    return p, cells, obstacles


def _write_both(tmp_path, writer_args, monkeypatch):
    """Write once with the native ext, once with the Python fallback."""
    native_path = tmp_path / "native.dat"
    py_path = tmp_path / "python.dat"
    lio.write_final_state(native_path, *writer_args)
    monkeypatch.setattr(lio, "_native", None)
    lio.write_final_state(py_path, *writer_args)
    return native_path.read_bytes(), py_path.read_bytes()


def test_final_state_bytes_identical(tmp_path, scene, monkeypatch):
    p, cells, obstacles = scene
    nb, pb = _write_both(tmp_path, (p, cells, obstacles), monkeypatch)
    assert nb == pb


def test_av_vels_bytes_identical(tmp_path, monkeypatch):
    av = np.array([1.2345e-5, 0.0, 3.3e-2, 7.77e-9], dtype=np.float32)
    native_path = tmp_path / "native.dat"
    py_path = tmp_path / "python.dat"
    lio.write_av_vels(native_path, av)
    monkeypatch.setattr(lio, "_native", None)
    lio.write_av_vels(py_path, av)
    assert native_path.read_bytes() == py_path.read_bytes()


def test_read_obstacles_native(tmp_path):
    f = tmp_path / "obs.dat"
    f.write_text("0 0 1\n3 1 1\n0 0 1\n")  # duplicate line like the corners
    mask = np.zeros((4, 8), dtype=np.uint8)
    n = native.read_obstacles(str(f), 8, 4, mask)
    assert n == 3  # line count includes duplicates (d2q9-bgk.c:640)
    assert mask[0, 0] == 1 and mask[1, 3] == 1
    assert mask.sum() == 2


def test_read_obstacles_native_validation(tmp_path):
    f = tmp_path / "obs.dat"
    f.write_text("9 0 1\n")
    mask = np.zeros((4, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="x-coord"):
        native.read_obstacles(str(f), 8, 4, mask)
    f.write_text("1 1 2\n")
    with pytest.raises(ValueError, match="blocked"):
        native.read_obstacles(str(f), 8, 4, mask)


def test_final_state_shape_mismatch_raises(tmp_path, scene):
    """Mismatched buffer shapes must raise, not read out of bounds."""
    p, cells, obstacles = scene
    u_x, u_y, u, pressure = lio.final_state_fields(p, cells, obstacles)
    with pytest.raises(ValueError, match="shape"):
        native.write_final_state(
            str(tmp_path / "bad.dat"),
            np.ascontiguousarray(u_x),
            np.ascontiguousarray(u_y[:-1]),  # one row short
            np.ascontiguousarray(u),
            np.ascontiguousarray(pressure),
            np.ascontiguousarray(obstacles.astype(np.int32)),
        )
