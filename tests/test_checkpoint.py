"""Checkpoint/resume and debug-mode tests."""

import numpy as np

from lbm_tpu.obstacles import generate_obstacles
from lbm_tpu.params import Params
from lbm_tpu.runner import (
    load_checkpoint,
    run_simulation,
    save_checkpoint,
)


def small_params(**kw):
    defaults = dict(nx=32, ny=16, max_iters=30, reynolds_dim=10,
                    density=0.1, accel=0.005, omega=1.85)
    defaults.update(kw)
    return Params(**defaults)


def test_checkpoint_roundtrip(tmp_path):
    f = tmp_path / "ck.npz"
    cells = np.random.default_rng(0).random((9, 4, 8)).astype(np.float32)
    av = np.arange(5, dtype=np.float32)
    save_checkpoint(f, 5, cells, av)
    step, c, a = load_checkpoint(f)
    assert step == 5
    np.testing.assert_array_equal(c, cells)
    np.testing.assert_array_equal(a, av)


def test_chunked_equals_single_shot(tmp_path):
    p = small_params()
    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    ck = run_simulation(
        p, obstacles, kernel="reference",
        checkpoint_every=7, checkpoint_file=tmp_path / "ck.npz",
    )
    np.testing.assert_array_equal(base.cells, ck.cells)
    np.testing.assert_allclose(base.av_vels, ck.av_vels, rtol=1e-6)
    # The final checkpoint holds the completed run.
    step, cells, av = load_checkpoint(tmp_path / "ck.npz")
    assert step == p.max_iters
    np.testing.assert_array_equal(cells, ck.cells)


def test_resume_continues_trajectory(tmp_path):
    p = small_params(max_iters=30)
    obstacles = generate_obstacles(p.nx, p.ny)
    full = run_simulation(p, obstacles, kernel="reference")

    # Run half, checkpoint, then resume to the end.
    half = run_simulation(
        p, obstacles, kernel="reference", n_iters=15,
        checkpoint_every=15, checkpoint_file=tmp_path / "ck.npz",
    )
    resumed = run_simulation(
        p, obstacles, kernel="reference", resume_from=tmp_path / "ck.npz",
    )
    np.testing.assert_array_equal(full.cells, resumed.cells)
    np.testing.assert_allclose(full.av_vels, resumed.av_vels, rtol=1e-6)
    np.testing.assert_allclose(full.av_vels[:15], half.av_vels, rtol=1e-6)


def test_debug_mode_prints_reference_block(capsys):
    p = small_params(max_iters=3)
    obstacles = generate_obstacles(p.nx, p.ny)
    res = run_simulation(p, obstacles, kernel="reference", debug=True)
    out = capsys.readouterr().out
    assert "==timestep: 0==" in out
    assert "==timestep: 2==" in out
    assert "av velocity: " in out
    assert "tot density: " in out
    # Debug trajectory equals the jitted path's.
    base = run_simulation(p, obstacles, kernel="reference")
    np.testing.assert_allclose(base.av_vels, res.av_vels, rtol=1e-6)
