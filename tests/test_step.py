"""Physics tests for the jnp fused step: conservation, bounce-back,
acceleration guard, and golden-trajectory prefix agreement."""

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_tpu.obstacles import num_non_obstacles_r
from lbm_tpu.ops.reference import accelerate_flow, collide_stream, fused_step
from lbm_tpu.params import Params
from lbm_tpu.state import initial_state
from lbm_tpu.runner import make_simulate, run_simulation

from conftest import requires_reference


def small_params(**kw):
    defaults = dict(nx=16, ny=16, max_iters=10, reynolds_dim=10,
                    density=0.1, accel=0.005, omega=1.85)
    defaults.update(kw)
    return Params(**defaults)


def test_density_conservation():
    """Total density is conserved by collide-stream (d2q9-bgk.c:127-128)."""
    p = small_params()
    rng = np.random.default_rng(0)
    cells = jnp.asarray(
        rng.uniform(0.01, 0.2, size=(9, p.ny, p.nx)).astype(np.float32)
    )
    obstacles = jnp.zeros((p.ny, p.nx), dtype=bool)
    before = float(jnp.sum(cells, dtype=jnp.float64 if cells.dtype == jnp.float64 else jnp.float32))
    new, _ = collide_stream(cells, obstacles, p.omega)
    after = float(jnp.sum(new))
    assert np.isclose(before, after, rtol=1e-5)


def test_bounceback_reverses_at_obstacles():
    """At an obstacle cell, each outgoing speed equals the streamed-in
    opposite speed (d2q9-bgk.c:325-333)."""
    p = small_params()
    rng = np.random.default_rng(1)
    cells = jnp.asarray(
        rng.uniform(0.01, 0.2, size=(9, p.ny, p.nx)).astype(np.float32)
    )
    obstacles = np.zeros((p.ny, p.nx), dtype=bool)
    obstacles[5, 7] = True
    new, _ = collide_stream(cells, jnp.asarray(obstacles), p.omega)
    # Streamed value for speed k at (jj, ii) comes from (jj-cy, ii-cx).
    from lbm_tpu.state import D2Q9

    for k in range(9):
        src_j = (5 - D2Q9.CY[int(D2Q9.OPP[k])]) % p.ny
        src_i = (7 - D2Q9.CX[int(D2Q9.OPP[k])]) % p.nx
        expected = cells[int(D2Q9.OPP[k]), src_j, src_i]
        assert new[k, 5, 7] == expected


def test_streaming_periodic_wrap():
    """A pulse streams by one lattice vector per step with periodic wrap."""
    p = small_params(omega=0.0)  # omega=0: no relaxation, pure streaming
    cells = np.zeros((9, p.ny, p.nx), dtype=np.float32)
    # Put mass only in speed 1 (east) at the right edge; avoid rho=0
    # elsewhere by adding a uniform background in speed 0.
    cells[0] = 0.1
    cells[1, 3, p.nx - 1] = 0.5
    obstacles = jnp.zeros((p.ny, p.nx), dtype=bool)
    new, _ = collide_stream(jnp.asarray(cells), obstacles, np.float32(0.0))
    # speed 1 mass moved east with wraparound to x=0
    assert np.isclose(float(new[1, 3, 0]), 0.5)
    assert float(new[1, 3, p.nx - 1]) == 0.0


def test_accelerate_flow_guard():
    """Forcing applies only where west speeds stay positive and cell is
    fluid (d2q9-bgk.c:250-253)."""
    p = small_params()
    cells = np.asarray(initial_state(p)).copy()
    row = p.ny - 2
    # Make one column's speed 3 too small for the guard.
    cells[3, row, 4] = 1e-6
    obstacles = np.zeros((p.ny, p.nx), dtype=bool)
    obstacles[row, 9] = True
    out = np.asarray(
        accelerate_flow(jnp.asarray(cells), jnp.asarray(obstacles),
                        p.accel_w1, p.accel_w2)
    )
    w1, w2 = p.accel_w1, p.accel_w2
    # Normal column 2: accelerated.
    assert np.isclose(out[1, row, 2], cells[1, row, 2] + w1)
    assert np.isclose(out[3, row, 2], cells[3, row, 2] - w1)
    assert np.isclose(out[5, row, 2], cells[5, row, 2] + w2)
    assert np.isclose(out[6, row, 2], cells[6, row, 2] - w2)
    # Guarded column 4 and obstacle column 9: unchanged.
    np.testing.assert_array_equal(out[:, row, 4], cells[:, row, 4])
    np.testing.assert_array_equal(out[:, row, 9], cells[:, row, 9])
    # Other rows untouched.
    np.testing.assert_array_equal(out[:, row + 1, :], cells[:, row + 1, :])
    np.testing.assert_array_equal(out[:, row - 1, :], cells[:, row - 1, :])


@requires_reference
def test_golden_prefix_128(params_128, obstacles_128, golden_av_vels_128,
                           monkeypatch):
    """First 200 av_vels of the 128x128 scene match the golden trajectory.

    av_vels[tt] depends only on steps 0..tt, so a prefix run checks the
    full per-step pipeline against check/128x128.av_vels.dat. The golden
    data is double-precision (original coursework code); f32 with the
    reference's exact term-by-term association tracks it to ~1e-4 % over
    this horizon — far inside check.py's 1 % gate. The default paired
    equilibrium drifts ~1e-2 % here and is gated at 0.1 % by
    test_golden_grids; this test pins the reference association to keep
    guarding it at the tighter bar.
    """
    monkeypatch.setenv("LBM_PAIRED_EQ", "0")
    n = 200
    sim = make_simulate(params_128, kernel="reference", n_iters=n)
    cells0 = initial_state(params_128)
    inv = num_non_obstacles_r(obstacles_128)
    _, av = sim(cells0, jnp.asarray(obstacles_128), inv)
    av = np.asarray(av)
    ref = golden_av_vels_128[:n]
    pct = 100.0 * np.abs((ref - av) / ref)
    assert pct.max() < 0.01, f"max %diff {pct.max():.2e} at {pct.argmax()}"


@requires_reference
def test_run_simulation_result_types(params_128, obstacles_128):
    res = run_simulation(params_128, obstacles_128, kernel="reference", n_iters=5)
    assert res.cells.shape == (9, 128, 128)
    assert res.cells.dtype == np.float32
    assert res.av_vels.shape == (5,)
    assert np.isfinite(res.reynolds)
    assert set(res.timings) == {"init", "compute", "collate", "total"}


def test_float64_params_without_x64_raises():
    """Library calls with float64 params in a non-x64 process would
    silently compute f32 and relabel it — refuse instead (ADVICE r1)."""
    import jax
    import pytest as _pytest

    from lbm_tpu.runner import make_simulate

    assert not jax.config.jax_enable_x64  # test processes never enable it
    p = small_params(dtype=np.float64)
    with _pytest.raises(ValueError, match="x64"):
        make_simulate(p, kernel="reference")
