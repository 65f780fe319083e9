"""Pallas fused kernel vs the portable jnp reference (interpret mode on
CPU; compiled on real TPU)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_tpu.obstacles import generate_obstacles
from lbm_tpu.ops.pallas_fused import (
    _pick_block_rows,
    collide_stream_pallas,
    make_fused_step,
)
from lbm_tpu.ops.reference import collide_stream, collide_stream_halo, fused_step
from lbm_tpu.params import Params


def small_params(**kw):
    defaults = dict(nx=128, ny=32, max_iters=5, reynolds_dim=10,
                    density=0.1, accel=0.005, omega=1.85)
    defaults.update(kw)
    return Params(**defaults)


def rand_state(p, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.01, 0.2, (9, p.ny, p.nx)).astype(np.float32))


def test_pick_block_rows():
    assert _pick_block_rows(1024, 1024) in (32, 64, 128, 256)
    assert 1024 % _pick_block_rows(1024, 1024) == 0
    assert _pick_block_rows(32, 128) == 32  # whole grid fits one window
    assert _pick_block_rows(8, 16384) >= 1


def test_pallas_matches_reference_periodic():
    p = small_params()
    cells = rand_state(p)
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    want, want_tot = collide_stream(cells, obstacles, p.omega)
    got, got_tot = collide_stream_pallas(
        cells, cells[:, -1:, :], cells[:, :1, :], obstacles, p.omega
    )
    # 1-ulp differences are expected between the two compilation paths
    # (FMA/fusion choices differ); anything beyond that is a real bug.
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=2e-5, atol=5e-8)
    assert np.isclose(float(want_tot), float(got_tot), rtol=1e-5)


def test_pallas_matches_reference_multiblock():
    """Grid spanning several row blocks exercises the DMA window edges."""
    p = small_params(ny=128, nx=256)
    cells = rand_state(p, seed=2)
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    south, north = cells[:, -1:, :], cells[:, :1, :]
    want, want_tot = collide_stream_halo(cells, south, north, obstacles, p.omega)
    got, got_tot = collide_stream_pallas(cells, south, north, obstacles, p.omega)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=2e-5, atol=5e-8)
    assert np.isclose(float(want_tot), float(got_tot), rtol=1e-5)


def test_pallas_nonwrapped_halos():
    """Arbitrary (non-periodic) halo rows — the sharded-path contract."""
    p = small_params(ny=64, nx=128)
    cells = rand_state(p, seed=3)
    rng = np.random.default_rng(4)
    south = jnp.asarray(rng.uniform(0.01, 0.2, (9, 1, p.nx)).astype(np.float32))
    north = jnp.asarray(rng.uniform(0.01, 0.2, (9, 1, p.nx)).astype(np.float32))
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    want, _ = collide_stream_halo(cells, south, north, obstacles, p.omega)
    got, _ = collide_stream_pallas(cells, south, north, obstacles, p.omega)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=2e-5, atol=5e-8)


def test_fused_step_pallas_trajectory():
    """A few full steps (accelerate + kernel) match the jnp fused_step."""
    p = small_params(ny=32, nx=128)
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    step = make_fused_step(p)
    from lbm_tpu.state import initial_state

    c_ref = initial_state(p)
    c_pal = initial_state(p)
    for _ in range(3):
        c_ref, t_ref = fused_step(
            c_ref, obstacles, p.accel_w1, p.accel_w2, p.omega
        )
        c_pal, t_pal = step(c_pal, obstacles)
        np.testing.assert_allclose(
            np.asarray(c_ref), np.asarray(c_pal), rtol=2e-5, atol=5e-8
        )
        assert np.isclose(float(t_ref), float(t_pal), rtol=1e-4)


def test_pallas_odd_sizes():
    """Non-128-multiple widths and non-power-of-two heights still match
    the jnp reference (lane padding + odd block divisors)."""
    p = small_params(ny=24, nx=100)
    cells = rand_state(p, seed=5)
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    south, north = cells[:, -1:, :], cells[:, :1, :]
    want, _ = collide_stream_halo(cells, south, north, obstacles, p.omega)
    got, _ = collide_stream_pallas(cells, south, north, obstacles, p.omega)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=2e-5, atol=5e-8)


def test_carrystep_inkernel_accel_trajectory():
    """CarryStep (in-kernel row acceleration) trajectory matches the jnp
    path. Square grid so make_carry_step picks the row layout."""
    from lbm_tpu.runner import make_simulate
    from lbm_tpu.state import initial_state
    from lbm_tpu.obstacles import num_non_obstacles_r
    from lbm_tpu.ops.pallas_fused import make_carry_step, CarryStep

    p = small_params(ny=128, nx=128, max_iters=8)
    assert isinstance(make_carry_step(p), CarryStep)
    obstacles = generate_obstacles(p.nx, p.ny)
    inv = num_non_obstacles_r(obstacles)
    obs = jnp.asarray(obstacles)
    c1, a1 = make_simulate(p, kernel="reference", n_iters=8)(
        initial_state(p), obs, inv)
    c2, a2 = make_simulate(p, kernel="pallas", n_iters=8)(
        initial_state(p), obs, inv)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-4)


def test_transposed_carrystep_trajectory():
    """TransposedCarryStep (wide-grid layout, lane-masked acceleration)
    matches the jnp path on a wide grid."""
    from lbm_tpu.runner import make_simulate
    from lbm_tpu.state import initial_state
    from lbm_tpu.obstacles import num_non_obstacles_r
    from lbm_tpu.ops.pallas_fused import make_carry_step, TransposedCarryStep

    p = small_params(ny=32, nx=128, max_iters=8)
    assert isinstance(make_carry_step(p), TransposedCarryStep)
    obstacles = generate_obstacles(p.nx, p.ny)
    inv = num_non_obstacles_r(obstacles)
    obs = jnp.asarray(obstacles)
    c1, a1 = make_simulate(p, kernel="reference", n_iters=8)(
        initial_state(p), obs, inv)
    c2, a2 = make_simulate(p, kernel="pallas", n_iters=8)(
        initial_state(p), obs, inv)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-4)


def test_transpose_state_involution():
    from lbm_tpu.ops.pallas_fused import transpose_state

    rng = np.random.default_rng(12)
    cells = jnp.asarray(rng.random((9, 16, 32), np.float32))
    back = transpose_state(transpose_state(cells))
    np.testing.assert_array_equal(np.asarray(cells), np.asarray(back))


@pytest.mark.parametrize("ny", [12, 13])
def test_carrystep_accel_fallback_matches_reference(ny, monkeypatch):
    """When the forced row ny-2 lands on a block edge, CarryStep falls
    back to the XLA row update + edge-array mirror (the reference's
    buffer-accelerate flags, d2q9-bgk.c:241-245). Since by | h and
    by | h-2 imply by | 2, the edge case is only reachable with
    by <= 2 — force it by shrinking the per-slot VMEM budget."""
    import lbm_tpu.ops.pallas_fused as pf
    from lbm_tpu.runner import run_simulation

    monkeypatch.setattr(pf, "_SLOT_BYTES", 2 * 9 * 16 * 4)  # 2-row budget
    p = small_params(ny=ny, nx=16, max_iters=20)
    impl = pf.make_carry_step(p)
    assert type(impl) is pf.CarryStep, "nx < 2*ny must not transpose"
    assert impl._by <= 2 and not impl._in_kernel
    assert impl.steps_per_call == 1, "fallback cannot pair steps"

    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas")
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


class TestFusedTwoStep:
    """Temporal-blocking kernel (_pallas_step_fused): depth timesteps
    per HBM pass with depth-deep carried edge rows and redundant
    boundary-row compute. Trajectories must match the jnp reference at
    f32 reassociation level, including when the forced row ny-2 lands
    in an edge-array channel of a neighbouring block (the static owner
    factors) and when obstacles sit on the forced row (guarded forcing
    on loaded halo copies). iters%4==0 selects depth 4; iters%4==2
    falls back to depth 2."""

    def _check(self, p, obstacles):
        from lbm_tpu.runner import run_simulation, _select_impl

        impl = _select_impl(
            "pallas", p, paired=p.max_iters % 2 == 0, n_iters=p.max_iters
        )
        assert impl.fused > 1, "shape must select a fused kernel"
        base = run_simulation(p, obstacles, kernel="reference")
        got = run_simulation(p, obstacles, kernel="pallas")
        np.testing.assert_allclose(
            base.cells, got.cells, rtol=2e-5, atol=5e-8
        )
        np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)
        return impl

    def test_single_block_square(self):
        p = small_params(ny=32, nx=32, max_iters=12)
        obstacles = generate_obstacles(p.nx, p.ny)
        self._check(p, obstacles)

    @pytest.mark.slow
    def test_multiblock_forced_row_in_edge_channel(self, monkeypatch):
        """by=8 multi-block: block 0's prev-B edge row IS the forced row
        (global h-2), exercising the static owner factors; obstacles
        scattered on the forced row exercise the guard on edge copies."""
        import lbm_tpu.ops.pallas_fused as pf

        monkeypatch.setattr(pf, "_SLOT_BYTES", 8 * 9 * 32 * 4)
        # Pin depth 4 (small states default to depth 2 since v6).
        monkeypatch.setenv("LBM_PALLAS_DEPTH", "4")
        rng = np.random.default_rng(17)
        p = small_params(ny=32, nx=32, max_iters=12)
        obstacles = generate_obstacles(p.nx, p.ny)
        obstacles[p.ny - 2, :] |= rng.random(p.nx) < 0.3
        obstacles[p.ny - 2, 5] = False
        impl = self._check(p, obstacles)
        assert impl._h // impl._by == 4 and impl.fused == 4

    def test_unpaired_odd_pairs(self):
        """iters % 4 != 0: fused-2 runs unpaired (2 steps per call)."""
        from lbm_tpu.runner import _select_impl

        p = small_params(ny=32, nx=32, max_iters=10)
        impl = _select_impl("pallas", p, paired=False, n_iters=10)
        assert impl.fused == 2 and impl.steps_per_call == 2
        obstacles = generate_obstacles(p.nx, p.ny)
        self._check(p, obstacles)

    def test_transposed_wide_grid(self, monkeypatch):
        """Wide grids run fused-2 on the transposed lattice with the
        lane-masked forcing applied to every copy."""
        import lbm_tpu.ops.pallas_fused as pf

        monkeypatch.setattr(pf, "_SLOT_BYTES", 16 * 9 * 16 * 4)
        rng = np.random.default_rng(23)
        p = small_params(ny=16, nx=64, max_iters=12)
        obstacles = generate_obstacles(p.nx, p.ny)
        obstacles |= rng.random((p.ny, p.nx)) < 0.1
        obstacles[p.ny - 2, 7] = False
        impl = self._check(p, obstacles)
        assert type(impl) is pf.TransposedCarryStep

    def test_odd_iters_run_fused_main_plus_tail(self):
        """Indivisible iteration counts split into a paired-fused main
        segment plus a short unpaired tail (runner._segments), instead of
        running the whole trajectory at depth 1 — the reference's loop
        ran any maxIters at full speed (d2q9-bgk.c:191)."""
        from lbm_tpu.ops.pallas_fused import plan_iters
        from lbm_tpu.runner import _segments, run_simulation

        p = small_params(ny=32, nx=32, max_iters=21)
        main, tail = plan_iters(p, 21)
        assert main == 20 and tail == 1
        assert [n for _, n in _segments("pallas", p, 21)] == [20, 1]
        obstacles = generate_obstacles(p.nx, p.ny)

        base = run_simulation(p, obstacles, kernel="reference")
        got = run_simulation(p, obstacles, kernel="pallas")
        np.testing.assert_allclose(
            base.cells, got.cells, rtol=2e-5, atol=5e-8
        )
        np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)
        assert (np.asarray(got.av_vels) != 0).all()

    def test_plan_iters_official_scenes(self):
        """Every official scene length divides the preferred paired
        granularity (4 for chip-resident depth-2 grids, 8 for depth-4
        large states), so they all plan as one unsplit segment — the
        segmented path only engages for non-official lengths."""
        from lbm_tpu.ops.pallas_fused import plan_iters

        sq = small_params(ny=1024, nx=1024, max_iters=20000)
        assert plan_iters(sq, 20000) == (20000, 0)
        wide = small_params(ny=1024, nx=16384, max_iters=20000)
        assert plan_iters(wide, 20000) == (20000, 0)
        stress = small_params(ny=128, nx=131072, max_iters=20000)
        assert plan_iters(stress, 20000) == (20000, 0)
        # A non-official length on the same large grid does split, into
        # a paired depth-4 main and the shortest possible tail.
        assert plan_iters(wide, 20004) == (20000, 4)
        assert plan_iters(sq, 20001) == (20000, 1)

    @pytest.mark.parametrize(
        "iters,segs",
        [(3, [3]), pytest.param(6, [4, 2], marks=pytest.mark.slow)],
    )
    def test_short_indivisible_iters(self, iters, segs):
        """iters=3 (shorter than one paired pass, no depth divides it)
        is the genuine single-segment fallback: the whole run steps the
        depth-1 unpaired kernel. iters=6 splits into a paired depth-2
        main and a fused-but-unpaired depth-2 tail."""
        from lbm_tpu.runner import _segments, run_simulation

        p = small_params(ny=32, nx=32, max_iters=iters)
        assert [n for _, n in _segments("pallas", p, iters)] == segs
        obstacles = generate_obstacles(p.nx, p.ny)
        base = run_simulation(p, obstacles, kernel="reference")
        got = run_simulation(p, obstacles, kernel="pallas")
        np.testing.assert_allclose(
            base.cells, got.cells, rtol=2e-5, atol=5e-8
        )
        np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


def test_supports_tpu_grid_and_resolution(monkeypatch):
    """Grids whose (possibly transposed) row count is not 8-aligned
    cannot keep Mosaic DMA tiles aligned on real TPU: auto resolution
    must fall back to the reference kernel there, and an explicit
    pallas request must fail with a clear error instead of a Mosaic
    compile crash. 8-aligned grids (all official scenes) still resolve
    to pallas."""
    from lbm_tpu.ops.pallas_fused import supports_tpu_grid
    from lbm_tpu import runner

    assert supports_tpu_grid(1024, 1024)
    assert supports_tpu_grid(1024, 16384)  # transposed: h = nx
    assert supports_tpu_grid(128, 131072)
    assert not supports_tpu_grid(100, 100)
    # Lane alignment: the lane dimension must be a 128-multiple on real
    # TPU — a 16-lane auto-resolved grid produced a live Mosaic compile
    # failure ("Slice shape along dimension 2 must be aligned to tiling
    # (128), but is 16") before this gate covered lanes.
    assert not supports_tpu_grid(16, 32)   # transposed, lanes = ny = 16
    assert not supports_tpu_grid(25, 64)   # transposed, lanes = ny = 25
    assert not supports_tpu_grid(25, 32)   # no transpose, h = 25
    assert not supports_tpu_grid(128, 64)  # rows aligned, lanes = 64
    assert supports_tpu_grid(128, 256)

    monkeypatch.setattr(runner.jax, "default_backend", lambda: "tpu")
    p_ok = small_params(ny=128, nx=128)
    assert runner._resolve_kernel("auto", p_ok) == "pallas"
    p_odd = small_params(ny=100, nx=100)
    assert runner._resolve_kernel("auto", p_odd) == "reference"
    with pytest.raises(ValueError, match="8-aligned"):
        runner._resolve_kernel("pallas", p_odd)


@pytest.mark.slow
def test_depth8_opt_in_matches_reference(monkeypatch):
    """Depth 8 is available behind LBM_PALLAS_DEPTH (measured slower on
    the chip, so not a default) and must stay correct."""
    from lbm_tpu.runner import run_simulation, _select_impl

    monkeypatch.setenv("LBM_PALLAS_DEPTH", "8")
    p = small_params(ny=32, nx=32, max_iters=16)
    impl = _select_impl("pallas", p, paired=True, n_iters=16)
    assert impl.fused == 8 and impl.steps_per_call == 16
    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas")
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


def test_depth16_selection(monkeypatch):
    """Depth 16 is reachable behind LBM_PALLAS_DEPTH (measured 12.5%
    slower than depth 8 at 131072x128 on v5e — docs/PERF.md headroom #3 —
    so never a default) and by < 2*depth demotes. Correctness at 16 is
    proven on hardware (av_vels bit-identical to depth 8 over 2000 steps
    at 131072x128) and opt-in in interpret mode below — the O(depth²)
    boundary-stack trace makes the interpret run ~15 min, too slow for
    the default suite."""
    from lbm_tpu.ops.pallas_fused import _depth_preference, CarryStep
    from lbm_tpu.runner import _select_impl

    monkeypatch.setenv("LBM_PALLAS_DEPTH", "16")
    assert _depth_preference(131072, 128) == [16, 8, 4, 2]
    monkeypatch.setenv("LBM_PALLAS_DEPTH", "8")
    assert _depth_preference(131072, 128) == [8, 4, 2]
    monkeypatch.setenv("LBM_PALLAS_DEPTH", "16")

    impl = _select_impl("pallas", small_params(ny=32, nx=32, max_iters=32),
                        paired=True, n_iters=32)
    assert impl.fused == 16 and impl.steps_per_call == 32
    # A 16-row-block grid can't hold a 16-deep fused pass (by >= 2*depth).
    assert CarryStep(small_params(ny=16, nx=32), fuse=16).fused == 1


@pytest.mark.skipif(not os.environ.get("LBM_RUN_SLOW"),
                    reason="~15 min interpret trace; set LBM_RUN_SLOW=1")
def test_depth16_opt_in_matches_reference(monkeypatch):
    """Full interpret equivalence at depth 16 (opt-in, see above)."""
    from lbm_tpu.runner import run_simulation, _select_impl

    monkeypatch.setenv("LBM_PALLAS_DEPTH", "16")
    p = small_params(ny=32, nx=32, max_iters=32)
    impl = _select_impl("pallas", p, paired=True, n_iters=32)
    assert impl.fused == 16 and impl.steps_per_call == 32
    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas")
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


@pytest.mark.slow
def test_omega_absorbed_equilibrium_optout(monkeypatch):
    """The omega-absorbed relax (LBM_OMEGA_EQ=1 opt-in; default off,
    measured -4..-7% on TPU — docs/PERF.md) is a pure
    f32 reassociation: opting out restores the v6 association, and both
    settings track the reference-kernel trajectory."""
    from lbm_tpu.runner import run_simulation

    p = small_params(ny=64, nx=128, max_iters=20)
    obstacles = generate_obstacles(p.nx, p.ny)
    monkeypatch.setenv("LBM_OMEGA_EQ", "0")
    base = run_simulation(p, obstacles, kernel="reference")
    pal = run_simulation(p, obstacles, kernel="pallas")
    np.testing.assert_allclose(base.cells, pal.cells, rtol=2e-5, atol=5e-8)
    monkeypatch.setenv("LBM_OMEGA_EQ", "1")
    absd = run_simulation(p, obstacles, kernel="reference")
    np.testing.assert_allclose(base.cells, absd.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, absd.av_vels, rtol=1e-4)


def test_mxu_equilibrium_matches_reference(monkeypatch):
    """The MXU experiment form (feq as a (9,6)x(6,N) dot_general,
    lbm_tpu/ops/mxu_eq.py) is algebraically the reference equilibrium:
    one step must match collide_stream at f32-reassociation level."""
    from lbm_tpu.ops.mxu_eq import collide_stream_mxu

    monkeypatch.setenv("LBM_PAIRED_EQ", "0")
    p = small_params(ny=64, nx=128)
    cells = rand_state(p, seed=9)
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    want, want_tot = collide_stream(cells, obstacles, p.omega)
    got, got_tot = collide_stream_mxu(cells, obstacles, p.omega)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=5e-5, atol=1e-7
    )
    assert np.isclose(float(want_tot), float(got_tot), rtol=1e-4)


def test_paired_equilibrium_matches_reference(monkeypatch):
    """The default f32 equilibrium is the even/odd opposite-speed paired
    form (fewer VPU ops, different f32 association); LBM_PAIRED_EQ=0
    restores the reference's term-by-term expansion. Both the jnp and
    pallas paths share the rewritten _bgk_update, so they must stay
    within the usual cross-compilation tolerance of the unpaired
    reference trajectory — and of each other."""
    from lbm_tpu.runner import run_simulation

    p = small_params(ny=64, nx=128, max_iters=20)
    obstacles = generate_obstacles(p.nx, p.ny)
    monkeypatch.setenv("LBM_PAIRED_EQ", "0")
    base = run_simulation(p, obstacles, kernel="reference")

    monkeypatch.setenv("LBM_PAIRED_EQ", "1")
    ref_paired = run_simulation(p, obstacles, kernel="reference")
    pal_paired = run_simulation(p, obstacles, kernel="pallas")
    # Paired vs unpaired: identical algebra, different rounding.
    np.testing.assert_allclose(
        base.cells, ref_paired.cells, rtol=2e-5, atol=5e-8
    )
    np.testing.assert_allclose(base.av_vels, ref_paired.av_vels, rtol=1e-4)
    # Pallas under the flag tracks its own jnp form as tightly as ever.
    np.testing.assert_allclose(
        ref_paired.cells, pal_paired.cells, rtol=2e-5, atol=5e-8
    )
    np.testing.assert_allclose(
        ref_paired.av_vels, pal_paired.av_vels, rtol=1e-4
    )


def test_accel_line_extract_bit_exact():
    """The transposed-layout line extraction (guards on the forced
    column's slices only) is bit-identical to the full-plane guard form
    it replaces on the resident kernels' hot path — all factors are
    exact 0/1 floats, so the algebra commutes exactly."""
    import jax.numpy as jnp

    from lbm_tpu.ops.pallas_fused import (
        AccelSpec,
        _accel_line_extract,
        _accel_ok,
        _accelerated,
    )
    from lbm_tpu.params import Params

    p = Params(nx=32, ny=16, max_iters=1, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    accel = AccelSpec.lanes(p, p.ny)
    rng = np.random.default_rng(61)
    # Values straddling the guard thresholds, some negative.
    vals = [jnp.asarray(rng.normal(0.01, 0.02, (8, 16)).astype(np.float32))
            for _ in range(9)]
    fluid = jnp.asarray((rng.random((8, 16)) > 0.2).astype(np.float32))
    line = (jnp.arange(16)[None, :] == accel.index).astype(jnp.float32)

    full = _accelerated(vals, _accel_ok(vals, fluid, accel, line), accel)
    fast = _accel_line_extract(vals, fluid, accel, line)
    for k in range(9):
        np.testing.assert_array_equal(np.asarray(full[k]),
                                      np.asarray(fast[k]))
