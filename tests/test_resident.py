"""VMEM-resident kernel (lbm_tpu/ops/pallas_resident.py) vs the jnp
reference and the blocked pallas path — interpret mode on CPU; the
compiled kernel is proven bit-exact against the blocked kernel on real
Mosaic at 1024x1024 (docs/PERF.md v8).

Resident selection is TPU-auto / env-gated (LBM_RESIDENT=1 opts in for
interpret runs), so these tests opt in explicitly and the rest of the
suite keeps exercising the blocked kernel unchanged.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_tpu.obstacles import generate_obstacles
from lbm_tpu.ops import pallas_fused as pf
from lbm_tpu.ops.reference import fused_step
from lbm_tpu.params import Params
from lbm_tpu.state import initial_state


def small_params(**kw):
    defaults = dict(nx=128, ny=32, max_iters=5, reynolds_dim=10,
                    density=0.1, accel=0.005, omega=1.85)
    defaults.update(kw)
    return Params(**defaults)


def reference_trajectory(p, obstacles, n):
    c = initial_state(p)
    tots = []
    for _ in range(n):
        c, t = fused_step(c, obstacles, p.accel_w1, p.accel_w2, p.omega)
        tots.append(float(t))
    return c, np.asarray(tots, dtype=np.float32)


def run_impl(impl, p, obstacles):
    prepared = impl.prepare(obstacles)
    carry, tots = impl.step(impl.init(initial_state(p), prepared), prepared)
    return impl.final(carry), np.asarray(tots)


def assert_matches(got, tots, want, want_tots):
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=5e-8
    )
    np.testing.assert_allclose(tots, want_tots, rtol=1e-4)


def test_resident_single_block_matches_reference():
    from lbm_tpu.ops.pallas_resident import ResidentStep

    p = small_params(ny=32, nx=128, max_iters=8)
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    got, tots = run_impl(ResidentStep(p, 8), p, obstacles)
    want, want_tots = reference_trajectory(p, obstacles, 8)
    assert_matches(got, tots, want, want_tots)


def test_resident_multiblock_matches_reference(monkeypatch):
    """Several row blocks per step exercises the block-edge neighbour
    reads from the resident previous state (including the periodic
    wrap rows) and the per-block tot accumulation."""
    from lbm_tpu.ops.pallas_resident import ResidentStep

    monkeypatch.setattr(pf, "_SLOT_BYTES", 8 * 9 * 64 * 4)  # by=8
    p = small_params(ny=32, nx=64, max_iters=6)
    assert pf._pick_block_rows(p.ny, p.nx) == 8
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    got, tots = run_impl(ResidentStep(p, 6), p, obstacles)
    want, want_tots = reference_trajectory(p, obstacles, 6)
    assert_matches(got, tots, want, want_tots)


def test_resident_forced_row_on_block_edge(monkeypatch):
    """The in-place RMW forcing needs no block-interior assumption
    (the blocked kernel's single-step path has one). Since by divides
    ny, the forced row ny-2 can only land on a block edge when by == 2
    (offset 0); force that with a 2-row slot budget so block b-1's
    next_a read and block b's body both see the forced values."""
    from lbm_tpu.ops.pallas_resident import ResidentStep

    monkeypatch.setattr(pf, "_SLOT_BYTES", 2 * 9 * 64 * 4)
    p = small_params(ny=6, nx=64, max_iters=4)
    by = pf._pick_block_rows(p.ny, p.nx)
    assert by == 2 and (p.ny - 2) % by == 0  # genuinely a block-edge row
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    got, tots = run_impl(ResidentStep(p, 4), p, obstacles)
    want, want_tots = reference_trajectory(p, obstacles, 4)
    assert_matches(got, tots, want, want_tots)


def test_resident_shift_streaming_bit_identical(monkeypatch):
    """The LBM_RESIDENT_SHIFT A/B variant (offset-load streaming —
    docs/PERF.md round-5 micro-A/B) must be BIT-identical to the
    roll+select streaming it replaces, in both single-block (pure
    wrap-concat windows) and multi-block (interior offset loads +
    boundary stitches) geometries."""
    from lbm_tpu.ops.pallas_fused import AccelSpec
    from lbm_tpu.ops.pallas_resident import _pallas_resident

    p = small_params(ny=48, nx=64, max_iters=4)
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny)).astype(jnp.int8)
    accel = AccelSpec.rows(p, p.ny)

    def run(flag):
        monkeypatch.setenv("LBM_RESIDENT_SHIFT", flag)
        new, tots = _pallas_resident(
            initial_state(p), obstacles, omega_f=float(p.omega),
            interpret=True, accel=accel, gsteps=4,
        )
        return np.asarray(new), np.asarray(tots)

    for slot_bytes in (None, 8 * 9 * p.nx * 4):  # single-block, by=8
        if slot_bytes is not None:
            monkeypatch.setattr(pf, "_SLOT_BYTES", slot_bytes)
        base = run("0")
        shifted = run("1")
        np.testing.assert_array_equal(base[0], shifted[0])
        np.testing.assert_array_equal(base[1], shifted[1])


def test_resident_transposed_matches_reference():
    from lbm_tpu.ops.pallas_resident import TransposedResidentStep

    p = small_params(ny=32, nx=128, max_iters=4)
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    got, tots = run_impl(TransposedResidentStep(p, 4), p, obstacles)
    want, want_tots = reference_trajectory(p, obstacles, 4)
    assert_matches(got, tots, want, want_tots)


def test_resident_random_obstacles_random_state():
    """Interior obstacles (bounce-back inside the flow) + a random
    initial state. Oracle = the blocked pallas kernel, not the jnp
    path: a random state puts the acceleration guard on a knife edge
    where legitimate 1-ulp compilation differences flip the forcing
    and amplify chaotically (measured: jnp and BOTH pallas kernels
    agree to ~3e-7 for 4 steps, then the jnp path departs both
    identically). Resident vs blocked isolates the new kernel."""
    from lbm_tpu.ops.pallas_fused import make_fused_step
    from lbm_tpu.ops.pallas_resident import ResidentStep

    p = small_params(ny=32, nx=128, max_iters=6)
    rng = np.random.default_rng(7)
    obs = generate_obstacles(p.nx, p.ny)
    obs |= rng.random((p.ny, p.nx)) < 0.1
    obs[p.ny - 2, :] = False  # keep the forced row partly fluid
    obstacles = jnp.asarray(obs)
    cells0_np = rng.uniform(0.01, 0.2, (9, p.ny, p.nx)).astype(np.float32)

    blocked = make_fused_step(p)
    c = jnp.asarray(cells0_np)
    want_tots = []
    for _ in range(6):
        c, t = blocked(c, obstacles)
        want_tots.append(float(t))

    impl = ResidentStep(p, 6)
    prepared = impl.prepare(obstacles)
    carry, tots = impl.step(
        impl.init(jnp.asarray(cells0_np), prepared), prepared
    )
    got = impl.final(carry)
    assert_matches(got, np.asarray(tots), c,
                   np.asarray(want_tots, dtype=np.float32))


def test_resident_inplace_matches_reference(monkeypatch):
    """Single-buffer in-place mode (LBM_RESIDENT_INPLACE=1; the
    automatic path for states whose two buffers exceed VMEM, e.g.
    2048x1024): multi-block with the register-carried old-edge rows,
    an odd step count (legal without buffer parity), the by=2 forced
    block-edge row, and the transposed layout."""
    from lbm_tpu.ops.pallas_resident import (
        ResidentStep,
        TransposedResidentStep,
    )

    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "1")

    monkeypatch.setattr(pf, "_SLOT_BYTES", 8 * 9 * 64 * 4)  # by=8
    p = small_params(ny=32, nx=64, max_iters=6)
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    for n in (6, 5):  # even and odd step counts
        got, tots = run_impl(ResidentStep(p, n), p, obstacles)
        want, want_tots = reference_trajectory(p, obstacles, n)
        assert_matches(got, tots, want, want_tots)

    monkeypatch.setattr(pf, "_SLOT_BYTES", 2 * 9 * 64 * 4)  # by=2
    p2 = small_params(ny=6, nx=64, max_iters=4)
    obs2 = jnp.asarray(generate_obstacles(p2.nx, p2.ny))
    got, tots = run_impl(ResidentStep(p2, 4), p2, obs2)
    want, want_tots = reference_trajectory(p2, obs2, 4)
    assert_matches(got, tots, want, want_tots)

    monkeypatch.setattr(pf, "_SLOT_BYTES", 6 * 1024 * 1024)
    p3 = small_params(ny=32, nx=128, max_iters=4)
    obs3 = jnp.asarray(generate_obstacles(p3.nx, p3.ny))
    got, tots = run_impl(TransposedResidentStep(p3, 4), p3, obs3)
    want, want_tots = reference_trajectory(p3, obs3, 4)
    assert_matches(got, tots, want, want_tots)


def test_resident_selection_and_planning(monkeypatch):
    """Gating: off by default on CPU; LBM_RESIDENT=1 selects it when a
    preferred G divides the step count; planner and selector agree on
    main/tail splits; LBM_RESIDENT_STEPS pins G."""
    from lbm_tpu.ops.pallas_resident import ResidentStep
    from lbm_tpu.runner import _select_impl

    p = small_params(ny=64, nx=64, max_iters=20)

    monkeypatch.delenv("LBM_RESIDENT", raising=False)
    assert not isinstance(_select_impl("pallas", p, n_iters=20), ResidentStep)

    monkeypatch.setenv("LBM_RESIDENT", "1")
    impl = _select_impl("pallas", p, n_iters=20)
    assert isinstance(impl, ResidentStep)
    assert impl.gsteps == 20 and impl.steps_per_call == 20

    assert pf.plan_iters(p, 20) == (20, 0)
    assert pf.plan_iters(p, 150) == (150, 0)  # G=50 divides
    assert pf.plan_iters(p, 101) == (100, 1)  # resident main + odd tail
    # The debug path passes n_iters=None: never resident.
    assert not isinstance(
        _select_impl("pallas", p, paired=False), ResidentStep
    )

    monkeypatch.setenv("LBM_RESIDENT_STEPS", "10")
    impl = _select_impl("pallas", p, n_iters=20)
    assert isinstance(impl, ResidentStep) and impl.gsteps == 10

    monkeypatch.setenv("LBM_RESIDENT", "0")
    monkeypatch.delenv("LBM_RESIDENT_STEPS", raising=False)
    assert not isinstance(_select_impl("pallas", p, n_iters=20), ResidentStep)


def test_resident_ineligible_geometry(monkeypatch):
    """States over the VMEM budget or with non-8-aligned rows keep the
    blocked kernel even when resident is forced on."""
    from lbm_tpu.ops.pallas_resident import resident_prefs

    monkeypatch.setenv("LBM_RESIDENT", "1")
    assert resident_prefs(16384, 1024, transposed=False) is None  # 604 MB/buffer
    assert resident_prefs(30, 64, transposed=False) is None  # rows not 8-aligned
    assert resident_prefs(1024, 1024, transposed=False) is not None  # the headline grid
    assert resident_prefs(32, 64, transposed=False) is not None
    # Transposed states never AUTO-select the in-place mode: measured
    # 227x slower than the blocked kernel at 16384 rows x 128 lanes
    # (register-spill thrash; docs/PERF.md). Row-layout in-place and
    # transposed double-buffer stay eligible; the force wins for A/B.
    assert resident_prefs(16384, 128, transposed=True) is None
    assert resident_prefs(16384, 128, transposed=False) is not None
    assert resident_prefs(1024, 512, transposed=True) is not None
    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "1")
    assert resident_prefs(16384, 128, transposed=True) is not None
    monkeypatch.delenv("LBM_RESIDENT_INPLACE")


def test_recursive_segment_planning(monkeypatch):
    """Tails the main granularity leaves behind re-plan recursively
    (runner._segments): a 1099-step resident run becomes 1000@G=100 +
    96@G=32 (resident again, at the largest dividing granularity) + 3
    single steps — never a long unfused tail. A tiny-divisor count
    (2002) must NOT hijack the whole run at G=2 (the _G_PREF floor):
    it splits 2000@G=100 + 2 blocked steps."""
    from lbm_tpu.ops.pallas_resident import ResidentStep
    from lbm_tpu.runner import _segments

    monkeypatch.setenv("LBM_RESIDENT", "1")
    p = small_params(ny=64, nx=64, max_iters=1099)

    segs = _segments("pallas", p, 1099)
    assert [n for _, n in segs] == [1000, 96, 3]
    assert [getattr(i, "gsteps", None) for i, _ in segs] == [100, 32, None]

    segs = _segments("pallas", p, 2002)
    assert [n for _, n in segs] == [2000, 2]
    assert isinstance(segs[0][0], ResidentStep) and segs[0][0].gsteps == 100
    assert not isinstance(segs[1][0], ResidentStep)

    # Blocked-only planning (resident off) keeps its prior shape.
    monkeypatch.setenv("LBM_RESIDENT", "0")
    segs = _segments("pallas", p, 21)
    assert [n for _, n in segs] == [20, 1]


def test_resident_run_simulation_with_tail(monkeypatch):
    """End-to-end through runner segments: a count no preferred G
    divides runs resident main + fused/blocked tail, matching the
    reference trajectory, av_vels and Reynolds."""
    from lbm_tpu.runner import run_simulation

    monkeypatch.setenv("LBM_RESIDENT", "1")
    p = small_params(ny=64, nx=64, max_iters=25)
    obstacles = generate_obstacles(p.nx, p.ny)
    got = run_simulation(p, obstacles, kernel="pallas", n_iters=25)
    monkeypatch.setenv("LBM_RESIDENT", "0")
    base = run_simulation(p, obstacles, kernel="reference", n_iters=25)
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)
    assert np.isclose(base.reynolds, got.reynolds, rtol=1e-4)


@pytest.mark.slow
def test_resident_checkpoint_resume(monkeypatch, tmp_path):
    """Chunked + resumed execution re-plans each chunk through the
    resident selector; the resumed trajectory must equal the one-shot
    run exactly (same kernels, same association)."""
    from lbm_tpu.runner import run_simulation

    monkeypatch.setenv("LBM_RESIDENT", "1")
    p = small_params(ny=64, nx=64, max_iters=24)
    obstacles = generate_obstacles(p.nx, p.ny)
    ck = tmp_path / "resident.npz"
    full = run_simulation(p, obstacles, kernel="pallas")
    part = run_simulation(
        p, obstacles, kernel="pallas", n_iters=16,
        checkpoint_every=8, checkpoint_file=ck,
    )
    resumed = run_simulation(
        p, obstacles, kernel="pallas", resume_from=ck
    )
    np.testing.assert_array_equal(full.cells, resumed.cells)
    np.testing.assert_allclose(full.av_vels, resumed.av_vels, rtol=1e-6)
