"""Sharded-vs-unsharded equivalence on a virtual 8-device CPU mesh — the
TPU-native answer to "test the decomposition without a cluster"
(SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbm_tpu.obstacles import generate_obstacles, num_non_obstacles_r
from lbm_tpu.ops.reference import (
    accelerate_flow,
    accelerate_flow_dynamic,
    collide_stream,
    collide_stream_halo,
)
from lbm_tpu.params import Params
from lbm_tpu.parallel.decomp import RowDecomposition, largest_divisor_leq, make_mesh
from lbm_tpu.runner import make_simulate, run_simulation
from lbm_tpu.state import initial_state


def small_params(**kw):
    defaults = dict(nx=32, ny=32, max_iters=20, reynolds_dim=10,
                    density=0.1, accel=0.005, omega=1.85)
    defaults.update(kw)
    return Params(**defaults)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"


def test_decomposition_facts():
    d = RowDecomposition(ny=128, n_shards=8)
    assert d.local_ny == 16
    assert d.owner_of_row(126) == 7
    assert d.local_index(126) == 14
    assert d.accel_row == 126
    with pytest.raises(ValueError, match="not divisible"):
        RowDecomposition(ny=10, n_shards=4)
    assert largest_divisor_leq(128, 6) == 4
    assert largest_divisor_leq(100, 8) == 5


def test_halo_kernel_matches_global():
    """collide_stream_halo with wrapped halo rows == global collide_stream."""
    p = small_params()
    rng = np.random.default_rng(7)
    cells = jnp.asarray(rng.uniform(0.01, 0.2, (9, p.ny, p.nx)).astype(np.float32))
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    ref_new, ref_tot = collide_stream(cells, obstacles, p.omega)
    new, tot = collide_stream_halo(
        cells, cells[:, -1:, :], cells[:, :1, :], obstacles, p.omega
    )
    np.testing.assert_array_equal(np.asarray(ref_new), np.asarray(new))
    assert np.isclose(float(ref_tot), float(tot), rtol=1e-6)


def test_halo_kernel_block_equivalence():
    """Stacking two half-blocks stepped with true halo rows reproduces the
    global step (the decomposition invariant behind the MPI design)."""
    p = small_params()
    rng = np.random.default_rng(8)
    cells = jnp.asarray(rng.uniform(0.01, 0.2, (9, p.ny, p.nx)).astype(np.float32))
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    h = p.ny // 2
    ref_new, _ = collide_stream(cells, obstacles, p.omega)
    lo, _ = collide_stream_halo(
        cells[:, :h], cells[:, -1:], cells[:, h : h + 1], obstacles[:h], p.omega
    )
    hi, _ = collide_stream_halo(
        cells[:, h:], cells[:, h - 1 : h], cells[:, :1], obstacles[h:], p.omega
    )
    np.testing.assert_array_equal(np.asarray(ref_new[:, :h]), np.asarray(lo))
    np.testing.assert_array_equal(np.asarray(ref_new[:, h:]), np.asarray(hi))


def test_accelerate_dynamic_matches_static():
    p = small_params()
    rng = np.random.default_rng(9)
    cells = jnp.asarray(rng.uniform(0.01, 0.2, (9, p.ny, p.nx)).astype(np.float32))
    obstacles = jnp.asarray(generate_obstacles(p.nx, p.ny))
    want = accelerate_flow(cells, obstacles, p.accel_w1, p.accel_w2)
    got = accelerate_flow_dynamic(
        cells, obstacles, p.accel_w1, p.accel_w2,
        jnp.int32(p.ny - 2), jnp.bool_(True),
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    # Inactive: unchanged.
    same = accelerate_flow_dynamic(
        cells, obstacles, p.accel_w1, p.accel_w2,
        jnp.int32(5), jnp.bool_(False),
    )
    np.testing.assert_array_equal(np.asarray(cells), np.asarray(same))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_trajectory_matches_unsharded(n_dev):
    """Full sharded simulation == unsharded, cells bit-exact, av_vels to
    reduction-order tolerance."""
    p = small_params(ny=64, nx=32, max_iters=30)
    obstacles = generate_obstacles(p.nx, p.ny)
    res_1 = run_simulation(p, obstacles, kernel="reference")
    mesh = make_mesh(n_dev)
    res_n = run_simulation(p, obstacles, kernel="reference", mesh=mesh)
    np.testing.assert_array_equal(res_1.cells, res_n.cells)
    np.testing.assert_allclose(res_1.av_vels, res_n.av_vels, rtol=2e-5)
    assert np.isclose(res_1.reynolds, res_n.reynolds, rtol=1e-5)


@pytest.mark.parametrize("kernel", ["reference", "pallas"])
def test_sharded_accel_row_on_shard_boundary(kernel):
    """ny-2 is the bottom row of the top shard for ny=64/8-dev (local idx
    6 of 8)… exercise a config where the accelerated row is the shard's
    TOP edge so the neighbour's halo must carry the accelerated values:
    ny=16 over 8 devices -> local_ny=2, row 14 = top shard's row 0 (for
    the pallas path this also exercises the edge-array accel mirror)."""
    p = small_params(ny=16, nx=32, max_iters=25)
    obstacles = generate_obstacles(p.nx, p.ny)
    res_1 = run_simulation(p, obstacles, kernel="reference")
    res_8 = run_simulation(p, obstacles, kernel=kernel, mesh=make_mesh(8))
    if kernel == "reference":
        np.testing.assert_array_equal(res_1.cells, res_8.cells)
    else:
        np.testing.assert_allclose(res_1.cells, res_8.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(res_1.av_vels, res_8.av_vels, rtol=1e-4)


def test_sharded_pallas_matches_unsharded_reference():
    """Pallas kernel under shard_map (interpret mode on CPU) reproduces
    the unsharded jnp trajectory — the multi-chip production path."""
    p = small_params(ny=32, nx=128, max_iters=10)
    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    shard = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(4))
    np.testing.assert_allclose(base.cells, shard.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, shard.av_vels, rtol=1e-4)


def test_sharded_pallas_obstacles_on_boundary_accel_row():
    """Adversarial combination: the forced row is a shard-edge row AND
    contains obstacles, so the neighbour shard must apply the guarded
    forcing to its halo copy using the obstacle+accel flags carried in
    the edge-entry channels."""
    rng = np.random.default_rng(21)
    p = small_params(ny=16, nx=64, max_iters=20)  # row 14 = top shard's row 0
    obstacles = generate_obstacles(p.nx, p.ny)
    extra = rng.random(p.nx) < 0.3
    obstacles[p.ny - 2, :] |= extra  # obstacles scattered on the forced row
    obstacles[p.ny - 2, 5] = False  # keep some fluid there
    base = run_simulation(p, obstacles, kernel="reference")
    shard = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(8))
    np.testing.assert_allclose(base.cells, shard.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, shard.av_vels, rtol=1e-4)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_transposed_sharding_wide_grid(n_dev):
    """Wide grids shard the transposed lattice over physical x; the
    trajectory must match the unsharded portable path."""
    from lbm_tpu.parallel.halo import plan_sharding
    from jax.sharding import PartitionSpec as P

    p = small_params(ny=16, nx=128, max_iters=24)
    mesh = make_mesh(n_dev)
    transposed, decomp, cells_spec, obs_spec = plan_sharding(mesh=mesh, params=p, kernel="pallas")
    assert transposed and cells_spec == P(None, None, "y")
    assert decomp.local_ny == p.nx // n_dev  # transposed rows = physical x

    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    shard = run_simulation(p, obstacles, kernel="pallas", mesh=mesh)
    np.testing.assert_allclose(base.cells, shard.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, shard.av_vels, rtol=1e-4)


def test_transposed_sharding_with_scattered_obstacles():
    rng = np.random.default_rng(33)
    p = small_params(ny=16, nx=128, max_iters=20)
    obstacles = generate_obstacles(p.nx, p.ny)
    obstacles |= rng.random((p.ny, p.nx)) < 0.1
    obstacles[p.ny - 2, 7] = False
    base = run_simulation(p, obstacles, kernel="reference")
    shard = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(8))
    np.testing.assert_allclose(base.cells, shard.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, shard.av_vels, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("n_dev,iters", [(4, 12), (2, 10)])
def test_sharded_fused_two_step_rows(n_dev, iters, monkeypatch):
    """Sharded temporal fusion (pallas_fused._kernel_fused, ring=False): with
    local_ny >= 8 the shard impl selects the fused two-step kernel; the
    double edge entries ppermute over the ring and shard 0's south halo
    row B IS the forced row ny-2, exercising the ACC channels for both
    packed rows. Obstacles scattered on the forced row exercise the
    guard on the halo copies."""
    from lbm_tpu.parallel.halo import _shard_impl, plan_sharding

    # Pin depth 4 (small per-shard states default to depth 2 since v6).
    monkeypatch.setenv("LBM_PALLAS_DEPTH", "4")
    rng = np.random.default_rng(41)
    p = small_params(ny=64, nx=32, max_iters=iters)
    mesh = make_mesh(n_dev)
    transposed, decomp, _, _ = plan_sharding(p, mesh, "pallas")
    impl = _shard_impl(p, decomp, "pallas", n_iters=iters,
                       transposed=transposed)
    assert not transposed
    assert impl.fused == (4 if iters % 4 == 0 else 2)
    assert impl.steps_per_call == impl.fused  # unpaired at these iters

    obstacles = generate_obstacles(p.nx, p.ny)
    obstacles[p.ny - 2, :] |= rng.random(p.nx) < 0.3
    obstacles[p.ny - 2, 5] = False
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=mesh)
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


@pytest.mark.slow
def test_sharded_fused_two_step_transposed(monkeypatch):
    """Wide-grid x-sharding with the fused kernel: static lane forcing
    applies to every copy, no ACC channels needed."""
    from lbm_tpu.parallel.halo import _shard_impl, plan_sharding

    # Pin depth 4 (small per-shard states default to depth 2 since v6).
    monkeypatch.setenv("LBM_PALLAS_DEPTH", "4")
    rng = np.random.default_rng(43)
    p = small_params(ny=16, nx=128, max_iters=12)
    mesh = make_mesh(4)
    transposed, decomp, _, _ = plan_sharding(p, mesh, "pallas")
    impl = _shard_impl(p, decomp, "pallas", n_iters=12,
                       transposed=transposed)
    assert transposed and impl.fused == 4

    obstacles = generate_obstacles(p.nx, p.ny)
    obstacles |= rng.random((p.ny, p.nx)) < 0.1
    obstacles[p.ny - 2, 7] = False
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=mesh)
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


@pytest.mark.parametrize("ny,nx,iters", [(64, 16, 11), (16, 128, 11)])
def test_sharded_segments_odd_iters(ny, nx, iters):
    """Indivisible iteration counts run as a paired-fused main segment
    plus a short tail inside the one shard_map program
    (halo._shard_segments) for both the row-sharded and transposed
    x-sharded plans, and still match the unsharded trajectory."""
    from lbm_tpu.parallel.halo import _shard_segments, plan_sharding

    p = small_params(ny=ny, nx=nx, max_iters=iters)
    mesh = make_mesh(8)
    transposed, decomp, _, _ = plan_sharding(p, mesh, "pallas")
    segs = _shard_segments(p, decomp, "pallas", iters, transposed)
    assert [n for _, n in segs] == [8, 3]
    assert segs[0][0].steps_per_call == 4  # paired depth-2 main

    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=mesh)
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)
    assert (np.asarray(got.av_vels) != 0).all()


def test_sharded_kernel_validation(monkeypatch):
    """The sharded builders validate like the single-device path
    (review finding r2-2): on real TPU, per-shard rows that are not
    8-aligned demote auto to the reference kernel and reject explicit
    pallas with a clear error (a Mosaic crash can kill the TPU session);
    float64 never resolves to the f32-only pallas kernel."""
    from lbm_tpu.parallel import halo

    mesh = make_mesh(4)
    odd = small_params(ny=100, nx=32)  # local rows 25 over 4 shards
    # CPU/interpret: no geometry constraint.
    assert halo.resolve_shard_kernel(odd, mesh, "pallas") == "pallas"

    monkeypatch.setattr(halo.jax, "default_backend", lambda: "tpu")
    assert halo.resolve_shard_kernel(odd, mesh, "auto") == "reference"
    with pytest.raises(ValueError, match="8-aligned"):
        halo.resolve_shard_kernel(odd, mesh, "pallas")
    ok = small_params(ny=64, nx=32)  # local rows 16
    assert halo.resolve_shard_kernel(ok, mesh, "auto") == "pallas"
    p64 = small_params(ny=64, dtype=np.float64)
    assert halo.resolve_shard_kernel(p64, mesh, "auto") == "reference"
    with pytest.raises(ValueError, match="float32-only"):
        halo.resolve_shard_kernel(p64, mesh, "pallas")


def test_wide_misaligned_shards_take_row_plan(monkeypatch):
    """A wide grid whose TRANSPOSED shards would break Mosaic's
    8-aligned-rows rule (nx=288 over 8 -> 36 rows/shard) must take the
    row plan on real TPU — which is Mosaic-legal at 8 rows/shard —
    instead of demoting auto to the reference kernel (review finding
    r3). Off-TPU (interpret) the transposed plan has no such
    constraint and is kept."""
    from lbm_tpu.parallel import halo

    mesh = make_mesh(8)
    p = small_params(ny=64, nx=288)
    transposed, decomp, _, _ = halo.plan_sharding(p, mesh, "pallas")
    assert transposed  # CPU/interpret: unconstrained

    monkeypatch.setattr(halo.jax, "default_backend", lambda: "tpu")
    transposed, decomp, _, _ = halo.plan_sharding(p, mesh, "pallas")
    assert not transposed and decomp.ny == p.ny
    assert halo.resolve_shard_kernel(p, mesh, "auto") == "pallas"
    # Aligned wide grids still transpose on TPU (512/8 = 64 rows/shard).
    p2 = small_params(ny=64, nx=512)
    transposed, _, _, _ = halo.plan_sharding(p2, mesh, "pallas")
    assert transposed
    # plan_row_padding agrees there is nothing to pad for the row plan.
    obstacles = generate_obstacles(p.nx, p.ny)
    assert halo.plan_row_padding(p, obstacles, mesh, "pallas") == 0


def test_sharded_f64_without_x64_raises():
    """The x64 guard must cover the sharded builders too, not just the
    single-device runner (review finding r2)."""
    import pytest as _pytest

    from lbm_tpu.parallel.halo import make_sharded_chunk, make_sharded_simulate

    p = small_params(ny=16, dtype=np.float64)
    mesh = make_mesh(2)
    with _pytest.raises(ValueError, match="x64"):
        make_sharded_simulate(p, mesh, kernel="reference")
    with _pytest.raises(ValueError, match="x64"):
        make_sharded_chunk(p, mesh, kernel="reference", chunk_iters=4)
    with _pytest.raises(ValueError, match="x64"):
        run_simulation(p, generate_obstacles(p.nx, p.ny),
                       kernel="reference", mesh=mesh)


class TestNonDivisorPadding:
    """Non-divisor device counts run via wall-shielded obstacle-row
    padding (halo.plan_row_padding / pad_scene, VERDICT r2 missing #1 —
    the reference's allocate_rows balanced any ny over any rank count,
    d2q9-bgk.c:483-492)."""

    def test_plan_and_exactness(self):
        from lbm_tpu.parallel.halo import pad_scene, plan_row_padding

        p = small_params(ny=46, nx=64, max_iters=12)
        obstacles = generate_obstacles(p.nx, p.ny)
        mesh = make_mesh(3)
        pad = plan_row_padding(p, obstacles, mesh, "reference")
        assert pad == 2
        pp, po = pad_scene(p, obstacles, pad)
        assert pp.ny == 48 and po.shape == (48, 64)
        assert po[:2].all(), "pad rows must be obstacles"
        # Divisible cases need no padding.
        assert plan_row_padding(
            small_params(ny=48, nx=64), generate_obstacles(64, 48),
            mesh, "reference") == 0

        base = run_simulation(p, obstacles, kernel="reference")
        got = run_simulation(p, obstacles, kernel="reference", mesh=mesh)
        assert got.cells.shape == base.cells.shape
        np.testing.assert_allclose(
            base.cells, got.cells, rtol=2e-5, atol=5e-8
        )
        np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)
        assert np.isclose(base.reynolds, got.reynolds, rtol=1e-4)

    def test_pallas_kernel_padded(self):
        """The pallas path steps the padded lattice too (interpret mode;
        local rows need not be 8-aligned off-TPU)."""
        p = small_params(ny=46, nx=64, max_iters=8)
        obstacles = generate_obstacles(p.nx, p.ny)
        mesh = make_mesh(3)
        base = run_simulation(p, obstacles, kernel="reference")
        got = run_simulation(p, obstacles, kernel="pallas", mesh=mesh)
        np.testing.assert_allclose(
            base.cells, got.cells, rtol=2e-5, atol=5e-8
        )
        np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)

    def test_refuses_without_walls(self):
        """plan_row_padding (the WALL planner, used by the pallas paths)
        still refuses wall-less masks; the policy owner plan_padding_mode
        routes that case to wrap padding instead (TestWallLessWrap)."""
        from lbm_tpu.parallel.halo import plan_padding_mode, plan_row_padding

        p = small_params(ny=46, nx=64)
        no_walls = np.zeros((p.ny, p.nx), dtype=bool)
        with pytest.raises(ValueError, match="wall rows"):
            plan_row_padding(p, no_walls, make_mesh(3), "reference")
        assert plan_padding_mode(
            p, no_walls, make_mesh(3), "reference") == ("wrap_ref", 2)

    def test_alignment_only_padding_optional_without_walls(self,
                                                           monkeypatch):
        """Real-TPU pallas wants 8-aligned per-shard rows, so ny=96 over
        8 devices would pad to 128 — but when the scene has no wall rows
        AND ny already divides the mesh, padding is optional: return 0
        and let resolve_shard_kernel demote auto to the reference kernel
        (review finding: this case used to raise 'ny=96 does not divide
        over 8 devices', which is false)."""
        import jax as _jax

        from lbm_tpu.parallel.halo import plan_row_padding

        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        p = small_params(ny=96, nx=64)
        no_walls = np.zeros((p.ny, p.nx), dtype=bool)
        assert plan_row_padding(p, no_walls, make_mesh(8), "auto") == 0
        # With walls the alignment padding IS taken (96 -> 128, pad 32).
        walls = generate_obstacles(p.nx, p.ny)
        assert plan_row_padding(p, walls, make_mesh(8), "pallas") == 32

    def test_auto_plan_respects_dtype(self, monkeypatch):
        """plan_sharding('auto') must resolve the kernel with the same
        f32 gate as resolve_shard_kernel: an f64 wide grid takes the ROW
        plan (reference kernel), never the transposed pallas plan
        (review finding: a missing dtype check here could reshard
        inputs inside the timed region)."""
        import jax as _jax

        from lbm_tpu.parallel.halo import plan_sharding

        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        p = small_params(ny=16, nx=128, dtype=np.float64)
        transposed, _, _, _ = plan_sharding(p, make_mesh(4), "auto")
        assert not transposed
        p32 = small_params(ny=16, nx=128)
        transposed, _, _, _ = plan_sharding(p32, make_mesh(4), "auto")
        assert transposed


class TestResolveMesh:
    """halo.resolve_mesh — the CLI's device policy as a tested library
    contract (VERDICT r3 #5): clamp to visible devices, keep non-divisor
    counts via wall-shielded padding (wall-bounded masks) or periodic
    wrap padding (wall-less masks), demote to the largest divisor of ny
    only when wrap padding cannot fit or explicit pallas forbids it."""

    def test_walls_nondivisor_keeps_all_devices(self):
        from lbm_tpu.parallel.halo import resolve_mesh

        p = small_params(ny=46, nx=64)
        walls = generate_obstacles(p.nx, p.ny)
        mesh, notes = resolve_mesh(p, walls, 3, "reference")
        assert mesh is not None and mesh.shape["y"] == 3
        assert notes == []

    def test_wall_less_nondivisor_keeps_all_devices(self):
        """Wall-less non-divisor scenes run on ALL requested devices via
        wrap padding (VERDICT r3 missing #2 — the reference's
        allocate_rows balanced any (ny, size) pair)."""
        from lbm_tpu.parallel.halo import resolve_mesh

        p = small_params(ny=46, nx=64)
        no_walls = np.zeros((p.ny, p.nx), dtype=bool)
        mesh, notes = resolve_mesh(p, no_walls, 3, "reference")
        assert mesh is not None and mesh.shape["y"] == 3
        assert notes == []

    def test_wall_less_prime_ny_keeps_all_devices(self):
        """Even prime ny shards on every device: ny=47 over 4 pads one
        wrap row to 48."""
        from lbm_tpu.parallel.halo import resolve_mesh

        p = small_params(ny=47, nx=64)
        no_walls = np.zeros((p.ny, p.nx), dtype=bool)
        mesh, notes = resolve_mesh(p, no_walls, 4, "reference")
        assert mesh is not None and mesh.shape["y"] == 4
        assert notes == []

    def test_wall_less_tiny_ny_demotes_to_divisor(self):
        """ny barely above the device count leaves no headroom for the
        pad inside shard 0 (pad > local_ny-1): divisor fallback."""
        from lbm_tpu.parallel.halo import resolve_mesh

        p = small_params(ny=9, nx=64)
        no_walls = np.zeros((p.ny, p.nx), dtype=bool)
        mesh, notes = resolve_mesh(p, no_walls, 8, "reference")
        assert mesh is not None and mesh.shape["y"] == 3
        assert any("divisor fallback" in n for n in notes)

    def test_wall_less_explicit_pallas_keeps_all_devices(self):
        """Wall-less non-divisor scenes run the PRODUCTION pallas kernel
        via the pallas wrap discipline (halo._WrapPallasShardImpl;
        VERDICT r4 #2 — the reference's allocate_rows served any
        (ny, size) pair at full speed, d2q9-bgk.c:483-492): all devices
        kept, no demotion note."""
        from lbm_tpu.parallel.halo import plan_padding_mode, resolve_mesh

        p = small_params(ny=46, nx=64)
        no_walls = np.zeros((p.ny, p.nx), dtype=bool)
        assert plan_padding_mode(
            p, no_walls, make_mesh(3), "pallas") == ("wrap", 2)
        mesh, notes = resolve_mesh(p, no_walls, 3, "pallas")
        assert mesh is not None and mesh.shape["y"] == 3
        assert notes == []

    def test_wall_less_explicit_pallas_no_headroom_demotes(self):
        """When even the bare wrap pad cannot fit inside shard 0, an
        explicit pallas request raises and resolve_mesh takes the
        divisor fallback. (nx < 2*ny: a WIDE wall-less tiny-ny scene
        would instead take the transposed x-plan with all devices and
        no padding at all — ny=9, nx=64 over 8 does exactly that.)"""
        from lbm_tpu.parallel.halo import plan_padding_mode, resolve_mesh

        p = small_params(ny=9, nx=16)
        no_walls = np.zeros((p.ny, p.nx), dtype=bool)
        with pytest.raises(ValueError):
            plan_padding_mode(p, no_walls, make_mesh(8), "pallas")
        mesh, notes = resolve_mesh(p, no_walls, 8, "pallas")
        assert mesh is not None and mesh.shape["y"] == 3
        assert any("divisor fallback" in n for n in notes)

    def test_wall_less_tpu_planner_selects_production_wrap(self):
        """On real TPU the planner serves wall-less scenes with the
        production kernel: 'auto' resolves to pallas and the wrap pad is
        sized to keep per-shard rows 8-aligned (Mosaic DMA tiling) —
        non-divisor ny pads to the next multiple of 8n, and even a
        DIVISOR ny whose shards are misaligned (ny=1000 over 8) takes an
        alignment wrap pad instead of demoting to the ~15x-slower jnp
        kernel. Planner-level contract (backend='tpu' override; the
        discipline itself is trajectory-tested in interpret mode)."""
        from lbm_tpu.parallel.halo import plan_padding_mode

        no_walls = np.zeros((1020, 64), dtype=bool)
        p = small_params(ny=1020, nx=64)
        assert plan_padding_mode(
            p, no_walls, make_mesh(8), "auto", backend="tpu"
        ) == ("wrap", 4)  # 1020 -> 1024, local 128 (8-aligned)
        p2 = small_params(ny=1000, nx=64)
        assert plan_padding_mode(
            p2, np.zeros((1000, 64), dtype=bool), make_mesh(8), "auto",
            backend="tpu",
        ) == ("wrap", 24)  # divisor but local 125 misaligned -> 1024
        # No headroom for the aligned pad (96 -> 128 needs 32 > local-1):
        # auto falls back to 'none' (divisor) and demotes as before.
        p3 = small_params(ny=96, nx=64)
        assert plan_padding_mode(
            p3, np.zeros((96, 64), dtype=bool), make_mesh(8), "auto",
            backend="tpu",
        ) == ("none", 0)
        # A 1-device mesh never takes the wrap plan: the discipline is a
        # sharded construct, and the single-chip path demotes misaligned
        # wall-less grids as before (review finding: the alignment
        # branch returned 'wrap' for n=1 and the impl then refused the
        # single-shard build).
        assert plan_padding_mode(
            p2, np.zeros((1000, 64), dtype=bool), make_mesh(1), "auto",
            backend="tpu",
        ) == ("none", 0)

    def test_clamps_to_visible_devices(self):
        from lbm_tpu.parallel.halo import resolve_mesh

        p = small_params(ny=64, nx=64)
        walls = generate_obstacles(p.nx, p.ny)
        mesh, notes = resolve_mesh(p, walls, 64, "reference")
        assert mesh is not None and mesh.shape["y"] == 8
        assert any("8 devices" in n and "visible" in n for n in notes)

    def test_wrap_trajectory_bit_exact(self):
        """Wall-less non-divisor sharding is BIT-EXACT, not approximate:
        the wrap discipline (halo._ReferenceShardImpl) refreshes the one
        pad row a real row pulls from with the true global last row each
        step, so every real cell sees exactly the unpadded periodic
        lattice. Scattered (non-wall) obstacles exercise bounce-back
        across the wrap seam."""
        rng = np.random.default_rng(5)
        p = small_params(ny=46, nx=64, max_iters=12)
        no_walls = rng.random((p.ny, p.nx)) < 0.08
        no_walls[p.ny - 2, 7] = False  # keep fluid on the forced row
        base = run_simulation(p, no_walls, kernel="reference")
        got = run_simulation(p, no_walls, kernel="reference",
                             mesh=make_mesh(3))
        assert got.cells.shape == base.cells.shape
        np.testing.assert_array_equal(base.cells, got.cells)
        np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=2e-5)
        assert np.isclose(base.reynolds, got.reynolds, rtol=1e-5)

    def test_wrap_pad_fills_shard0(self):
        """Boundary case pad == local_ny-1 (ny=36 over 8: pad 4, local 5;
        shard 0 has ONE real row, which is simultaneously its top row,
        its wrap bottom-send, and the row the refreshed pad row feeds)."""
        p = small_params(ny=36, nx=32, max_iters=10)
        no_walls = np.zeros((p.ny, p.nx), dtype=bool)
        base = run_simulation(p, no_walls, kernel="reference")
        got = run_simulation(p, no_walls, kernel="reference",
                             mesh=make_mesh(8))
        np.testing.assert_array_equal(base.cells, got.cells)
        np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=2e-5)

    def test_wrap_chunked_and_debug_paths(self, capsys):
        """The wrap discipline reaches the chunked runner
        (make_sharded_chunk) and the --debug per-step path too — same
        bit-exact contract."""
        p = small_params(ny=46, nx=32, max_iters=9)
        no_walls = np.zeros((p.ny, p.nx), dtype=bool)
        base = run_simulation(p, no_walls, kernel="reference")
        chunked = run_simulation(p, no_walls, kernel="reference",
                                 mesh=make_mesh(3), chunk_iters=4)
        np.testing.assert_array_equal(base.cells, chunked.cells)
        dbg = run_simulation(p, no_walls, kernel="reference",
                             mesh=make_mesh(3), debug=True)
        capsys.readouterr()  # the reference block is not under test here
        np.testing.assert_array_equal(base.cells, dbg.cells)
        np.testing.assert_allclose(base.av_vels, dbg.av_vels, rtol=2e-5)

    def test_pallas_wrap_trajectory_bit_exact(self):
        """The PRODUCTION-kernel wrap (halo._WrapPallasShardImpl,
        interpret mode here) carries the same bit-exact contract as the
        portable wrap: the Mosaic kernel is unchanged and the wrap rides
        the seam channel + an O(nx) pad-row refresh, so the sharded
        trajectory equals the unsharded pallas trajectory cell-for-cell.
        Scattered (non-wall) obstacles exercise bounce-back across the
        wrap seam; ny=36 over 8 is the pad == local_ny-1 boundary."""
        rng = np.random.default_rng(5)
        for ny, nx, n, iters in [(46, 64, 3, 12), (36, 32, 8, 10)]:
            p = small_params(ny=ny, nx=nx, max_iters=iters)
            no_walls = rng.random((p.ny, p.nx)) < 0.08
            no_walls[p.ny - 2, 7] = False  # keep fluid on the forced row
            base = run_simulation(p, no_walls, kernel="pallas")
            got = run_simulation(p, no_walls, kernel="pallas",
                                 mesh=make_mesh(n))
            assert got.cells.shape == base.cells.shape
            np.testing.assert_array_equal(base.cells, got.cells)
            np.testing.assert_allclose(base.av_vels, got.av_vels,
                                       rtol=2e-5)
            ref = run_simulation(p, no_walls, kernel="reference")
            np.testing.assert_allclose(ref.cells, got.cells, rtol=2e-5,
                                       atol=5e-8)

    def test_pallas_wrap_block_edge_refresh(self, monkeypatch):
        """When the pad boundary lands on a block edge (p % by == 0),
        the first real row streams its south neighbour from the lasts[]
        edge-entry copy, not the lattice — the wrap refresh must land in
        BOTH. ny=92 over 8 pads to 96 (local 12); a shrunken slot budget
        forces by=4 so p=4 is a block boundary."""
        from lbm_tpu.ops import pallas_fused as pf

        monkeypatch.setattr(pf, "_SLOT_BYTES", 9 * 32 * 4 * 4)
        p = small_params(ny=92, nx=32, max_iters=11)
        rng = np.random.default_rng(7)
        no_walls = rng.random((p.ny, p.nx)) < 0.08
        no_walls[p.ny - 2, 5] = False
        assert pf._pick_block_rows((p.ny + 4) // 8, p.nx) == 4
        base = run_simulation(p, no_walls, kernel="pallas")
        got = run_simulation(p, no_walls, kernel="pallas",
                             mesh=make_mesh(8))
        np.testing.assert_array_equal(base.cells, got.cells)
        np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=2e-5)

    def test_pallas_wrap_chunked(self):
        """The pallas wrap discipline reaches the chunked runner
        (make_sharded_chunk -> _shard_segments with wrap_pad) — same
        bit-exact contract, and chunk boundaries never disturb the
        per-step refresh."""
        p = small_params(ny=46, nx=32, max_iters=9)
        no_walls = np.zeros((p.ny, p.nx), dtype=bool)
        base = run_simulation(p, no_walls, kernel="pallas")
        chunked = run_simulation(p, no_walls, kernel="pallas",
                                 mesh=make_mesh(3), chunk_iters=4)
        np.testing.assert_array_equal(base.cells, chunked.cells)
        np.testing.assert_allclose(base.av_vels, chunked.av_vels,
                                   rtol=2e-5)

    def test_backend_override_reaches_device_lookup(self, monkeypatch):
        """The backend= escape hatch must cover the jax.devices() call
        too: bare jax.devices() INITIALISES the default backend, and a
        down axon tunnel then hangs the caller (CLAUDE.md; review
        finding)."""
        import jax

        from lbm_tpu.parallel import halo

        seen = []
        real = jax.devices

        def record(backend=None):
            seen.append(backend)
            return real("cpu")

        monkeypatch.setattr(halo.jax, "devices", record)
        p = small_params(ny=64, nx=64)
        walls = generate_obstacles(p.nx, p.ny)
        mesh, _ = halo.resolve_mesh(p, walls, 4, "reference",
                                    backend="cpu")
        assert mesh is not None and mesh.shape["y"] == 4
        assert seen == ["cpu"]
