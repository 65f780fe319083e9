"""Sharded VMEM-resident ring kernel (parallel/resident_ring.py):
in-kernel remote-DMA seam exchange, validated against the unsharded
trajectory on the 8-virtual-device CPU mesh under the Pallas TPU
interpreter (which simulates per-device memories, remote DMAs and
semaphores — the closest no-hardware proof of the multi-chip RDMA
protocol this environment allows)."""

import numpy as np
import pytest

from lbm_tpu.obstacles import generate_obstacles
from lbm_tpu.params import Params
from lbm_tpu.parallel.decomp import make_mesh
from lbm_tpu.parallel import resident_ring as rr
from lbm_tpu.parallel.halo import _shard_segments, plan_sharding
from lbm_tpu.runner import run_simulation


def small_params(**kw):
    defaults = dict(nx=32, ny=32, max_iters=20, reynolds_dim=10,
                    density=0.1, accel=0.005, omega=1.85)
    defaults.update(kw)
    return Params(**defaults)


def ring_segments(p, n_dev, iters):
    mesh = make_mesh(n_dev)
    transposed, decomp, _, _ = plan_sharding(p, mesh, "pallas")
    return _shard_segments(p, decomp, "pallas", iters, transposed), transposed


def test_ring_gating(monkeypatch):
    """Default OFF everywhere (the blocked seam-ppermute path stays the
    proven production default); LBM_SHARD_RESIDENT=1 opts in; VMEM and
    geometry limits mirror the single-chip resident rules."""
    monkeypatch.delenv("LBM_SHARD_RESIDENT", raising=False)
    assert rr.ring_prefs(128, 1024, transposed=False) is None
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "0")
    assert rr.ring_prefs(128, 1024, transposed=False) is None
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    assert rr.ring_prefs(128, 1024, transposed=False) == rr._G_PREF
    assert rr.ring_gsteps(128, 1024, 20000, transposed=False) == 100
    assert rr.ring_gsteps(128, 1024, 23, transposed=False) is None
    # The ~75-MB single-buffer window (2048x1024 = 16384x1024 over 8
    # devices) qualifies via the in-place mode; one buffer that doesn't
    # fit the scoped-VMEM ceiling disqualifies.
    assert rr.ring_prefs(2048, 1024, transposed=False) == rr._G_PREF
    assert rr.ring_prefs(4096, 1024, transposed=False) is None
    # One sizing rule for mode + gate (_ring_n_bufs): shapes where the
    # buffers + calibrated working set push TWO buffers past the ring
    # ceiling fall back to in-place instead of being rejected
    # (1280x1024: by=64, double ~125 MB > 112-MiB ceiling, single
    # ~81 MB fits).
    assert rr._ring_n_bufs(1280, 1024, rr._ring_block_rows(1280, 1024)) == 1
    # The ring block cap (measured spill ~13x block bytes) halves the
    # blocked kernel's 4.5-MB / 128Ki-cell block to 64Ki cells.
    assert rr._ring_block_rows(2048, 1024) == 64
    assert rr._ring_block_rows(16384, 128) == 512
    assert rr._ring_block_rows(8, 64) == 8  # cap never starves a shard
    assert rr.ring_prefs(1280, 1024, transposed=False) == rr._G_PREF
    assert rr.ring_buffer_mode(1280, 1024, transposed=False) == "inplace"
    assert rr.ring_buffer_mode(2048, 1024, transposed=False) == "inplace"
    assert rr.ring_buffer_mode(16384, 128, transposed=False) == "inplace"
    assert rr.ring_buffer_mode(512, 1024, transposed=False) == "double"
    assert rr.ring_buffer_mode(4096, 1024, transposed=False) is None
    # The diagnostic applies the same spill gate as the planner (the
    # shape alone cannot disambiguate: 16384x128 row-layout runs
    # in-place, the same shape transposed is the measured OOM).
    assert rr.ring_buffer_mode(16384, 128, transposed=True) is None
    assert rr.ring_buffer_mode(2048, 256, transposed=True) == "double"
    # Transposed shards never AUTO-select the in-place mode: measured
    # on chip, its register spill OOMs the 128-MiB VMEM at the 72-MB
    # production shard (16384x128) and spill-thrashes ~100x at half
    # size. Double-buffer transposed rings stay eligible, and the
    # LBM_RESIDENT_INPLACE force still wins for A/B runs.
    assert rr.ring_prefs(16384, 128, transposed=True) is None
    assert rr.ring_prefs(16384, 128, transposed=False) == rr._G_PREF
    assert rr.ring_prefs(2048, 256, transposed=True) == rr._G_PREF
    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "1")
    assert rr.ring_prefs(16384, 128, transposed=True) == rr._G_PREF
    monkeypatch.delenv("LBM_RESIDENT_INPLACE")
    # LBM_RESIDENT_INPLACE=0 pins double-buffer mode -> 2048x1024 no
    # longer fits.
    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "0")
    assert rr.ring_prefs(2048, 1024, transposed=False) is None
    monkeypatch.delenv("LBM_RESIDENT_INPLACE")
    # Degenerate single-row shards can't form a block plan.
    assert rr.ring_prefs(1, 128, transposed=False) is None
    # On real TPU the blocked path's 8-aligned-rows rule applies.
    assert rr.ring_prefs(12, 128, backend="tpu", transposed=False) is None
    assert rr.ring_prefs(16, 128, backend="tpu", transposed=False) == rr._G_PREF
    # LBM_RESIDENT_STEPS pins one (even) granularity; invalid pins fail
    # loudly instead of silently measuring the blocked kernel (review
    # finding).
    monkeypatch.setenv("LBM_RESIDENT_STEPS", "4")
    assert rr.ring_prefs(128, 1024, transposed=False) == (4,)
    monkeypatch.setenv("LBM_RESIDENT_STEPS", "5")
    with pytest.raises(ValueError, match="even"):
        rr.ring_prefs(128, 1024, transposed=False)
    monkeypatch.setenv("LBM_RESIDENT_STEPS", "1OO")
    with pytest.raises(ValueError, match="not an integer"):
        rr.ring_prefs(128, 1024, transposed=False)


@pytest.mark.parametrize(
    "n_dev", [2, pytest.param(8, marks=pytest.mark.slow)]
)
def test_ring_matches_unsharded(n_dev, monkeypatch):
    """Full sharded ring simulation == unsharded reference trajectory;
    the planner must actually have selected the ring impl. A shrunk
    block budget makes the 2-device case multi-block (by=8 over 32
    local rows), exercising the interior-compute/seam-wait overlap
    split; the 8-device case is the single-block both-halo path."""
    from lbm_tpu.ops import pallas_fused as pf

    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setattr(pf, "_SLOT_BYTES", 8 * 9 * 32 * 4)
    p = small_params(ny=64, nx=32, max_iters=20)
    segs, transposed = ring_segments(p, n_dev, 20)
    assert not transposed
    assert len(segs) == 1 and isinstance(segs[0][0], rr.RingShardImpl)
    assert segs[0][0].steps_per_call == 20

    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas",
                         mesh=make_mesh(n_dev))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


@pytest.mark.slow
def test_ring_forced_row_on_shard_edge(monkeypatch):
    """ny=16 over 8 shards -> local_ny=2, the forced row ny-2 is the top
    shard's row 0 — its SOUTH seam. The neighbour below must receive
    pre-forced values (staging applies the guarded forcing), with
    obstacles scattered on the forced row exercising the guard."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    rng = np.random.default_rng(55)
    p = small_params(ny=16, nx=64, max_iters=20)
    segs, _ = ring_segments(p, 8, 20)
    assert isinstance(segs[0][0], rr.RingShardImpl)

    obstacles = generate_obstacles(p.nx, p.ny)
    obstacles[p.ny - 2, :] |= rng.random(p.nx) < 0.3
    obstacles[p.ny - 2, 5] = False
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(8))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


@pytest.mark.slow
def test_ring_transposed_wide_grid(monkeypatch):
    """Wide grids shard the transposed lattice over physical x; the
    forced line is a lane column in every shard (static lane forcing,
    staged seam rows included)."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    rng = np.random.default_rng(57)
    p = small_params(ny=16, nx=128, max_iters=20)
    segs, transposed = ring_segments(p, 4, 20)
    assert transposed
    assert isinstance(segs[0][0], rr.TransposedRingShardImpl)

    obstacles = generate_obstacles(p.nx, p.ny)
    obstacles |= rng.random((p.ny, p.nx)) < 0.1
    obstacles[p.ny - 2, 7] = False
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(4))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


def test_ring_single_shard_closes_on_itself(monkeypatch):
    """n_shards == 1: the ring closes locally (periodic wrap, no RDMA) —
    the configuration a 1-device-mesh Mosaic check would compile."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    p = small_params(ny=32, nx=32, max_iters=20)
    segs, _ = ring_segments(p, 1, 20)
    assert isinstance(segs[0][0], rr.RingShardImpl)
    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(1))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


@pytest.mark.slow
def test_ring_main_plus_tail_segments(monkeypatch):
    """Iteration counts no ring granularity divides run a ring main
    segment plus a re-planned blocked tail inside one shard_map
    program (halo._shard_segments)."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RESIDENT_STEPS", "4")
    p = small_params(ny=64, nx=32, max_iters=23)
    segs, _ = ring_segments(p, 8, 23)
    assert isinstance(segs[0][0], rr.RingShardImpl)
    assert segs[0][1] == 20 and segs[0][0].steps_per_call == 4
    assert sum(n for _, n in segs) == 23
    assert not any(isinstance(i, rr.RingShardImpl) for i, _ in segs[1:])

    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(8))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)
    assert (np.asarray(got.av_vels) != 0).all()


@pytest.mark.slow
def test_ring_checkpoint_resume(monkeypatch, tmp_path):
    """Chunked checkpoint/resume through the ring path: each chunk of
    the shard_map program re-plans its segments (make_sharded_chunk via
    halo._shard_segments), an odd stride forcing ring main + blocked
    tail inside every chunk; the trajectory must be independent of the
    chunking and survive a resume."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RESIDENT_STEPS", "4")
    mesh = make_mesh(4)
    p = small_params(ny=64, nx=32, max_iters=20)
    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    chunked = run_simulation(
        p, obstacles, kernel="pallas", mesh=mesh,
        checkpoint_every=7, checkpoint_file=tmp_path / "ck.npz",
    )
    np.testing.assert_allclose(base.cells, chunked.cells, rtol=2e-5,
                               atol=5e-8)
    np.testing.assert_allclose(base.av_vels, chunked.av_vels, rtol=1e-4)

    half = run_simulation(
        p, obstacles, kernel="pallas", mesh=mesh, n_iters=12,
        checkpoint_every=12, checkpoint_file=tmp_path / "ck2.npz",
    )
    resumed = run_simulation(
        p, obstacles, kernel="pallas", mesh=mesh,
        resume_from=tmp_path / "ck2.npz",
    )
    np.testing.assert_allclose(base.cells, resumed.cells, rtol=2e-5,
                               atol=5e-8)
    np.testing.assert_allclose(base.av_vels, resumed.av_vels, rtol=1e-4)


@pytest.mark.parametrize(
    "n_dev", [2, pytest.param(8, marks=pytest.mark.slow)]
)
def test_ring_inplace_matches_unsharded(n_dev, monkeypatch):
    """LBM_RESIDENT_INPLACE=1 forces the single-buffer in-place mode
    (production trigger: ~75-MB shards, e.g. 16384x1024 over 8). The
    2-device case is multi-block (by=8 over 32 local rows), exercising
    the 1..n-1-then-0 block order with register-carried old edge rows;
    the 8-device case is the single-block both-halo path."""
    from lbm_tpu.ops import pallas_fused as pf

    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "1")
    monkeypatch.setattr(pf, "_SLOT_BYTES", 8 * 9 * 32 * 4)
    p = small_params(ny=64, nx=32, max_iters=20)
    segs, _ = ring_segments(p, n_dev, 20)
    assert isinstance(segs[0][0], rr.RingShardImpl)

    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas",
                         mesh=make_mesh(n_dev))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


def test_ring_inplace_two_blocks(monkeypatch):
    """n_blocks == 2, the branch between the single-block and >=3-block
    paths (review coverage gap): block 1 takes its south via the direct
    pre-step load (not the register carry), runs AFTER the seam wait,
    and captures block 0's north; no interior block overlaps the
    transfer."""
    from lbm_tpu.ops import pallas_fused as pf

    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "1")
    monkeypatch.setattr(pf, "_SLOT_BYTES", 8 * 9 * 32 * 4)
    p = small_params(ny=32, nx=32, max_iters=20)
    segs, _ = ring_segments(p, 2, 20)
    assert isinstance(segs[0][0], rr.RingShardImpl)
    from lbm_tpu.ops.pallas_fused import _pick_block_rows

    assert _pick_block_rows(16, 32) == 8  # 16 local rows -> 2 blocks

    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(2))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


@pytest.mark.slow
def test_ring_inplace_forced_row_on_shard_edge(monkeypatch):
    """In-place mode with the forced row ny-2 as the top shard's south
    seam (local_ny=2) — the saved register rows and staged seams must
    both carry the guarded forcing."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "1")
    rng = np.random.default_rng(58)
    p = small_params(ny=16, nx=64, max_iters=20)
    segs, _ = ring_segments(p, 8, 20)
    assert isinstance(segs[0][0], rr.RingShardImpl)

    obstacles = generate_obstacles(p.nx, p.ny)
    obstacles[p.ny - 2, :] |= rng.random(p.nx) < 0.3
    obstacles[p.ny - 2, 5] = False
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(8))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


@pytest.mark.slow
def test_ring_inplace_transposed(monkeypatch):
    """In-place mode on the transposed (x-sharded) layout: static lane
    forcing applied per-load, saved rows included."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "1")
    rng = np.random.default_rng(59)
    p = small_params(ny=16, nx=128, max_iters=20)
    segs, transposed = ring_segments(p, 4, 20)
    assert transposed
    assert isinstance(segs[0][0], rr.TransposedRingShardImpl)

    obstacles = generate_obstacles(p.nx, p.ny)
    obstacles |= rng.random((p.ny, p.nx)) < 0.1
    obstacles[p.ny - 2, 7] = False
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(4))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


def test_ring_inplace_single_shard(monkeypatch):
    """n_shards == 1 in-place: the ring closes locally, block 0's seams
    are the pre-step edge rows loaded before any overwrite."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "1")
    from lbm_tpu.ops import pallas_fused as pf

    monkeypatch.setattr(pf, "_SLOT_BYTES", 8 * 9 * 32 * 4)
    p = small_params(ny=64, nx=32, max_iters=20)
    segs, _ = ring_segments(p, 1, 20)
    assert isinstance(segs[0][0], rr.RingShardImpl)
    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(1))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


def test_ring_inplace_protocol_race_free(monkeypatch):
    """The in-place step reorders blocks around the seam waits — run
    its full protocol under the interpreter's vector-clock race
    detector like the double-buffer variant."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "1")
    monkeypatch.setenv("LBM_RING_DETECT_RACES", "1")
    monkeypatch.setenv("LBM_RESIDENT_STEPS", "8")
    p = small_params(ny=32, nx=32, max_iters=8)
    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(4))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


def test_ring_non_divisor_padding(monkeypatch):
    """Non-divisor device counts (wall-shielded obstacle-row padding,
    halo.plan_row_padding) compose with the ring path: ny=46 over 3
    devices pads to 48 and the padded 16-row shards go VMEM-resident."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RESIDENT_STEPS", "4")
    p = small_params(ny=46, nx=64, max_iters=8)
    obstacles = generate_obstacles(p.nx, p.ny)
    # The PADDED plan (ny=48, 16-row shards) must select the ring impl.
    from lbm_tpu.parallel.halo import pad_scene, plan_row_padding

    mesh3 = make_mesh(3)
    pad = plan_row_padding(p, obstacles, mesh3, "pallas")
    assert pad == 2
    pp, _ = pad_scene(p, obstacles, pad)
    segs, _ = ring_segments(pp, 3, 8)
    assert isinstance(segs[0][0], rr.RingShardImpl)

    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(3))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)


def test_ring_checkpoint_resume_across_modes(monkeypatch, tmp_path):
    """A checkpoint written by the double-buffer ring resumes under the
    forced in-place mode (and the trajectory still matches): the
    carry is the lattice alone, so the checkpoint format is
    buffer-mode-independent — a mode flip between runs (e.g. a changed
    LBM_RESIDENT_INPLACE override or VMEM-cap setting) must not change
    physics."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RESIDENT_STEPS", "4")
    mesh = make_mesh(4)
    p = small_params(ny=64, nx=32, max_iters=20)
    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")

    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "0")
    run_simulation(
        p, obstacles, kernel="pallas", mesh=mesh, n_iters=12,
        checkpoint_every=12, checkpoint_file=tmp_path / "ck.npz",
    )
    monkeypatch.setenv("LBM_RESIDENT_INPLACE", "1")
    resumed = run_simulation(
        p, obstacles, kernel="pallas", mesh=mesh,
        resume_from=tmp_path / "ck.npz",
    )
    np.testing.assert_allclose(base.cells, resumed.cells, rtol=2e-5,
                               atol=5e-8)
    np.testing.assert_allclose(base.av_vels, resumed.av_vels, rtol=1e-4)


def test_ring_protocol_race_free(monkeypatch):
    """Run the full ring protocol under the interpreter's vector-clock
    race detector — the audit that caught the shared-recv-semaphore
    reordering hazard during development (two in-flight messages on one
    semaphore let a step-t wait be satisfied by the step-t+1 arrival;
    legal on real ICI too, so per-(direction,slot) semaphores are
    load-bearing)."""
    monkeypatch.setenv("LBM_SHARD_RESIDENT", "1")
    monkeypatch.setenv("LBM_RING_DETECT_RACES", "1")
    monkeypatch.setenv("LBM_RESIDENT_STEPS", "8")
    p = small_params(ny=32, nx=32, max_iters=8)
    obstacles = generate_obstacles(p.nx, p.ny)
    base = run_simulation(p, obstacles, kernel="reference")
    got = run_simulation(p, obstacles, kernel="pallas", mesh=make_mesh(4))
    np.testing.assert_allclose(base.cells, got.cells, rtol=2e-5, atol=5e-8)
    np.testing.assert_allclose(base.av_vels, got.av_vels, rtol=1e-4)
