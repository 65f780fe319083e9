"""Sharded stepping: shard_map over a 1-D row mesh with ppermute halo
exchange — the TPU-native replacement for the reference's per-step
MPI_Sendrecv halo exchange (d2q9-bgk.c:341-393) and end-of-run
MPI_Reduce of av_vels (d2q9-bgk.c:445).

Per step, inside one jitted shard_map'd fori_loop:

1. the shard owning global row ny-2 applies accelerate_flow to it
   (the reference's rank_accelerate flag, d2q9-bgk.c:242-243);
2. each shard sends its bottom interior row down and top interior row up
   via two ``ppermute``s over the periodic ring (the reference's
   send-down-receive-up / send-up-receive-down pair, d2q9-bgk.c:353-382)
   — because acceleration ran first, neighbours see the accelerated row
   in their halo, which is what the reference's buffer_up/down_accelerate
   flags laboriously reproduce (d2q9-bgk.c:244-245,499-500);
3. the halo-aware fused kernel updates the local rows;
4. the local tot_u partial is recorded — summed across shards once with
   a single psum after the loop, like the reference's one MPI_Reduce at
   collate time.

Collation of the lattice itself is implicit: the result stays sharded and
``jax.device_get`` gathers it host-side once at the end (the reference's
collate, d2q9-bgk.c:395-447).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lbm_tpu.params import Params
from lbm_tpu.parallel.decomp import AXIS, RowDecomposition
from lbm_tpu.ops import reference as ref_ops


def _up_perm(n: int):
    """Send to the shard above (rank_up = rank+1 mod size, d2q9-bgk.c:501)."""
    return [(i, (i + 1) % n) for i in range(n)]


def _down_perm(n: int):
    """Send to the shard below (rank_down, d2q9-bgk.c:502)."""
    return [(i, (i - 1) % n) for i in range(n)]


def exchange_halos(interior: jnp.ndarray, n_shards: int,
                   wrap_pad: int = 0):
    """One-row halo exchange over the periodic ring.

    Returns ``(south, north)`` halo rows for this shard: south = the top
    interior row of the shard below, north = the bottom interior row of
    the shard above. Single-shard meshes reduce to periodic wrap.

    ``wrap_pad`` (the wrap padding modes, :func:`plan_padding_mode`):
    wall-less non-divisor runs pad the TOP of the lattice with
    ``wrap_pad`` obstacle rows, so the first REAL row is shard 0's local
    row ``wrap_pad`` — and it, not the pad row, is what the last shard
    must see as its north halo for the periodic wrap to close over the
    REAL lattice (the reference's uneven ``allocate_rows`` needed no
    such step because its shards were uneven, d2q9-bgk.c:483-492).
    """
    top = interior[:, -1:, :]
    bottom = interior[:, :1, :]
    if wrap_pad:
        is_first = lax.axis_index(AXIS) == 0
        bottom = jnp.where(
            is_first, interior[:, wrap_pad:wrap_pad + 1, :], bottom
        )
    if n_shards == 1:
        return top, bottom
    # Our top row becomes the south halo of the shard above (send up);
    # our bottom row becomes the north halo of the shard below (send down).
    south = lax.ppermute(top, AXIS, _up_perm(n_shards))
    north = lax.ppermute(bottom, AXIS, _down_perm(n_shards))
    return south, north


class _ReferenceShardImpl:
    """Per-shard jnp step: accelerate (owner shard only), exchange raw
    halo rows, run the halo-aware portable kernel. Carry = local cells.

    ``wrap_pad`` > 0 enables the wrap padding discipline ('wrap_ref'
    mode, :func:`plan_padding_mode`): the pad sits at the
    TOP of the lattice inside shard 0, the wrap halo the last shard
    receives is redirected to the first REAL row (exchange_halos), and
    the one pad row a real row pulls from (local row wrap_pad-1) is
    refreshed each step with the received south halo — the true global
    last row. Pull streaming is one-row-local, so no other pad row is
    ever read by a real row and the real region stays BIT-EXACT vs the
    unpadded periodic lattice (tests/test_sharded.py asserts exact cell
    equality). This is the equal-shard answer to the reference's uneven
    ``allocate_rows`` on masks without boundary walls
    (d2q9-bgk.c:483-492)."""

    def __init__(self, params: Params, decomp: RowDecomposition,
                 wrap_pad: int = 0):
        self.params = params
        self.decomp = decomp
        self.wrap_pad = wrap_pad

    steps_per_call = 1

    def prepare(self, obstacles):
        return obstacles

    def init(self, cells, obstacles):
        return cells

    def step(self, cells, obstacles):
        p, d = self.params, self.decomp
        local_row = d.local_accel_row()
        active = (local_row >= 0) & (local_row < d.local_ny)
        cells = ref_ops.accelerate_flow_dynamic(
            cells, obstacles, p.accel_w1, p.accel_w2, local_row, active
        )
        south, north = exchange_halos(cells, d.n_shards, self.wrap_pad)
        if self.wrap_pad:
            # Close the periodic wrap over the REAL lattice: refresh the
            # pad row the first real row pulls from with the received
            # south halo (= the global last row). O(nx) — only the one
            # row is selected and written.
            w = self.wrap_pad
            is_first = lax.axis_index(AXIS) == 0
            row = jnp.where(is_first, south, cells[:, w - 1:w, :])
            cells = cells.at[:, w - 1:w, :].set(row)
        new, tot = ref_ops.collide_stream_halo(
            cells, south, north, obstacles, p.omega
        )
        return new, tot[None]

    def final(self, cells):
        return cells


class _PallasShardImpl:
    """Per-shard fused-kernel step carrying per-block edge-row arrays
    (the single-chip CarryStep design): the shard's boundary rows ARE its
    first/last edge entries, so the per-step halo exchange ppermutes
    those QP-padded entries directly and the kernel never re-gathers from
    the tiled lattice. Acceleration runs in-kernel in dynamic mode: the
    owner shard's forced-row mask is an i8 input built once per run from
    axis_index, and halo copies carry their accel flag in edge-array
    channel ACC_CH — the reference's rank/buffer accelerate flags
    (d2q9-bgk.c:241-245,498-500) with zero extra per-step passes. Paired
    stepping (aliased ping-pong buffers) keeps while-carry slots on fixed
    lattice buffers, as in the single-chip path."""

    def __init__(self, params: Params, decomp: RowDecomposition,
                 paired: bool = True, fuse: int = 1):
        from lbm_tpu.ops import pallas_fused as pf

        self.pf = pf
        self.params = params
        self.decomp = decomp
        h_local, lanes = self._local_shape(params, decomp)
        by = pf._pick_block_rows(h_local, lanes)
        # Temporal fusion (depth steps per pass, pallas_fused._kernel_fused)
        # needs 8-aligned blocks; the deeper edge entries ride the same
        # ppermute pattern, so the halo machinery is unchanged.
        self.fused = (
            fuse if (fuse > 1 and by % 8 == 0 and by >= 2 * fuse) else 1
        )
        if self.fused > 1:
            self.steps_per_call = self.fused * (2 if paired else 1)
        else:
            self.steps_per_call = 2 if paired else 1

    @staticmethod
    def _local_shape(params: Params, decomp: RowDecomposition):
        return decomp.local_ny, params.nx

    def prepare(self, obstacles):
        accel_mask = self.decomp.accel_mask_i8(obstacles.shape[1])
        return (obstacles, obstacles.astype(jnp.int8), accel_mask)

    def init(self, cells, prepared):
        return self.pf.carry_init(
            self, cells, prepared[0], accel_mask=prepared[2]
        )

    def _halo_seams(self, firsts, lasts):
        """The two boundary edge entries, ppermuted over the ring (the
        reference's send-down/send-up pair, d2q9-bgk.c:353-382) — the
        only per-pass communication; the kernel ring-indexes the
        resident entries in place, so the rolled edge-array copies the
        old sharded path materialised each pass (~10% of a pass at
        by=128/depth=4) are gone."""
        n = self.decomp.n_shards
        if n == 1:
            return lasts[-1:], firsts[:1]
        south_e = lax.ppermute(lasts[-1:], AXIS, _up_perm(n))
        north_e = lax.ppermute(firsts[:1], AXIS, _down_perm(n))
        return south_e, north_e

    def _accel_spec(self):
        return self.pf.AccelSpec.rows(self.params, self.params.ny)

    def _single_call(self, cells, firsts, lasts, prepared, dst):
        _, obs_i8, accel_mask = prepared
        return self.pf._pallas_step(
            cells, lasts, firsts, obs_i8,
            omega_f=float(self.params.omega),
            interpret=self.pf._interpret(),
            accel=self._accel_spec(),
            seams=self._halo_seams(firsts, lasts),
            accel_mask=accel_mask, dst=dst,
        )

    def _fused_call(self, cells, firsts, lasts, prepared, dst):
        _, obs_i8, accel_mask = prepared
        return self.pf._pallas_step_fused(
            cells, lasts, firsts, obs_i8,
            omega_f=float(self.params.omega),
            interpret=self.pf._interpret(),
            accel=self._accel_spec(), depth=self.fused,
            ring=False, seams=self._halo_seams(firsts, lasts),
            accel_mask=accel_mask, dst=dst,
        )

    def step(self, carry, prepared):
        return self.pf.carry_step(self, carry, prepared)

    def final(self, carry):
        return carry[0]


class _WrapPallasShardImpl(_PallasShardImpl):
    """Production-kernel wrap discipline for wall-less non-divisor (or
    TPU-alignment) padding — the fused Mosaic kernel itself is UNCHANGED
    (VERDICT r4 #2; the reference's uneven ``allocate_rows`` served any
    (ny, size) pair at full speed, d2q9-bgk.c:483-492). The wrap is
    expressed entirely through data the kernel already consumes:

    - shard 0's north-going seam entry is SYNTHESISED from lattice row
      ``p`` (= wrap_pad, the first REAL row) instead of the firsts[0]
      edge entry, so the last shard's top row pulls the true global
      bottom row through the existing seam channel;
    - the received south seam (= the true global last row) refreshes the
      one pad row a real row pulls from: lattice row ``p-1``, plus its
      ``lasts`` edge-entry copy when ``p`` is a block boundary (row p
      then streams from the edge array, not the lattice). Both are
      O(nx) jnp updates outside the kernel.

    Row ``p`` is never the forced row (forced = ny_pad-2 = p + ny-2 > p
    for ny > 2), so the synthesised entry's ACC channel is always 0.
    Temporal fusion and pairing are off: the refresh must land between
    every step, and pairing's dst-donor discipline would force a full
    lattice copy around the pre-kernel row update (the donor must stay
    live for the second aliased call). Expected cost from the
    single-chip measurements of the same configurations: the unpaired
    depth-1 blocked kernel measures ~8.8 GLUPS at 16384x1024 vs
    0.2-1.6 for the jnp path (docs/PERF.md) — the ~order-of-magnitude
    cliff this closes. The composed sharded wrap itself is
    interpret/CPU-proven (bit-exact); no multi-chip hardware exists in
    this environment to time it."""

    def __init__(self, params: Params, decomp: RowDecomposition,
                 wrap_pad: int):
        super().__init__(params, decomp, paired=False, fuse=1)
        if not (decomp.n_shards > 1 and 1 <= wrap_pad <= decomp.local_ny - 1):
            raise ValueError(
                f"wrap_pad={wrap_pad} must fit inside shard 0 "
                f"(local_ny={decomp.local_ny}, {decomp.n_shards} shards)"
            )
        self.wrap_pad = wrap_pad
        self._by = self.pf._pick_block_rows(decomp.local_ny, params.nx)

    def _single_call(self, cells, firsts, lasts, prepared, dst):
        obs, obs_i8, accel_mask = prepared
        pf, p = self.pf, self.wrap_pad
        n = self.decomp.n_shards
        nx = cells.shape[2]
        is_first = lax.axis_index(AXIS) == 0
        # (a) Shard 0 advertises its first REAL row as the lattice
        # bottom: a seam entry in the gather_edge_rows channel layout
        # (9 speeds, OBS_CH flags, ACC_CH = 0 — row p is never forced).
        synth = jnp.concatenate(
            [
                cells[:, p, :],
                obs[p : p + 1, :].astype(cells.dtype),
                jnp.zeros((pf.QP - pf.Q - 1, nx), cells.dtype),
            ],
            axis=0,
        )[None]
        first_entry = jnp.where(is_first, synth, firsts[:1])
        south_e = lax.ppermute(lasts[-1:], AXIS, _up_perm(n))
        north_e = lax.ppermute(first_entry, AXIS, _down_perm(n))
        # (b) Refresh the pad row the first real row pulls from with the
        # true global last row (shard 0 only; other shards keep their
        # row unchanged through the same jnp.where so the SPMD program
        # stays uniform).
        row = jnp.where(is_first, south_e[0, : pf.Q, :], cells[:, p - 1, :])
        cells = cells.at[:, p - 1, :].set(row)
        if p % self._by == 0:
            # Row p is a block first row: it streams its south neighbour
            # from the lasts[] edge entry of the block below, so that
            # copy must carry the refreshed speeds too (channels OBS/ACC
            # stay as the kernel wrote them: obstacle pad row, never
            # forced).
            b = p // self._by - 1
            ent = jnp.where(is_first, south_e[0, : pf.Q, :],
                            lasts[b, : pf.Q, :])
            lasts = lasts.at[b, : pf.Q, :].set(ent)
        return pf._pallas_step(
            cells, lasts, firsts, obs_i8,
            omega_f=float(self.params.omega),
            interpret=pf._interpret(),
            accel=self._accel_spec(),
            seams=(south_e, north_e),
            accel_mask=accel_mask, dst=dst,
        )


class _TransposedPallasShardImpl(_PallasShardImpl):
    """Wide grids (nx >> ny) multi-chip: shard the TRANSPOSED lattice's
    rows — i.e. physical x — so every shard keeps its long dimension on
    sublanes (the fast layout) and halo exchange runs along physical x.
    The forced line (physical row ny-2) is a lane column present in every
    shard at a static index, so acceleration is the static lane
    AccelSpec — no dynamic mask or halo accel flags needed."""

    @staticmethod
    def _local_shape(params: Params, decomp: RowDecomposition):
        # Transposed rows = physical x; lanes = physical y.
        return decomp.local_ny, params.ny

    def _accel_spec(self):
        return self.pf.AccelSpec.lanes(self.params, self.params.ny)

    def prepare(self, obstacles):
        # obstacles arrive as the local physical block (ny, local_nx).
        # accel_mask stays None: the forced line is a static lane column.
        obs_t = obstacles.T
        return (obs_t, obs_t.astype(jnp.int8), None)

    def init(self, cells, prepared):
        from lbm_tpu.ops.pallas_fused import transpose_state

        cells_t = transpose_state(cells)  # (9, local_nx, ny)
        return super().init(cells_t, prepared)

    def final(self, carry):
        from lbm_tpu.ops.pallas_fused import transpose_state

        return transpose_state(carry[0])


def _resolve_kernel(kernel: str, params: Params,
                    backend: str | None = None) -> str:
    """Resolve ``auto`` with the SAME rule everywhere (TPU backend and
    float32 — the pallas kernels are f32-only), so plan_sharding,
    plan_row_padding and resolve_shard_kernel can never disagree about
    which plan a given configuration runs (review finding: a missing
    dtype gate here let plan_sharding('auto') return a transposed
    pallas plan for an f64 wide grid the built program would never
    use)."""
    if kernel == "auto":
        return (
            "pallas"
            if (backend or jax.default_backend()) == "tpu"
            and params.dtype == np.float32
            else "reference"
        )
    return kernel


def _wide_transposed_plan(params: Params, n: int,
                          backend: str | None = None) -> bool:
    """The wide-grid x-sharding gate, shared by plan_sharding and
    plan_row_padding — the two must agree or padding would fight the
    plan (review finding: previously hand-duplicated). nx is the
    transposed lattice's sharded rows: it must divide the mesh, stay
    8-aligned, and on real TPU keep 8-aligned PER-SHARD rows (a wide
    grid whose transposed shards misalign must take the row plan —
    which plan_row_padding can always align — rather than demote to
    the reference kernel in resolve_shard_kernel)."""
    from lbm_tpu.ops.pallas_fused import _transposed_layout

    # The wide-grid criterion itself lives in pallas_fused
    # (_transposed_layout, the ONE policy home — review finding: this
    # function re-hardcoded nx >= 2*ny, so a threshold tune there would
    # have left the sharded planner picking a layout the single-chip
    # impl no longer uses); the mesh-divisibility and per-shard
    # alignment terms are sharding-specific and stay here.
    return (
        _transposed_layout(params.ny, params.nx)
        and params.nx % n == 0
        and ((backend or jax.default_backend()) != "tpu"
             or (params.nx // n) % 8 == 0)
    )


def resolve_shard_kernel(params: Params, mesh: Mesh, kernel: str,
                         backend: str | None = None) -> str:
    """Resolve ``auto`` and validate the sharded pallas configuration the
    same way runner._resolve_kernel does for the single-device path:
    float32-only, and on real TPU the PER-SHARD Mosaic geometry must
    keep DMA tiles 8-aligned in rows. ``auto`` demotes to the reference
    kernel on violation; an explicit pallas request fails with a clear
    error instead of a Mosaic compile crash (which can take the TPU
    session down for an hour — CLAUDE.md)."""
    was_auto = kernel == "auto"
    kernel = _resolve_kernel(kernel, params, backend=backend)
    if kernel == "pallas" and params.dtype != np.float32:
        raise ValueError(
            "the pallas kernel is float32-only; use kernel='reference' "
            "with float64"
        )
    if kernel == "pallas" and (backend or jax.default_backend()) == "tpu":
        from lbm_tpu.ops.pallas_fused import _pick_block_rows

        transposed, decomp, _, _ = plan_sharding(params, mesh, "pallas",
                                                 backend=backend)
        _, local_h, width = _pallas_shard_geometry(params, decomp, transposed)
        by = _pick_block_rows(local_h, width)
        if local_h % 8 or by % 8:
            if was_auto:
                return "reference"
            raise ValueError(
                f"grid {params.ny}x{params.nx} over {decomp.n_shards} "
                "shards: per-shard rows must stay 8-aligned for the "
                "Mosaic kernel on real TPU; use kernel='reference'"
            )
    return kernel


def plan_row_padding(params: Params, obstacles, mesh: Mesh,
                     kernel: str, backend: str | None = None) -> int:
    """Rows of all-obstacle padding that make the row plan divide the
    mesh evenly — the equal-shard answer to the reference's uneven
    ``allocate_rows`` (first ny%size ranks take one extra row,
    d2q9-bgk.c:483-492): ny=1024 on 6 devices pads to 1056 and uses all
    six instead of demoting to 4.

    Padding is EXACT, not approximate, when both y boundaries are full
    bounce-back wall rows (true of every shipped scene): a wall row's
    distributions that its fluid neighbour reads depend only on that
    neighbour, never on what lies beyond the wall, so rows behind the
    wall are causally disconnected from the interior; pad cells are
    obstacles, so av_vels and the fluid count are untouched, and the
    runner slices the pad back off before reporting. The pad goes BELOW
    row 0 so the forced row keeps its index relative to the top
    (ny-2, d2q9-bgk.c:240). Raises when padding would be needed but a
    boundary row has fluid cells (padding would change the physics).

    Returns 0 when the existing plans (row divisor or the wide-grid
    transposed-x plan) already fit."""
    n = mesh.shape[AXIS]
    ny = params.ny
    # ``backend`` override per the CLAUDE.md rule: these are pure-Python
    # planners, and probing jax.default_backend() INITIALISES the
    # backend — analysis tooling asking "how would this count pad?"
    # must not hang on a down tunnel (review finding; ring_prefs /
    # resident_prefs grew the same escape hatch).
    k = _resolve_kernel(kernel, params, backend=backend)
    on_tpu = (backend or jax.default_backend()) == "tpu"
    # The wide-grid transposed plan shards x; no row padding involved.
    if k == "pallas" and _wide_transposed_plan(params, n, backend=backend):
        return 0
    # Real-TPU Mosaic needs 8-aligned per-shard rows (resolve_shard_kernel);
    # padding to that unit keeps the pallas kernel instead of demoting.
    align = 8 if (k == "pallas" and on_tpu) else 1
    unit = n * align
    ny_pad = -(-ny // unit) * unit
    if ny_pad == ny:
        return 0
    obs = np.asarray(obstacles, dtype=bool)
    if not (obs[0, :].all() and obs[-1, :].all()):
        if ny % n == 0:
            # Alignment-only padding is optional: the row plan already
            # divides, so let resolve_shard_kernel demote auto to the
            # reference kernel (or raise its clear explicit-pallas
            # error) instead of refusing the run (review finding).
            return 0
        raise ValueError(
            f"ny={ny} does not divide over {n} devices and the obstacle "
            "mask has no full wall rows at both y boundaries, so "
            "obstacle-row padding would change the physics; use a "
            "divisor device count"
        )
    return ny_pad - ny


def _wrap_fits(ny: int, n: int, unit: int):
    """Smallest wrap pad to a multiple of ``unit`` rows that fits inside
    shard 0 (pad <= local_ny-1 — the refresh discipline keeps the whole
    pad region and the first real row on shard 0), or None."""
    pad = -(-ny // unit) * unit - ny
    local = (ny + pad) // n
    return pad if 1 <= pad <= local - 1 else None


def plan_padding_mode(params: Params, obstacles, mesh: Mesh,
                      kernel: str, backend: str | None = None):
    """The padding policy's single owner:
    ``('none'|'wall'|'wrap'|'wrap_ref', pad)``.

    - ``'none'``: the existing plans fit (row divisor, or the wide-grid
      transposed-x plan) — no padding.
    - ``'wall'``: non-divisor ny with full bounce-back wall rows at both
      y boundaries — :func:`plan_row_padding`'s wall-shielded
      obstacle-row padding, causally inert, any kernel (the production
      pallas paths run it unchanged).
    - ``'wrap'``: wall-less padding served by the PRODUCTION pallas
      kernel (:class:`_WrapPallasShardImpl` — the fused Mosaic kernel
      unchanged, the wrap expressed through the seam channel plus an
      O(nx) per-step pad-row refresh; VERDICT r4 #2). The pad is sized
      for the pallas geometry: 8-aligned per-shard rows on real TPU
      (Mosaic DMA tiling), the bare divisor remainder elsewhere. Also
      selected on real TPU for wall-less DIVISOR counts whose per-shard
      rows are misaligned (ny=1000 over 8 -> pad 24 to 1024), which
      previously demoted to the reference kernel.
    - ``'wrap_ref'``: the same wrap discipline on the portable
      reference kernel (_ReferenceShardImpl) — taken when the resolved
      kernel is 'reference', or when the pallas-geometry pad does not
      fit inside shard 0 but the bare remainder does ('auto' demotes;
      an explicit 'pallas' request raises a clear error instead).

    Both wrap modes are bit-exact: equal shards pad below row 0 with
    obstacle rows, and the shard step closes the periodic wrap over the
    REAL lattice (the reference's uneven ``allocate_rows`` balancing,
    d2q9-bgk.c:483-492). Needs pad <= local_ny-1 so the whole pad
    region sits inside shard 0 (fails only for ny barely above the
    device count — resolve_mesh then takes the divisor fallback).
    """
    n = mesh.shape[AXIS]
    k = _resolve_kernel(kernel, params, backend=backend)
    on_tpu = (backend or jax.default_backend()) == "tpu"
    pallas_unit = n * (8 if on_tpu else 1)
    try:
        pad = plan_row_padding(params, obstacles, mesh, kernel,
                               backend=backend)
        if pad:
            return "wall", pad
        # Divisor wall-less grids whose per-shard rows are misaligned
        # would demote to the reference kernel on real TPU
        # (resolve_shard_kernel's Mosaic-geometry gate); alignment wrap
        # padding keeps the production kernel when it fits. n > 1: the
        # wrap discipline is a SHARDED construct (the seam redirection
        # and pad-row refresh live in the shard impls) — a 1-device
        # mesh must keep the 'none' plan and demote as before (review
        # finding: the bare condition returned 'wrap' for n=1, and
        # _WrapPallasShardImpl correctly refuses single-shard builds).
        if (k == "pallas" and on_tpu and n > 1 and params.ny % pallas_unit
                and not _wide_transposed_plan(params, n, backend=backend)):
            obs = np.asarray(obstacles, dtype=bool)
            if not (obs[0, :].all() and obs[-1, :].all()):
                pad = _wrap_fits(params.ny, n, pallas_unit)
                if pad is not None:
                    return "wrap", pad
        return "none", 0
    except ValueError:
        if k == "pallas":
            pad = _wrap_fits(params.ny, n, pallas_unit)
            if pad is not None:
                return "wrap", pad
        pad = _wrap_fits(params.ny, n, n)
        if pad is None:
            raise  # pad would spill past shard 0: divisor fallback
        if k == "pallas" and kernel != "auto":
            raise ValueError(
                f"ny={params.ny} over {n} devices leaves no room for the "
                "pallas wrap pad inside shard 0; use kernel='auto' (or "
                "'reference') for the portable wrap, or a divisor device "
                "count"
            ) from None
        return "wrap_ref", pad


def resolve_mesh(params: Params, obstacles, n_devices: int, kernel: str,
                 backend: str | None = None):
    """Resolve a requested device count to a usable mesh (or ``None``
    for unsharded) — the CLI's device policy as a library contract
    (VERDICT r3 #5), so the demotion rules are tested behaviour rather
    than driver-script accident:

    1. clamp to the visible device count;
    2. non-divisor counts keep all devices: wall-bounded masks via
       wall-shielded obstacle-row padding, wall-less masks via periodic
       wrap padding — on the PRODUCTION pallas kernel when its geometry
       fits ('wrap'), the portable kernel otherwise ('wrap_ref')
       (:func:`plan_padding_mode` — together the equal-shard answer to
       the reference's uneven ``allocate_rows``, d2q9-bgk.c:483-492,
       for any (ny, size) pair with ceil(ny/size)-1 pad headroom);
    3. demote to the largest divisor of ny only when even wrap padding
       cannot fit (ny barely above the device count).

    Returns ``(mesh_or_None, notes)``; ``notes`` are human-readable
    demotion messages for the caller to surface (the CLI prints them to
    stderr). This is a feasibility PROBE only — the padding plan is
    discarded and run_simulation recomputes the identical plan from the
    same single owner (plan_padding_mode), so the two calls cannot
    drift."""
    from lbm_tpu.parallel.decomp import largest_divisor_leq, make_mesh

    notes = []
    # Honour the backend override for the device lookup too: bare
    # jax.devices() INITIALISES the default backend, and a down axon
    # tunnel then hangs the caller (CLAUDE.md) — the exact hazard the
    # backend= escape hatch exists to avoid.
    devices = jax.devices(backend) if backend else jax.devices()
    visible = len(devices)
    usable = min(n_devices, visible)
    if usable != n_devices:
        notes.append(f"note: using {usable} devices ({visible} visible)")
    if usable <= 1:
        return None, notes
    mesh = make_mesh(usable, devices=devices)
    try:
        mode, _ = plan_padding_mode(params, obstacles, mesh, kernel,
                                    backend=backend)
        if mode == "wrap_ref" and _resolve_kernel(
                kernel, params, backend=backend) != "reference":
            notes.append(
                "note: wall-less non-divisor run uses the portable "
                "reference kernel (periodic wrap padding: the pallas "
                "wrap pad does not fit inside shard 0)"
            )
    except ValueError:
        fallback = largest_divisor_leq(params.ny, usable)
        notes.append(
            f"note: using {fallback} devices (ny={params.ny} over "
            f"{usable} leaves no headroom for wrap padding; "
            "divisor fallback)"
        )
        # Pass the already-resolved devices: a bare make_mesh(fallback)
        # would call jax.devices() — initialising the default backend
        # (the down-tunnel hang hazard the backend= override exists to
        # avoid) and potentially building the mesh over different
        # devices than the probe used (ADVICE r4).
        mesh = (
            make_mesh(fallback, devices=devices) if fallback > 1 else None
        )
    return mesh, notes


def pad_scene(params: Params, obstacles, pad: int):
    """Apply :func:`plan_row_padding`'s result: ``pad`` all-obstacle rows
    below row 0 (indices shift up by ``pad``; the forced row stays at
    the new ny-2)."""
    import dataclasses

    obs = np.pad(
        np.asarray(obstacles, dtype=bool), ((pad, 0), (0, 0)),
        constant_values=True,
    )
    return dataclasses.replace(params, ny=params.ny + pad), obs


def plan_sharding(params: Params, mesh: Mesh, kernel: str,
                  backend: str | None = None):
    """Decide the decomposition axis and shard_map specs.

    Standard: rows (physical y) — the reference's decomposition. Wide
    pallas grids shard physical x instead (the transposed lattice's rows)
    so each shard's long dimension stays on sublanes.
    Returns (transposed, decomp, cells_spec, obstacles_spec)."""
    n = mesh.shape[AXIS]
    kernel = _resolve_kernel(kernel, params, backend=backend)
    transposed = kernel == "pallas" and _wide_transposed_plan(
        params, n, backend=backend
    )
    if transposed:
        return (
            True,
            RowDecomposition(ny=params.nx, n_shards=n),
            P(None, None, AXIS),
            P(None, AXIS),
        )
    return (
        False,
        RowDecomposition(ny=params.ny, n_shards=n),
        P(None, AXIS, None),
        P(AXIS, None),
    )


def _pallas_shard_geometry(params: Params, decomp: RowDecomposition,
                           transposed: bool):
    """(impl class, per-shard rows, lane width) for the pallas path."""
    cls = _TransposedPallasShardImpl if transposed else _PallasShardImpl
    width = params.ny if transposed else params.nx
    return cls, decomp.local_ny, width


def _shard_impl(params: Params, decomp: RowDecomposition, kernel: str,
                n_iters: int, transposed: bool = False,
                wrap_pad: int = 0):
    """Pick the per-shard step implementation, preferring the fused
    kernel depth that fits the PER-SHARD state size (per-step HBM
    traffic divided by depth; small resident shards prefer depth 2 —
    see pallas_fused._depth_preference), then aliased pairing on top.
    ``wrap_pad`` (wall-less non-divisor / alignment runs) routes to the
    wrap impls: :class:`_WrapPallasShardImpl` (production kernel, fusion
    and pairing off — the per-step pad-row refresh must land between
    steps) or :class:`_ReferenceShardImpl`."""
    if kernel == "pallas" and wrap_pad:
        return _WrapPallasShardImpl(params, decomp, wrap_pad)
    if kernel == "pallas":
        from lbm_tpu.ops.pallas_fused import _depth_preference

        cls, local_ny, width = _pallas_shard_geometry(
            params, decomp, transposed
        )
        for d in _depth_preference(local_ny, width):
            if n_iters % d == 0:
                impl = cls(params, decomp,
                           paired=n_iters % (2 * d) == 0, fuse=d)
                if impl.fused == d:
                    return impl
        return cls(params, decomp, paired=n_iters % 2 == 0)
    return _ReferenceShardImpl(params, decomp, wrap_pad=wrap_pad)


def _shard_segments(params: Params, decomp: RowDecomposition, kernel: str,
                    iters: int, transposed: bool, wrap_pad: int = 0):
    """Plan the run as ``[(impl, n_steps), ...]`` (the sharded analogue
    of runner._segments, via the shared pallas_fused.plan_split): one
    segment when the preferred fused granularity divides ``iters``,
    otherwise a main paired-fused segment plus a tail shorter than one
    paired pass (fused but unpaired when a depth divides it), so
    arbitrary iteration counts keep the fused kernel's speed."""
    if kernel == "pallas" and iters > 0 and not wrap_pad:
        from lbm_tpu.ops.pallas_fused import _depth_preference, plan_split
        from lbm_tpu.parallel import resident_ring as rr

        cls, local_ny, width = _pallas_shard_geometry(
            params, decomp, transposed
        )
        # Per-shard ring residency first (experimental opt-in,
        # LBM_SHARD_RESIDENT=1): G steps per call with in-kernel seam
        # RDMA; indivisible counts run a ring main segment and re-plan
        # the tail (mirrors runner._segments' resident planning).
        g = rr.ring_gsteps(local_ny, width, iters, transposed=transposed)
        if g:
            return [(rr.make_ring_impl(params, decomp, transposed, g),
                     iters)]
        prefs = rr.ring_prefs(local_ny, width, transposed=transposed)
        if prefs:
            main = iters - iters % prefs[0]
            if main:
                return [
                    (rr.make_ring_impl(
                        params, decomp, transposed,
                        rr.ring_gsteps(local_ny, width, main,
                                       transposed=transposed)), main),
                ] + _shard_segments(params, decomp, kernel, iters - main,
                                    transposed)
        main, tail, probe = plan_split(
            iters,
            (
                cls(params, decomp, paired=True, fuse=d)
                for d in _depth_preference(local_ny, width)
            ),
        )
        if tail:
            return [
                (probe, main),
                (_shard_impl(params, decomp, kernel, n_iters=tail,
                             transposed=transposed), tail),
            ]
    return [(_shard_impl(params, decomp, kernel, n_iters=iters,
                         transposed=transposed, wrap_pad=wrap_pad), iters)]


def _check_wrap_kernel(wrap_pad: int, kernel: str,
                       transposed: bool = False) -> None:
    """Wrap padding's build-time contract: the wrap discipline lives in
    the ROW-plan impls (_ReferenceShardImpl and _WrapPallasShardImpl);
    a transposed build with wrap_pad would silently read pad rows as
    physics (plan_padding_mode never produces the combination — the
    wide plan shards x and needs no row padding)."""
    if wrap_pad and kernel not in ("reference", "pallas"):
        raise ValueError(
            "wrap_pad (wall-less non-divisor padding) requires the "
            f"'reference' or 'pallas' kernel, got {kernel!r}"
        )
    if wrap_pad and transposed:
        raise ValueError(
            "wrap_pad requires the row plan; the transposed x-sharded "
            "plan cannot carry row padding"
        )


def make_sharded_simulate(
    params: Params,
    mesh: Mesh,
    kernel: str = "reference",
    n_iters: int | None = None,
    wrap_pad: int = 0,
):
    """Jitted whole-simulation function over a row-sharded lattice:
    ``(cells0, obstacles, inv_fluid) -> (final_cells, av_vels)``.

    Input shardings depend on the plan: row decomposition shards
    ``cells0`` (9, ny, nx) P(None, 'y', None) and ``obstacles``
    P('y', None); wide pallas grids use the transposed plan —
    P(None, None, 'y') / P(None, 'y') (physical x). Place inputs with
    :func:`shard_inputs` (which applies plan_sharding) rather than
    hand-building specs, or the compiled call reshards the lattice
    inside the timed region. ``av_vels`` comes back replicated."""
    from lbm_tpu.params import ensure_dtype_computable

    ensure_dtype_computable(params)
    iters = params.max_iters if n_iters is None else n_iters
    kernel = resolve_shard_kernel(params, mesh, kernel)
    transposed, decomp, cells_spec, obs_spec = plan_sharding(params, mesh, kernel)
    _check_wrap_kernel(wrap_pad, kernel, transposed)
    segs = _shard_segments(params, decomp, kernel, iters, transposed,
                           wrap_pad=wrap_pad)

    # The stepping loop is runner._segment_loop — one implementation for
    # the single-device and shard_map programs.
    from lbm_tpu.runner import _segment_loop

    def local_sim(cells, obstacles, inv_fluid):
        av_partial = jnp.zeros((iters,), dtype=cells.dtype)
        cells, av_partial = _segment_loop(
            segs, cells, obstacles, inv_fluid, av_partial, 0
        )
        # One reduction for the whole trajectory, not one per step — the
        # reference's single end-of-run MPI_Reduce (d2q9-bgk.c:445).
        av = lax.psum(av_partial, AXIS)
        return cells, av

    sharded = jax.shard_map(
        local_sim,
        mesh=mesh,
        in_specs=(cells_spec, obs_spec, P()),
        out_specs=(cells_spec, P()),
        # vma checking can't see through pallas_call out_shapes; skip it
        # (correctness is covered by the sharded-vs-unsharded tests).
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_sharded_chunk(
    params: Params,
    mesh: Mesh,
    kernel: str,
    chunk_iters: int,
    wrap_pad: int = 0,
):
    """Sharded analogue of runner.make_chunk:
    ``(cells, obstacles, inv, av, t0) -> (cells, av)`` running
    ``chunk_iters`` steps that fill av_vels[t0:t0+chunk_iters] (av passed
    replicated; the chunk's partials are psum'd once at the end)."""
    from lbm_tpu.params import ensure_dtype_computable

    ensure_dtype_computable(params)
    kernel = resolve_shard_kernel(params, mesh, kernel)
    transposed, decomp, cells_spec, obs_spec = plan_sharding(params, mesh, kernel)
    _check_wrap_kernel(wrap_pad, kernel, transposed)
    segs = _shard_segments(params, decomp, kernel, chunk_iters, transposed,
                           wrap_pad=wrap_pad)

    from lbm_tpu.runner import _segment_loop

    def local_chunk(cells, obstacles, inv_fluid, av, t0):
        av_partial = jnp.zeros((chunk_iters,), dtype=cells.dtype)
        cells, av_partial = _segment_loop(
            segs, cells, obstacles, inv_fluid, av_partial, 0
        )
        av = lax.dynamic_update_slice(av, lax.psum(av_partial, AXIS), (t0,))
        return cells, av

    sharded = jax.shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(cells_spec, obs_spec, P(), P(), P()),
        out_specs=(cells_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 3))


def shard_inputs(mesh: Mesh, cells: jnp.ndarray, obstacles: jnp.ndarray,
                 *, params: Params, kernel: str = "reference"):
    """Place the initial state and mask with the shardings the sharded
    simulate expects — the same plan make_sharded_simulate selects
    (x-decomposed for wide pallas grids), so the compiled call never
    reshards inside the timed region. ``params`` is required: a
    row-spec guess would silently reshard transposed plans per call
    (review finding)."""
    kernel = resolve_shard_kernel(params, mesh, kernel)
    _, _, cells_spec, obs_spec = plan_sharding(params, mesh, kernel)
    cells_s = jax.device_put(cells, NamedSharding(mesh, cells_spec))
    obs_s = jax.device_put(obstacles, NamedSharding(mesh, obs_spec))
    return cells_s, obs_s
