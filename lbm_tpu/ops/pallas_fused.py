"""Fused Pallas TPU kernel for the collide-stream step.

The TPU-native equivalent of the reference's hot loop (``timestep``,
d2q9-bgk.c:268-339) and of its OpenCL kernel experiment
(report_mpi/report.tex:873-921): one pass over the lattice doing (optional
in-kernel) accelerate_flow + pull streaming + bounce-back + BGK relaxation
+ the tot_u reduction, VMEM-blocked over rows with explicit one-row halos
(the reference's +2 halo rows, d2q9-bgk.c:546).

Design:

- Inputs ``interior`` (9, H, nx) and per-block neighbour-row arrays
  ``prevs``/``nexts`` (n_blocks, QP, nx). Mosaic DMA slices must be
  (8, 128)-tile aligned on both sides, so neighbour rows ride an untiled
  leading block axis with the speed dim padded 9 -> QP=16; channel 9
  carries the row's obstacle flags (so in-kernel acceleration can apply
  its fluid guard to halo copies without extra loads). Each grid step
  issues three unconditional DMAs — the aligned (9, BY, nx) body block
  plus its two neighbour rows — double-buffered across two VMEM slots so
  the next block's fetch overlaps this block's compute (the kernel is
  HBM-bandwidth-bound at ~0.5 FLOP/byte, like the reference:
  report_mpi/report.tex:158).
- Acceleration (d2q9-bgk.c:235-266) can run inside the kernel on the
  loaded copies (an :class:`AccelSpec` names the forced line, per-speed
  deltas and guard speeds): zero extra HBM traffic, and the guarded
  update is applied consistently to every copy a stream can read — the
  reference's rank/buffer accelerate flags (d2q9-bgk.c:241-245) by
  construction.
- The ±1-row pull windows are built in registers: sublane ``pltpu.roll``
  of the body with the one wrong edge row patched in via an iota select
  from the neighbour-row buffer. Periodic x is a lane rotate per speed.
- Periodic y is the caller's choice of neighbour rows, so the same
  kernel serves the single-chip (wrapped rows) and sharded (ppermute'd
  rows) paths.
- The new state's per-block edge rows are exported as extra outputs, so
  a stepping loop's next neighbour-row arrays are a leading-axis roll —
  no strided gather from the tiled lattice (:class:`CarryStep`).
- For wide grids (nx >> ny) :class:`TransposedCarryStep` runs the whole
  simulation on the transposed lattice (speeds swap x/y components under
  transpose), putting the long dimension on sublanes where the row
  machinery is optimal; acceleration becomes a lane-masked in-kernel
  update (axis=1).
- The BGK math is the shared :func:`lbm_tpu.ops.reference._bgk_update`,
  guaranteeing term-for-term f32 agreement with the portable path.
- tot_u accumulates across the sequential TPU grid into a (1, 1) SMEM
  output block that every grid step maps to.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.params import Params
from lbm_tpu.state import D2Q9
from lbm_tpu.ops.reference import (
    _bgk_update,
    _bgk_update_planes,
    accelerate_flow,
)

Q = D2Q9.Q
# Edge-row arrays pad the speed dim to a sublane multiple: Mosaic requires
# leading-dim DMA slices of wide (N, q, nx) arrays to be 8-aligned in q.
# Channel OBS_CH carries the row's obstacle flags.
QP = 16
OBS_CH = Q  # == 9
ACC_CH = Q + 1  # == 10: accel-line flag (sharded dynamic forcing)
# Speed permutation under lattice transpose (x and y velocity components
# swap): transposed-space speed k stores physical speed SIGMA[k].
SIGMA = (0, 2, 1, 4, 3, 5, 8, 7, 6)
# VMEM budget per DMA slot (two slots live at once, plus the pipelined
# output and obstacle blocks). Tunable: bigger blocks amortise per-block
# overheads; the scoped-VMEM limit is raised accordingly below. 6 MiB
# (by=128 on 1024-lane grids) measured best across every benchmark
# shape at fusion depth 4 (docs/PERF.md).
_SLOT_BYTES = int(os.environ.get("LBM_PALLAS_SLOT_BYTES", 6 * 1024 * 1024))
# Ceiling for the scoped-VMEM limit passed to Mosaic. The hardware has
# 128 MiB of VMEM; Mosaic's default scoped limit is 100 MiB and block
# configs slightly above it (e.g. 256-row blocks at depth 4 on
# 1024-lane grids: ~120 MiB) are legal if the ceiling is raised.
_VMEM_CAP = int(os.environ.get("LBM_PALLAS_VMEM_CAP", 100 * 1024 * 1024))


@dataclasses.dataclass(frozen=True)
class AccelSpec:
    """Static description of the accelerate_flow forcing for in-kernel
    application (d2q9-bgk.c:235-266).

    ``axis``: 0 = the forced line is a lattice row (sublane index),
    1 = a column (lane index). ``index`` is its global coordinate.
    ``deltas``: per-speed additive forcing. ``guards``: (speed, threshold)
    triples that must stay positive after subtraction for the cell to be
    forced (plus the not-an-obstacle condition).
    """

    axis: int
    index: int
    deltas: tuple
    guards: tuple

    @staticmethod
    def rows(params: Params, h: int) -> "AccelSpec":
        """Physical layout: force row h-2 (go/d2q9-bgk.go:131)."""
        w1, w2 = float(params.accel_w1), float(params.accel_w2)
        return AccelSpec(
            axis=0,
            index=h - 2,
            deltas=(0.0, w1, 0.0, -w1, 0.0, w2, -w2, -w2, w2),
            guards=((3, w1), (6, w2), (7, w2)),
        )

    @staticmethod
    def lanes(params: Params, ny_phys: int) -> "AccelSpec":
        """Transposed layout: the physical row ny-2 is lane column ny-2;
        deltas/guards permute through SIGMA."""
        base = AccelSpec.rows(params, ny_phys)
        return AccelSpec(
            axis=1,
            index=ny_phys - 2,
            deltas=tuple(base.deltas[SIGMA[k]] for k in range(Q)),
            guards=tuple((SIGMA[g], t) for g, t in base.guards),
        )


def _transposed_layout(ny: int, nx: int) -> bool:
    """ONE home for the wide-grid transposition policy (review finding:
    supports_tpu_grid and _layout each hard-coded it — tuning one copy
    would let the Mosaic-geometry gate validate a layout the impl no
    longer uses)."""
    return nx >= 2 * ny and nx % 8 == 0


def _pick_block_rows(h: int, nx: int) -> int:
    """Largest divisor of h whose 9-speed f32 row block fits the per-slot
    VMEM budget. Multiples of 8 are strongly preferred (body DMA offsets
    land on (8,128)-tile boundaries); when the budget would force fewer
    than 8 rows, the smallest 8-multiple divisor wins instead (the raised
    vmem limit absorbs the overshoot)."""
    budget_rows = max(1, _SLOT_BYTES // (Q * nx * 4))
    divisors = [d for d in range(1, h + 1) if h % d == 0]
    aligned = [d for d in divisors if d % 8 == 0]
    fitting = [d for d in aligned if d <= budget_rows]
    if fitting:
        return fitting[-1]
    if aligned:
        return aligned[0]
    fallback = [d for d in divisors if d <= budget_rows]
    return fallback[-1] if fallback else 1


def _accel_ok(vals, fluid_f, accel: AccelSpec, line_f):
    """The forcing guard on one loaded copy: on the forced line, fluid,
    and no guarded speed driven negative (d2q9-bgk.c:250-253).

    All factors are f32 0/1 indicators multiplied together — Mosaic
    rejects several i1-vector patterns (i8 ``==``, vector vs dynamic
    scalar compares, mixed-replication logical ands)."""
    okf = line_f * fluid_f
    for g, t in accel.guards:
        okf = okf * (
            vals[g] - np.float32(t) > np.float32(0.0)
        ).astype(jnp.float32)
    return okf


def _accel_line_extract(vals, fluid_f, accel: AccelSpec, line_f):
    """axis=1 (transposed-layout) forcing with the v6.5 line
    extraction: the guards need only the forced COLUMN's values, so
    the compares run on (m, 1) lane slices and the line-and-fluid
    indicator broadcasts over the narrow result — bit-identical to
    the full-plane _accel_ok form (all factors are exact 0/1 floats)
    at ~2 full-plane ops per copy instead of ~5. The VMEM-resident
    kernels' hottest-path forcing (review finding: they re-paid the
    full-plane cost the blocked kernel already eliminated)."""
    c = accel.index
    okl = None
    for g, t in accel.guards:
        ind = (
            vals[g][:, c : c + 1] - np.float32(t) > np.float32(0.0)
        ).astype(jnp.float32)
        okl = ind if okl is None else okl * ind
    return _accelerated(vals, (line_f * fluid_f) * okl, accel)


def _accelerated(vals, okf, accel: AccelSpec):
    """Apply the per-speed deltas scaled by the 0/1 indicator."""
    out = []
    for k in range(Q):
        d = np.float32(accel.deltas[k])
        if float(d) == 0.0:
            out.append(vals[k])
        else:
            out.append(vals[k] + d * okf)
    return out


def _kernel(
    interior_ref,  # (9, H, nx) HBM
    prevs_ref,  # (n_blocks, QP, nx) HBM: row below each block (+obs ch 9)
    nexts_ref,  # (n_blocks, QP, nx) HBM: row above each block (+obs ch 9)
    obs_ref,  # (BY, nx) VMEM block (auto-pipelined, int8)
    *rest,
    by: int,
    omega: np.float32,
    accel: AccelSpec | None,
    ring: bool = False,
    seam: bool = False,
    has_dst: bool = False,
    dynamic_accel: bool = False,
):
    rest = list(rest)
    accmask_ref = rest.pop(0) if dynamic_accel else None
    if seam:
        south_ref = rest.pop(0)  # (1, QP, nx) ppermuted seam prev entry
        north_ref = rest.pop(0)  # (1, QP, nx) ppermuted seam next entry
    if has_dst:
        # Donor refs for input_output_aliases — memory only, never read.
        rest = rest[3:]
    (out_ref, firsts_ref, lasts_ref, tot_ref,
     body_scr, prev_scr, next_scr, sems) = rest
    # out_ref: (9, BY, nx) VMEM block; firsts/lasts_ref: (1, QP, nx) VMEM
    # blocks (this block's new edge rows); tot_ref: (1,1) SMEM, same block
    # every step; body/prev/next_scr: double-buffered VMEM DMA slots.
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def body_dma(block, slot):
        return pltpu.make_async_copy(
            interior_ref.at[:, pl.ds(block * by, by), :],
            body_scr.at[slot],
            sems.at[slot, 0],
        )

    def prev_dma(block, slot):
        # ring: prevs_ref/nexts_ref hold the CURRENT lasts/firsts arrays;
        # block b's south neighbour row is lasts[(b-1) % n] and its north
        # neighbour firsts[(b+1) % n] (periodic y). seam: same resident
        # indexing with clamping — block 0's start is replaced by the
        # seam DMA (same shape and semaphore, so this descriptor still
        # serves wait()). explicit (neither): per-block prevs/nexts.
        if ring:
            src = prevs_ref.at[(block - 1 + n) % n]
        elif seam:
            src = prevs_ref.at[jnp.maximum(block - 1, 0)]
        else:
            src = prevs_ref.at[block]
        return pltpu.make_async_copy(
            src, prev_scr.at[slot], sems.at[slot, 1]
        )

    def next_dma(block, slot):
        if ring:
            src = nexts_ref.at[(block + 1) % n]
        elif seam:
            src = nexts_ref.at[jnp.minimum(block + 1, n - 1)]
        else:
            src = nexts_ref.at[block]
        return pltpu.make_async_copy(
            src, next_scr.at[slot], sems.at[slot, 2]
        )

    def start(block, slot):
        body_dma(block, slot).start()
        if not seam:
            prev_dma(block, slot).start()
            next_dma(block, slot).start()
        else:
            # Boundary blocks read the ppermuted seam entries (the
            # reference's halo rows, d2q9-bgk.c:341-393); interior
            # blocks ring-index the resident neighbour entries — no
            # rolled edge-array copies outside the kernel.
            @pl.when(block == 0)
            def _():
                pltpu.make_async_copy(
                    south_ref.at[0], prev_scr.at[slot], sems.at[slot, 1]
                ).start()

            @pl.when(block > 0)
            def _():
                prev_dma(block, slot).start()

            @pl.when(block == n - 1)
            def _():
                pltpu.make_async_copy(
                    north_ref.at[0], next_scr.at[slot], sems.at[slot, 2]
                ).start()

            @pl.when(block < n - 1)
            def _():
                next_dma(block, slot).start()

    def wait(block, slot):
        body_dma(block, slot).wait()
        prev_dma(block, slot).wait()
        next_dma(block, slot).wait()

    # Double-buffered pipeline: warm up block 0, prefetch block i+1 while
    # computing block i (sequential TPU grid).
    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n)
    def _():
        # Clamp: on single-block grids the predicated-off prefetch would
        # otherwise lower a statically out-of-range DMA offset.
        start(jnp.minimum(i + 1, n - 1), (i + 1) % 2)

    slot = i % 2
    wait(i, slot)

    nx = out_ref.shape[-1]
    obstacles = obs_ref[:] != 0
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (by, nx), 0)

    body = [body_scr[slot, k] for k in range(Q)]
    prev_row = [prev_scr[slot, k] for k in range(Q)]
    next_row = [next_scr[slot, k] for k in range(Q)]

    if accel is not None and dynamic_accel:
        # Sharded SPMD forcing: the owning line is dynamic per shard, so
        # the body's line indicator arrives as an i8 mask input and halo
        # copies carry theirs in edge-array channel ACC_CH.
        fluid_body = np.float32(1.0) - obstacles.astype(jnp.float32)
        line_f = (accmask_ref[:] != 0).astype(jnp.float32)
        ok = _accel_ok(body, fluid_body, accel, line_f)
        body = _accelerated(body, ok, accel)
        fluid_p = np.float32(1.0) - prev_scr[slot, OBS_CH]
        ok_p = _accel_ok(prev_row, fluid_p, accel, prev_scr[slot, ACC_CH])
        prev_row = _accelerated(prev_row, ok_p, accel)
        fluid_n = np.float32(1.0) - next_scr[slot, OBS_CH]
        ok_n = _accel_ok(next_row, fluid_n, accel, next_scr[slot, ACC_CH])
        next_row = _accelerated(next_row, ok_n, accel)
    elif accel is not None:
        fluid_body = np.float32(1.0) - obstacles.astype(jnp.float32)
        if accel.axis == 0:
            # Forced row: by construction it is never a block-edge row
            # (callers assert index % by not in {0, by-1}), so only the
            # body copy needs patching. The row mask is a STATIC local-row
            # comparison gated by a scalar owner-block factor (vector vs
            # dynamic scalar compares are unsupported on this target).
            lr = accel.index % by
            ab = accel.index // by
            owner = jnp.where(
                i == np.int32(ab), np.float32(1.0), np.float32(0.0)
            )
            line_f = (row_ids == np.int32(lr)).astype(jnp.float32) * owner
            ok = _accel_ok(body, fluid_body, accel, line_f)
            body = _accelerated(body, ok, accel)
        else:
            # Forced lane column: present in the body and both edge rows.
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (by, nx), 1)
            line_f = (lane_ids == np.int32(accel.index)).astype(jnp.float32)
            ok = _accel_ok(body, fluid_body, accel, line_f)
            body = _accelerated(body, ok, accel)
            lane1 = (
                jax.lax.broadcasted_iota(jnp.int32, (nx,), 0)
                == np.int32(accel.index)
            ).astype(jnp.float32)
            # The obs channel already stores f32 0/1 flags.
            fluid_p = np.float32(1.0) - prev_scr[slot, OBS_CH]
            ok_p = _accel_ok(prev_row, fluid_p, accel, lane1)
            prev_row = _accelerated(prev_row, ok_p, accel)
            fluid_n = np.float32(1.0) - next_scr[slot, OBS_CH]
            ok_n = _accel_ok(next_row, fluid_n, accel, lane1)
            next_row = _accelerated(next_row, ok_n, accel)

    streamed = _pull_interior(body, prev_row, next_row, row_ids, by, nx)
    new, tot_u = _bgk_update(streamed, obstacles, omega)
    out_ref[:] = new
    # Edge rows exported per block (with their obstacle flags in channel
    # OBS_CH) so the next step's neighbour-row arrays are a cheap
    # leading-axis roll instead of a strided gather from the tiled lattice.
    zeros_tail = jnp.zeros((QP - Q - 2, nx), jnp.float32)
    obs_f = obs_ref[:].astype(jnp.float32)
    if dynamic_accel:
        acc_f = (accmask_ref[:] != 0).astype(jnp.float32)
    else:
        acc_f = jnp.zeros((by, nx), jnp.float32)
    firsts_ref[0] = jnp.concatenate(
        [new[:, 0, :], obs_f[0:1, :], acc_f[0:1, :], zeros_tail], axis=0
    )
    lasts_ref[0] = jnp.concatenate(
        [new[:, by - 1, :], obs_f[by - 1 : by, :],
         acc_f[by - 1 : by, :], zeros_tail], axis=0
    )

    @pl.when(i == 0)
    def _():
        tot_ref[0, 0] = tot_u

    @pl.when(i > 0)
    def _():
        tot_ref[0, 0] = tot_ref[0, 0] + tot_u


def gather_edge_rows(interior, obstacles, by, accel_mask=None):
    """One-time construction of the per-block edge-row arrays
    ``(firsts, lasts)`` of shape (n_blocks, QP, nx): rows b*by and
    b*by+by-1 of each block, with channel OBS_CH carrying the row's
    obstacle flags (and ACC_CH its accel-line flags when given). The
    block index leads on an untiled axis so kernel DMAs never slice the
    tiled row dimension.

    Exactly the depth-1 case of :func:`gather_edge_rows_fused`
    (QP == EDGE_STRIDE and the slot layouts coincide), so it delegates
    — one builder owns the channel layout."""
    return gather_edge_rows_fused(interior, obstacles, by, 1,
                                  accel_mask=accel_mask)


def _pallas_step(interior, prevs, nexts, obs_i8, *, omega_f, interpret,
                 accel=None, ring=False, seams=None, dst=None,
                 accel_mask=None):
    """One fused step. Returns ``(new, firsts, lasts, tot)`` where
    firsts/lasts are the NEW state's per-block edge rows.

    ``ring=True``: ``prevs``/``nexts`` are the CURRENT lasts/firsts edge
    arrays themselves; the kernel ring-indexes neighbours (periodic y) —
    no rolled copies. ``seams=(south_entry, north_entry)``: the sharded
    form of the same — prevs/nexts are the shard's OWN lasts/firsts,
    resident entries are ring-indexed in-kernel and the two boundary
    blocks read the (1, QP, nx) ppermuted seam entries.
    ``dst``: optional (cells, firsts, lasts) buffer
    donors aliased to the first three outputs, letting a paired stepping
    loop keep every while-carry slot on a fixed buffer (XLA otherwise
    inserts a full-lattice carry copy per iteration above ~100 MB state).

    Deliberately NOT wrapped in jax.jit: a nested jit becomes a
    closed_call in the surrounding loop with its own buffer boundary.
    Callers are jitted."""
    # Same guard as _pallas_step_fused: a sharded (seam) pass with a
    # STATIC row AccelSpec would compute the forced-row owner block
    # from the GLOBAL index against the LOCAL lattice — silently
    # forcing the wrong row on every shard. All current sharded
    # callers pass the dynamic mask; this keeps a future one honest.
    assert not (seams is not None and accel_mask is None
                and accel is not None and accel.axis == 0), (
        "sharded row forcing requires the dynamic accel mask"
    )
    q, h, nx = interior.shape
    by = _pick_block_rows(h, nx)
    n_blocks = h // by
    omega = np.float32(omega_f)

    kernel = functools.partial(
        _kernel, by=by, omega=omega, accel=accel, ring=ring,
        seam=seams is not None,
        has_dst=dst is not None, dynamic_accel=accel_mask is not None,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [interior, prevs, nexts, obs_i8]
    if accel_mask is not None:
        in_specs.append(
            pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(accel_mask)
    if seams is not None:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        operands += [seams[0], seams[1]]
    aliases = {}
    if dst is not None:
        base = len(operands)
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 3
        operands += list(dst)
        aliases = {base: 0, base + 1: 1, base + 2: 2}
    new, firsts, lasts, tot = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((Q, by, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QP, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QP, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, h, nx), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, QP, nx), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, QP, nx), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Q, by, nx), jnp.float32),
            pltpu.VMEM((2, QP, nx), jnp.float32),
            pltpu.VMEM((2, QP, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Two DMA slots + pipelined output/obstacle blocks; leave
            # headroom over the computed footprint.
            vmem_limit_bytes=min(
                _VMEM_CAP,
                4 * (2 * Q * by * nx * 4 + 2 * Q * by * nx * 4)
                + 32 * QP * nx + (1 << 22),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(100 * h * nx),
            bytes_accessed=int((2 * Q * 4 + 4) * h * nx),
            transcendentals=int(h * nx),
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    return new, firsts, lasts, tot[0, 0]


# ---------------------------------------------------------------------------
# Fused multi-step kernel (temporal blocking, parametric depth)
# ---------------------------------------------------------------------------
#
# Large states (>= ~600 MB) are honestly HBM-bound: the 1-step kernel
# measured ~8.8 GLUPS at 16384x1024 across every block size = ~640 GB/s
# effective, 78% of the v5e's nominal 819 GB/s (docs/PERF.md). The way
# past that wall is to advance ``depth`` timesteps per HBM pass: read
# the lattice once, step D times in VMEM, write once — dividing
# per-step traffic by D (the classic temporal-blocking stencil
# transform; the reference's version of this ceiling is
# report_mpi/report.tex:158).
#
# Per block a D-deep pass needs state-t rows [s-D, s+by+D), so edge
# arrays carry D rows per block side (slot layout below). Each stage
# computes the by interior rows plus a shrinking stack of boundary rows
# (D-1, D-2, ... per side — redundantly recomputed by the neighbouring
# blocks, ~D^2/by extra compute, cheap under a memory-bound roof).
# tot_u at every stage counts only the block's owned rows, so the union
# over blocks is exact per step. Acceleration applies to every loaded
# copy and every intermediate stage's outputs with static owner-block
# factors (or the dynamic ACC channels under sharding), so ANY
# forced-row position stays in-kernel — the 1-step kernel's block-edge
# fallback is structurally unnecessary here.

# Edge entries pack ``depth`` rows per block side at EDGE_STRIDE-channel
# intervals: row slot j holds speeds [16j, 16j+9), obstacle flags at
# 16j+9 and accel-line flags at 16j+10 (sharded dynamic forcing). For
# firsts entries slot j = global row s+j; for lasts entries slot j =
# global row s+by-1-j (slot 0 is always the outermost row).
EDGE_STRIDE = 16
OBS_OFF = Q  # +9 within a row slot
ACC_OFF = Q + 1  # +10


def gather_edge_rows_fused(interior, obstacles, by, depth, accel_mask=None):
    """Per-block ``depth``-deep edge rows ``(firsts, lasts)`` of shape
    (n_blocks, EDGE_STRIDE*depth, nx) in the slot layout above."""
    obs_f = obstacles.astype(jnp.float32)
    acc_f = (
        accel_mask.astype(jnp.float32)
        if accel_mask is not None
        else jnp.zeros_like(obs_f)
    )
    nx = interior.shape[2]

    def build(row_offsets):
        parts = []
        n_blocks = interior.shape[1] // by
        pad = jnp.zeros((n_blocks, EDGE_STRIDE - Q - 2, nx), jnp.float32)
        for off in row_offsets:
            parts += [
                interior[:, off::by, :].transpose(1, 0, 2),
                obs_f[off::by, :][:, None, :],
                acc_f[off::by, :][:, None, :],
                pad,
            ]
        return jnp.concatenate(parts, axis=1)

    firsts = build([j for j in range(depth)])
    lasts = build([by - 1 - j for j in range(depth)])
    return firsts, lasts


def _row_forced_factor(i, offset, by, h, accel):
    """Scalar f32 indicator: is global row (i*by + offset) mod h the
    forced row? ``offset`` is static, ``i`` the block program id."""
    if accel is None or accel.axis != 0:
        return None
    target = (accel.index - offset) % h
    if target % by != 0:
        return np.float32(0.0)
    owner = target // by
    return jnp.where(
        i == np.int32(owner), np.float32(1.0), np.float32(0.0)
    )


def _accel_rows2(vals, obs_f, line_f, accel):
    """Guarded forcing on a list of planes with an f32 0/1 line
    indicator (scalar or array) and f32 0/1 obstacle flags."""
    fluid_f = np.float32(1.0) - obs_f
    ok = _accel_ok(vals, fluid_f, accel, line_f)
    return _accelerated(vals, ok, accel)


def _pull_interior(body, prev_a, next_a, row_ids, by, nx):
    """Streamed source planes for rows [s, s+by) given the block body and
    the rows directly below/above (per-speed lists)."""
    streamed = []
    for k in range(Q):
        cy = int(D2Q9.CY[k])
        cx = int(D2Q9.CX[k])
        if cy == 0:
            win = body[k]
        elif cy == 1:
            rolled = pltpu.roll(body[k], 1, 0) if by > 1 else body[k]
            win = jnp.where(row_ids == 0, prev_a[k], rolled)
        else:
            rolled = pltpu.roll(body[k], by - 1, 0) if by > 1 else body[k]
            win = jnp.where(row_ids == by - 1, next_a[k], rolled)
        if cx != 0:
            win = pltpu.roll(win, cx % nx, 1)
        streamed.append(win)
    return streamed


def _pull_stacked(below, mid, above, nx):
    """Streamed planes for a stack of boundary rows: each output row r
    pulls cy=+1 speeds from ``below[k]`` row r, cy=0 from ``mid[k]`` row
    r, cy=-1 from ``above[k]`` row r (per-speed lists of aligned
    (m, nx) source stacks)."""
    streamed = []
    for k in range(Q):
        cy = int(D2Q9.CY[k])
        cx = int(D2Q9.CX[k])
        win = mid[k] if cy == 0 else (below[k] if cy == 1 else above[k])
        if cx != 0:
            win = pltpu.roll(win, cx % nx, 1)
        streamed.append(win)
    return streamed


def _cat_rows(*parts):
    """Concatenate (m, nx) row stacks, dropping statically-empty ones
    (zero-size operands don't survive Mosaic lowering)."""
    parts = [p for p in parts if p.shape[0] > 0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _kernel_fused(
    interior_ref,  # (9, H, nx) HBM
    lasts_ref,  # (n_blocks, 16*depth, nx) HBM: lasts (ring) / prev entries
    firsts_ref,  # (n_blocks, 16*depth, nx) HBM: firsts (ring) / next entries
    obs_ref,  # (by, nx) VMEM block (int8, auto-pipelined)
    *rest,
    by: int,
    h: int,
    omega: np.float32,
    accel: AccelSpec,
    depth: int,
    ring: bool = True,
    seam: bool = False,
    has_dst: bool = False,
    dynamic_accel: bool = False,
):
    rest = list(rest)
    accmask_ref = rest.pop(0) if dynamic_accel else None
    if seam:
        south_ref = rest.pop(0)  # (1, qpd, nx) ppermuted seam prev entry
        north_ref = rest.pop(0)  # (1, qpd, nx) ppermuted seam next entry
    if has_dst:
        rest = rest[3:]  # donor refs: memory only, never read
    (out_ref, firsts_out_ref, lasts_out_ref, tot_ref,
     body_scr, prev_scr, next_scr, sems) = rest
    i = pl.program_id(0)
    n = pl.num_programs(0)
    D = depth

    def body_dma(block, slot):
        return pltpu.make_async_copy(
            interior_ref.at[:, pl.ds(block * by, by), :],
            body_scr.at[slot],
            sems.at[slot, 0],
        )

    def prev_dma(block, slot):
        # ring: periodic resident indexing. seam: resident indexing with
        # clamping — block 0's start is replaced by the seam DMA in
        # start() (same shape/semaphore, so the descriptor serves wait()).
        if ring:
            src = lasts_ref.at[(block - 1 + n) % n]
        else:
            src = lasts_ref.at[jnp.maximum(block - 1, 0)]
        return pltpu.make_async_copy(
            src, prev_scr.at[slot], sems.at[slot, 1]
        )

    def next_dma(block, slot):
        if ring:
            src = firsts_ref.at[(block + 1) % n]
        else:
            src = firsts_ref.at[jnp.minimum(block + 1, n - 1)]
        return pltpu.make_async_copy(
            src, next_scr.at[slot], sems.at[slot, 2]
        )

    def start(block, slot):
        body_dma(block, slot).start()
        if not seam:
            prev_dma(block, slot).start()
            next_dma(block, slot).start()
        else:
            # The two boundary blocks read the ppermuted seam entries
            # (the reference's halo rows, d2q9-bgk.c:341-393); interior
            # blocks ring-index resident entries — the per-pass rolled
            # edge-array copies the old sharded path built are gone.
            @pl.when(block == 0)
            def _():
                pltpu.make_async_copy(
                    south_ref.at[0], prev_scr.at[slot], sems.at[slot, 1]
                ).start()

            @pl.when(block > 0)
            def _():
                prev_dma(block, slot).start()

            @pl.when(block == n - 1)
            def _():
                pltpu.make_async_copy(
                    north_ref.at[0], next_scr.at[slot], sems.at[slot, 2]
                ).start()

            @pl.when(block < n - 1)
            def _():
                next_dma(block, slot).start()

    def wait(block, slot):
        body_dma(block, slot).wait()
        prev_dma(block, slot).wait()
        next_dma(block, slot).wait()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n)
    def _():
        start(jnp.minimum(i + 1, n - 1), (i + 1) % 2)

    slot = i % 2
    wait(i, slot)

    nx = out_ref.shape[-1]
    obstacles = obs_ref[:] != 0
    obs_body_f = obstacles.astype(jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (by, nx), 0)

    body = [body_scr[slot, k] for k in range(Q)]
    # Boundary stacks at state t, ordered ascending by global row:
    # T[k][r] = row s-D+r (prev entry slot D-1-r, since slot 0 is the
    # row adjacent to the block); U[k][r] = row s+by+r (next slot r).
    def prev_ch(r, off):
        return prev_scr[slot, EDGE_STRIDE * (D - 1 - r) + off]

    def next_ch(r, off):
        return next_scr[slot, EDGE_STRIDE * r + off]

    T = [
        jnp.stack([prev_ch(r, k) for r in range(D)]) for k in range(Q)
    ]
    U = [
        jnp.stack([next_ch(r, k) for r in range(D)]) for k in range(Q)
    ]
    T_obs = jnp.stack([prev_ch(r, OBS_OFF) for r in range(D)])
    U_obs = jnp.stack([next_ch(r, OBS_OFF) for r in range(D)])

    # --- accel line indicators for every copy -----------------------------
    ones_row = jnp.ones((1, nx), jnp.float32)
    if dynamic_accel:
        # Sharded SPMD forcing: the owning line is dynamic per shard;
        # the body's indicator arrives as an i8 mask input and every
        # edge-entry row carries its own flag in the ACC channels.
        body_line = (accmask_ref[:] != 0).astype(jnp.float32)
        T_line = jnp.stack([prev_ch(r, ACC_OFF) for r in range(D)])
        U_line = jnp.stack([next_ch(r, ACC_OFF) for r in range(D)])
    elif accel.axis == 0:
        lr = accel.index % by
        ab = accel.index // by
        owner = jnp.where(i == np.int32(ab), np.float32(1.0), np.float32(0.0))
        body_line = (row_ids == np.int32(lr)).astype(jnp.float32) * owner
        # Static owner factors per boundary row (global rows s-D+r and
        # s+by+r — any forced-row position stays in-kernel).
        T_line = _cat_rows(*[
            ones_row * _row_forced_factor(i, r - D, by, h, accel)
            for r in range(D)
        ])
        U_line = _cat_rows(*[
            ones_row * _row_forced_factor(i, by + r, by, h, accel)
            for r in range(D)
        ])
    else:
        lane1 = (
            jax.lax.broadcasted_iota(jnp.int32, (nx,), 0)
            == np.int32(accel.index)
        ).astype(jnp.float32)
        body_line = (
            jax.lax.broadcasted_iota(jnp.int32, (by, nx), 1)
            == np.int32(accel.index)
        ).astype(jnp.float32)
        T_line = U_line = jnp.stack([lane1] * D)

    # Static forcing: the guard product only needs the forced LINE's
    # values, so extract that one row/column per stage instead of
    # evaluating three full-plane guard compares — the line-and-fluid
    # indicator (with the owner factor) is loop-invariant and broadcasts
    # back over the narrow guard result. Cuts the body forcing from ~13
    # plane-ops per stage to ~8 (docs/PERF.md v6.5); the dynamic sharded
    # mask keeps the full-plane form (its line position is per-shard).
    if not dynamic_accel:
        body_lf = body_line * (np.float32(1.0) - obs_body_f)
        if accel.axis == 0:
            lr_s = accel.index % by

            def _line(v):
                return v[lr_s:lr_s + 1, :]
        else:
            c_s = accel.index

            def _line(v):
                return v[:, c_s:c_s + 1]

        def accel_body(planes):
            okl = None
            for g, t in accel.guards:
                ind = (
                    _line(planes[g]) - np.float32(t) > np.float32(0.0)
                ).astype(jnp.float32)
                okl = ind if okl is None else okl * ind
            return _accelerated(planes, body_lf * okl, accel)
    else:
        def accel_body(planes):
            return _accel_rows2(planes, obs_body_f, body_line, accel)

    # --- D fused timesteps: accelerate -> stream, shrinking the boundary
    # stacks by one row per side per stage (redundant recompute of
    # 2*(D-1+...+1) rows per block, ~D^2/by extra work).
    tots = []
    for stage in range(D):
        m = D - stage  # boundary rows per side at this stage's entry
        body = accel_body(body)
        T = _accel_rows2(T, T_obs[:m], T_line[:m], accel)
        U = _accel_rows2(U, U_obs[:m], U_line[:m], accel)

        prev_adj = [T[k][m - 1] for k in range(Q)]
        next_adj = [U[k][0] for k in range(Q)]
        src = _pull_interior(body, prev_adj, next_adj, row_ids, by, nx)
        new, tot = _bgk_update(src, obstacles, omega)
        tots.append(tot)

        if m > 1:
            # T' rows s-(m-1)..s-1 pull from [T; body row 0];
            # U' rows s+by..s+by+m-2 pull from [body row by-1; U].
            t_below = [T[k][0 : m - 1] for k in range(Q)]
            t_mid = [T[k][1:m] for k in range(Q)]
            t_above = [
                _cat_rows(T[k][2:m], body[k][0:1]) for k in range(Q)
            ]
            u_below = [
                _cat_rows(body[k][by - 1 : by], U[k][0 : m - 2])
                for k in range(Q)
            ]
            u_mid = [U[k][0 : m - 1] for k in range(Q)]
            u_above = [U[k][1:m] for k in range(Q)]
            t_src = _pull_stacked(t_below, t_mid, t_above, nx)
            u_src = _pull_stacked(u_below, u_mid, u_above, nx)
            T_obs = T_obs[1:m]
            U_obs = U_obs[0 : m - 1]
            T_line = T_line[1:m]
            U_line = U_line[0 : m - 1]
            # One planes-only update over the CONCATENATED T+U stacks:
            # both are (m-1, nx), so separate updates would each pay a
            # full 8-sublane vreg row — merging halves that padding
            # waste, and the boundary rows' tot_u is never counted
            # (owned rows only) so the sqrt+reduce is skipped.
            tu_src = [_cat_rows(t_src[k], u_src[k]) for k in range(Q)]
            tu_obs = _cat_rows(T_obs, U_obs) > np.float32(0.5)
            TU, _ = _bgk_update_planes(tu_src, tu_obs, omega)
            T = [TU[k][0 : m - 1] for k in range(Q)]
            U = [TU[k][m - 1 :] for k in range(Q)]
        body = [new[k] for k in range(Q)]

    out_ref[:] = new

    # --- export the new state's depth-deep edge rows ----------------------
    if dynamic_accel:
        acc_f = (accmask_ref[:] != 0).astype(jnp.float32)
    else:
        acc_f = jnp.zeros((by, nx), jnp.float32)
    pad = jnp.zeros((EDGE_STRIDE - Q - 2, nx), jnp.float32)

    def entry(rows):
        parts = []
        for r in rows:
            parts += [
                new[:, r, :], obs_body_f[r : r + 1, :],
                acc_f[r : r + 1, :], pad,
            ]
        return jnp.concatenate(parts, axis=0)

    firsts_out_ref[0] = entry([j for j in range(D)])
    lasts_out_ref[0] = entry([by - 1 - j for j in range(D)])

    @pl.when(i == 0)
    def _():
        for d in range(D):
            tot_ref[0, d] = tots[d]

    @pl.when(i > 0)
    def _():
        for d in range(D):
            tot_ref[0, d] = tot_ref[0, d] + tots[d]


def _pallas_step_fused(interior, prevs, nexts, obs_i8, *, omega_f,
                       interpret, accel, depth, ring=True, seams=None,
                       dst=None, accel_mask=None):
    """One fused ``depth``-step pass. Returns
    ``(new, firsts', lasts', tots)`` where the edge arrays are the
    t+depth state's depth-deep edge rows and ``tots`` is the (depth,)
    per-step |u| sums, in step order.

    ``prevs``/``nexts`` follow :func:`_pallas_step`'s convention
    EXACTLY (review finding: this entry point used to take the same
    arrays in the opposite order and swap internally — a copy-paste
    trap between the two sibling call sites): the caller passes the
    CURRENT lasts edge array as ``prevs`` and firsts as ``nexts``.

    ``ring=True``: periodic y, the kernel ring-indexes them as its
    neighbour entries. ``seams=(south_entry, north_entry)``: sharded
    mode — prevs/nexts are the shard's OWN edge arrays, resident
    entries are ring-indexed in-kernel and the two boundary blocks read
    the (1, qpd, nx) ppermuted seam entries (no per-pass rolled
    edge-array copies). ``accel_mask``: dynamic SPMD forcing
    (``accel`` still supplies deltas/guards; the line indicator comes
    from the mask and the edge ACC channels).

    Like :func:`_pallas_step`, deliberately not jitted itself."""
    assert ring or seams is not None, "sharded mode requires seam entries"
    # The configurations _kernel_fused cannot serve fail at trace time
    # instead of producing silent wrong rows (review finding): forcing
    # is mandatory (the unfused _pallas_step serves unforced passes),
    # and a STATIC row spec under sharding would wrap the forced row
    # into local coordinates (_row_forced_factor's periodic target) —
    # sharded row forcing must come through the dynamic mask.
    assert accel is not None, "fused passes require an AccelSpec"
    assert not (seams is not None and accel_mask is None
                and accel.axis == 0), (
        "sharded row forcing requires the dynamic accel mask"
    )
    q, h, nx = interior.shape
    by = _pick_block_rows(h, nx)
    n_blocks = h // by
    omega = np.float32(omega_f)
    qpd = EDGE_STRIDE * depth

    kernel = functools.partial(
        _kernel_fused, by=by, h=h, omega=omega, accel=accel, depth=depth,
        ring=ring, seam=seams is not None, has_dst=dst is not None,
        dynamic_accel=accel_mask is not None,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [interior, prevs, nexts, obs_i8]
    if accel_mask is not None:
        in_specs.append(
            pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(accel_mask)
    if seams is not None:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        operands += [seams[0], seams[1]]
    aliases = {}
    if dst is not None:
        base = len(operands)
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 3
        operands += list(dst)
        aliases = {base: 0, base + 1: 1, base + 2: 2}
    new, firsts_o, lasts_o, tot = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((Q, by, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qpd, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qpd, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, depth), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, h, nx), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, qpd, nx), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, qpd, nx), jnp.float32),
            jax.ShapeDtypeStruct((1, depth), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Q, by, nx), jnp.float32),
            pltpu.VMEM((2, qpd, nx), jnp.float32),
            pltpu.VMEM((2, qpd, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Counts the double-buffered body slots AND the depth-scaled
            # edge scratch + pipelined edge output blocks (undercounting
            # them fails the deep-fusion opt-ins at wide nx).
            vmem_limit_bytes=min(
                _VMEM_CAP,
                4 * (2 * Q * by * nx * 4 + 2 * Q * by * nx * 4)
                + 32 * qpd * nx + (1 << 22),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(100 * depth * h * nx),
            bytes_accessed=int((2 * Q * 4 + 4) * h * nx),
            transcendentals=int(depth * h * nx),
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    return new, firsts_o, lasts_o, tot[0]


def _edge_pad(row9, nx):
    """(9, 1, nx) halo row -> (1, QP, nx) edge-array entry (obs ch = 0:
    halo rows come from outside the block's mask and are only read as
    streaming sources unless an AccelSpec needs them — wrapped-row callers
    fill the channel from the real mask)."""
    return jnp.pad(row9.transpose(1, 0, 2), ((0, 0), (0, QP - Q), (0, 0)))


def _collide_stream_pallas(interior, south, north, obs_i8, *, omega_f, interpret):
    q, h, nx = interior.shape
    by = _pick_block_rows(h, nx)
    n_blocks = h // by
    # Standalone form: build the neighbour-row arrays from the lattice.
    firsts, lasts = gather_edge_rows(interior, obs_i8 != 0, by)
    prevs = jnp.concatenate(
        [_edge_pad(south, nx), lasts[: n_blocks - 1]], axis=0
    )
    nexts = jnp.concatenate(
        [firsts[1:], _edge_pad(north, nx)], axis=0
    )
    new, _, _, tot = _pallas_step(
        interior, prevs, nexts, obs_i8, omega_f=omega_f, interpret=interpret
    )
    return new, tot


def collide_stream_pallas(interior, south, north, obstacles, omega):
    """Fused step on a local row block with explicit y-halo rows.

    Drop-in twin of :func:`lbm_tpu.ops.reference.collide_stream_halo`
    (obstacles bool (H, nx)); interpret-mode on non-TPU backends.
    """
    interpret = jax.default_backend() != "tpu"
    # int8 mask: 1 B/cell of HBM traffic instead of 4 (the mask is the
    # only non-distribution stream in the kernel).
    obs_i8 = obstacles.astype(jnp.int8)
    return _collide_stream_pallas(
        interior, south, north, obs_i8,
        omega_f=float(omega), interpret=interpret,
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def transpose_state(cells):
    """Physical (9, ny, nx) <-> transposed (9, nx, ny): swap the spatial
    axes and permute speeds by SIGMA (x and y velocity components swap).
    The map is an involution."""
    return jnp.stack([cells[SIGMA[k]].T for k in range(Q)])


def carry_init(impl, cells, obstacles, accel_mask=None):
    """Shared carry construction for the (cells, firsts, lasts) stepping
    protocol (single-chip :class:`CarryStep` and the sharded impls in
    parallel/halo.py): gather the depth-deep per-block edge arrays and,
    in paired mode, allocate the ping-pong buffer set whose slots the
    aliased kernel calls keep fixed (docs/PERF.md v3)."""
    by = _pick_block_rows(cells.shape[1], cells.shape[2])
    if impl.fused > 1:
        firsts, lasts = gather_edge_rows_fused(
            cells, obstacles, by, impl.fused, accel_mask=accel_mask
        )
    else:
        firsts, lasts = gather_edge_rows(
            cells, obstacles, by, accel_mask=accel_mask
        )
    if impl.steps_per_call == 2 * impl.fused:
        return (
            cells, jnp.zeros_like(cells),
            firsts, lasts, jnp.zeros_like(firsts), jnp.zeros_like(lasts),
        )
    return (cells, firsts, lasts)


def carry_step(impl, carry, prepared):
    """Shared step driver for the carry protocol. ``impl`` supplies
    ``_fused_call`` / ``_single_call`` with signature
    ``(cells, firsts, lasts, prepared, dst) -> (new, f', l', tots)``
    (tots: (depth,) fused, scalar single). Paired mode runs TWO aliased
    calls whose outputs rotate through the donated ping-pong buffers, so
    every while-carry slot keeps a fixed buffer and XLA never inserts
    carry copies; unpaired runs one call."""
    fused = impl.fused > 1
    call = impl._fused_call if fused else impl._single_call
    if impl.steps_per_call == 2 * impl.fused:
        cells_a, cells_b, fa, la, fb, lb = carry
        n1, f1, l1, t1 = call(cells_a, fa, la, prepared, (cells_b, fb, lb))
        n2, f2, l2, t2 = call(n1, f1, l1, prepared, (cells_a, fa, la))
        tots = jnp.concatenate([t1, t2]) if fused else jnp.stack([t1, t2])
        return (n2, n1, f2, l2, f1, l1), tots
    cells, firsts, lasts = carry
    new, f2, l2, tots = call(cells, firsts, lasts, prepared, None)
    return (new, f2, l2), (tots if fused else tots[None])


class CarryStep:
    """Single-chip step implementation carrying the lattice plus per-block
    edge-row arrays; the kernel ring-indexes neighbour rows directly from
    the edge arrays (periodic y), and in paired mode two aliased kernel
    calls per loop iteration keep every while-carry slot on a fixed
    buffer so XLA never inserts carry copies (docs/PERF.md).
    Acceleration runs inside the kernel when the forced row is
    block-interior (always true for the ny-2 row with 8-row blocks);
    otherwise it falls back to the XLA row update (unpaired)."""

    def __init__(self, params: Params, paired: bool = True, fuse: int = 1):
        self.params = params
        self.omega = float(params.omega)
        self._h, self._nx = self._shape(params)
        by = _pick_block_rows(self._h, self._nx)
        row = self._h - 2
        self._by = by
        self._in_kernel = by >= 3 and row % by not in (0, by - 1)
        # Temporal fusion needs 8-aligned blocks (deep edge rows +
        # boundary recompute assume the standard tile geometry, and
        # by >= 2*depth keeps single-block wrap consistent).
        self.fused = fuse if (fuse > 1 and by % 8 == 0 and by >= 2 * fuse) else 1
        if self.fused > 1:
            self.steps_per_call = self.fused * (2 if paired else 1)
        else:
            self.steps_per_call = 2 if (paired and self._in_kernel) else 1

    @staticmethod
    def _shape(params):
        return params.ny, params.nx

    def _accel_spec(self):
        return AccelSpec.rows(self.params, self._h)

    def _transform_in(self, cells):
        return cells

    def _transform_out(self, cells):
        return cells

    def _obs_transform(self, obstacles):
        return obstacles

    def prepare(self, obstacles):
        """Loop-invariant obstacle forms, computed once outside the loop
        (anything recomputed per step or carried instead costs a pass or
        a while-carry copy)."""
        obs = self._obs_transform(obstacles)
        return (obs, obs.astype(jnp.int8), None)

    def init(self, cells, prepared):
        return carry_init(self, self._transform_in(cells), prepared[0])

    def _fused_call(self, cells, firsts, lasts, prepared, dst):
        _, obs_i8, _ = prepared
        return _pallas_step_fused(
            cells, lasts, firsts, obs_i8, omega_f=self.omega,
            interpret=_interpret(), accel=self._accel_spec(),
            depth=self.fused, dst=dst,
        )

    def _single_call(self, cells, firsts, lasts, prepared, dst):
        obstacles, obs_i8, _ = prepared
        if self._in_kernel:
            return _pallas_step(
                cells, lasts, firsts, obs_i8, omega_f=self.omega,
                interpret=_interpret(), accel=self._accel_spec(),
                ring=True, dst=dst,
            )
        # Fallback: XLA row update + edge-array mirror when the forced
        # row is a block edge (the reference's buffer flags,
        # d2q9-bgk.c:244-245). Never paired, so dst is always None.
        row, by = self._h - 2, self._by
        cells = accelerate_flow(
            cells, obstacles, self.params.accel_w1, self.params.accel_w2
        )
        if row % by == 0:
            firsts = firsts.at[row // by, :Q].set(cells[:, row, :])
        if row % by == by - 1:
            lasts = lasts.at[row // by, :Q].set(cells[:, row, :])
        return _pallas_step(
            cells, lasts, firsts, obs_i8, omega_f=self.omega,
            interpret=_interpret(), accel=None, ring=True, dst=dst,
        )

    def step(self, carry, prepared):
        return carry_step(self, carry, prepared)

    def final(self, carry):
        return self._transform_out(carry[0])


class TransposedCarryStep(CarryStep):
    """CarryStep on the transposed lattice — for wide grids (nx >> ny)
    the long dimension moves onto sublanes, where the blocked row
    machinery runs at full rate. Speeds permute by SIGMA under the x/y
    swap; acceleration (physical row ny-2) becomes a lane-masked
    in-kernel update of column ny-2 (always in-kernel, so pairing is
    always available)."""

    @staticmethod
    def _shape(params):
        return params.nx, params.ny

    def _accel_spec(self):
        return AccelSpec.lanes(self.params, self._nx)

    def _transform_in(self, cells):
        return transpose_state(cells)

    def _transform_out(self, cells_t):
        return transpose_state(cells_t)

    def _obs_transform(self, obstacles):
        return obstacles.T

    def __init__(self, params: Params, paired: bool = True, fuse: int = 1):
        super().__init__(params, paired=paired, fuse=fuse)
        # Lane-masked acceleration is always in-kernel in this layout.
        self._in_kernel = True
        if self.fused == 1:
            self.steps_per_call = 2 if paired else 1


def supports_tpu_grid(ny: int, nx: int) -> bool:
    """Whether the Mosaic (compiled, non-interpret) kernel can run this
    grid on real TPU: block DMA offsets and sizes must stay
    (8, 128)-tile aligned on BOTH axes (CLAUDE.md Mosaic constraints),
    so the (possibly transposed) row count and the block height it
    implies must be 8-multiples AND the lane dimension a 128-multiple
    (a 16-lane grid compiles to 128-misaligned memref slices and Mosaic
    rejects it; a 32-lane sharded compile once took the whole tunnel
    session down). Every official scene qualifies; odd shapes like
    100x100 do not and should take the XLA reference kernel instead
    (runner._resolve_kernel does this automatically for kernel="auto").
    Interpret mode has no such constraint — CPU tests cover odd shapes."""
    transposed = _transposed_layout(ny, nx)
    h = nx if transposed else ny
    lanes = ny if transposed else nx
    by = _pick_block_rows(h, lanes)
    return h % 8 == 0 and by % 8 == 0 and lanes % 128 == 0


def _depth_preference(rows: int, lanes: int) -> list[int]:
    """Fusion depths to try, most-preferred first, for an execution
    layout of ``rows`` x ``lanes`` (post-transpose for wide grids).

    ``LBM_PALLAS_DEPTH`` pins the maximum (and most preferred) depth.
    Otherwise the preference is size- and shape-aware (measured on v5e,
    docs/PERF.md v6/v6.5): chip-resident states (<= ~50 MB per lattice
    buffer, e.g. 1024x1024 = 37.7 MB) run ~3% faster at depth 2;
    larger states are HBM-bound and want depth 4's traffic cut; and
    large NARROW-lane layouts (lanes <= 128 — the transposed 131072x128
    stress shape) go one further: depth 8 measures 28.4 vs 27.1 GLUPS
    there since v6.5 cut the per-stage VPU work, while on 1024-lane
    layouts depth 8 still loses to register pressure (23.8 vs 24.1 at
    16384x1024).
    """
    env = os.environ.get("LBM_PALLAS_DEPTH")
    if env is not None:
        dmax = int(env)
        return [d for d in (16, 8, 4, 2) if d <= dmax]
    if 9 * rows * lanes * 4 <= 50_000_000:
        return [2, 4]
    if lanes <= 128:
        return [8, 4, 2]
    return [4, 2]


def plan_split(iters: int, probes) -> tuple[int, int, object | None]:
    """Shared segment planner: split ``iters`` into ``(main, tail,
    winning_probe)`` so the main segment runs at the preferred fusion
    depth with aliased pairing even when the total iteration count is
    odd or otherwise indivisible (the reference's loop ran any maxIters
    at full speed, d2q9-bgk.c:191; fusion must not regress that).

    ``probes``: candidate paired impls, most-preferred first (built by
    the single-device and sharded callers from their own impl classes).
    A probe whose construction demoted the fusion depth or pairing is
    skipped. The tail is shorter than one paired pass and runs at
    whatever depth divides it (fused but unpaired when possible) — at
    most ``2*depth - 1`` slower steps out of the whole run. Returns
    ``(iters, 0, None)`` when no split helps."""
    for probe in probes:
        d = probe.fused
        if d <= 1 or probe.steps_per_call != 2 * d:
            continue
        g = 2 * d
        if iters > g and iters % g:
            return iters - iters % g, iters % g, probe
        break
    return iters, 0, None


def _layout(params: Params):
    """(impl class, rows, lanes) of the preferred execution layout:
    transposed for wide grids, physical otherwise."""
    ny, nx = params.ny, params.nx
    if _transposed_layout(ny, nx):
        return TransposedCarryStep, nx, ny
    return CarryStep, ny, nx


def plan_iters(params: Params, iters: int,
               backend: str | None = None) -> tuple[int, int]:
    """Single-device :func:`plan_split`: ``(main, tail)`` for the
    grid's preferred execution layout and depth preference. When the
    state qualifies for the VMEM-resident kernel
    (:mod:`lbm_tpu.ops.pallas_resident`) the plan is cut at resident
    granularities instead: a step count some preferred G divides runs
    as one resident segment, anything else as a resident main segment
    plus a short tail (which re-plans recursively through
    make_carry_step — smaller resident G, or the fused/blocked path for
    odd remainders). ``backend`` overrides the resident gate's backend
    probe like make_carry_step's — pure planning paths must never
    initialise the backend (CLAUDE.md)."""
    cls, rows, lanes = _layout(params)
    from lbm_tpu.ops import pallas_resident as pr

    transposed = cls is TransposedCarryStep
    prefs = pr.resident_prefs(rows, lanes, backend=backend,
                              transposed=transposed)
    if prefs and iters > 0:
        if pr.resident_gsteps(rows, lanes, iters, backend=backend,
                              transposed=transposed):
            return iters, 0
        main = iters - iters % prefs[0]
        if main:
            return main, iters % prefs[0]
    main, tail, _ = plan_split(
        iters,
        (cls(params, paired=True, fuse=d)
         for d in _depth_preference(rows, lanes)),
    )
    return main, tail


def make_carry_step(params: Params, paired: bool = True,
                    n_iters: int | None = None,
                    backend: str | None = None):
    """Pick the execution layout (transposed when the grid is much wider
    than tall) and the temporal fusion depth: a depth-D pass divides
    per-step HBM traffic by D. The preferred depth is size-aware
    (:func:`_depth_preference`); the first preference the iteration
    count and block geometry allow wins (every official scene's
    maxIters divides by 4). Chip-resident states short-circuit to the
    VMEM-resident kernel first (lbm_tpu/ops/pallas_resident.py) — its
    eligibility and granularity rules mirror :func:`plan_iters`, so
    planner and impl selection always agree. ``backend`` overrides the
    resident gate's backend probe; analysis scripts pass it so this
    function never initialises a backend (jax.default_backend() would
    — and the tunnelled TPU backend can hang for an hour when the
    session is down, CLAUDE.md)."""
    cls, rows, lanes = _layout(params)
    from lbm_tpu.ops import pallas_resident as pr

    g = pr.resident_gsteps(rows, lanes, n_iters, backend=backend,
                           transposed=cls is TransposedCarryStep)
    if g:
        rcls = (
            pr.TransposedResidentStep
            if cls is TransposedCarryStep
            else pr.ResidentStep
        )
        return rcls(params, g)
    if n_iters is not None:
        for d in _depth_preference(rows, lanes):
            if n_iters % d == 0:
                impl = cls(params, paired=paired and n_iters % (2 * d) == 0,
                           fuse=d)
                if impl.fused == d:
                    return impl
    # Fall-through: no preference depth divides n_iters. Pairing still
    # needs an even count (its sharded twin _shard_impl guards this too).
    even = n_iters is None or n_iters % 2 == 0
    return cls(params, paired=paired and even)


def make_fused_step(params: Params):
    """Single-device full step (accelerate + fused kernel) on a global
    periodic lattice: ``(cells, obstacles) -> (cells, tot_u)``."""
    w1, w2, omega = params.accel_w1, params.accel_w2, params.omega

    def step(cells, obstacles):
        cells = accelerate_flow(cells, obstacles, w1, w2)
        # Periodic y: halo rows are the wrapped edge rows.
        return collide_stream_pallas(
            cells, cells[:, -1:, :], cells[:, :1, :], obstacles, omega
        )

    return step

