"""Fused Pallas TPU kernel for the collide-stream step.

The TPU-native equivalent of the reference's hot loop (``timestep``,
d2q9-bgk.c:268-339) and of its OpenCL kernel experiment
(report_mpi/report.tex:873-921): one pass over the lattice doing pull
streaming + bounce-back + BGK relaxation + the tot_u reduction, VMEM-blocked
over rows with explicit one-row halos (the reference's +2 halo rows,
d2q9-bgk.c:546).

Design:

- Inputs ``interior`` (9, H, nx), ``south``/``north`` (9, 1, nx) halo rows,
  obstacle mask (H, nx) f32. Mosaic DMA slices must be aligned to the
  (8, 128) tile, so the per-block neighbour rows are NOT sliced out of the
  tiled row axis in-kernel; instead two tiny per-block arrays ``prevs`` /
  ``nexts`` of shape (n_blocks, 9, nx) are gathered OUTSIDE the kernel
  (block index on an untiled leading axis, ~2 rows/block of extra traffic —
  exactly the reference's halo rows), and each grid step issues three
  unconditional DMAs: the aligned (9, BY, nx) body block plus its two
  neighbour rows, double-buffered across two VMEM slots so the next
  block's fetch overlaps this block's compute (the kernel is
  HBM-bandwidth-bound at ~0.5 FLOP/byte, like the reference:
  report_mpi/report.tex:158).
- The ±1-row pull windows are built in registers: sublane ``pltpu.roll``
  of the body with the one wrong edge row patched in via an iota select
  from the neighbour-row buffer. Periodic x is a lane rotate per speed.
- Periodic y is the caller's choice of south/north rows, so the same
  kernel serves the single-chip (wrapped rows) and sharded (ppermute'd
  rows) paths.
- The BGK math is the shared :func:`lbm_tpu.ops.reference._bgk_update`,
  guaranteeing term-for-term f32 agreement with the portable path.
- tot_u accumulates across the sequential TPU grid into a (1, 1) SMEM
  output block that every grid step maps to.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.params import Params
from lbm_tpu.state import D2Q9
from lbm_tpu.ops.reference import _bgk_update, accelerate_flow

Q = D2Q9.Q
# Edge-row arrays pad the speed dim to a sublane multiple: Mosaic requires
# leading-dim DMA slices of wide (N, q, nx) arrays to be 8-aligned in q.
QP = 16
# VMEM budget per DMA slot (two slots live at once, plus the pipelined
# output and obstacle blocks). Tunable: bigger blocks amortise per-block
# overheads; the scoped-VMEM limit is raised accordingly below.
_SLOT_BYTES = int(os.environ.get("LBM_PALLAS_SLOT_BYTES", 3 * 1024 * 1024))


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


def _kernel(
    interior_ref,  # (9, H, nx) HBM
    prevs_ref,  # (n_blocks, QP, nx) HBM: row below each block (speeds 0..8)
    nexts_ref,  # (n_blocks, QP, nx) HBM: row above each block
    obs_ref,  # (BY, nx) VMEM block (auto-pipelined)
    out_ref,  # (9, BY, nx) VMEM block (auto-pipelined)
    firsts_ref,  # (1, QP, nx) VMEM block: this block's new row 0
    lasts_ref,  # (1, QP, nx) VMEM block: this block's new row BY-1
    tot_ref,  # (1, 1) SMEM block, same block every step
    body_scr,  # (2, 9, BY, nx) VMEM
    prev_scr,  # (2, QP, nx) VMEM
    next_scr,  # (2, QP, nx) VMEM
    sems,  # (2, 3) DMA semaphores
    *,
    by: int,
    omega: np.float32,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dmas(block, slot):
        return (
            pltpu.make_async_copy(
                interior_ref.at[:, pl.ds(block * by, by), :],
                body_scr.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                prevs_ref.at[block], prev_scr.at[slot], sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                nexts_ref.at[block], next_scr.at[slot], sems.at[slot, 2]
            ),
        )

    def start(block, slot):
        for dma in dmas(block, slot):
            dma.start()

    def wait(block, slot):
        for dma in dmas(block, slot):
            dma.wait()

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
    streamed = []
    for k in range(Q):
        cy = int(D2Q9.CY[k])
        cx = int(D2Q9.CX[k])
        body = body_scr[slot, k]  # (BY, nx)
        if cy == 0:
            win = body
        elif cy == 1:
            # Pull from row j-1: sublane roll down, then patch row 0 with
            # the row below the block.
            rolled = pltpu.roll(body, 1, 0) if by > 1 else body
            win = jnp.where(row_ids == 0, prev_scr[slot, k], rolled)
        else:
            # Pull from row j+1: roll up, patch the top row.
            rolled = pltpu.roll(body, by - 1, 0) if by > 1 else body
            win = jnp.where(row_ids == by - 1, next_scr[slot, k], rolled)
        if cx != 0:
            # Periodic x: lane rotate (pltpu.roll needs shift >= 0).
            win = pltpu.roll(win, cx % nx, 1)
        streamed.append(win)
    new, tot_u = _bgk_update(streamed, obstacles, omega)
    out_ref[:] = new
    # Edge rows exported per block so the next step's neighbour-row
    # arrays are a cheap leading-axis roll instead of a strided gather
    # from the tiled lattice.
    pad = ((0, QP - Q), (0, 0))
    firsts_ref[0] = jnp.pad(new[:, 0, :], pad)
    lasts_ref[0] = jnp.pad(new[:, by - 1, :], pad)

    @pl.when(i == 0)
    def _():
        tot_ref[0, 0] = tot_u

    @pl.when(i > 0)
    def _():
        tot_ref[0, 0] = tot_ref[0, 0] + tot_u


def gather_edge_rows(interior, by):
    """One-time construction of the per-block edge-row arrays
    ``(firsts, lasts)`` of shape (n_blocks, 9, nx): rows b*by and
    b*by+by-1 of each block (strided gather — only used to initialise;
    the kernel re-exports them every step). The block index leads on an
    untiled axis so kernel DMAs never slice the tiled row dimension."""
    pad = ((0, 0), (0, QP - Q), (0, 0))
    lasts = jnp.pad(interior[:, by - 1 :: by, :].transpose(1, 0, 2), pad)
    firsts = jnp.pad(interior[:, ::by, :].transpose(1, 0, 2), pad)
    return firsts, lasts


@functools.partial(jax.jit, static_argnames=("omega_f", "interpret"))
def _pallas_step(interior, prevs, nexts, obs_i8, *, omega_f, interpret):
    """One fused step given prebuilt neighbour-row arrays. Returns
    ``(new, firsts, lasts, tot)`` where firsts/lasts are the NEW state's
    per-block edge rows (for the next step's prevs/nexts)."""
    q, h, nx = interior.shape
    by = _pick_block_rows(h, nx)
    n_blocks = h // by
    omega = np.float32(omega_f)

    kernel = functools.partial(_kernel, by=by, omega=omega)
    new, firsts, lasts, tot = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((by, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
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
                100 * 1024 * 1024,
                4 * (2 * Q * by * nx * 4 + 2 * Q * by * nx * 4) + (1 << 22),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(100 * h * nx),
            bytes_accessed=int((2 * Q * 4 + 4) * h * nx),
            transcendentals=int(h * nx),
        ),
        interpret=interpret,
    )(interior, prevs, nexts, obs_i8)
    return new, firsts, lasts, tot[0, 0]


def _collide_stream_pallas(interior, south, north, obs_i8, *, omega_f, interpret):
    q, h, nx = interior.shape
    by = _pick_block_rows(h, nx)
    n_blocks = h // by
    # Standalone form: build the neighbour-row arrays from the lattice.
    firsts, lasts = gather_edge_rows(interior, by)
    pad = ((0, 0), (0, QP - Q), (0, 0))
    prevs = jnp.concatenate(
        [jnp.pad(south.transpose(1, 0, 2), pad), lasts[: n_blocks - 1]], axis=0
    )
    nexts = jnp.concatenate(
        [firsts[1:], jnp.pad(north.transpose(1, 0, 2), pad)], axis=0
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


class CarryStep:
    """Single-chip step implementation carrying ``(cells, firsts, lasts)``
    so each step's neighbour-row arrays are a leading-axis roll of the
    previous kernel's edge-row outputs — no per-step strided gather from
    the tiled lattice."""

    def __init__(self, params: Params):
        self.params = params
        self.w1 = params.accel_w1
        self.w2 = params.accel_w2
        self.omega = float(params.omega)

    def _by(self, cells):
        return _pick_block_rows(cells.shape[1], cells.shape[2])

    def init(self, cells):
        firsts, lasts = gather_edge_rows(cells, self._by(cells))
        return (cells, firsts, lasts)

    def step(self, carry, obstacles):
        cells, firsts, lasts = carry
        h = cells.shape[1]
        by = self._by(cells)
        row = h - 2
        cells = accelerate_flow(cells, obstacles, self.w1, self.w2)
        # Mirror the accelerated row into the edge arrays when it is a
        # block edge (the reference's buffer_up/down_accelerate flags,
        # d2q9-bgk.c:244-245) — static per geometry.
        if row % by == 0:
            firsts = firsts.at[row // by, :Q].set(cells[:, row, :])
        if row % by == by - 1:
            lasts = lasts.at[row // by, :Q].set(cells[:, row, :])
        # Periodic y: block b's south neighbour row is block b-1's last
        # row (block -1 wraps to the top), and vice versa.
        prevs = jnp.roll(lasts, 1, axis=0)
        nexts = jnp.roll(firsts, -1, axis=0)
        new, f2, l2, tot = _pallas_step(
            cells, prevs, nexts, obstacles.astype(jnp.int8),
            omega_f=self.omega,
            interpret=jax.default_backend() != "tpu",
        )
        return (new, f2, l2), tot

    def final(self, carry):
        return carry[0]


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


def make_halo_kernel(params: Params, local_ny: int):
    """Per-shard kernel for the shard_map path: same signature as
    ``collide_stream_halo``."""
    omega = params.omega

    def kernel(interior, south, north, obstacles):
        return collide_stream_pallas(interior, south, north, obstacles, omega)

    return kernel
