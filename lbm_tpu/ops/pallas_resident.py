"""VMEM-resident whole-lattice Pallas kernel (v8): G timesteps per call
with the ping-pong state held entirely in VMEM.

The chip has 128 MiB of VMEM; the headline 1024x1024 scene is only
37.7 MB per lattice buffer, yet the blocked streaming kernel
(ops/pallas_fused.py) still pays a full HBM round trip per fused pass —
at its measured depth-2 sweet spot the 1024^2 state moves ~39 B per
cell-step, which is the nominal HBM roof (docs/PERF.md). This kernel
removes that wall for chip-resident states: the lattice is DMA'd
HBM->VMEM once per call, G whole timesteps run between two VMEM
buffers, and the result is DMA'd back once — per-step HBM traffic drops
to ~72/G B/cell, unmeasurable at G >= 50.

The v7 lesson (docs/PERF.md negative results) is respected: the
per-stage math stays REGISTER-resident — the same roll + edge-select
streaming and shared :func:`_bgk_update` as the blocked kernel, block
by block. Only the backing store of the ping-pong buffers moves from
HBM to VMEM; because the full previous state is resident, neighbour
rows are direct single-row loads and the fused kernel's carried
edge-row arrays, depth-stacked boundary recompute, and per-pass DMA
pipeline all disappear.

Reference lineage: the in-kernel step loop is the reference's
``main`` loop body (accelerate -> fused timestep -> pointer swap,
/root/reference/d2q9-bgk.c:191-203) with the pointer swap realised as
the bufA/bufB parity inside one ``lax.fori_loop``; acceleration is the
guarded row forcing of d2q9-bgk.c:235-266 applied in place to the
resident state.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.params import Params
from lbm_tpu.state import D2Q9
from lbm_tpu.ops.reference import _bgk_update
from lbm_tpu.ops.pallas_fused import (
    _VMEM_CAP,
    _accel_line_extract,
    _accel_ok,
    _accelerated,
    _interpret,
    _pick_block_rows,
    _pull_interior,
    AccelSpec,
    transpose_state,
)

Q = D2Q9.Q

# Step-count granularities per call, most-preferred first. Larger G
# amortises the two full-lattice VMEM round trips (72/G B per
# cell-step of HBM traffic); the list stays divisor-rich so official
# iteration counts (20000, 40000, 2000-iter marginals, test lengths)
# land on a single segment, but stops at 16 — measured G sensitivity
# (docs/PERF.md v8: G=20 still beats blocked by ~9%, the round trips
# at G<~8 cost as much HBM as blocked depth-2 moves) means a SMALL
# exact divisor must never hijack a whole run from the main+tail split
# at G=100 (e.g. iters=2002 must run 2000@G=100 + a 2-step blocked
# tail, not 1001 calls at G=2). LBM_RESIDENT_STEPS pins one value
# (bypassing the floor, for A/B probes).
_G_PREF = (100, 64, 50, 32, 20, 16)


def _kernel_resident(
    interior_ref,  # (9, H, nx) ANY/HBM input (aliased to the output)
    obs_ref,  # (H, nx) VMEM int8 mask (whole array)
    out_ref,  # (9, H, nx) ANY/HBM output
    tot_ref,  # (1, G) SMEM: per-step |u| sums
    buf_a,  # (9, H, nx) VMEM scratch (state at even steps / the only
    #          buffer in in-place mode)
    *rest,  # double mode: buf_b (odd-step state), sem; in-place: sem
    by: int,
    h: int,
    omega: np.float32,
    accel: AccelSpec,
    gsteps: int,
    inplace: bool,
    shift: bool = False,
):
    if inplace:
        (sem,) = rest
    else:
        buf_b, sem = rest
    nx = out_ref.shape[-1]
    n_blocks = h // by
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (by, nx), 0)
    one = np.float32(1.0)

    # --- whole-state copy-in (once per G steps) ---------------------------
    cp_in = pltpu.make_async_copy(interior_ref, buf_a, sem)
    cp_in.start()
    cp_in.wait()

    def accelerate_in_place(src):
        """The reference's accelerate_flow (d2q9-bgk.c:235-266) as an
        in-place narrow RMW on the resident state's forced row: O(nx)
        work once per step, and every subsequent read — body or
        neighbour row, any block — sees the forced values by
        construction (the blocked kernel needs per-copy application
        instead because its loads happen before forcing can)."""
        row = accel.index
        # Every row access stays rank-2 (1, nx): rank-1 slices of the big
        # VMEM refs trip Mosaic's implicit-dim layout inference (observed
        # layout.h check failure), while (1, nx) is the standard tile row.
        vals = [src[k, row : row + 1, :] for k in range(Q)]
        fluid = one - (obs_ref[row : row + 1, :] != 0).astype(jnp.float32)
        ok = _accel_ok(vals, fluid, accel, one)
        forced = _accelerated(vals, ok, accel)
        for k in range(Q):
            if float(accel.deltas[k]) != 0.0:
                src[k, row : row + 1, :] = forced[k]

    def lane_accel(planes, fluid_f, line_f):
        """Transposed-layout forcing (the forced line is a lane column,
        present in every row): guarded per-copy application with the
        blocked kernel's line extraction (guards evaluated on the
        forced column's (m, 1) slices only — bit-identical, ~3 fewer
        full-plane ops per copy per step on this kernel's hottest
        path)."""
        return _accel_line_extract(planes, fluid_f, accel, line_f)

    if accel.axis == 1:
        lane1 = (
            jax.lax.broadcasted_iota(jnp.int32, (1, nx), 1)
            == np.int32(accel.index)
        ).astype(jnp.float32)
        lane_blk = (
            jax.lax.broadcasted_iota(jnp.int32, (by, nx), 1)
            == np.int32(accel.index)
        ).astype(jnp.float32)

    def _streamed_shifted(src, b):
        """LBM_RESIDENT_SHIFT A/B variant (row layout only): because the
        full previous state is resident, the cy=+-1 source windows are
        just by-row loads at sublane offset r0-+1 — replacing the
        roll + edge-select pair per shifted speed with one offset load
        (the blocked kernel can't do this: its windows live in per-block
        DMA slots). Boundary blocks stitch the periodic wrap with one
        concatenate. Bit-identical values by construction; whether
        Mosaic's unaligned-load lowering beats roll+select is exactly
        the measured question (docs/PERF.md round-5 micro-A/B)."""
        r0 = b * by
        streamed = []
        for k in range(Q):
            cy = int(D2Q9.CY[k])
            cx = int(D2Q9.CX[k])
            if cy == 0:
                win = src[k, r0 : r0 + by, :]
            elif cy == 1:
                if b == 0:
                    win = jnp.concatenate(
                        [src[k, h - 1 : h, :], src[k, 0 : by - 1, :]],
                        axis=0,
                    )
                else:
                    win = src[k, r0 - 1 : r0 + by - 1, :]
            else:
                if b == n_blocks - 1:
                    win = jnp.concatenate(
                        [src[k, r0 + 1 : h, :], src[k, 0:1, :]], axis=0
                    )
                else:
                    win = src[k, r0 + 1 : r0 + by + 1, :]
            if cx != 0:
                win = pltpu.roll(win, cx % nx, 1)
            streamed.append(win)
        return streamed

    def one_step(src, dst, idx):
        """One whole timestep src -> dst: accelerate, then the same
        register-resident pull-stream + BGK block pass as the blocked
        kernel, with neighbour rows read straight from the resident
        previous state (periodic y via static wrapped indices)."""
        if accel.axis == 0:
            accelerate_in_place(src)
        tot = None
        for b in range(n_blocks):
            r0 = b * by
            rp = (r0 - 1) % h
            rn = (r0 + by) % h
            obstacles = obs_ref[r0 : r0 + by, :] != 0
            if shift:
                streamed = _streamed_shifted(src, b)
            else:
                body = [src[k, r0 : r0 + by, :] for k in range(Q)]
                prev_a = [src[k, rp : rp + 1, :] for k in range(Q)]
                next_a = [src[k, rn : rn + 1, :] for k in range(Q)]
                if accel.axis == 1:
                    fluid_b = one - obstacles.astype(jnp.float32)
                    body = lane_accel(body, fluid_b, lane_blk)
                    fluid_p = one - (
                        obs_ref[rp : rp + 1, :] != 0
                    ).astype(jnp.float32)
                    prev_a = lane_accel(prev_a, fluid_p, lane1)
                    fluid_n = one - (
                        obs_ref[rn : rn + 1, :] != 0
                    ).astype(jnp.float32)
                    next_a = lane_accel(next_a, fluid_n, lane1)
                streamed = _pull_interior(
                    body, prev_a, next_a, row_ids, by, nx
                )
            new, t = _bgk_update(streamed, obstacles, omega)
            dst[:, r0 : r0 + by, :] = new
            tot = t if tot is None else tot + t
        tot_ref[0, idx] = tot

    def one_step_inplace(buf, idx):
        """One timestep updating ``buf`` in place (single resident
        buffer — for states whose TWO buffers don't fit VMEM). No
        stash memory is needed: block b+1's south neighbour is block
        b's OLD last row, which block b just loaded as part of its
        body — carry it across the (unrolled) block loop in registers;
        only the pre-step row 0 needs saving for the last block's
        periodic wrap. This is the register-carry analogue of the
        blocked kernel's carried edge-row arrays."""
        if accel.axis == 0:
            accelerate_in_place(buf)
        # Block 0's south neighbour: the (untouched) pre-step last row.
        prev_a = [buf[k, h - 1 : h, :] for k in range(Q)]
        if accel.axis == 1:
            fluid_w = one - (obs_ref[h - 1 : h, :] != 0).astype(jnp.float32)
            prev_a = lane_accel(prev_a, fluid_w, lane1)
        saved0 = None
        tot = None
        for b in range(n_blocks):
            r0 = b * by
            rn = r0 + by
            body = [buf[k, r0 : r0 + by, :] for k in range(Q)]
            obstacles = obs_ref[r0 : r0 + by, :] != 0
            if accel.axis == 1:
                fluid_b = one - obstacles.astype(jnp.float32)
                body = lane_accel(body, fluid_b, lane_blk)
            if b == 0:
                saved0 = [body[k][0:1, :] for k in range(Q)]
            if b < n_blocks - 1:
                next_a = [buf[k, rn : rn + 1, :] for k in range(Q)]
                if accel.axis == 1:
                    fluid_n = one - (
                        obs_ref[rn : rn + 1, :] != 0
                    ).astype(jnp.float32)
                    next_a = lane_accel(next_a, fluid_n, lane1)
            else:
                next_a = saved0  # periodic wrap: pre-step row 0
            streamed = _pull_interior(body, prev_a, next_a, row_ids, by, nx)
            new, t = _bgk_update(streamed, obstacles, omega)
            # Old last row, already accelerated — the next block's south
            # neighbour; take it from registers BEFORE the overwrite.
            prev_a = [body[k][by - 1 : by, :] for k in range(Q)]
            buf[:, r0 : r0 + by, :] = new
            tot = t if tot is None else tot + t
        tot_ref[0, idx] = tot

    if inplace:
        def step_i(i, carry):
            one_step_inplace(buf_a, i)
            return carry

        lax.fori_loop(0, gsteps, step_i, 0)
        final = buf_a
    else:
        # --- G steps as gsteps//2 A->B->A pairs (the pointer swap of
        # d2q9-bgk.c:196 as buffer parity; G is even by construction) ----
        def pair(i, carry):
            one_step(buf_a, buf_b, 2 * i)
            one_step(buf_b, buf_a, 2 * i + 1)
            return carry

        lax.fori_loop(0, gsteps // 2, pair, 0)
        final = buf_a

    # --- whole-state copy-out --------------------------------------------
    cp_out = pltpu.make_async_copy(final, out_ref, sem)
    cp_out.start()
    cp_out.wait()


def _inplace_override() -> bool | None:
    """The LBM_RESIDENT_INPLACE A/B override, parsed ONCE for both the
    single-chip and sharded-ring kernels (one knob, one spelling rule):
    None = unset (automatic), else the forced mode."""
    env = os.environ.get("LBM_RESIDENT_INPLACE")
    if env is None:
        return None
    return env not in ("0", "", "false")


def inplace_transposed_refused(n_bufs: int, transposed: bool) -> bool:
    """The measured spill wall (docs/PERF.md "The resident spill
    wall"): TRANSPOSED layouts never AUTO-select the single-buffer
    in-place mode — on chip the transposed in-place body register-spill
    OOMs the 128-MiB VMEM at the 72-MB production shard (16384x128) and
    spill-thrashes 100-227x at smaller sizes, while the blocked path is
    faster there anyway. ONE predicate shared by the single-chip
    planner (resident_prefs) and the sharded ring (ring_buffer_mode /
    ring_prefs) so the two can't drift; the LBM_RESIDENT_INPLACE
    override still wins for A/B runs."""
    return n_bufs == 1 and transposed and _inplace_override() is None


def _inplace_mode(state_bytes: int, mask_bytes: int) -> bool:
    """Single-buffer in-place stepping when two resident buffers don't
    fit the scoped-VMEM ceiling (extends residency up to ~75 MB states,
    e.g. 2048x1024); LBM_RESIDENT_INPLACE=1/0 forces for A/B."""
    forced = _inplace_override()
    if forced is not None:
        return forced
    return 2 * state_bytes + mask_bytes + (24 << 20) > _VMEM_CAP


def _pallas_resident(cells, obs_i8, *, omega_f, interpret, accel, gsteps):
    """Run ``gsteps`` whole timesteps on a VMEM-resident lattice.
    Returns ``(new_cells, tots)`` with ``tots`` the (gsteps,) per-step
    un-normalised |u| sums. The input lattice buffer is donated to the
    output (alias 0->0), so a stepping loop's carry slot keeps one
    fixed HBM buffer."""
    q, h, nx = cells.shape
    by = _pick_block_rows(h, nx)
    assert h % by == 0
    state_bytes = q * h * nx * 4
    inplace = _inplace_mode(state_bytes, h * nx)
    assert gsteps >= 1 and (inplace or gsteps % 2 == 0), gsteps
    # LBM_RESIDENT_SHIFT=1: A/B the offset-load streaming variant
    # (row-layout double-buffer mode only; in-place register-carries old
    # rows and the transposed layout applies per-copy lane forcing, both
    # incompatible with raw shifted loads). docs/PERF.md round-5 A/B.
    shift = (
        os.environ.get("LBM_RESIDENT_SHIFT", "0") not in ("0", "", "false")
        and not inplace
        and accel.axis == 0
    )
    kernel = functools.partial(
        _kernel_resident, by=by, h=h, omega=np.float32(omega_f),
        accel=accel, gsteps=gsteps, inplace=inplace, shift=shift,
    )
    n_bufs = 1 if inplace else 2
    scratch = [pltpu.VMEM((q, h, nx), jnp.float32)] * n_bufs
    new, tot = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, h, nx), jnp.float32),
            jax.ShapeDtypeStruct((1, gsteps), jnp.float32),
        ],
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            # The resident state buffer(s) + the whole int8 mask + block
            # working-set slack.
            vmem_limit_bytes=min(
                _VMEM_CAP, n_bufs * state_bytes + h * nx + (24 << 20)
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(100 * gsteps * h * nx),
            bytes_accessed=int(2 * q * 4 * h * nx + h * nx),
            transcendentals=int(gsteps * h * nx),
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(cells, obs_i8)
    return new, tot[0]


def _pinned_steps(even: bool) -> int | None:
    """Parse the LBM_RESIDENT_STEPS pin, failing loudly on an invalid
    value (review finding: a typo crashed deep inside planning with a
    bare int() traceback, and an odd pin in a parity-constrained mode
    silently measured the BLOCKED kernel while the operator believed
    they pinned the resident one)."""
    pin = os.environ.get("LBM_RESIDENT_STEPS")
    if not pin:
        return None
    try:
        g = int(pin)
    except ValueError:
        raise ValueError(
            f"LBM_RESIDENT_STEPS={pin!r} is not an integer"
        ) from None
    if g < 1:
        raise ValueError(f"LBM_RESIDENT_STEPS={g} must be positive")
    if even and g % 2:
        raise ValueError(
            f"LBM_RESIDENT_STEPS={g}: this mode steps in pairs "
            "(double-buffer parity / RDMA slot parity) and needs an "
            "even count"
        )
    return g


def resident_prefs(
    rows: int, lanes: int, backend: str | None = None, *,
    transposed: bool,
) -> tuple[int, ...] | None:
    """Step-granularity preference list when the (possibly transposed)
    ``rows`` x ``lanes`` lattice qualifies for residency, else None.

    Qualify = the resident f32 state buffer(s) — two in double-buffer
    mode, one for the ~75-78 MB in-place window — + the mask +
    working-set slack fit
    the scoped-VMEM ceiling, and the row geometry keeps every DMA and
    block slice (8, 128)-tile aligned (CLAUDE.md Mosaic constraints).
    ``transposed`` is keyword-REQUIRED here and in
    :func:`resident_gsteps` (like the ring planner's entry points): a
    caller that forgot a defaulted ``transposed=False`` would silently
    skip the measured in-place spill gate below.
    LBM_RESIDENT gates: "0" disables, "1" forces (including interpret
    mode, for tests), unset = automatic on real TPU only — interpret
    runs keep the blocked kernel so the CPU suite's fused coverage is
    unchanged. ``backend`` overrides the backend probe WITHOUT
    disturbing the env gates (scripts/plot_roofline.py mirrors the TPU
    auto-selection — floor included — from a CPU process this way)."""
    env = os.environ.get("LBM_RESIDENT")
    if env is not None and env in ("0", "", "false"):
        return None
    if env is None and (backend or jax.default_backend()) != "tpu":
        return None
    state_bytes = Q * rows * lanes * 4
    # Tiny states are per-step-latency-bound and measure slightly FASTER
    # on the blocked kernel (128² −14%, 256² −3%, but 512² +11% and
    # 1024² +19% resident — docs/PERF.md v8), so automatic selection
    # needs a floor; LBM_RESIDENT=1 bypasses it (tests, re-measurement).
    if env is None and state_bytes < (4 << 20):
        return None
    n_bufs = 1 if _inplace_mode(state_bytes, rows * lanes) else 2
    if n_bufs * state_bytes + rows * lanes + (24 << 20) > _VMEM_CAP:
        return None
    # Measured on chip at 16384 rows x 128 lanes (a plain 16384x128
    # scene), the in-place transposed kernel register-spills so hard it
    # runs at 0.02 GLUPS vs the blocked kernel's 4.56 — a 227x loss
    # with bit-identical trajectories; row-layout in-place (the
    # measured 20.62-GLUPS 2048x1024 window) is unaffected.
    if inplace_transposed_refused(n_bufs, transposed):
        return None
    by = _pick_block_rows(rows, lanes)
    if rows % 8 or by % 8 or rows % by:
        return None
    pin = _pinned_steps(even=n_bufs == 2)
    return (pin,) if pin else _G_PREF


def resident_gsteps(rows: int, lanes: int, n_iters: int | None,
                    backend: str | None = None, *,
                    transposed: bool) -> int | None:
    """The preferred step count per call for an ``n_iters``-step run,
    or None when residency doesn't apply (ineligible geometry/size, no
    preference divides ``n_iters``, or no length given — the
    single-step debug path)."""
    prefs = resident_prefs(rows, lanes, backend=backend,
                           transposed=transposed)
    if not prefs or not n_iters:
        return None
    for g in prefs:
        if n_iters % g == 0:
            return g
    return None


class ResidentStep:
    """Step implementation over the runner's prepare/init/step/final
    protocol with the simplest possible carry — the lattice alone (no
    edge-row arrays; the kernel holds the whole state in VMEM and the
    input->output alias keeps the carry slot on one fixed buffer, so
    pairing is unnecessary). ``fused`` reports the HBM-amortisation
    depth (G steps per HBM round trip), the roofline-AI analogue of the
    blocked kernel's temporal-fusion depth."""

    transposed = False

    def __init__(self, params: Params, gsteps: int):
        self.params = params
        self.omega = float(params.omega)
        self.gsteps = int(gsteps)
        self.fused = self.gsteps
        self.steps_per_call = self.gsteps
        if self.transposed:
            self._h, self._nx = params.nx, params.ny
        else:
            self._h, self._nx = params.ny, params.nx

    def _accel_spec(self) -> AccelSpec:
        if self.transposed:
            return AccelSpec.lanes(self.params, self._nx)
        return AccelSpec.rows(self.params, self._h)

    def _transform_in(self, cells):
        return transpose_state(cells) if self.transposed else cells

    _transform_out = _transform_in

    def prepare(self, obstacles):
        obs = obstacles.T if self.transposed else obstacles
        return obs.astype(jnp.int8)

    def init(self, cells, prepared):
        return self._transform_in(cells)

    def step(self, carry, prepared):
        new, tots = _pallas_resident(
            carry, prepared, omega_f=self.omega, interpret=_interpret(),
            accel=self._accel_spec(), gsteps=self.gsteps,
        )
        return new, tots

    def final(self, carry):
        return self._transform_out(carry)


class TransposedResidentStep(ResidentStep):
    """Resident stepping on the transposed lattice for wide grids
    (nx >> 2*ny): same layout/speed permutation as
    :class:`lbm_tpu.ops.pallas_fused.TransposedCarryStep`."""

    transposed = True
