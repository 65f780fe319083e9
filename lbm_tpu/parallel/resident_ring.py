"""Sharded VMEM-resident stepping with in-kernel remote-DMA seam
exchange (v9 "resident ring"): G whole timesteps per pallas_call with
each shard's lattice resident in VMEM and the two seam rows exchanged
over ICI every step by ``pltpu.make_async_remote_copy`` — no HBM
traffic between the one copy-in and one copy-out per call.

Why: the single-chip resident kernel (ops/pallas_resident.py) removed
the HBM wall for chip-resident states (25.7 vs 20.8 GLUPS at 1024^2),
but the sharded path still runs the blocked kernel — one full HBM
round trip per fused pass (depth <= 8), because the seam ppermute
lives at the XLA level BETWEEN pallas calls. Under row sharding the
per-shard state shrinks by n_shards, so production grids become
VMEM-resident per shard (1024^2 over 8 shards: 4.7 MB/buffer); what
keeps them out of VMEM is only the per-step halo. Moving the halo
exchange INSIDE the kernel as an RDMA ring removes that constraint:
per-step HBM traffic drops from 72/depth to ~72/G B/cell (G = 100),
and the seam transfer (2 rows x 9 speeds) overlaps the interior-block
compute — the overlap the reference's trailing MPI_Sendrecv could
never achieve (23% halo overhead at 112 ranks,
/root/reference/report_mpi/report.tex:164-165; exchange at
/root/reference/d2q9-bgk.c:341-393).

Synchronisation protocol (validated step-by-step in interpret mode
with the race detector on — see tests/test_ring.py):

- Steps run in pairs (A->B then B->A, the reference's pointer swap
  d2q9-bgk.c:196 as buffer parity), and every per-step communication
  buffer is 2-slotted by step parity: stage_up/dn (the outgoing seam
  rows, forcing pre-applied) and halo_s/n (the incoming neighbour
  rows).
- Each (direction, slot) pair has its OWN send and recv DMA
  semaphore. This is load-bearing, not convention: two in-flight
  messages from the same sender sharing one recv semaphore let the
  receiver's step-t wait be satisfied by the step-t+1 arrival while
  t's payload is still in flight (measured: silent wrong trajectories
  in the interpreter; the same reordering is legal on real ICI).
  Per-slot semaphores bound the protocol exactly: a shard can issue
  the slot-s message for step t+2 only after its step-t+1 recv wait
  passed, which orders it after both neighbours finished reading
  their slot-s halos for step t.
- Per step: stage + start both RDMAs -> compute interior blocks ->
  wait recvs -> compute the two boundary blocks -> wait sends. The
  seam bytes ride ICI under the interior compute.

Acceleration (d2q9-bgk.c:235-266) is applied per-load to the pre-step
state — the forced-row mask (built once per run from axis_index, the
reference's rank_accelerate flag d2q9-bgk.c:498-500) guards body,
neighbour-row and STAGED-row loads alike, so a neighbour whose south
halo is the forced row (local_ny=2 decompositions) receives pre-forced
values with no extra flag channels.

Like the single-chip resident kernel, shards whose TWO buffers exceed
the scoped-VMEM ceiling but whose ONE buffer fits (~75-78 MB, e.g.
16384x1024 over 8 devices at 75.5 MB/shard) step a single resident
buffer IN PLACE: blocks run 1..n-1 then 0 so the seam RDMAs still
overlap the interior compute, with register-carried old edge rows
replacing the second buffer (the v8.1 design, d2q9-bgk.c:196's
pointer swap collapsed to one buffer).

Default OFF: the blocked seam-ppermute path (parallel/halo.py) stays
the production sharded default because this kernel's Mosaic lowering
and per-step RDMA latency are unproven on real multi-chip hardware
(none is reachable from this environment — CLAUDE.md); correctness is
proven against the unsharded trajectory on the interpret mesh at
f32-reassociation level (rtol 2e-5 — this kernel sums per-block tots
in its own order, so bit-level gates don't apply). Opt in with
LBM_SHARD_RESIDENT=1.
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
from lbm_tpu.ops.pallas_resident import (
    _G_PREF,
    _inplace_override,
    _pinned_steps,
    inplace_transposed_refused,
)
from lbm_tpu.parallel.decomp import AXIS, RowDecomposition

Q = D2Q9.Q

# Scoped-VMEM ceiling for ring configurations. The ring's explicit
# budget (_ring_vmem_bytes) can exceed the default 100-MiB scoped cap
# slightly on the 75.5-MB in-place window once the seam buffers' tile
# padding is counted honestly (~100.8 MiB at 2048x1024); the hardware
# has 128 MiB and raised ceilings are legal (see _VMEM_CAP's note in
# ops/pallas_fused.py — ~120-MiB blocked configs compile), so allow up
# to 112 MiB, keeping >= 16 MiB for Mosaic-internal buffers.
_RING_VMEM_CEIL = int(
    os.environ.get("LBM_RING_VMEM_CEIL", 112 * 1024 * 1024)
)


# Ring row blocks are capped at HALF the blocked kernel's 4.5-MB block
# (64Ki cells). Measured on the chip (16384x128 in-place TRANSPOSED
# shard), the register-allocator spill for that body is essentially
# block-size INVARIANT — 57.90 MB at 4.5-MB blocks (OOM'd the 128-MiB
# hardware VMEM by 1.9 MB), 56.83 MB at the capped 2.25-MB blocks
# (still 0.85 MB past) — per-block live sets sum over the whole shard,
# so shrinking blocks re-slices the same total. The cap therefore does
# NOT fix that pathology (ring_prefs refuses transposed in-place
# categorically); it cuts the explicit block working set, which
# measured 2.4x FASTER on the row-layout in-place Mosaic case
# (0.134 s -> 0.056 s / 200 steps) and keeps >= 4 blocks per shard so
# seam RDMAs have interior compute to hide under.
_RING_BLOCK_ELEMS = 64 * 1024


def _ring_block_rows(rows: int, lanes: int) -> int:
    """Ring-kernel row-block size: ``_pick_block_rows`` capped to
    ``_RING_BLOCK_ELEMS`` cells (see above — the cap cuts the explicit
    block working set, and the resident buffer leaves far less slack
    than the blocked kernel's streaming slots) AND to rows/4, so shards
    of >= 32 rows split into >= 4 blocks (2 interior) and the per-step
    seam RDMA has an interior window to hide under (the overlap the
    whole block order exists for); sub-32-row shards floor at by=8 and
    may be all-boundary — see the cap note below."""
    by = _pick_block_rows(rows, lanes)
    # The rows/4 term keeps >= 4 blocks (2 interior) on shards of
    # >= 32 rows; the max(8, ...) floor wins below that, so tiny
    # shards may be all-boundary with the seam latency fully exposed
    # — functionally correct, and the weak-scaling model's
    # boundary_rows accounting (max(0, rows - 2*by)) prices it in.
    cap = max(8, min(_RING_BLOCK_ELEMS // lanes, rows // 4))
    if by <= cap:
        return by
    fitting = [d for d in range(8, cap + 1, 8) if rows % d == 0]
    return fitting[-1] if fitting else by


def _ring_aux_bytes(rows: int, lanes: int) -> int:
    """Non-state VMEM the ring kernel needs besides the resident
    buffer(s): the int8 masks (obstacles + the dynamic accel mask of
    the row-sharded path — counted for the transposed path too so the
    in-place decision is layout-independent) and the 8 seam slot
    buffers (2 directions x 2 slots x stage/halo), each a (Q, 1, nx)
    f32 buffer whose single row pads to a full (8, 128) sublane tile
    (review finding: the unpadded count understated these 8x)."""
    return 2 * rows * lanes + 8 * Q * 8 * lanes * 4


def _ring_vmem_bytes(n_bufs: int, rows: int, lanes: int, by: int) -> int:
    """Scoped-VMEM budget for a ring configuration: the resident
    buffer(s) + masks/tile-padded seams + a 13x-block-bytes working-set
    allowance. The 13x is the spill/block ratio of the first measured
    OOM (57.9 MB spill over 4.5-MB blocks, 16384x128 transposed
    in-place); the follow-up compile at 2.25-MB blocks showed that
    TRANSPOSED body's spill is really block-size invariant (56.8 MB),
    so no per-block byte model can gate that pathology — ring_prefs
    refuses transposed in-place categorically instead. For the layouts
    this budget does gate, it is hardware-validated: the 75.5-MB
    row-layout in-place window (2048 rows x 1024 lanes) budgets
    ~108 MiB — past the default 100-MiB scoped cap but under the ring
    ceiling (_RING_VMEM_CEIL) — and its Mosaic case compiles and runs
    green on the chip, bounding the row-layout body's real spill well
    under the transposed body's ~57 MB."""
    working = max(13 * Q * by * lanes * 4, 8 << 20)
    return n_bufs * Q * rows * lanes * 4 + _ring_aux_bytes(rows, lanes) \
        + working


def _ring_n_bufs(rows: int, lanes: int, by: int) -> int | None:
    """Resident buffer count for a ring shard under ONE sizing rule
    (review finding: deciding the mode with the single-chip
    _inplace_mode's flat-slack rule but gating with _ring_vmem_bytes
    left a disagreement window — e.g. 1280x1024 shards — rejected
    outright instead of falling back to in-place): 2 when double
    buffers fit the ring VMEM ceiling, else 1 when a single buffer
    does, else None. LBM_RESIDENT_INPLACE forces the mode for A/B (the
    forced mode must still fit)."""
    forced = _inplace_override()
    if forced is not None:
        n = 1 if forced else 2
        return n if _ring_vmem_bytes(n, rows, lanes, by) <= _RING_VMEM_CEIL \
            else None
    for n in (2, 1):
        if _ring_vmem_bytes(n, rows, lanes, by) <= _RING_VMEM_CEIL:
            return n
    return None


def ring_buffer_mode(rows: int, lanes: int, *,
                     transposed: bool) -> str | None:
    """'double' | 'inplace' | None for a per-shard shape — the
    diagnostic the harness scripts record in their artifacts. Applies
    the same refusals as ring_prefs (notably the transposed in-place
    spill gate, via the shared inplace_transposed_refused predicate)
    so an artifact can never record a mode the planner would refuse to
    run. ``transposed`` is keyword-REQUIRED: the shard shape alone
    cannot disambiguate (16384x128 row-layout legitimately runs
    in-place; the same shape transposed is the measured OOM), so a
    forgotten default here would silently skip the gate."""
    by = _ring_block_rows(rows, lanes)
    if rows % by:
        return None
    n = _ring_n_bufs(rows, lanes, by)
    if n is None:
        return None
    if inplace_transposed_refused(n, transposed):
        return None
    return "inplace" if n == 1 else "double"


def ring_planned(params: Params, mesh, iters: int,
                 kernel: str = "pallas") -> bool:
    """True when the sharding planner's FIRST segment is a ring impl —
    the selected-the-ring guard all three harnesses need (sweep rows,
    the driver dryrun, the on-chip Mosaic check), shared so the three
    hand-rolled copies can't drift (review finding)."""
    from lbm_tpu.parallel.halo import _shard_segments, plan_sharding

    transposed, decomp, _, _ = plan_sharding(params, mesh, kernel)
    segs = _shard_segments(params, decomp, kernel, iters, transposed)
    return isinstance(segs[0][0], RingShardImpl)


def _kernel_ring(*refs, by, h, omega, accel, gsteps, n_shards,
                 dynamic_accel, inplace):
    """G timesteps on a VMEM-resident shard with per-step seam RDMA.

    Positional refs (pallas order: inputs, outputs, scratch):
    interior (9,h,nx) ANY in (aliased to out), obs (h,nx) VMEM i8,
    [accel mask (h,nx) VMEM i8 when ``dynamic_accel``,] out (9,h,nx)
    ANY, tot (1,G) SMEM; scratch: buf_a [+ buf_b unless ``inplace``]
    (9,h,nx) VMEM, 4 stage + 4 halo (Q,1,nx) VMEM slot buffers, 1
    whole-state-copy DMA semaphore, 8 per-(direction,slot) DMA
    semaphores."""
    it = iter(refs)
    interior_ref = next(it)
    obs_ref = next(it)
    acc_ref = next(it) if dynamic_accel else None
    out_ref = next(it)
    tot_ref = next(it)
    buf_a = next(it)
    buf_b = None if inplace else next(it)
    stage_up = (next(it), next(it))
    stage_dn = (next(it), next(it))
    halo_s = (next(it), next(it))
    halo_n = (next(it), next(it))
    copy_sem = next(it)
    sem_up_send = (next(it), next(it))
    sem_dn_send = (next(it), next(it))
    sem_s_recv = (next(it), next(it))
    sem_n_recv = (next(it), next(it))

    nx = out_ref.shape[-1]
    n_blocks = h // by
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (by, nx), 0)
    one = np.float32(1.0)

    if n_shards > 1:
        my = lax.axis_index(AXIS)
        up = lax.rem(my + 1, np.int32(n_shards))
        dn = lax.rem(my - 1 + np.int32(n_shards), np.int32(n_shards))

    if accel.axis == 1:
        # One (1, nx) forced-lane indicator for every load width — it
        # broadcasts over (m, nx) bit-identically, and a full (by, nx)
        # copy per body load measurably spills (~the last MBs of the
        # 128-MiB VMEM OOM on the 16384x128 in-place transposed shard).
        lane1 = (
            jax.lax.broadcasted_iota(jnp.int32, (1, nx), 1)
            == np.int32(accel.index)
        ).astype(jnp.float32)

    def forced(vals, fluid_f, line_f):
        """Guarded per-load forcing (d2q9-bgk.c:250-253) — identical to
        the blocked kernel's per-copy application; f32 indicator
        products per the Mosaic i1 rules (CLAUDE.md). The static
        transposed line takes the blocked kernel's line extraction
        (bit-identical, guards on (m, 1) column slices); the dynamic
        row-sharded mask keeps the full-plane form (its line position
        is per-shard)."""
        if accel.axis == 1:
            return _accel_line_extract(vals, fluid_f, accel, line_f)
        ok = _accel_ok(vals, fluid_f, accel, line_f)
        return _accelerated(vals, ok, accel)

    def line_factor(r0, m):
        """f32 0/1 forced-line indicator for rows [r0, r0+m): the
        dynamic mask rows under row sharding, the static lane column
        when transposed."""
        if accel.axis == 1:
            return lane1
        if dynamic_accel:
            return (acc_ref[r0 : r0 + m, :] != 0).astype(jnp.float32)
        return np.float32(0.0)

    def load_rows(src, r0, m):
        """Per-speed (m, nx) planes of pre-step rows [r0, r0+m) with
        forcing applied. Every row access stays rank-2 — rank-1 slices
        of big VMEM refs trip Mosaic layout inference (CLAUDE.md)."""
        vals = [src[k, r0 : r0 + m, :] for k in range(Q)]
        fluid = one - (obs_ref[r0 : r0 + m, :] != 0).astype(jnp.float32)
        return forced(vals, fluid, line_factor(r0, m))

    def start_seams(src, slot):
        """Stage the outgoing seam rows (forcing pre-applied) and start
        both RDMAs. Returns (rdma_up, rdma_dn, top, bot) — the in-flight
        copies plus the pre-step edge rows (the local seam substitutes
        when the ring closes on itself, n_shards == 1)."""
        top = load_rows(src, h - 1, 1)
        bot = load_rows(src, 0, 1)
        if n_shards == 1:
            return None, None, top, bot
        for k in range(Q):
            stage_up[slot][k, 0:1, :] = top[k]
            stage_dn[slot][k, 0:1, :] = bot[k]
        rd_up = pltpu.make_async_remote_copy(
            src_ref=stage_up[slot],
            dst_ref=halo_s[slot],
            send_sem=sem_up_send[slot],
            recv_sem=sem_s_recv[slot],
            device_id=(up,),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rd_dn = pltpu.make_async_remote_copy(
            src_ref=stage_dn[slot],
            dst_ref=halo_n[slot],
            send_sem=sem_dn_send[slot],
            recv_sem=sem_n_recv[slot],
            device_id=(dn,),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rd_up.start()
        rd_dn.start()
        return rd_up, rd_dn, top, bot

    def seam_rows(rd_up, rd_dn, slot, top, bot):
        """Block on the incoming seam rows and return (south, north)."""
        if n_shards == 1:
            # Single shard: the ring closes on itself (periodic y).
            return top, bot
        rd_up.wait_recv()
        rd_dn.wait_recv()
        south = [halo_s[slot][k, 0:1, :] for k in range(Q)]
        north = [halo_n[slot][k, 0:1, :] for k in range(Q)]
        return south, north

    def one_step(src, dst, idx, slot):
        """One timestep src -> dst with seam RDMA on slot buffers."""
        rd_up, rd_dn, top, bot = start_seams(src, slot)

        def block(b, south, north, tot):
            r0 = b * by
            obstacles = obs_ref[r0 : r0 + by, :] != 0
            body = load_rows(src, r0, by)
            streamed = _pull_interior(body, south, north, row_ids, by, nx)
            new, t = _bgk_update(streamed, obstacles, omega)
            dst[:, r0 : r0 + by, :] = new
            return t if tot is None else tot + t

        # --- interior blocks overlap the seam transfer ---------------
        tot = None
        for b in range(1, n_blocks - 1):
            tot = block(
                b,
                load_rows(src, b * by - 1, 1),
                load_rows(src, b * by + by, 1),
                tot,
            )

        # --- boundary blocks need the neighbours' seam rows ----------
        south, north = seam_rows(rd_up, rd_dn, slot, top, bot)
        if n_blocks == 1:
            tot = block(0, south, north, tot)
        else:
            tot = block(0, south, load_rows(src, by, 1), tot)
            tot = block(
                n_blocks - 1,
                load_rows(src, (n_blocks - 1) * by - 1, 1),
                north,
                tot,
            )
        tot_ref[0, idx] = tot
        if n_shards > 1:
            rd_up.wait_send()
            rd_dn.wait_send()

    def one_step_inplace(buf, idx, slot):
        """One timestep updating the single resident buffer in place —
        the ring analogue of the single-chip v8.1 mode
        (ops/pallas_resident.py one_step_inplace), for shards whose TWO
        buffers don't fit VMEM (e.g. 16384x1024 over 8 devices: 75.5 MB
        per shard buffer). Block order is 1..n-1 then 0, so the seam
        RDMAs still ride under the interior blocks:

        - ascending blocks b >= 2 take their south row from registers
          (block b-1's OLD last row, saved before its overwrite); block
          1's south is block 0's old last row, untouched until block 0
          runs last;
        - block b < n-1 takes its north row from block b+1's still-old
          rows; block n-1's north is the incoming halo;
        - block 0 (last) takes the incoming south halo and block 1's
          saved old FIRST row as its north; its own body rows are
          untouched because every write so far hit rows >= by.
        Every load goes through ``load_rows``, so the saved register
        rows carry the guarded forcing exactly like the staged seams."""
        rd_up, rd_dn, top, bot = start_seams(buf, slot)

        carry = {"tot": None, "prev": None, "first": None}

        def block(b, south, north):
            r0 = b * by
            body = load_rows(buf, r0, by)
            if b == 1:
                carry["first"] = [body[k][0:1, :] for k in range(Q)]
            old_last = [body[k][by - 1 : by, :] for k in range(Q)]
            obstacles = obs_ref[r0 : r0 + by, :] != 0
            streamed = _pull_interior(body, south, north, row_ids, by, nx)
            new, t = _bgk_update(streamed, obstacles, omega)
            buf[:, r0 : r0 + by, :] = new
            carry["prev"] = old_last
            t0 = carry["tot"]
            carry["tot"] = t if t0 is None else t0 + t

        if n_blocks == 1:
            south, north = seam_rows(rd_up, rd_dn, slot, top, bot)
            block(0, south, north)
        else:
            # --- interior blocks overlap the seam transfer -----------
            for b in range(1, n_blocks - 1):
                south = (carry["prev"] if b > 1
                         else load_rows(buf, by - 1, 1))
                block(b, south, load_rows(buf, b * by + by, 1))
            south, north = seam_rows(rd_up, rd_dn, slot, top, bot)
            b = n_blocks - 1
            block(b, carry["prev"] if b > 1
                  else load_rows(buf, by - 1, 1), north)
            block(0, south, carry["first"])
        tot_ref[0, idx] = carry["tot"]
        if n_shards > 1:
            rd_up.wait_send()
            rd_dn.wait_send()

    # --- whole-state copy-in (once per G steps) -----------------------
    cp_in = pltpu.make_async_copy(interior_ref, buf_a, copy_sem)
    cp_in.start()
    cp_in.wait()

    # G steps as G//2 pairs (A->B->A buffer parity, or two in-place
    # updates); the RDMA slot parity is static per half either way.
    def pair(i, carry):
        if inplace:
            one_step_inplace(buf_a, 2 * i, 0)
            one_step_inplace(buf_a, 2 * i + 1, 1)
        else:
            one_step(buf_a, buf_b, 2 * i, 0)
            one_step(buf_b, buf_a, 2 * i + 1, 1)
        return carry

    lax.fori_loop(0, gsteps // 2, pair, 0)

    cp_out = pltpu.make_async_copy(buf_a, out_ref, copy_sem)
    cp_out.start()
    cp_out.wait()


def _ring_interpret():
    """Interpret parameter for this kernel: remote DMAs need the TPU
    interpreter (pltpu.InterpretParams — simulates per-device memories,
    DMAs and semaphores on CPU), not the legacy ``interpret=True``.
    LBM_RING_DETECT_RACES=1 turns on its vector-clock race detector
    (slow; used by the protocol-audit test)."""
    if not _interpret():
        return False
    detect = os.environ.get("LBM_RING_DETECT_RACES") == "1"
    return pltpu.InterpretParams(detect_races=detect)


def _pallas_ring(cells, obs_i8, accel_mask, *, omega_f, accel, gsteps,
                 n_shards):
    """Run ``gsteps`` timesteps on one VMEM-resident shard with per-step
    seam RDMA. Returns ``(new_cells, tots)``; the input lattice buffer
    is donated to the output (alias 0->0) so the stepping loop's carry
    slot keeps one fixed HBM buffer per shard."""
    q, h, nx = cells.shape
    by = _ring_block_rows(h, nx)
    assert h % by == 0 and gsteps >= 2 and gsteps % 2 == 0, (h, by, gsteps)
    n_bufs = _ring_n_bufs(h, nx, by)
    assert n_bufs is not None, (h, nx, by)
    inplace = n_bufs == 1
    kernel = functools.partial(
        _kernel_ring, by=by, h=h, omega=np.float32(omega_f), accel=accel,
        gsteps=gsteps, n_shards=n_shards,
        dynamic_accel=accel_mask is not None, inplace=inplace,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [cells, obs_i8]
    if accel_mask is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(accel_mask)
    seam = pltpu.VMEM((Q, 1, nx), jnp.float32)
    new, tot = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, h, nx), jnp.float32),
            jax.ShapeDtypeStruct((1, gsteps), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((q, h, nx), jnp.float32)] * n_bufs
            + [seam] * 8
            + [pltpu.SemaphoreType.DMA] * 9
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _RING_VMEM_CEIL,
                _ring_vmem_bytes(n_bufs, h, nx, by),
            ),
            # The RDMA barrier id is only legal when the kernel actually
            # emits remote copies; on a 1-shard mesh the ring closes
            # locally (no RDMA in the binary) and Mosaic rejects the
            # param at trace time — found by scripts/tpu_mosaic_check.py
            # (the 1-device hardware-structure proof was unreachable
            # until this became conditional).
            **({"collective_id": 0} if n_shards > 1 else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(100 * gsteps * h * nx),
            bytes_accessed=int(2 * q * 4 * h * nx + h * nx),
            transcendentals=int(gsteps * h * nx),
        ),
        input_output_aliases={0: 0},
        interpret=_ring_interpret(),
    )(*operands)
    return new, tot[0]


def ring_prefs(local_rows: int, lanes: int,
               backend: str | None = None, *,
               transposed: bool) -> tuple[int, ...] | None:
    """Step-granularity preference list when the per-shard lattice
    qualifies for ring residency, else None.

    Qualify = LBM_SHARD_RESIDENT=1 (experimental opt-in — see module
    docstring; "0"/unset keeps the proven blocked seam-ppermute path),
    the resident f32 shard buffer(s) — two in double-buffer mode, one
    for the ~75-78 MB in-place window (``_ring_n_bufs``; the
    LBM_RESIDENT_INPLACE override of the single-chip v8.1 kernel
    forces the mode) — + masks + seam slots fit the scoped-VMEM
    ceiling, the block plan tiles the shard evenly, and on real TPU the same 8-aligned-rows
    rule as the blocked sharded path (resolve_shard_kernel).
    ``backend`` overrides the backend probe so analysis paths never
    initialise a backend (CLAUDE.md). ``transposed`` is
    keyword-REQUIRED here and in :func:`ring_gsteps` for the same
    reason as :func:`ring_buffer_mode`: a caller that forgot a
    defaulted ``transposed=False`` would silently skip the measured
    in-place spill gate below (review finding).

    TRANSPOSED shards never auto-select the IN-PLACE mode: measured on
    the chip, the transposed in-place kernel's register spill OOMs the
    128-MiB VMEM at the 72-MB production shard (16384x128 — 0.85 MB
    past at the capped 2.25-MB blocks, 1.9 MB past at the original
    4.5-MB blocks: the spill is block-size invariant there) and
    spill-thrashes at half that size (8192x128 compiles but runs
    ~100x slower than the blocked path) — the blocked seam-halo path
    is faster there anyway (its depth-8 rate at 128 lanes is the
    131072x128 headline). Double-buffer transposed rings are fine
    (proven on-chip at 2048x256). LBM_RESIDENT_INPLACE=1 still forces
    the mode for A/B runs. The mode/refusal logic is shared with
    ring_buffer_mode so artifacts record what the planner runs."""
    if os.environ.get("LBM_SHARD_RESIDENT") != "1":
        return None
    if local_rows < 2:
        return None
    if ring_buffer_mode(local_rows, lanes, transposed=transposed) is None:
        return None
    by = _ring_block_rows(local_rows, lanes)
    if (backend or jax.default_backend()) == "tpu" and (
        local_rows % 8 or by % 8
    ):
        return None
    # The ring's RDMA slot parity needs even G in BOTH buffer modes.
    pin = _pinned_steps(even=True)
    return (pin,) if pin else _G_PREF


def ring_gsteps(local_rows: int, lanes: int, n_iters: int | None,
                backend: str | None = None, *,
                transposed: bool) -> int | None:
    """The preferred step count per call for an ``n_iters``-step
    segment, or None when ring residency doesn't apply."""
    prefs = ring_prefs(local_rows, lanes, backend=backend,
                       transposed=transposed)
    if not prefs or not n_iters:
        return None
    for g in prefs:
        if n_iters % g == 0:
            return g
    return None


class RingShardImpl:
    """Per-shard step implementation over the runner's
    prepare/init/step/final protocol: carry = the local lattice alone
    (no edge-row arrays — seams move in-kernel). ``fused`` reports the
    HBM-amortisation depth (G steps per HBM round trip)."""

    transposed = False

    def __init__(self, params: Params, decomp: RowDecomposition,
                 gsteps: int):
        self.params = params
        self.decomp = decomp
        self.omega = float(params.omega)
        self.gsteps = int(gsteps)
        self.fused = self.gsteps
        self.steps_per_call = self.gsteps

    def prepare(self, obstacles):
        # Forced-row mask from axis_index — the reference's
        # rank_accelerate remapping (d2q9-bgk.c:498), shared with
        # halo._PallasShardImpl.prepare (decomp.accel_mask_i8).
        accel_mask = self.decomp.accel_mask_i8(obstacles.shape[1])
        return (obstacles, obstacles.astype(jnp.int8), accel_mask)

    def _accel_spec(self) -> AccelSpec:
        return AccelSpec.rows(self.params, self.params.ny)

    def init(self, cells, prepared):
        return cells

    def step(self, carry, prepared):
        _, obs_i8, accel_mask = prepared
        new, tots = _pallas_ring(
            carry, obs_i8, accel_mask, omega_f=self.omega,
            accel=self._accel_spec(), gsteps=self.gsteps,
            n_shards=self.decomp.n_shards,
        )
        return new, tots

    def final(self, carry):
        return carry


class TransposedRingShardImpl(RingShardImpl):
    """Wide-grid x-sharding (the transposed plan): the forced line is a
    static lane column present in every shard, so no dynamic mask — the
    lane AccelSpec guards every load, staged seam rows included."""

    transposed = True

    def prepare(self, obstacles):
        obs_t = obstacles.T
        return (obs_t, obs_t.astype(jnp.int8), None)

    def _accel_spec(self) -> AccelSpec:
        return AccelSpec.lanes(self.params, self.params.ny)

    def init(self, cells, prepared):
        return transpose_state(cells)

    def step(self, carry, prepared):
        _, obs_i8, _ = prepared
        new, tots = _pallas_ring(
            carry, obs_i8, None, omega_f=self.omega,
            accel=self._accel_spec(), gsteps=self.gsteps,
            n_shards=self.decomp.n_shards,
        )
        return new, tots

    def final(self, carry):
        return transpose_state(carry)


def make_ring_impl(params: Params, decomp: RowDecomposition,
                   transposed: bool, gsteps: int) -> RingShardImpl:
    cls = TransposedRingShardImpl if transposed else RingShardImpl
    return cls(params, decomp, gsteps)
