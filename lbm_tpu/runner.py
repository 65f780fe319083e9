"""Simulation driver: the reference's main loop (d2q9-bgk.c:191-203) as a
single jitted ``lax.fori_loop`` — accelerate → fused collide-stream →
per-step av_vels accumulation — entirely on device, with av_vels stored in a
preallocated ``(maxIters,)`` on-device buffer (the reference's host-side
``av_vels`` array, d2q9-bgk.c:646) and transferred once at the end (the
reference's collate, d2q9-bgk.c:395-447).

Extras beyond the reference:

- chunked execution with periodic checkpoint/resume (.npz of step index,
  lattice state and trajectory prefix) — the reference persisted nothing
  until the end (SURVEY §5);
- a debug mode printing the reference's ``-DDEBUG`` per-step block
  (``==timestep==`` / av velocity / tot density, d2q9-bgk.c:198-202).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from lbm_tpu.params import Params
from lbm_tpu.obstacles import num_non_obstacles_r
from lbm_tpu.state import D2Q9, initial_state, initial_state_np
from lbm_tpu.observables import calc_reynolds, total_density
from lbm_tpu.ops import reference as ref_ops


@dataclasses.dataclass
class SimulationResult:
    cells: np.ndarray  # (9, ny, nx) final global state, params.dtype
    av_vels: np.ndarray  # (maxIters,) params.dtype
    reynolds: float
    timings: dict  # init / compute / collate / total seconds
    # Graceful preemption (chunked checkpointing paths only): the number
    # of steps actually completed, and whether the run stopped early on
    # SIGTERM/SIGINT with its state flushed to the checkpoint file.
    # av_vels entries past completed_steps are zeros, not trajectory.
    completed_steps: int = -1  # -1 = the full iteration count
    preempted: bool = False


class _PreemptionGuard:
    """Graceful-preemption watch for the chunked loops: while active,
    SIGTERM/SIGINT set a flag instead of killing the process, so the
    loop can flush a checkpoint at the next chunk boundary and stop
    early with a resumable state — TPU pods are routinely preempted,
    and the reference simply lost the whole run (SURVEY §5: no
    checkpoint/recovery). A SECOND signal restores default handling
    (the first escalation path if the current chunk hangs). Armed only
    when periodic checkpointing gives the loop a boundary to stop at;
    inert outside the main thread, where ``signal.signal`` raises."""

    _SIGNALS = ("SIGTERM", "SIGINT")

    def __init__(self, enabled: bool):
        self.enabled = enabled
        self.requested = False
        self._saved = {}

    def _handle(self, signum, frame):
        self.requested = True
        self._restore()  # second signal: default (deadly) behaviour

    def _restore(self):
        import signal as _signal

        for num, prev in self._saved.items():
            _signal.signal(num, prev)
        self._saved = {}

    def __enter__(self):
        if not self.enabled:
            return self
        import signal as _signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return self
        for name in self._SIGNALS:
            num = getattr(_signal, name, None)
            if num is None:
                continue
            self._saved[num] = _signal.signal(num, self._handle)
        return self

    def __exit__(self, *exc):
        self._restore()
        return False


class _SimpleImpl:
    """Carry = the lattice itself (jnp reference path). Step impls return
    per-call tot_u vectors of shape (steps_per_call,)."""

    steps_per_call = 1

    def __init__(self, step):
        self._step = step

    def prepare(self, obstacles):
        return obstacles

    def init(self, cells, prepared):
        return cells

    def step(self, carry, prepared):
        carry, tot = self._step(carry, prepared)
        return carry, tot[None]

    def final(self, carry):
        return carry


def _resolve_kernel(kernel: str, params: Params) -> str:
    """Resolve ``auto`` to a concrete kernel name and validate dtype.

    On real TPU, grids the Mosaic kernel's DMA-tile alignment cannot
    serve (non-8-aligned row counts — every official scene qualifies,
    odd shapes like 100x100 do not) resolve to the XLA reference kernel
    under ``auto`` and are rejected with a clear error when pallas is
    requested explicitly; interpret mode (CPU) has no such constraint."""
    was_auto = kernel == "auto"
    if was_auto:
        if jax.default_backend() == "tpu" and params.dtype == np.float32:
            try:
                from lbm_tpu.ops import pallas_fused

                kernel = (
                    "pallas"
                    if pallas_fused.supports_tpu_grid(params.ny, params.nx)
                    else "reference"
                )
            except ImportError as exc:
                # A silent demotion here hides a ~20x slowdown on TPU
                # (review finding) — demote, but say so.
                import warnings

                warnings.warn(
                    "kernel='auto' fell back to the reference kernel: "
                    f"the pallas kernel failed to import ({exc})",
                    RuntimeWarning,
                )
                kernel = "reference"
        else:
            kernel = "reference"
    if kernel == "pallas" and params.dtype != np.float32:
        raise ValueError(
            "the pallas kernel is float32-only; use --kernel reference "
            "with --precision float64"
        )
    # Auto-resolved pallas already passed supports_tpu_grid above; only
    # an EXPLICIT pallas request still needs the Mosaic-geometry gate.
    if not was_auto and kernel == "pallas" and jax.default_backend() == "tpu":
        from lbm_tpu.ops import pallas_fused

        if not pallas_fused.supports_tpu_grid(params.ny, params.nx):
            raise ValueError(
                f"grid {params.ny}x{params.nx}: the Mosaic kernel needs "
                "an 8-aligned (possibly transposed) row count and a "
                "128-aligned lane dimension on real TPU; use --kernel "
                "reference for this grid"
            )
    if kernel not in ("reference", "pallas"):
        raise ValueError(f"unknown kernel {kernel!r}")
    from lbm_tpu.params import ensure_dtype_computable

    ensure_dtype_computable(params)
    return kernel


def _select_impl(kernel: str, params: Params, paired: bool = True,
                 n_iters: int | None = None):
    """Resolve a step implementation with prepare/init/step/final over an
    opaque carry (the Pallas path carries per-block edge-row arrays and,
    in paired mode, ping-pong lattice buffers alongside the lattice).
    ``paired`` requires the caller to run an even number of steps."""
    w1, w2, omega = params.accel_w1, params.accel_w2, params.omega
    kernel = _resolve_kernel(kernel, params)
    if kernel == "reference":
        return _SimpleImpl(
            lambda cells, obs: ref_ops.fused_step(cells, obs, w1, w2, omega)
        )
    if kernel == "pallas":
        from lbm_tpu.ops import pallas_fused

        return pallas_fused.make_carry_step(
            params, paired=paired, n_iters=n_iters
        )
    raise ValueError(f"unknown kernel {kernel!r}")


def _select_step(kernel: str, params: Params):
    """Back-compat: a plain ``(cells, obstacles) -> (cells, tot_u)``
    (single-step, used by the debug path)."""
    impl = _select_impl(kernel, params, paired=False)

    def step(cells, obs):
        prepared = impl.prepare(obs)
        carry, tots = impl.step(impl.init(cells, prepared), prepared)
        return impl.final(carry), tots[0]

    return step


def _segment_loop(segs, cells, obstacles, inv_fluid, av_vels, t0):
    """Shared stepping loop over planned segments ``[(impl, n), ...]``
    (used verbatim inside halo's shard_map programs too): each segment
    runs ``n`` steps of its impl in one ``fori_loop``, writing
    av_vels[t0+off : t0+off+n]. Per-step scaling by 1/num_fluid_cells is
    algebraically the reference's end-of-run scaling of the reduced sums
    (d2q9-bgk.c:445-446). ``t0`` may be a python int or traced scalar."""
    off = 0
    for impl, n in segs:
        spc = impl.steps_per_call
        assert n % spc == 0
        prepared = impl.prepare(obstacles)  # loop-invariant

        def body(i, loop_carry, impl=impl, prepared=prepared, spc=spc,
                 off=off):
            carry, av = loop_carry
            carry, tots = impl.step(carry, prepared)
            av = lax.dynamic_update_slice(
                av, tots * inv_fluid, (t0 + off + i * spc,)
            )
            return carry, av

        carry, av_vels = lax.fori_loop(
            0, n // spc, body, (impl.init(cells, prepared), av_vels)
        )
        cells = impl.final(carry)
        off += n
    return cells, av_vels


def _segments(kernel: str, params: Params, iters: int):
    """Plan the run as ``[(impl, n_steps), ...]``. One segment when
    the kernel's preferred step granularity divides ``iters``;
    otherwise a main segment at the preferred granularity (paired /
    resident) and the remainder re-planned recursively — a tail the
    next-best granularity still doesn't divide splits again (e.g.
    resident 1000@G=100 + 96 depth-fused + 3 single steps for
    iters=1099), so arbitrary iteration counts keep full speed with at
    most a handful of slow steps (the reference's loop had no
    divisibility constraint, d2q9-bgk.c:191)."""
    kernel = _resolve_kernel(kernel, params)
    parts = []
    remaining = iters
    if kernel == "pallas":
        from lbm_tpu.ops import pallas_fused

        while remaining > 0:
            main, tail = pallas_fused.plan_iters(params, remaining)
            if not tail:
                break  # remaining runs as one segment below
            parts.append((
                _select_impl(kernel, params, paired=True, n_iters=main),
                main,
            ))
            remaining = tail  # strictly shrinks: re-plan it
    if remaining > 0 or not parts:
        impl = _select_impl(
            kernel, params, paired=remaining % 2 == 0, n_iters=remaining
        )
        parts.append((impl, remaining))
    return parts


def make_simulate(params: Params, kernel: str = "auto", n_iters: int | None = None):
    """Build the jitted whole-simulation function
    ``(cells0, obstacles, inv_fluid) -> (final_cells, av_vels)``.
    """
    iters = params.max_iters if n_iters is None else n_iters
    segs = _segments(kernel, params, iters)
    av_dtype = params.dtype

    @partial(jax.jit, donate_argnums=(0,))
    def simulate(cells, obstacles, inv_fluid):
        av_vels = jnp.zeros((iters,), dtype=av_dtype)
        return _segment_loop(segs, cells, obstacles, inv_fluid, av_vels, 0)

    return simulate


def make_chunk(params: Params, kernel: str, chunk_iters: int):
    """Jitted chunk runner ``(cells, obstacles, inv, av, t0) -> (cells, av)``
    executing ``chunk_iters`` steps that write av_vels[t0:t0+chunk_iters]."""
    segs = _segments(kernel, params, chunk_iters)

    def chunk(cells, obstacles, inv_fluid, av_vels, t0):
        return _segment_loop(segs, cells, obstacles, inv_fluid, av_vels, t0)

    return jax.jit(chunk, donate_argnums=(0, 3))


def _fence(small_output) -> None:
    """Force completion of the computation producing ``small_output`` by
    fetching it to host — block_until_ready can return early for donated
    outputs on tunnelled backends (docs/PERF.md)."""
    np.asarray(small_output)


def save_checkpoint(path: str | Path, step: int, cells, av_vels) -> None:
    """Persist (step, lattice, trajectory prefix) as .npz."""
    np.savez_compressed(
        path,
        step=np.int64(step),
        cells=np.asarray(cells),
        av_vels=np.asarray(av_vels),
    )


def load_checkpoint(path: str | Path):
    """Returns (step, cells, av_vels) from a checkpoint file."""
    try:
        with np.load(path) as z:
            return int(z["step"]), z["cells"], z["av_vels"]
    except OSError:
        raise  # missing/unreadable file — already on the CLI die() path
    except Exception as exc:
        # zipfile.BadZipFile (truncated/corrupt), KeyError (missing
        # arrays), EOFError, numpy's misleading pickled-data ValueError
        # — translate to the CLI's one-line die() contract instead of
        # an unhandled traceback or a cryptic message (review finding).
        raise ValueError(f"invalid checkpoint file {path!r}: {exc!r}") \
            from exc


def run_simulation(
    params: Params,
    obstacles: np.ndarray,
    kernel: str = "auto",
    n_iters: int | None = None,
    mesh=None,
    debug: bool = False,
    checkpoint_every: int | None = None,
    checkpoint_file: str | Path | None = None,
    resume_from: str | Path | None = None,
    trace_dir: str | Path | None = None,
    chunk_iters: int | None = None,
) -> SimulationResult:
    """Run the full simulation and return final state + trajectory.

    ``mesh``: optional ``jax.sharding.Mesh`` with a single 'y' axis; when
    given, the lattice is row-sharded and stepped under ``shard_map`` with
    ppermute halo exchange (the reference's MPI decomposition,
    d2q9-bgk.c:341-393, 483-503).

    ``checkpoint_every``/``checkpoint_file``: periodically persist state;
    ``resume_from``: continue a previous run's checkpoint.
    ``chunk_iters``: bound any single device execution to this many
    timesteps WITHOUT checkpoint I/O (trajectory identical — the same
    chunked runners the checkpoint path uses, minus the per-chunk
    ~35 MB/s host flush). Motivation: the tunnelled TPU reproducibly
    kills executions that run for minutes (the 16384x1024 jnp leg,
    ~145 s in one call, crashed the worker twice; chunked it survives).
    ``debug``: print the reference's -DDEBUG per-step block (slow path).
    ``trace_dir``: capture a jax.profiler trace of the compute phase
    (the gprof/Advisor analogue — profiling.trace; view with xprof or
    summarise with scripts/trace_report.py).
    """
    import contextlib

    from lbm_tpu.profiling import trace as _trace

    trace_ctx = (
        (lambda: _trace(str(trace_dir)))
        if trace_dir is not None
        else contextlib.nullcontext
    )
    from lbm_tpu.profiling import PhaseTimers

    timers = PhaseTimers()
    timers.start("total")
    timers.start("init")
    if checkpoint_every is not None and checkpoint_every <= 0:
        raise ValueError(
            f"checkpoint_every must be a positive step count, "
            f"got {checkpoint_every}"
        )
    if checkpoint_every is not None and checkpoint_file is None:
        # Without a file the chunked path would run (slower) and save
        # nothing — a misconfiguration, not a request. Execution-length
        # bounding without I/O is chunk_iters' job.
        raise ValueError(
            "checkpoint_every requires checkpoint_file (periodic "
            "checkpointing needs somewhere to write); to bound "
            "execution length without saving, use chunk_iters"
        )
    if chunk_iters is not None and chunk_iters <= 0:
        raise ValueError(
            f"chunk_iters must be a positive step count, got {chunk_iters}"
        )
    if chunk_iters is not None and checkpoint_every is not None:
        # Two competing strides would silently pick one; refuse.
        raise ValueError(
            "chunk_iters and checkpoint_every are mutually exclusive "
            "(checkpointing already chunks at its own stride)"
        )
    iters = params.max_iters if n_iters is None else n_iters
    if iters <= 0:
        # Params validates max_iters > 0; the n_iters override must
        # hold the same contract or --iters -5 surfaces as a cryptic
        # 'negative dimensions are not allowed' from jnp.zeros (and 0
        # silently writes an empty av_vels.dat) — review finding.
        raise ValueError(f"iteration count must be positive, got {iters}")
    obstacles = np.asarray(obstacles, dtype=bool)
    orig_ny = params.ny
    pad_rows, wrap_pad = 0, 0
    if mesh is not None:
        # Non-divisor device counts: pad with obstacle rows instead of
        # demoting the mesh (halo.plan_padding_mode; the reference's
        # allocate_rows balancing, d2q9-bgk.c:483-492) — wall-shielded
        # behind boundary walls (any kernel), periodic-wrap otherwise
        # (exact: the shard step re-routes the wrap around the pad; the
        # production pallas kernel in 'wrap' mode, the portable kernel
        # in 'wrap_ref'). The pad is sliced back off the final state
        # below.
        from lbm_tpu.parallel import halo as _halo

        pad_mode, pad_rows = _halo.plan_padding_mode(
            params, obstacles, mesh, kernel
        )
        if pad_rows:
            params, obstacles = _halo.pad_scene(params, obstacles, pad_rows)
        if pad_mode == "wrap":
            wrap_pad = pad_rows
        elif pad_mode == "wrap_ref":
            # The pallas wrap pad does not fit (or the caller asked for
            # the reference kernel): portable wrap impl.
            kernel = "reference"
            wrap_pad = pad_rows
    inv_fluid = num_non_obstacles_r(obstacles, dtype=params.dtype)
    obs_dev = jnp.asarray(obstacles)

    start_step = 0
    av0 = np.zeros((iters,), dtype=params.dtype)
    if resume_from is not None:
        start_step, cells_np, av_prefix = load_checkpoint(resume_from)
        if not 0 <= start_step <= iters:
            # A clamp here would return the checkpoint's too-advanced
            # lattice as the "result" of a shorter run (review finding).
            raise ValueError(
                f"checkpoint at step {start_step} cannot resume a "
                f"{iters}-iteration run"
            )
        # Reconcile row padding: checkpoints store the PADDED lattice of
        # the run that wrote them, and this run's device count may pad
        # differently (review finding: a 6-device 1024->1056-row
        # checkpoint resumed on 8 divisor devices crashed on shapes).
        # Pad rows never feed the interior — wall-shielded pads are
        # causally disconnected behind the walls, and wrap-mode pads
        # are rewritten from the wrap halo before any real row reads
        # them (plan_padding_mode) — so stripping the writer's pad and
        # substituting fresh equilibrium pad rows is exact either way.
        old_pad = cells_np.shape[1] - orig_ny
        if (cells_np.shape[0] != D2Q9.Q
                or cells_np.shape[2] != params.nx or old_pad < 0):
            raise ValueError(
                f"checkpoint lattice shape {cells_np.shape} does not "
                f"match the {orig_ny}x{params.nx} scene"
            )
        if old_pad != pad_rows:
            interior = cells_np[:, old_pad:, :]
            if pad_rows:
                # Host-side twin — building a lattice-sized buffer on
                # the device just to download it costs a ~35 MB/s
                # tunnel round-trip at production sizes (review
                # finding) and initialises the backend during prep.
                fresh = initial_state_np(params, dtype=params.dtype)
                fresh[:, pad_rows:, :] = interior
                cells_np = fresh
            else:
                cells_np = interior
        cells0 = jnp.asarray(cells_np.astype(params.dtype, copy=False))
        if len(av_prefix) < start_step:
            # A truncated write (or a hand-edited step field) would
            # otherwise surface as a raw numpy broadcast error.
            raise ValueError(
                f"checkpoint av_vels prefix has {len(av_prefix)} "
                f"entries but claims step {start_step}"
            )
        av0[:start_step] = av_prefix[:start_step]
    else:
        cells0 = initial_state(params, dtype=params.dtype)

    if debug:
        return _run_debug(
            params, cells0, obs_dev, inv_fluid, kernel, iters, timers,
            start_step, av0,
            checkpoint_every=checkpoint_every,
            checkpoint_file=checkpoint_file,
            trace_ctx=trace_ctx,
            mesh=mesh,
            pad_rows=pad_rows,
            wrap_pad=wrap_pad,
        )

    completed, preempted = iters, False
    chunked = bool(checkpoint_every or chunk_iters or start_step)
    if mesh is not None and not chunked:
        from lbm_tpu.parallel import halo

        simulate = halo.make_sharded_simulate(
            params, mesh, kernel=kernel, n_iters=iters, wrap_pad=wrap_pad
        )
        cells0, obs_dev = halo.shard_inputs(
            mesh, cells0, obs_dev, params=params, kernel=kernel
        )
        compiled = simulate.lower(cells0, obs_dev, inv_fluid).compile()
        jax.block_until_ready((cells0, obs_dev))
        timers.stop("init")
        with timers.phase("compute"), trace_ctx():
            cells, av_vels = compiled(cells0, obs_dev, inv_fluid)
            _fence(av_vels)
    elif chunked:
        # Chunked path (single-device or sharded): one jitted runner per
        # distinct chunk length (full chunks + possibly a shorter tail),
        # all compiled before the compute timer starts.
        stride = checkpoint_every or chunk_iters or (iters - start_step)
        if mesh is not None:
            from lbm_tpu.parallel import halo

            cells0, obs_dev = halo.shard_inputs(
                mesh, cells0, obs_dev, params=params, kernel=kernel
            )
            mk = lambda n: halo.make_sharded_chunk(
                params, mesh, kernel, n, wrap_pad=wrap_pad
            )
        else:
            mk = lambda n: make_chunk(params, kernel, n)
        sizes = []
        tt_probe = start_step
        while tt_probe < iters:
            n = min(stride, iters - tt_probe)
            if n not in sizes:
                sizes.append(n)
            tt_probe += n
        av_vels = jnp.asarray(av0)
        runners = {
            n: mk(n).lower(
                cells0, obs_dev, inv_fluid, av_vels, jnp.int32(0)
            ).compile()
            for n in sizes
        }
        cells = cells0
        jax.block_until_ready((cells0, obs_dev))
        timers.stop("init")
        timers.start("compute")
        guard = _PreemptionGuard(
            enabled=bool(checkpoint_every and checkpoint_file is not None)
        )
        with trace_ctx(), guard:
            tt = start_step
            while tt < iters:
                n = min(stride, iters - tt)
                cells, av_vels = runners[n](
                    cells, obs_dev, inv_fluid, av_vels, jnp.int32(tt)
                )
                tt += n
                if checkpoint_every and checkpoint_file is not None:
                    # save_checkpoint's np.asarray is itself the fence.
                    save_checkpoint(checkpoint_file, tt, cells, av_vels)
                if guard.requested:
                    # Preempted: the chunk just completed and its state
                    # is flushed — stop here; the caller resumes from
                    # the checkpoint (latency bound: one chunk).
                    break
            _fence(av_vels)
        timers.stop("compute")
        completed, preempted = tt, guard.requested and tt < iters
    else:
        simulate = make_simulate(params, kernel=kernel, n_iters=iters)
        compiled = simulate.lower(cells0, obs_dev, inv_fluid).compile()
        jax.block_until_ready((cells0, obs_dev))
        timers.stop("init")
        with timers.phase("compute"), trace_ctx():
            cells, av_vels = compiled(cells0, obs_dev, inv_fluid)
            _fence(av_vels)

    # Collate: device -> host gather of the final lattice + trajectory.
    # Reynolds is computed on the DEVICE-RESIDENT state: re-uploading the
    # lattice would cost ~17 s at 16384x1024 over the ~35 MB/s tunnel
    # (docs/PERF.md measurement rules).
    with timers.phase("collate"):
        cells_np = np.asarray(jax.device_get(cells), dtype=params.dtype)
        av_np = np.asarray(jax.device_get(av_vels), dtype=params.dtype)
        reynolds = float(calc_reynolds(params, cells, obs_dev))
    timers.stop("total")
    if pad_rows:
        cells_np = cells_np[:, pad_rows:, :]

    return SimulationResult(
        cells=cells_np,
        av_vels=av_np,
        reynolds=reynolds,
        timings=dict(timers.elapsed),
        completed_steps=completed,
        preempted=preempted,
    )


def _run_debug(params, cells0, obs_dev, inv_fluid, kernel, iters, timers,
               start_step=0, av0=None,
               checkpoint_every=None, checkpoint_file=None,
               trace_ctx=None, mesh=None, pad_rows=0, wrap_pad=0):
    """Python-loop path printing the reference's -DDEBUG block per step
    (d2q9-bgk.c:198-202); resumes mid-trajectory when given a start step
    and av prefix, and honours periodic checkpointing like the jitted
    path. Under a ``mesh`` it steps the sharded one-step chunk runner —
    the reference's -DDEBUG block also worked under MPI
    (d2q9-bgk.c:198-202; the per-step reduce is the debug path's
    explicit cost)."""
    import contextlib

    av = np.zeros((iters,), dtype=params.dtype) if av0 is None else av0
    # AOT-compile during init so the first-call compile (70-120 s on the
    # tunnelled TPU) lands in the init timer like every other path.
    if mesh is not None:
        from lbm_tpu.parallel import halo

        cells, obs_dev = halo.shard_inputs(
            mesh, cells0, obs_dev, params=params, kernel=kernel
        )
        av_box = [jnp.asarray(av)]  # replicated on-device trajectory
        chunk = halo.make_sharded_chunk(params, mesh, kernel, 1,
                                        wrap_pad=wrap_pad)
        compiled = chunk.lower(
            cells, obs_dev, inv_fluid, av_box[0], jnp.int32(0)
        ).compile()

        def do_step(cells, tt):
            cells, av_box[0] = compiled(
                cells, obs_dev, inv_fluid, av_box[0], jnp.int32(tt)
            )
            # Host fetch of one scalar: the per-step psum is already
            # inside the chunk; av_vels[tt] is replicated.
            return cells, float(av_box[0][tt])
    else:
        cells = cells0
        step = jax.jit(_select_step(kernel, params)).lower(
            cells0, obs_dev
        ).compile()
        inv = float(inv_fluid)

        def do_step(cells, tt):
            cells, tot_u = step(cells, obs_dev)
            return cells, float(tot_u) * inv

    timers.stop("init")
    timers.start("compute")
    # The profiler trace covers the compute phase only, like every
    # other path — entered after the AOT compile so a --debug --trace
    # capture isn't dominated by compilation (review finding).
    done = start_step
    guard = _PreemptionGuard(
        enabled=bool(checkpoint_every and checkpoint_file is not None)
    )
    with (trace_ctx or contextlib.nullcontext)(), guard:
        for tt in range(start_step, iters):
            cells, av[tt] = do_step(cells, tt)
            print("==timestep: %d==" % tt)
            print("av velocity: %.12E" % av[tt])
            # Exclude the wall-shielded pad rows (non-divisor meshes):
            # their mass is not part of the scene, and the pad region
            # is not exactly at rest (its row adjacent to the wall
            # pulls from the evolving wall row), so the reference's
            # debug block would otherwise report a drifting offset.
            print("tot density: %.12E" % float(
                total_density(cells[:, pad_rows:, :] if pad_rows else cells)
            ))
            done = tt + 1
            if (checkpoint_every and checkpoint_file is not None
                    and (done % checkpoint_every == 0 or done == iters
                         or guard.requested)):
                save_checkpoint(checkpoint_file, done, cells, av)
            if guard.requested:
                # The per-step python loop can flush immediately — no
                # chunk boundary to wait for.
                break
    timers.stop("compute")
    with timers.phase("collate"):
        cells_np = np.asarray(jax.device_get(cells), dtype=params.dtype)
        reynolds = float(calc_reynolds(params, cells, obs_dev))
    timers.stop("total")
    if pad_rows:
        cells_np = cells_np[:, pad_rows:, :]
    return SimulationResult(
        cells=cells_np,
        av_vels=av,
        reynolds=reynolds,
        timings=dict(timers.elapsed),
        completed_steps=done,
        preempted=guard.requested and done < iters,
    )
