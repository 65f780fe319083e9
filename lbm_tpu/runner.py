"""Simulation driver: the reference's main loop (d2q9-bgk.c:191-203) as a
single jitted ``lax.fori_loop`` — accelerate → fused collide-stream →
per-step av_vels accumulation — entirely on device, with av_vels stored in a
preallocated ``(maxIters,)`` on-device buffer (the reference's host-side
``av_vels`` array, d2q9-bgk.c:646) and transferred once at the end (the
reference's collate, d2q9-bgk.c:395-447).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from lbm_tpu.params import Params
from lbm_tpu.state import initial_state
from lbm_tpu.observables import calc_reynolds
from lbm_tpu.ops import reference as ref_ops


@dataclasses.dataclass
class SimulationResult:
    cells: np.ndarray  # (9, ny, nx) final global state, params.dtype
    av_vels: np.ndarray  # (maxIters,) params.dtype
    reynolds: float
    timings: dict  # init / compute / collate / total seconds


def _select_step(kernel: str, params: Params):
    """Resolve a step function ``(cells, obstacles) -> (cells, tot_u)``."""
    w1, w2, omega = params.accel_w1, params.accel_w2, params.omega
    if kernel == "auto":
        if jax.default_backend() == "tpu":
            try:
                from lbm_tpu.ops import pallas_fused  # noqa: F401

                kernel = "pallas"
            except ImportError:
                kernel = "reference"
        else:
            kernel = "reference"
    if kernel == "reference":
        return lambda cells, obs: ref_ops.fused_step(cells, obs, w1, w2, omega)
    if kernel == "pallas":
        from lbm_tpu.ops import pallas_fused

        return pallas_fused.make_fused_step(params)
    raise ValueError(f"unknown kernel {kernel!r}")


def make_simulate(params: Params, kernel: str = "auto", n_iters: int | None = None):
    """Build the jitted whole-simulation function
    ``(cells0, obstacles, inv_fluid) -> (final_cells, av_vels)``.
    """
    iters = params.max_iters if n_iters is None else n_iters
    step = _select_step(kernel, params)
    av_dtype = params.dtype

    @partial(jax.jit, donate_argnums=(0,))
    def simulate(cells, obstacles, inv_fluid):
        av_vels = jnp.zeros((iters,), dtype=av_dtype)

        def body(tt, carry):
            cells, av_vels = carry
            cells, tot_u = step(cells, obstacles)
            # Per-step scaling by 1/num_fluid_cells is algebraically the
            # reference's end-of-run scaling of the reduced sums
            # (d2q9-bgk.c:445-446).
            av_vels = av_vels.at[tt].set(tot_u * inv_fluid)
            return cells, av_vels

        return lax.fori_loop(0, iters, body, (cells, av_vels))

    return simulate


def run_simulation(
    params: Params,
    obstacles: np.ndarray,
    kernel: str = "auto",
    n_iters: int | None = None,
    mesh=None,
) -> SimulationResult:
    """Run the full simulation and return final state + trajectory.

    ``mesh``: optional ``jax.sharding.Mesh`` with a single 'y' axis; when
    given, the lattice is row-sharded and stepped under ``shard_map`` with
    ppermute halo exchange (the reference's MPI decomposition,
    d2q9-bgk.c:341-393, 483-503).
    """
    t0 = time.perf_counter()
    obstacles = np.asarray(obstacles, dtype=bool)
    inv_fluid = params.dtype(1.0) / params.dtype(
        obstacles.size - int(np.count_nonzero(obstacles))
    )
    cells0 = initial_state(params, dtype=params.dtype)
    obs_dev = jnp.asarray(obstacles)

    if mesh is not None:
        from lbm_tpu.parallel import halo

        simulate = halo.make_sharded_simulate(params, mesh, kernel=kernel, n_iters=n_iters)
        cells0, obs_dev = halo.shard_inputs(mesh, cells0, obs_dev)
    else:
        simulate = make_simulate(params, kernel=kernel, n_iters=n_iters)

    # Compile ahead of the timed region (the reference's init phase covers
    # file I/O + allocation; compilation is our analogous one-off cost).
    compiled = simulate.lower(cells0, obs_dev, inv_fluid).compile()
    jax.block_until_ready((cells0, obs_dev))
    t1 = time.perf_counter()

    cells, av_vels = compiled(cells0, obs_dev, inv_fluid)
    jax.block_until_ready(cells)
    t2 = time.perf_counter()

    # Collate: device -> host gather of the final lattice + trajectory.
    cells_np = np.asarray(jax.device_get(cells), dtype=params.dtype)
    av_np = np.asarray(jax.device_get(av_vels), dtype=params.dtype)
    reynolds = float(calc_reynolds(params, jnp.asarray(cells_np), jnp.asarray(obstacles)))
    t3 = time.perf_counter()

    return SimulationResult(
        cells=cells_np,
        av_vels=av_np,
        reynolds=reynolds,
        timings={
            "init": t1 - t0,
            "compute": t2 - t1,
            "collate": t3 - t2,
            "total": t3 - t0,
        },
    )
