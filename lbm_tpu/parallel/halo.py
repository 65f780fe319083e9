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

from functools import partial

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


def exchange_halos(interior: jnp.ndarray, n_shards: int):
    """One-row halo exchange over the periodic ring.

    Returns ``(south, north)`` halo rows for this shard: south = the top
    interior row of the shard below, north = the bottom interior row of
    the shard above. Single-shard meshes reduce to periodic wrap.
    """
    top = interior[:, -1:, :]
    bottom = interior[:, :1, :]
    if n_shards == 1:
        return top, bottom
    # Our top row becomes the south halo of the shard above (send up);
    # our bottom row becomes the north halo of the shard below (send down).
    south = lax.ppermute(top, AXIS, _up_perm(n_shards))
    north = lax.ppermute(bottom, AXIS, _down_perm(n_shards))
    return south, north


def _shard_step(params: Params, decomp: RowDecomposition, kernel: str):
    """Build the per-shard step ``(cells, obstacles) -> (cells, tot_u)``."""
    w1, w2, omega = params.accel_w1, params.accel_w2, params.omega
    local_ny = decomp.local_ny
    n = decomp.n_shards

    if kernel == "pallas":
        from lbm_tpu.ops import pallas_fused

        local_kernel = pallas_fused.make_halo_kernel(params, local_ny)
    else:
        local_kernel = lambda i, s, nn, o: ref_ops.collide_stream_halo(
            i, s, nn, o, omega
        )

    def step(cells, obstacles):
        # (9, local_ny, nx), (local_ny, nx)
        my = lax.axis_index(AXIS)
        local_row = np.int32(decomp.accel_row) - my * np.int32(local_ny)
        active = (local_row >= 0) & (local_row < local_ny)
        cells = ref_ops.accelerate_flow_dynamic(
            cells, obstacles, w1, w2, local_row, active
        )
        south, north = exchange_halos(cells, n)
        return local_kernel(cells, south, north, obstacles)

    return step


def make_sharded_simulate(
    params: Params,
    mesh: Mesh,
    kernel: str = "reference",
    n_iters: int | None = None,
):
    """Jitted whole-simulation function over a row-sharded lattice:
    ``(cells0, obstacles, inv_fluid) -> (final_cells, av_vels)``.

    ``cells0`` (9, ny, nx) sharded P(None, 'y', None); ``obstacles``
    (ny, nx) sharded P('y', None); ``av_vels`` comes back replicated.
    """
    n_shards = mesh.shape[AXIS]
    decomp = RowDecomposition(ny=params.ny, n_shards=n_shards)
    iters = params.max_iters if n_iters is None else n_iters
    if kernel == "auto":
        kernel = "pallas" if jax.default_backend() == "tpu" else "reference"
    step = _shard_step(params, decomp, kernel)

    def local_sim(cells, obstacles, inv_fluid):
        av_partial = jnp.zeros((iters,), dtype=cells.dtype)

        def body(tt, carry):
            cells, av = carry
            cells, tot_u = step(cells, obstacles)
            av = av.at[tt].set(tot_u * inv_fluid)
            return cells, av

        cells, av_partial = lax.fori_loop(0, iters, body, (cells, av_partial))
        # One reduction for the whole trajectory, not one per step — the
        # reference's single end-of-run MPI_Reduce (d2q9-bgk.c:445).
        av = lax.psum(av_partial, AXIS)
        return cells, av

    sharded = jax.shard_map(
        local_sim,
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P(AXIS, None), P()),
        out_specs=(P(None, AXIS, None), P()),
        # vma checking can't see through pallas_call out_shapes; skip it
        # (correctness is covered by the sharded-vs-unsharded tests).
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_inputs(mesh: Mesh, cells: jnp.ndarray, obstacles: jnp.ndarray):
    """Place the initial state and mask with the shardings the sharded
    simulate expects."""
    cells_s = jax.device_put(
        cells, NamedSharding(mesh, P(None, AXIS, None))
    )
    obs_s = jax.device_put(obstacles, NamedSharding(mesh, P(AXIS, None)))
    return cells_s, obs_s
