"""Portable jnp implementation of the per-timestep ops.

This is the semantic reference for the Pallas TPU kernel and the sharded
path: pull-streaming + bounce-back + BGK collision + the per-step velocity
reduction, fused in one pass exactly like the reference's ``timestep``
(d2q9-bgk.c:268-339), preceded by ``accelerate_flow`` forcing on global row
ny-2 (d2q9-bgk.c:235-266; unambiguous serial form go/d2q9-bgk.go:127-143).

Everything is float32 with the reference's operation association so f32
trajectories track the golden data to ~1e-5 %, far inside check.py's 1 %
tolerance.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lbm_tpu.state import D2Q9

_ONE = np.float32(1.0)
_ZERO = np.float32(0.0)


def accelerate_flow(
    cells: jnp.ndarray,
    obstacles: jnp.ndarray,
    w1: np.float32,
    w2: np.float32,
    row: int | None = None,
) -> jnp.ndarray:
    """Apply the east-directed forcing to one lattice row.

    Mirrors d2q9-bgk.c:235-266: on row ``ny-2`` (default), cells that are
    not obstacles and whose west-side densities would stay positive get
    ``w1`` added to speed 1 / subtracted from speed 3 and ``w2`` added to
    speeds 5,8 / subtracted from speeds 6,7.

    ``cells``: (9, ny, nx) f32. ``obstacles``: (ny, nx) bool.
    """
    if row is None:
        row = cells.shape[1] - 2
    r = cells[:, row, :]  # (9, nx)
    obs = obstacles[row, :]  # (nx,)
    ok = (
        (~obs)
        & (r[3] - w1 > _ZERO)
        & (r[6] - w2 > _ZERO)
        & (r[7] - w2 > _ZERO)
    )
    delta = jnp.asarray(
        np.array([0, w1, 0, -w1, 0, w2, -w2, -w2, w2], dtype=np.float32)
    )
    new_row = jnp.where(ok[None, :], r + delta[:, None], r)
    return cells.at[:, row, :].set(new_row)


def _stream_pull(cells: jnp.ndarray) -> jnp.ndarray:
    """Pull streaming: output cell (jj, ii) for speed k gathers from
    (jj - cy[k], ii - cx[k]) with periodic wrap (d2q9-bgk.c:288-315) —
    i.e. each plane rolled by its lattice velocity.
    """
    return jnp.stack(
        [
            jnp.roll(cells[k], (int(D2Q9.CY[k]), int(D2Q9.CX[k])), (0, 1))
            for k in range(D2Q9.Q)
        ]
    )


def collide_stream(
    cells: jnp.ndarray,
    obstacles: jnp.ndarray,
    omega: np.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One fused streaming + bounce-back + BGK collision step plus the
    tot_u reduction (d2q9-bgk.c:268-339).

    Returns ``(new_cells, tot_u)`` where ``tot_u`` is the un-normalised sum
    of |u| over fluid cells (the caller scales by 1/num_fluid_cells, as the
    reference does post-reduce at d2q9-bgk.c:445-446).
    """
    s = _stream_pull(cells)
    # Density: reference sums speeds 0..8 left-to-right (d2q9-bgk.c:315).
    rho = s[0] + s[1] + s[2] + s[3] + s[4] + s[5] + s[6] + s[7] + s[8]
    u_x = (s[1] + s[5] + s[8] - (s[3] + s[6] + s[7])) / rho
    u_y = (s[2] + s[5] + s[6] - (s[4] + s[7] + s[8])) / rho
    u_sq = u_x * u_x + u_y * u_y

    obs = obstacles  # (ny, nx) bool
    new_planes = []
    for k in range(D2Q9.Q):
        cx = float(D2Q9.CX[k])
        cy = float(D2Q9.CY[k])
        w = np.float32(D2Q9.W[k])
        # Projected velocity, preserving the reference's expression shapes
        # (e.g. speed 6 uses (-u_x + u_y), d2q9-bgk.c:331).
        if cx == 0.0 and cy == 0.0:
            # Speed 0: feq = w0 * rho * (1 - u_sq * 1.5)  (d2q9-bgk.c:325)
            feq = w * rho * (_ONE - u_sq * D2Q9.TWO_C_SQ_R)
        else:
            if cx == 0.0:
                uc = u_y if cy > 0 else -u_y
            elif cy == 0.0:
                uc = u_x if cx > 0 else -u_x
            else:
                ux_t = u_x if cx > 0 else -u_x
                uy_t = u_y if cy > 0 else -u_y
                uc = ux_t + uy_t
            feq = (
                w
                * rho
                * (
                    _ONE
                    + uc * D2Q9.C_SQ_R
                    + (uc * uc) * D2Q9.TWO_C_SQ_SQ_R
                    - u_sq * D2Q9.TWO_C_SQ_R
                )
            )
        relaxed = s[k] + omega * (feq - s[k])
        bounced = s[int(D2Q9.OPP[k])]
        new_planes.append(jnp.where(obs, bounced, relaxed))

    tot_u = jnp.sum(jnp.where(obs, _ZERO, jnp.sqrt(u_sq)), dtype=jnp.float32)
    return jnp.stack(new_planes), tot_u


def fused_step(
    cells: jnp.ndarray,
    obstacles: jnp.ndarray,
    w1: np.float32,
    w2: np.float32,
    omega: np.float32,
    accel_row: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """accelerate_flow on the pre-step state, then the fused collide-stream
    pass — the loop body of d2q9-bgk.c:191-197 (acceleration acts on the
    post-swap state of the previous iteration).
    """
    cells = accelerate_flow(cells, obstacles, w1, w2, accel_row)
    return collide_stream(cells, obstacles, omega)
