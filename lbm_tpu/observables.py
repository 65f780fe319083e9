"""Observables over a global lattice state: average velocity, Reynolds
number, total density — the reference's av_velocity / calc_reynolds /
total_density (d2q9-bgk.c:449-481, 675-696).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lbm_tpu.params import Params


def macroscopic(cells: jnp.ndarray):
    """Per-cell density and velocity from a (9, ny, nx) state
    (the write_values/av_velocity formulas, d2q9-bgk.c:456-473).

    Returns ``(rho, u_x, u_y)`` each (ny, nx) f32.
    """
    rho = jnp.sum(cells, axis=0, dtype=cells.dtype)
    u_x = (cells[1] + cells[5] + cells[8] - (cells[3] + cells[6] + cells[7])) / rho
    u_y = (cells[2] + cells[5] + cells[6] - (cells[4] + cells[7] + cells[8])) / rho
    return rho, u_x, u_y


def av_velocity(cells: jnp.ndarray, obstacles: jnp.ndarray) -> jnp.ndarray:
    """Mean |u| over fluid cells (d2q9-bgk.c:449-481)."""
    _, u_x, u_y = macroscopic(cells)
    speed = jnp.sqrt(u_x * u_x + u_y * u_y)
    # Coerce: on a reference-style int 0/1 mask, bitwise ~ would mark
    # EVERY cell fluid (review finding).
    fluid = ~obstacles.astype(bool)
    d = cells.dtype
    tot_u = jnp.sum(jnp.where(fluid, speed, d.type(0)), dtype=d)
    # The count is summed as integers (the reference's int tot_cells,
    # d2q9-bgk.c:450) — f32 partial sums round past 2^24 fluid cells.
    tot_cells = jnp.sum(fluid, dtype=jnp.int32).astype(d)
    return tot_u / tot_cells


def calc_reynolds(
    params: Params, cells: jnp.ndarray, obstacles: jnp.ndarray
) -> jnp.ndarray:
    """av_velocity * reynolds_dim / viscosity (d2q9-bgk.c:675-678)."""
    return (
        av_velocity(cells, obstacles)
        * params.dtype(params.reynolds_dim)
        / params.viscosity
    )


def total_density(cells: jnp.ndarray) -> jnp.ndarray:
    """Sum of all distributions — conserved per step (d2q9-bgk.c:680-696)."""
    return jnp.sum(cells, dtype=cells.dtype)
