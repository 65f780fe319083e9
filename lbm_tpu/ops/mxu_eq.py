"""MXU-offloaded BGK equilibrium — the round-3 experiment (VERDICT r2).

The fused kernel is VPU-issue-bound on 1024-lane grids (docs/PERF.md);
the reference's own biggest single win was engaging its wide unit
(vectorization, 3.7x — report_openmp/report.tex:243-246). The TPU
analogue would be computing the equilibrium on the MXU: expand
feq_k = w_k*rho*(1 + 3*uc_k + 4.5*uc_k^2 - 1.5*u^2) (d2q9-bgk.c:325-333)
over the quadratic feature vector

    phi = [rho, rho*ux, rho*uy, rho*ux^2, rho*uy^2, rho*ux*uy]

so all nine equilibria become one (9, 6) x (6, cells) contraction:

    W[k] = w_k * [1, 3*cx, 3*cy, 4.5*cx^2-1.5, 4.5*cy^2-1.5, 9*cx*cy]

This module provides the XLA-level form (:func:`collide_stream_mxu`) —
jnp code whose feq is a genuine dot_general, letting XLA lay out the
relayouts as well as it can — used by scripts/mxu_probe.py to measure
the idea's ceiling on the chip against the elementwise form. The
structural problem it measures: the planar (9, ny, nx) layout keeps the
speed/feature axes on untiled leading dims, so the contraction needs a
(ny, nx)-volume relayout on both sides of a K=6 matmul that occupies
6/128 of the MXU's contraction depth. See docs/PERF.md for the measured
verdict.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lbm_tpu.state import D2Q9


def equilibrium_matrix(dtype=np.float32) -> np.ndarray:
    """(9, 6) map from the quadratic feature vector to the nine
    equilibria — algebraically identical to d2q9-bgk.c:325-333."""
    w = np.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4, dtype=np.float64)
    W = np.zeros((D2Q9.Q, 6), dtype=np.float64)
    for k in range(D2Q9.Q):
        cx, cy = float(D2Q9.CX[k]), float(D2Q9.CY[k])
        W[k] = w[k] * np.array([
            1.0, 3.0 * cx, 3.0 * cy,
            4.5 * cx * cx - 1.5, 4.5 * cy * cy - 1.5, 9.0 * cx * cy,
        ])
    return W.astype(dtype)


def collide_stream_mxu(
    cells: jnp.ndarray,
    obstacles: jnp.ndarray,
    omega: np.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in twin of :func:`lbm_tpu.ops.reference.collide_stream` with
    the equilibrium evaluated as a matmul (f32-faithful: HIGHEST
    precision keeps the MXU in its fp32-equivalent mode)."""
    s = [
        jnp.roll(cells[k], (int(D2Q9.CY[k]), int(D2Q9.CX[k])), (0, 1))
        for k in range(D2Q9.Q)
    ]
    rho = s[0] + s[1] + s[2] + s[3] + s[4] + s[5] + s[6] + s[7] + s[8]
    u_x = (s[1] + s[5] + s[8] - (s[3] + s[6] + s[7])) / rho
    u_y = (s[2] + s[5] + s[6] - (s[4] + s[7] + s[8])) / rho
    u_sq = u_x * u_x + u_y * u_y

    rux, ruy = rho * u_x, rho * u_y
    phi = jnp.stack(
        [rho, rux, ruy, rux * u_x, ruy * u_y, rux * u_y]
    )  # (6, ny, nx)
    W = jnp.asarray(equilibrium_matrix())
    ny, nx = rho.shape
    feq = jax.lax.dot_general(
        W, phi.reshape(6, ny * nx),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(D2Q9.Q, ny, nx)

    omega = np.float32(omega)
    new = []
    for k in range(D2Q9.Q):
        relaxed = s[k] + omega * (feq[k] - s[k])
        bounced = s[int(D2Q9.OPP[k])]
        new.append(jnp.where(obstacles, bounced, relaxed))
    tot_u = jnp.sum(jnp.where(obstacles, np.float32(0), jnp.sqrt(u_sq)))
    return jnp.stack(new), tot_u
