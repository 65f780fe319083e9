"""Headline benchmark: GLUPS (giga lattice-updates per second) at
1024x1024 on the available accelerator, vs the reference's best cluster
result (6.2 GLUPS: 1024^2 x 20000 iters / 3.38 s on 112 Broadwell cores,
report_mpi/report.tex:109-112, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from lbm_tpu.obstacles import generate_obstacles, num_non_obstacles_r
from lbm_tpu.params import Params
from lbm_tpu.runner import make_simulate
from lbm_tpu.state import initial_state

BASELINE_GLUPS = 6.2  # reference's 112-core MPI best at 1024^2


def bench(nx: int = 1024, ny: int = 1024, iters: int = 2000, kernel: str = "auto"):
    params = Params(
        nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
        density=np.float32(0.1), accel=np.float32(0.01), omega=np.float32(1.85),
    )
    obstacles = generate_obstacles(nx, ny)
    inv = num_non_obstacles_r(obstacles)
    cells0 = initial_state(params)
    obs_dev = jnp.asarray(obstacles)

    simulate = make_simulate(params, kernel=kernel, n_iters=iters)
    compiled = simulate.lower(cells0, obs_dev, inv).compile()
    # Untimed first execution: on remote/tunnelled backends the first run
    # of a program carries load overhead far beyond steady state.
    c, a = compiled(cells0, obs_dev, inv)
    np.asarray(a)
    cells0 = initial_state(params)
    jax.block_until_ready(cells0)

    t0 = time.perf_counter()
    cells, av = compiled(cells0, obs_dev, inv)
    # Force full host materialisation — block_until_ready alone can return
    # early through remote-execution backends.
    av_np = np.asarray(av)
    dt = time.perf_counter() - t0

    lups = nx * ny * iters / dt
    assert np.isfinite(av_np).all(), "trajectory diverged"
    return lups / 1e9, dt


def main() -> int:
    kernel = sys.argv[1] if len(sys.argv) > 1 else "auto"
    glups, dt = bench(kernel=kernel)
    print(
        json.dumps(
            {
                "metric": "GLUPS_1024x1024",
                "value": round(glups, 4),
                "unit": "GLUPS",
                "vs_baseline": round(glups / BASELINE_GLUPS, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
