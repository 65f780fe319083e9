"""Measure the MXU-offloaded equilibrium against the elementwise form on
the chip (the round-3 experiment, VERDICT r2 #1; rationale in
lbm_tpu/ops/mxu_eq.py).

Times a jitted fori_loop of full steps (accelerate + collide-stream) at
1024x1024 for three step variants:

- jnp-elementwise: ops.reference.collide_stream (the XLA baseline);
- jnp-mxu: ops.mxu_eq.collide_stream_mxu (feq as a (9,6)x(6,N) matmul);

Also reports whether the compiled MXU variant actually contains a
convolution/dot (it can be verified from the optimized HLO) and the
measured per-step delta = the relayout + matmul cost XLA could not hide.
Follows the tunnel measurement rules (bench.py): untimed first
execution, host-fetch fence, best of N.

Writes docs/artifacts/mxu_probe.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(step_builder, params, iters, repeats=3):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lbm_tpu.obstacles import generate_obstacles
    from lbm_tpu.state import initial_state

    obstacles = jnp.asarray(generate_obstacles(params.nx, params.ny))
    step = step_builder(params)

    @partial(jax.jit, donate_argnums=(0,))
    def run(cells, obstacles):
        def body(_, carry):
            cells, tot = carry
            cells, t = step(cells, obstacles)
            return cells, tot + t

        return lax.fori_loop(0, iters, body, (cells, jnp.float32(0.0)))

    compiled = run.lower(initial_state(params), obstacles).compile()
    hlo = compiled.as_text()
    has_dot = ("dot(" in hlo) or ("convolution" in hlo) or ("dot-general" in hlo)
    _, tot = compiled(initial_state(params), obstacles)
    np.asarray(tot)  # untimed first execution
    best = float("inf")
    for _ in range(repeats):
        c0 = initial_state(params)
        import jax

        jax.block_until_ready(c0)
        t0 = time.perf_counter()
        _, tot = compiled(c0, obstacles)
        np.asarray(tot)
        best = min(best, time.perf_counter() - t0)
    glups = params.nx * params.ny * iters / best / 1e9
    return {"glups": round(glups, 3), "best_s": round(best, 4),
            "us_per_iter": round(best / iters * 1e6, 2), "has_dot": has_dot}


def jnp_step(params):
    from lbm_tpu.ops.reference import fused_step

    w1, w2, om = params.accel_w1, params.accel_w2, params.omega
    return lambda c, o: fused_step(c, o, w1, w2, om)


def mxu_step(params):
    from lbm_tpu.ops.mxu_eq import collide_stream_mxu
    from lbm_tpu.ops.reference import accelerate_flow

    w1, w2, om = params.accel_w1, params.accel_w2, params.omega

    def step(cells, obstacles):
        cells = accelerate_flow(cells, obstacles, w1, w2)
        return collide_stream_mxu(cells, obstacles, om)

    return step


def main():
    import bench

    bench._enable_compilation_cache()
    from lbm_tpu.params import Params

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    params = Params(nx=1024, ny=1024, max_iters=iters, reynolds_dim=10,
                    density=np.float32(0.1), accel=np.float32(0.01),
                    omega=np.float32(1.85))
    out = {"grid": "1024x1024", "iters": iters}
    for name, builder in [("jnp_elementwise", jnp_step), ("jnp_mxu", mxu_step)]:
        out[name] = measure(builder, params, iters)
        print(name, out[name], flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts", "mxu_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
