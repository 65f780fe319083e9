#!/usr/bin/env python3
"""Measure the streaming share of the fused stage's VPU budget on chip.

docs/PERF.md's plateau analysis ("Remaining headroom" #1) attributes
~15% of the per-stage op budget to the streaming data movement — per
speed with cy!=0 a sublane roll + an edge-row select, and per speed
with cx!=0 a lane roll (ops/pallas_fused._pull_interior) — by counting
ops. This probe MEASURES that share directly: three variants of a
VMEM-resident stepping kernel (the v8 structure, pallas_resident) that
differ only in the per-block stage body —

- ``full``    pull-stream + BGK collide (the production op mix),
- ``collide`` BGK collide on unstreamed planes (streaming elided),
- ``stream``  pull-stream + copy-back (collision elided; the reduce is
              a plain plane sum so a dependent scalar still forces
              completion).

``collide`` and ``stream`` are physics-WRONG by construction (values
stay bounded: pure relaxation converges to equilibrium, pure streaming
permutes) — they exist only to split the stage's wall-clock between
its two halves under an identical memory/loop structure. The reference
faced the same question when its profiles split propagate vs collision
time (profiling/v0_128x128.txt:7-9: collision 70.5%, propagate 13.7%
before fusion).

Each variant runs in its own timeout-guarded subprocess (the tunnelled
TPU can hang a dead call — bench.py measurement rules): untimed first
execution, then best-of-N with a dependent host fetch as the fence.

Usage: python scripts/stream_cost_probe.py [--grid 1024x1024]
           [--gsteps 2000] [--repeats 3] [-o artifact.json]
       (TPU only: the interpret-mode cost model has no VPU issue ports
        to measure, so non-TPU workers refuse rather than mislabel.)
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

MODES = ("full", "collide", "stream")


def _probe_call(cells, obs_i8, *, mode: str, gsteps: int, omega: float):
    """One pallas_call advancing ``gsteps`` variant-steps between two
    VMEM-resident buffers (pallas_resident._kernel_resident's
    double-buffer core, minus acceleration — O(nx)/step, irrelevant to
    the per-cell stage cost being split here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lbm_tpu.ops.pallas_fused import _VMEM_CAP, _pick_block_rows, _pull_interior
    from lbm_tpu.ops.reference import _bgk_update
    from lbm_tpu.state import D2Q9

    q, h, nx = cells.shape
    assert q == D2Q9.Q
    by = _pick_block_rows(h, nx)
    assert h % by == 0 and gsteps % 2 == 0

    def kernel(x_ref, obs_ref, out_ref, tot_ref, buf_a, buf_b, sem):
        n_blocks = h // by
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (by, nx), 0)
        cp_in = pltpu.make_async_copy(x_ref, buf_a, sem)
        cp_in.start()
        cp_in.wait()

        def one_step(src, dst, idx):
            tot = None
            for b in range(n_blocks):
                r0 = b * by
                rp = (r0 - 1) % h
                rn = (r0 + by) % h
                body = [src[k, r0 : r0 + by, :] for k in range(q)]
                if mode == "collide":
                    streamed = body
                else:
                    prev_a = [src[k, rp : rp + 1, :] for k in range(q)]
                    next_a = [src[k, rn : rn + 1, :] for k in range(q)]
                    streamed = _pull_interior(
                        body, prev_a, next_a, row_ids, by, nx
                    )
                if mode == "stream":
                    new = jnp.stack(streamed)
                    t = jnp.sum(streamed[0])
                else:
                    obstacles = obs_ref[r0 : r0 + by, :] != 0
                    new, t = _bgk_update(
                        streamed, obstacles, np.float32(omega)
                    )
                dst[:, r0 : r0 + by, :] = new
                tot = t if tot is None else tot + t
            tot_ref[0, idx] = tot

        def pair(i, carry):
            one_step(buf_a, buf_b, 2 * i)
            one_step(buf_b, buf_a, 2 * i + 1)
            return carry

        lax.fori_loop(0, gsteps // 2, pair, 0)
        cp_out = pltpu.make_async_copy(buf_a, out_ref, sem)
        cp_out.start()
        cp_out.wait()

    state_bytes = q * h * nx * 4
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
        scratch_shapes=[
            pltpu.VMEM((q, h, nx), jnp.float32),
            pltpu.VMEM((q, h, nx), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _VMEM_CAP, 2 * state_bytes + h * nx + (24 << 20)
            ),
        ),
        interpret=False,
    )(cells, obs_i8)
    return new, tot[0]


def worker(mode: str, nx: int, ny: int, gsteps: int, repeats: int) -> None:
    """Measure one variant in THIS process; prints one RESULT line."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.obstacles import generate_obstacles
    from lbm_tpu.params import Params
    from lbm_tpu.state import initial_state

    backend = jax.default_backend()
    if backend != "tpu":
        print("RESULT " + json.dumps(
            {"mode": mode, "error": f"requires TPU, got {backend!r}"}
        ))
        return
    params = Params(nx=nx, ny=ny, max_iters=gsteps, reynolds_dim=10,
                    density=np.float32(0.1), accel=np.float32(0.01),
                    omega=np.float32(1.85))
    cells = initial_state(params)
    obs_i8 = jnp.asarray(
        generate_obstacles(nx, ny).astype(np.int8)
    )
    fn = jax.jit(functools.partial(
        _probe_call, mode=mode, gsteps=gsteps, omega=float(params.omega)
    ))
    compiled = fn.lower(cells, obs_i8).compile()
    _, tot = compiled(cells, obs_i8)
    np.asarray(tot)  # untimed first execution (program-load overhead)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, tot = compiled(cells, obs_i8)
        np.asarray(tot)  # dependent fetch = the fence (docs/PERF.md)
        best = min(best, time.perf_counter() - t0)
    print("RESULT " + json.dumps({
        "mode": mode, "nx": nx, "ny": ny, "gsteps": gsteps,
        "seconds": best,
        "glups": nx * ny * gsteps / best / 1e9,
        "backend": backend,
    }))


def measure(mode: str, nx: int, ny: int, gsteps: int, repeats: int,
            timeout_s: float) -> dict:
    cmd = [sys.executable, str(Path(__file__).resolve()), "--worker", mode,
           "--grid", f"{nx}x{ny}", "--gsteps", str(gsteps),
           "--repeats", str(repeats)]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout_s, cwd=str(HERE),
                             env=dict(os.environ))
    except subprocess.TimeoutExpired:
        return {"mode": mode, "error": f"timeout after {timeout_s:.0f}s"}
    for line in res.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    tail = (res.stderr.strip().splitlines() or ["no output"])[-1][:300]
    return {"mode": mode, "error": tail}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--grid", default="1024x1024")
    p.add_argument("--gsteps", type=int, default=2000,
                   help="steps per timed call (even; DMA in/out is "
                        "amortised over all of them)")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--timeout", type=float, default=1500.0)
    p.add_argument("--worker", default=None, choices=MODES,
                   help=argparse.SUPPRESS)
    p.add_argument("-o", "--output", default=None,
                   help="also write the rows + derived shares as JSON")
    args = p.parse_args(argv)
    nx, ny = (int(v) for v in args.grid.split("x"))
    if args.gsteps % 2:
        raise SystemExit("--gsteps must be even (buffer parity)")

    if args.worker:
        worker(args.worker, nx, ny, args.gsteps, args.repeats)
        return 0

    rows = []
    for mode in MODES:
        r = measure(mode, nx, ny, args.gsteps, args.repeats, args.timeout)
        print(json.dumps(r), flush=True)
        rows.append(r)
    by_mode = {r["mode"]: r for r in rows if "seconds" in r}
    summary = {"grid": args.grid, "gsteps": args.gsteps, "rows": rows}
    if {"full", "collide", "stream"} <= set(by_mode):
        t_full = by_mode["full"]["seconds"]
        # Two independent estimates of the streaming share: subtractive
        # (full - collide-only) and direct (stream-only / full). They
        # bracket the truth when the halves overlap on execution ports.
        summary["stream_share_subtractive"] = round(
            (t_full - by_mode["collide"]["seconds"]) / t_full, 4
        )
        summary["stream_share_direct"] = round(
            by_mode["stream"]["seconds"] / t_full, 4
        )
    print(json.dumps(summary), flush=True)
    if args.output:
        Path(args.output).write_text(json.dumps(summary, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
