#!/usr/bin/env python3
"""Measure the sharded program's hardware overhead on a 1-device mesh.

The weak-scaling model (scripts/weak_scaling_model.py) prices the seam
ppermute traffic against ICI; what it cannot price is the CPU-side
wrapper and the kernel-structure difference between the unsharded
production kernel and its shard_map twin (seam edge entries arrive as
separate DMA sources instead of resident ring slots). A 1-device mesh
runs the full sharded program — shard_map, self-ppermute, seam-entry
kernel — on the real chip, so (sharded − unsharded) marginal time IS
that overhead, measured end to end. The reference's analogue is its
measured 23% halo cost at 112 ranks (report_mpi/report.tex:164-165);
here the 1-shard structural overhead bounds what any shard count pays
before real neighbour traffic starts.

Both legs pin LBM_RESIDENT=0: the comparison isolates the shard_map
structure around the BLOCKED kernel (the kernel that actually shards —
the VMEM-resident kernel is single-chip-only by design, docs/PERF.md),
so the unsharded leg must not auto-select residency and fold the
resident-vs-blocked kernel difference into "sharding overhead".

Each hardware measurement runs in a timeout-guarded subprocess (the
CLAUDE.md rule: a hung tunnel call is not an Exception, so an
in-process measurement could hang forever).

Usage: python scripts/sharded_overhead.py [-o docs/artifacts/sharded_overhead.json]
       [--iters 2000] [--repeats 3]
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def measure(nx, ny, iters, repeats, sharded):
    """Child-process body: one (grid, leg) marginal measurement."""
    import os

    os.environ["LBM_RESIDENT"] = "0"
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lbm_tpu.obstacles import generate_obstacles, num_non_obstacles_r
    from lbm_tpu.params import Params
    from lbm_tpu.state import initial_state

    params = Params(nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
                    density=np.float32(0.1), accel=np.float32(0.01),
                    omega=np.float32(1.85))
    obstacles = generate_obstacles(nx, ny)
    inv = num_non_obstacles_r(obstacles)
    obs_dev = jnp.asarray(obstacles)
    cells0 = initial_state(params)

    if sharded:
        from lbm_tpu.parallel.decomp import make_mesh
        from lbm_tpu.parallel.halo import make_sharded_simulate, shard_inputs

        mesh = make_mesh(1)
        simulate = make_sharded_simulate(params, mesh, kernel="pallas")
        cells0, obs_dev = shard_inputs(
            mesh, cells0, obs_dev, params=params, kernel="pallas"
        )
    else:
        from lbm_tpu.runner import make_simulate

        simulate = make_simulate(params, kernel="pallas")

    def fresh_state():
        # The compiled program donates the lattice buffer — every call
        # needs a fresh (and, for the sharded twin, resharded) state.
        cells = initial_state(params)
        if sharded:
            cells, _ = shard_inputs(mesh, cells, obs_dev, params=params,
                                    kernel="pallas")
        return cells

    compiled = simulate.lower(cells0, obs_dev, inv).compile()
    c, a = compiled(cells0, obs_dev, inv)
    np.asarray(a)  # untimed first execution (program-load overhead)

    best = float("inf")
    for _ in range(repeats):
        cells = fresh_state()
        jax.block_until_ready(cells)
        t0 = time.perf_counter()
        c, a = compiled(cells, obs_dev, inv)
        np.asarray(a)
        best = min(best, time.perf_counter() - t0)
    return best, nx * ny * iters / best / 1e9


def _run_case(nx, ny, iters, repeats, sharded, timeout_s=1500.0):
    """Parent side: the measurement in a timeout-guarded subprocess."""
    cmd = [sys.executable, str(Path(__file__).resolve()), "--child",
           str(nx), str(ny), str(iters), str(repeats),
           "1" if sharded else "0"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout_s:.0f}s"}
    for line in res.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    return {"error": (res.stderr.strip().splitlines() or ["no output"])[-1][:500]}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--child", nargs=5, metavar=("NX", "NY", "ITERS",
                                                "REPEATS", "SHARDED"),
                   help=argparse.SUPPRESS)
    p.add_argument("-o", "--output",
                   default="docs/artifacts/sharded_overhead.json")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args(argv)

    if args.child:
        nx, ny, iters, repeats, sharded = (int(v) for v in args.child)
        s, g = measure(nx, ny, iters, repeats, bool(sharded))
        print("RESULT " + json.dumps({"seconds": s, "glups": g}))
        return 0

    # No backend probe in the parent: jax.default_backend() INITIALISES
    # the backend and hangs on a down tunnel (CLAUDE.md) — the whole
    # point of the per-leg subprocess guards. The platform is implied
    # by the measurement method.
    results = {"iters": args.iters,
               "method": "1-device-mesh sharded program vs unsharded "
                         "(both legs LBM_RESIDENT=0: blocked kernel), "
                         "2000-iter marginals, best of repeats, one "
                         "timeout-guarded subprocess per leg",
               "cases": []}
    for nx, ny in ((1024, 1024), (16384, 1024)):
        row = {"grid": f"{nx}x{ny}"}
        solo = _run_case(nx, ny, args.iters, args.repeats, sharded=False)
        shard = _run_case(nx, ny, args.iters, args.repeats, sharded=True)
        if "glups" in solo and "glups" in shard:
            row.update({
                "unsharded_glups": solo["glups"],
                "sharded_1dev_glups": shard["glups"],
                "overhead_pct": 100.0 * (shard["seconds"] - solo["seconds"])
                / solo["seconds"],
            })
        else:
            row["error"] = {"unsharded": solo, "sharded": shard}
        results["cases"].append(row)
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
