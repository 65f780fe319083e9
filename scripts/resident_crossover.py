#!/usr/bin/env python3
"""A/B the VMEM-resident kernel (ops/pallas_resident.py) against the
blocked kernel across state sizes, one timeout-guarded subprocess per
cell (a hung tunnel call is not an Exception — docs/PERF.md measurement
rules). This is the measurement behind the resident auto-selection
floor (pallas_resident.resident_prefs): tiny states are
per-step-latency-bound and run slightly faster blocked, while states
from ~9 MB up gain 11-19% resident.

The reference's analogue of this sweep is its per-version timing tables
(report_openmp/report.tex) — every optimisation shipped with the
measurement that justified its default.

Usage: python scripts/resident_crossover.py
       [-o docs/artifacts/resident_crossover.json] [--iters 2000]
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

# (nx, ny): the crossover ladder — official small scenes, the 512-class
# midpoints, and the headline grid (state = 9*nx*ny*4 B).
GRIDS = [(128, 128), (128, 256), (256, 256), (512, 512),
         (1024, 512), (1024, 1024)]

_CHILD = r"""
import os, sys, time
import numpy as np
sys.path.insert(0, sys.argv[1])
mode, nx, ny, iters = sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
os.environ["LBM_RESIDENT"] = "1" if mode == "resident" else "0"
import jax, jax.numpy as jnp
from lbm_tpu.params import Params
from lbm_tpu.obstacles import generate_obstacles, num_non_obstacles_r
from lbm_tpu.state import initial_state
from lbm_tpu.runner import make_simulate
p = Params(nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
           density=np.float32(0.1), accel=np.float32(0.01),
           omega=np.float32(1.85))
obstacles = generate_obstacles(p.nx, p.ny)
inv = num_non_obstacles_r(obstacles)
obs_dev = jnp.asarray(obstacles)
sim = make_simulate(p, kernel="pallas", n_iters=iters)
c0 = initial_state(p)
compiled = sim.lower(c0, obs_dev, inv).compile()
c, a = compiled(c0, obs_dev, inv)
np.asarray(a)  # untimed first execution (program-load overhead)
best = float("inf")
for _ in range(3):
    c0 = initial_state(p)
    jax.block_until_ready(c0)
    t0 = time.perf_counter()
    c, a = compiled(c0, obs_dev, inv)
    np.asarray(a)  # host fetch fences the timing
    best = min(best, time.perf_counter() - t0)
print("RESULT " + repr(nx * ny * iters / best / 1e9))
"""


def measure(nx, ny, iters, mode, timeout_s=900.0):
    here = str(Path(__file__).resolve().parent.parent)
    try:
        res = subprocess.run(
            [sys.executable, "-c", _CHILD, here, mode,
             str(nx), str(ny), str(iters)],
            capture_output=True, text=True, timeout=timeout_s, cwd=here,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout_s:.0f}s"}
    for line in res.stdout.splitlines():
        if line.startswith("RESULT "):
            return {"glups": float(line[len("RESULT "):])}
    return {"error": (res.stderr.strip().splitlines() or ["no output"])[-1][:300]}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output",
                   default="docs/artifacts/resident_crossover.json")
    p.add_argument("--iters", type=int, default=2000)
    args = p.parse_args(argv)

    results = {
        "method": "2000-iter marginals, best of 3, one subprocess per "
                  "cell; resident forced/disabled via LBM_RESIDENT",
        "floor_note": "auto-selection floors at 4 MiB of state "
                      "(pallas_resident.resident_prefs)",
        "cases": [],
    }
    for nx, ny in GRIDS:
        row = {"grid": f"{nx}x{ny}",
               "state_mb": round(9 * nx * ny * 4 / 1e6, 2)}
        for mode in ("resident", "blocked"):
            r = measure(nx, ny, args.iters, mode)
            row[mode] = r.get("glups", r)
        if all(isinstance(row[m], float) for m in ("resident", "blocked")):
            row["resident_vs_blocked_pct"] = round(
                100.0 * (row["resident"] / row["blocked"] - 1.0), 1
            )
        results["cases"].append(row)
        print(json.dumps(row), flush=True)
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
