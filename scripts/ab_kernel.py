"""A/B harness for kernel variants on the real chip.

Runs bench.bench() in a timeout-guarded subprocess per (grid, env)
configuration — the measurement rules (untimed first execution, host
fence, best-of-N) live in bench.py; this script only varies the
trace-time env knobs (LBM_OMEGA_EQ / LBM_PALLAS_DEPTH / LBM_PAIRED_EQ /
LBM_PALLAS_SLOT_BYTES / LBM_PALLAS_VMEM_CAP / LBM_RESIDENT /
LBM_RESIDENT_STEPS / LBM_RESIDENT_INPLACE / LBM_RESIDENT_SHIFT) and
prints one JSON line per cell. The reference's
analogue is its per-version benchmark tables (report_openmp/report.tex).

Usage: python scripts/ab_kernel.py [config ...]
  config = name:nx:ny:iters:ENV=V,ENV=V  (defaults below when absent)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULTS = [
    ("1024sq-base", 1024, 1024, 2000, {"LBM_OMEGA_EQ": "0"}),
    ("1024sq-omega", 1024, 1024, 2000, {"LBM_OMEGA_EQ": "1"}),
    ("16k-base", 16384, 1024, 2000, {"LBM_OMEGA_EQ": "0"}),
    ("16k-omega", 16384, 1024, 2000, {"LBM_OMEGA_EQ": "1"}),
    ("131k-base", 131072, 128, 2000, {"LBM_OMEGA_EQ": "0"}),
    ("131k-omega", 131072, 128, 2000, {"LBM_OMEGA_EQ": "1"}),
]


def parse(arg: str):
    parts = arg.split(":")
    if len(parts) < 4 or len(parts) > 5:
        # Rejecting extras matters: ':'-separated env knobs would
        # silently drop all but the first and record the measurement
        # under the requested name (review finding) — knobs are
        # comma-separated.
        raise SystemExit(
            f"config {arg!r}: expected name:nx:ny:iters[:ENV=V,ENV=V]"
        )
    name, nx, ny, iters, envs = (parts + [""])[:5]
    env = dict(kv.split("=", 1) for kv in envs.split(",") if kv)
    return name, int(nx), int(ny), int(iters), env


def run_one(name, nx, ny, iters, env, repeats=3, timeout_s=1500.0):
    sys.path.insert(0, HERE)
    from bench import measure_subprocess

    t0 = time.time()
    m = measure_subprocess(nx, ny, iters, "auto", repeats, timeout_s,
                           env=env)
    if "glups" in m:
        return {"name": name, "nx": nx, "ny": ny, "iters": iters,
                "env": env, "glups": round(m["glups"], 3),
                "backend": m.get("backend"),
                "wall_s": round(time.time() - t0, 1)}
    return {"name": name, "error": m["error"]}


def main():
    cases = [parse(a) for a in sys.argv[1:]] or DEFAULTS
    for case in cases:
        out = run_one(*case)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
