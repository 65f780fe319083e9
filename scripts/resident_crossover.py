#!/usr/bin/env python3
"""A/B the VMEM-resident kernel (ops/pallas_resident.py) against the
blocked kernel across state sizes. This is the measurement behind the
resident auto-selection floor (pallas_resident.resident_prefs): tiny
states are per-step-latency-bound and run slightly faster blocked,
while states from ~9 MB up gain 11-19% resident.

Each cell runs through scripts/ab_kernel.run_one — i.e. bench.bench()
in a timeout-guarded subprocess with the env override — so the
measurement discipline (untimed first execution, host-fence timing,
best-of-N; docs/PERF.md methodology) lives in exactly one place,
bench.py.

The reference's analogue of this sweep is its per-version timing tables
(report_openmp/report.tex) — every optimisation shipped with the
measurement that justified its default.

Usage: python scripts/resident_crossover.py
       [-o docs/artifacts/resident_crossover.json] [--iters 2000]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ab_kernel import run_one  # noqa: E402

# (nx, ny): the crossover ladder — official small scenes, the 512-class
# midpoints, and the headline grid (state = 9*nx*ny*4 B).
GRIDS = [(128, 128), (128, 256), (256, 256), (512, 512),
         (1024, 512), (1024, 1024)]

# LBM_RESIDENT=1 forces residency below the 4 MiB auto floor (that's
# the point: measuring both sides OF the floor); =0 pins blocked.
MODES = {"resident": {"LBM_RESIDENT": "1"}, "blocked": {"LBM_RESIDENT": "0"}}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output",
                   default="docs/artifacts/resident_crossover.json")
    p.add_argument("--iters", type=int, default=2000)
    args = p.parse_args(argv)

    import bench

    probe = bench._tpu_probe()
    if probe != "tpu":
        # Off-TPU, kernel='auto' resolves to the reference kernel and
        # LBM_RESIDENT is a no-op — both modes would measure the SAME
        # program and write a legitimate-looking ~0% artifact (review
        # finding). This artifact is a hardware measurement; refuse.
        print(json.dumps({
            "error": f"refusing: backend probe = {probe!r} — the "
                     "crossover is a TPU measurement (off-TPU both "
                     "modes run the identical reference kernel)"
        }), file=sys.stderr)
        return 1

    results = {
        "method": "bench.bench() marginals via ab_kernel.run_one (one "
                  "timeout-guarded subprocess per cell, untimed first "
                  "execution, host-fence, best of 3); resident "
                  "forced/disabled via LBM_RESIDENT",
        "iters": args.iters,
        "floor_note": "auto-selection floors at 4 MiB of state "
                      "(pallas_resident.resident_prefs)",
        "cases": [],
    }
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    for nx, ny in GRIDS:
        row = {"grid": f"{nx}x{ny}",
               "state_mb": round(9 * nx * ny * 4 / 1e6, 2)}
        for mode, env in MODES.items():
            r = run_one(f"{nx}x{ny}-{mode}", nx, ny, args.iters, env)
            row[mode] = r["glups"] if "glups" in r else r
            if r.get("backend"):
                row["backend"] = r["backend"]
        if all(isinstance(row[m], float) for m in MODES):
            row["resident_vs_blocked_pct"] = round(
                100.0 * (row["resident"] / row["blocked"] - 1.0), 1
            )
        results["cases"].append(row)
        print(json.dumps(row), flush=True)
        # Flushed after EVERY row, like sweep.py: cells run up to
        # 1500 s each on a flaky tunnel, and losing 11 completed rows
        # to a Ctrl-C on the 12th is sweep.py's documented hazard
        # (review finding).
        out.write_text(json.dumps(results, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
