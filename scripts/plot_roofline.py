#!/usr/bin/env python3
"""Roofline plot from sweep results — the analogue of the reference's
Intel Advisor roofline HTMLs (roofline/) and plots.ipynb analysis:
measured kernel points against the chip's HBM-bandwidth and compute
roofs.

Usage: python scripts/plot_roofline.py [sweep_results.json] [-o roofline.png]
       [--chip v5e]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lbm_tpu.profiling import (  # noqa: E402
    BYTES_PER_CELL_F32_MASK,
    CHIP_PEAKS,
    FLOPS_PER_CELL,
)


def _row_depth(r) -> int:
    """HBM-amortisation depth the default kernel config selects for a
    sweep row (reference kernel: 1; blocked pallas: the temporal-fusion
    depth; VMEM-resident states: G steps per HBM round trip). Hardware
    rows were measured on TPU where resident auto-selection applies —
    including its 4 MiB floor — so mirror that exact policy via the
    backend override (this script may itself run on CPU, where the
    automatic gate would otherwise stay off; forcing LBM_RESIDENT=1
    instead would bypass the floor and mislabel the small grids)."""
    if r.get("kernel") not in ("pallas", "auto"):
        return 1
    import os

    # Depth is recomputed from the DEFAULT kernel policy: leftover A/B
    # exports (exactly what ab_kernel.py sets) would silently re-label
    # every point's arithmetic intensity with a depth the sweep never
    # ran (review finding) — the sweep rows record no env, so a stale
    # export is undetectable from the plot. The knobs are restored
    # afterwards: plotting must not eat the caller's exports (a wrapper
    # that plots and then drives an A/B run would silently lose them).
    knobs = ("LBM_RESIDENT", "LBM_RESIDENT_STEPS",
             "LBM_RESIDENT_INPLACE", "LBM_PALLAS_DEPTH",
             "LBM_PALLAS_SLOT_BYTES", "LBM_SHARD_RESIDENT")
    saved = {k: os.environ.pop(k) for k in knobs if k in os.environ}
    try:
        from lbm_tpu.ops.pallas_fused import make_carry_step
        from lbm_tpu.params import Params

        nx, ny = (int(v) for v in r["grid"].split("x"))
        params = Params(nx=nx, ny=ny, max_iters=r["iters"],
                        reynolds_dim=10, density=0.1, accel=0.01,
                        omega=1.85)
        # The row's recorded backend drives the resident gate — passing
        # it keeps this script from ever initialising a jax backend (the
        # tunnelled TPU backend can hang for an hour when the session is
        # down; plotting must not depend on the chip being up).
        return make_carry_step(
            params, n_iters=r["iters"],
            backend=r.get("backend") or "cpu",
        ).fused
    finally:
        os.environ.update(saved)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sweep", nargs="?", default="sweep_results.json")
    p.add_argument("-o", "--output", default="roofline.png")
    p.add_argument("--chip", default="v5e", choices=sorted(CHIP_PEAKS))
    args = p.parse_args(argv)

    with open(args.sweep) as f:
        rows = json.load(f)
    # Only single-device TPU rows belong on a single-chip roofline: the
    # devices>1 sweep rows AND any backend!=tpu row are functional
    # (interpret-mode) runs, not hardware measurements — plotting them
    # against the v5e roofs would present meaningless points.
    # 'auto' rows are hardware measurements too (sweep.py records the
    # REQUESTED kernel name, and its default is auto — review finding:
    # the 'pallas'-only filter dropped a default sweep's TPU rows).
    results = [
        r for r in rows
        if "error" not in r and r.get("devices", 1) == 1
        and r.get("kernel") in ("pallas", "auto")
        and r.get("backend") == "tpu"
    ]
    skipped = len(rows) - len(results)
    if not results:
        print("no successful sweep results to plot", file=sys.stderr)
        return 1

    peaks = CHIP_PEAKS[args.chip]
    ai_unfused = FLOPS_PER_CELL / BYTES_PER_CELL_F32_MASK  # flops per byte

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(figsize=(8, 6))
    # Roofs: memory (slope = HBM GB/s) and compute (flat).
    xs = np.logspace(-2, 3, 256)
    mem_roof = xs * peaks["hbm_gbps"]  # GFLOP/s
    comp_roof = np.full_like(xs, peaks["tflops_peak"] * 1e3)
    ax.plot(xs, np.minimum(mem_roof, comp_roof), "k-", lw=2,
            label=f"{args.chip} roofline")
    ax.axvline(ai_unfused, color="grey", ls=":", lw=1)
    ax.text(ai_unfused * 1.1, 10, f"unfused AI = {ai_unfused:.2f} F/B",
            rotation=90, va="bottom", fontsize=8, color="grey")

    # Each point's EFFECTIVE arithmetic intensity accounts for the
    # temporal-fusion depth the default kernel config selects for that
    # grid (depth D moves 1/D of the per-step bytes), matching
    # profiling.roofline_report's steps_per_pass — without this, fused
    # points plot impossibly above the memory roof.
    for idx, r in enumerate(results):
        depth = _row_depth(r)
        ai = FLOPS_PER_CELL / (BYTES_PER_CELL_F32_MASK / depth)
        gflops = r["glups"] * FLOPS_PER_CELL  # GFLOP/s
        ax.plot([ai], [gflops], "o", ms=7)
        label = f"{r['grid']} ({r['glups']:.1f} GLUPS"
        label += f", D{depth})" if depth > 1 else ")"
        # Stagger label rows: clustered points otherwise overprint.
        ax.annotate(
            label, (ai, gflops), textcoords="offset points",
            xytext=(8, -4 - 9 * (idx % 4)), fontsize=8,
        )

    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("arithmetic intensity (FLOP/byte)")
    ax.set_ylabel("GFLOP/s")
    ax.set_title("lbm_tpu fused collide-stream kernel vs roofline")
    ax.legend(loc="upper left", fontsize=8)
    ax.grid(True, which="both", alpha=0.25)
    fig.savefig(args.output, dpi=150, bbox_inches="tight")
    print(f"wrote {args.output} ({len(results)} points, "
          f"{skipped} non-pallas/multi-device/error rows skipped)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
