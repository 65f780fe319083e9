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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sweep", nargs="?", default="sweep_results.json")
    p.add_argument("-o", "--output", default="roofline.png")
    p.add_argument("--chip", default="v5e", choices=sorted(CHIP_PEAKS))
    args = p.parse_args(argv)

    with open(args.sweep) as f:
        results = [r for r in json.load(f) if "error" not in r]
    if not results:
        print("no successful sweep results to plot", file=sys.stderr)
        return 1

    peaks = CHIP_PEAKS[args.chip]
    ai = FLOPS_PER_CELL / BYTES_PER_CELL_F32_MASK  # flops per byte

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
    ax.axvline(ai, color="grey", ls=":", lw=1)
    ax.text(ai * 1.1, 10, f"fused step AI = {ai:.2f} F/B", rotation=90,
            va="bottom", fontsize=8, color="grey")

    for r in results:
        gflops = r["glups"] * FLOPS_PER_CELL  # GFLOP/s
        ax.plot([ai], [gflops], "o", ms=7)
        ax.annotate(
            f"{r['grid']} ({r['glups']:.1f} GLUPS)",
            (ai, gflops), textcoords="offset points", xytext=(8, -4),
            fontsize=8,
        )

    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("arithmetic intensity (FLOP/byte)")
    ax.set_ylabel("GFLOP/s")
    ax.set_title("lbm_tpu fused collide-stream kernel vs roofline")
    ax.legend(loc="upper left", fontsize=8)
    ax.grid(True, which="both", alpha=0.25)
    fig.savefig(args.output, dpi=150, bbox_inches="tight")
    print(f"wrote {args.output} ({len(results)} points)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
