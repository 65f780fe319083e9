#!/usr/bin/env python3
"""Velocity heat-map of a final_state.dat — the reference's gnuplot
final_state.plt ("plot 'final_state.dat' using 1:2:5 with image",
final_state.plt:13) as matplotlib.

Usage: python scripts/plot_final_state.py [final_state.dat] [-o final_state.png]
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("final_state", nargs="?", default="final_state.dat")
    p.add_argument("-o", "--output", default="final_state.png")
    p.add_argument("--column", type=int, default=4,
                   help="0-based data column to plot (default 4 = |u|, "
                        "matching gnuplot's 1-based 'using 1:2:5')")
    args = p.parse_args(argv)

    data = np.loadtxt(args.final_state)
    ii = data[:, 0].astype(int)
    jj = data[:, 1].astype(int)
    val = data[:, args.column]
    nx, ny = ii.max() + 1, jj.max() + 1
    img = np.zeros((ny, nx))
    img[jj, ii] = val

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # Clamp the figure height: imshow's aspect='equal' already enforces
    # the cell aspect inside the axes, and 8*ny/nx degenerates to a
    # sliver for the wide scenes (131072x128 -> 0.008 in).
    fig, ax = plt.subplots(figsize=(8, min(max(8 * ny / nx, 2.0), 16.0)))
    im = ax.imshow(img, origin="lower", aspect="equal", interpolation="nearest")
    ax.set_title("Fluid Velocity")
    ax.set_xlabel("cell # along x-dimension")
    ax.set_ylabel("cell # along y-dimension")
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.savefig(args.output, dpi=150, bbox_inches="tight")
    print(f"wrote {args.output} ({nx}x{ny})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
