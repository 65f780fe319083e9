#!/usr/bin/env python3
"""Obstacle mask generator — the reference's generate_obstacles.py as a
proper CLI (boundary walls + optional full-height interior verticals at
nx//4 and (nx//4)*2, generate_obstacles.py:6-20).

Usage: python scripts/generate_obstacles.py WIDTH HEIGHT [--interior-walls]
       [-o out.dat]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lbm_tpu.obstacles import generate_obstacles  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("width", type=int)
    p.add_argument("height", type=int)
    p.add_argument("--interior-walls", action="store_true",
                   help="add vertical walls at x=W//4 and x=(W//4)*2")
    p.add_argument("-o", "--output", default=None,
                   help="output path (default obstacles_WxH.dat)")
    args = p.parse_args(argv)
    out = args.output or f"obstacles_{args.width}x{args.height}.dat"
    mask = generate_obstacles(args.width, args.height, args.interior_walls)
    # Emit in the reference's order: bottom row, top row, right column,
    # left column (then interior walls) so files diff cleanly against it.
    with open(out, "w") as f:
        for i in range(args.width):
            f.write(f"{i} 0 1\n")
        for i in range(args.width):
            f.write(f"{i} {args.height - 1} 1\n")
        for i in range(args.height):
            f.write(f"{args.width - 1} {i} 1\n")
        for i in range(args.height):
            f.write(f"0 {i} 1\n")
        if args.interior_walls:
            for i in range(args.height):
                f.write(f"{args.width // 4} {i} 1\n")
            for i in range(args.height):
                f.write(f"{(args.width // 4) * 2} {i} 1\n")
    print(f"wrote {out} ({int(mask.sum())} unique blocked cells)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
