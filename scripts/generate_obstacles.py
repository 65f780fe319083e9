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
    w, h = args.width, args.height
    # Emit in the reference's order: bottom row, top row, right column,
    # left column (then interior walls) so files diff cleanly against it
    # (duplicate corners included, like the reference).
    coords = [(i, 0) for i in range(w)]
    coords += [(i, h - 1) for i in range(w)]
    coords += [(w - 1, j) for j in range(h)]
    coords += [(0, j) for j in range(h)]
    if args.interior_walls:
        coords += [(w // 4, j) for j in range(h)]
        coords += [((w // 4) * 2, j) for j in range(h)]
    # The count comes from the EMITTED coordinates; the library mask is
    # a consistency gate, so a drift between the two implementations is
    # a loud error rather than a silently-wrong file (review finding).
    # Gated BEFORE the write: failing after would leave the drifted
    # file on disk for a timestamp-driven consumer despite the nonzero
    # exit (review finding).
    mask = generate_obstacles(w, h, args.interior_walls)
    written = set(coords)
    from_mask = {(int(x), int(y)) for y, x in zip(*mask.nonzero())}
    if written != from_mask:
        raise SystemExit(
            f"emitted coordinates disagree with lbm_tpu.obstacles."
            f"generate_obstacles ({len(written ^ from_mask)} cells differ)"
        )
    with open(out, "w") as f:
        for x, y in coords:
            f.write(f"{x} {y} 1\n")
    print(f"wrote {out} ({len(written)} unique blocked cells)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
