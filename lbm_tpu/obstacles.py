"""Obstacle mask loading and generation.

The reference reads obstacle files as ``x y 1`` integer triplets scattered
into a row-major mask (``d2q9-bgk.c:626-644``) and ships a generator that
draws boundary walls plus optional interior verticals
(``generate_obstacles.py:1-21``). Here the mask is a ``(ny, nx)`` bool array;
sharded runs slice it per device instead of re-reading per rank.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_obstacles(path: str | Path, nx: int, ny: int) -> np.ndarray:
    """Parse an obstacle ``.dat`` file into a (ny, nx) bool mask.

    Applies the reference's validation: 3 values per line, coords in range,
    blocked flag == 1 (``d2q9-bgk.c:628-633``). Uses the native C parser
    when the extension is built (same validation, same error strings —
    tests/test_native.py asserts mask equality with this numpy path);
    the 16.7M-cell masks parse ~10x faster there.
    """
    path = Path(path)
    from lbm_tpu.io import _native

    if _native is not None and path.is_file():
        mask8 = np.zeros((ny, nx), dtype=np.uint8)
        _native.read_obstacles(str(path), nx, ny, mask8)
        return mask8.astype(bool)
    try:
        tokens = Path(path).read_text().split()
    except OSError as exc:
        raise FileNotFoundError(f"could not open input obstacles file: {path}") from exc
    if not tokens:
        return np.zeros((ny, nx), dtype=bool)
    try:
        flat = np.array([int(t) for t in tokens], dtype=np.int64)
    except ValueError as exc:
        raise ValueError("expected 3 values per line in obstacle file") from exc
    if flat.size % 3:
        # Token-stream triplets, like the reference's fscanf
        # (d2q9-bgk.c:628) and the native parser — newline placement is
        # not significant (review finding: np.loadtxt rejected
        # multi-triplet lines the native path accepts).
        raise ValueError("expected 3 values per line in obstacle file")
    raw = flat.reshape(-1, 3)
    xx, yy, blocked = raw[:, 0], raw[:, 1], raw[:, 2]
    if np.any((xx < 0) | (xx > nx - 1)):
        raise ValueError("obstacle x-coord out of range")
    if np.any((yy < 0) | (yy > ny - 1)):
        raise ValueError("obstacle y-coord out of range")
    if np.any(blocked != 1):
        raise ValueError("obstacle blocked value should be 1")
    mask = np.zeros((ny, nx), dtype=bool)
    mask[yy, xx] = True
    return mask


def num_non_obstacles_r(mask: np.ndarray, dtype=np.float32):
    """1 / (number of fluid cells), the av_vels normaliser (d2q9-bgk.c:642).

    The reference divides by ``nx*ny - num_obstacle_lines`` where the count
    is of *file lines*; with well-formed (duplicate-free) files that equals
    the popcount of the mask used here.
    """
    d = np.dtype(dtype).type
    fluid = mask.size - int(np.count_nonzero(mask))
    return d(1.0) / d(fluid)


def generate_obstacles(
    nx: int, ny: int, interior_walls: bool = False
) -> np.ndarray:
    """Build the reference generator's mask: walls along rows 0 and ny-1 and
    columns 0 and nx-1, plus (optionally) full-height interior vertical walls
    at x = nx//4 and x = (nx//4)*2 (``generate_obstacles.py:6-20``).
    """
    mask = np.zeros((ny, nx), dtype=bool)
    mask[0, :] = True
    mask[ny - 1, :] = True
    mask[:, 0] = True
    mask[:, nx - 1] = True
    if interior_walls:
        mask[:, nx // 4] = True
        mask[:, (nx // 4) * 2] = True
    return mask


def write_obstacles(path: str | Path, mask: np.ndarray) -> None:
    """Write a mask back out in the reference's ``x y 1`` triplet format."""
    yy, xx = np.nonzero(mask)
    with open(path, "w") as fh:
        for x, y in zip(xx, yy):
            fh.write(f"{x} {y} 1\n")
