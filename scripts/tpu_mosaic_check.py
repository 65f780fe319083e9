#!/usr/bin/env python3
"""Prove the sharded pallas program (shard_map + edge-array halo logic)
compiles under real Mosaic and reproduces the unsharded trajectory on
the TPU — de-risking the multi-chip path whose functional coverage
otherwise runs interpret-mode on CPU (tests/test_sharded.py).

A 1-device mesh keeps the shard_map/ppermute program structure (the
reference's collated result had to be identical regardless of rank
count, d2q9-bgk.c:395-447); the kernel inside is the production Mosaic
binary, including the dynamic accel-mask variant (row sharding) and the
lane-accel transposed variant (x sharding).

Usage: python scripts/tpu_mosaic_check.py [-o docs/artifacts/mosaic_shardmap.json]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def check_case(name, nx, ny, iters, ring=False):
    """``ring`` = False (blocked seam-halo path), True (assert the
    planner selects the v9 ring impl), or "fallback" (LBM_SHARD_RESIDENT
    is ON but the planner must REFUSE the ring — the measured
    transposed-in-place spill gate, ring_prefs — and run the blocked
    path instead)."""
    import os

    import jax

    from lbm_tpu.obstacles import generate_obstacles
    from lbm_tpu.params import Params
    from lbm_tpu.parallel.decomp import make_mesh
    from lbm_tpu.parallel.halo import plan_sharding
    from lbm_tpu.runner import run_simulation

    params = Params(
        nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
        density=np.float32(0.1), accel=np.float32(0.005),
        omega=np.float32(1.85),
    )
    obstacles = generate_obstacles(nx, ny)
    mesh = make_mesh(1)
    if ring:
        # v9 resident-ring kernel on a 1-device mesh: RDMA is skipped
        # (the ring closes locally) but everything else in the Mosaic
        # binary — VMEM-resident pair loop, per-load forcing of staged
        # seam rows, SMEM tot stores — is the production structure.
        os.environ["LBM_SHARD_RESIDENT"] = "1"
    else:
        os.environ.pop("LBM_SHARD_RESIDENT", None)
    transposed, decomp, _, _ = plan_sharding(params, mesh, "pallas")
    buffer_mode = None
    if ring:
        from lbm_tpu.parallel import resident_ring as rr

        planned = rr.ring_planned(params, mesh, iters)
        if ring == "fallback":
            assert not planned, (
                f"{name}: the spill gate should have refused the ring"
            )
        else:
            assert planned, (
                f"{name}: planner did not select the ring impl"
            )
            rows, lanes = (nx, ny) if transposed else (ny, nx)
            buffer_mode = rr.ring_buffer_mode(rows, lanes,
                                              transposed=transposed)

    base = run_simulation(params, obstacles, kernel="reference")
    solo = run_simulation(params, obstacles, kernel="pallas")
    sharded = run_simulation(params, obstacles, kernel="pallas", mesh=mesh)

    def av_pct(a, b):
        return float(np.max(100.0 * np.abs(
            (a.av_vels - b.av_vels)
            / np.where(a.av_vels == 0, 1.0, a.av_vels)
        )))

    def cells_max(a, b):
        return float(np.max(np.abs(a.cells - b.cells)))

    # vs the unsharded Mosaic kernel: for the blocked sharded path the
    # shard_map wrapper must be numerically transparent (same kernel,
    # same block math — bit-level gates). The ring case compares a
    # DIFFERENT kernel (its per-step tot sums blocks in
    # interior-then-boundary order, and the solo path runs the
    # blocked/resident kernel), so its gate is f32-reassociation-level,
    # not bit-level.
    wrap_av, wrap_cells = av_pct(solo, sharded), cells_max(solo, sharded)
    # vs the jnp reference: physics agreement (f32 reassociation drift
    # only; the scene acceptance gate is 1%).
    phys_av, phys_cells = av_pct(base, sharded), cells_max(base, sharded)
    # "fallback" runs the SAME blocked kernel on both sides (the ring
    # was refused), so it takes the blocked path's bit-level gate, not
    # the ring's reassociation-level one.
    wrap_av_gate, wrap_cells_gate = (
        (5e-3, 1e-5) if ring is True else (1e-4, 1e-6)
    )
    ok = bool(
        wrap_av < wrap_av_gate and wrap_cells < wrap_cells_gate
        and phys_av < 0.1 and phys_cells < 1e-5
    )
    return {
        "case": name,
        "grid": f"{nx}x{ny}",
        "iters": iters,
        "backend": jax.default_backend(),
        "transposed_plan": bool(transposed),
        "ring_buffer_mode": buffer_mode,
        "vs_unsharded_pallas": {
            "max_av_vels_pct": wrap_av, "max_cells_abs": wrap_cells,
        },
        "vs_jnp_reference": {
            "max_av_vels_pct": phys_av, "max_cells_abs": phys_cells,
        },
        "compute_seconds": sharded.timings["compute"],
        "ok": ok,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output",
                   default="docs/artifacts/mosaic_shardmap.json")
    p.add_argument("--iters", type=int, default=200)
    args = p.parse_args(argv)

    import jax

    results = {"backend": jax.default_backend(), "devices": len(jax.devices())}
    if results["backend"] != "tpu":
        # This script's entire purpose is proving the sharded programs
        # under REAL Mosaic; on any other backend the cases run in
        # interpret mode and would overwrite the committed hardware
        # proof with ok:true that proved nothing (review finding).
        results.update(ok=False, error=(
            f"refusing to run on backend {results['backend']!r}: the "
            "artifact is a hardware proof (interpret-mode coverage "
            "lives in tests/)"
        ))
        print(json.dumps(results, indent=2))
        return 1
    cases = [
        # Row-sharded plan: Mosaic-compiles the dynamic accel-mask kernel.
        ("pallas/rows", 1024, 1024, False),
        # Transposed x-sharded plan: lane-accel kernel + SIGMA transpose.
        ("pallas/transposed-x", 4096, 512, False),
        # v9 resident-ring kernel (LBM_SHARD_RESIDENT=1): grids sized so
        # the SINGLE shard stays VMEM-resident (~19 MB state; 1024x1024
        # would need two 37.7 MB buffers + slack > the scoped cap).
        ("pallas/resident-ring", 512, 1024, True),
        ("pallas/resident-ring-x", 2048, 256, True),
        # Single-buffer IN-PLACE ring mode (auto-selected when two
        # buffers overflow the scoped cap): the exact per-shard shape
        # of 16384x1024 row-sharded over 8 devices (2048 rows x 1024
        # lanes), so a pass proves the Mosaic binary the multi-chip
        # in-place ring would run.
        ("pallas/resident-ring-inplace", 1024, 2048, True),
        # The OTHER production in-place shape (131072x128 transposed
        # over 8 -> 16384 rows x 128 lanes) is measured-refused:
        # transposed in-place register spill OOMs the 128-MiB VMEM
        # there (by 0.85 MB) and spill-thrashes at half size, so
        # ring_prefs gates it and the planner must fall back to the
        # blocked seam-halo path (whose depth-8 transposed kernel IS
        # the 131072x128 headline) even with the ring opted in.
        ("pallas/resident-ring-inplace-x-fallback", 16384, 128,
         "fallback"),
    ]
    # Per-case error capture so one failed Mosaic compile still yields a
    # written artifact with the other cases' results (a hung device call
    # is not an Exception — bound the whole script with `timeout` when
    # the tunnel is flaky, CLAUDE.md).
    results["cases"] = []
    for name, nx, ny, ring in cases:
        try:
            results["cases"].append(
                check_case(name, nx, ny, args.iters, ring=ring)
            )
        except Exception as exc:  # noqa: BLE001 — recorded, not hidden
            results["cases"].append(
                {"case": name, "ok": False, "error": repr(exc)[:500]}
            )
    results["ok"] = all(c["ok"] for c in results["cases"])
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))
    return 0 if results["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
