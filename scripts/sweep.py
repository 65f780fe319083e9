#!/usr/bin/env python3
"""Benchmark sweep — the TPU analogue of the reference's Slurm rank/thread
sweeps (js_procs/js_1..112, js_threads/js_1..28): runs the standard grids
across kernel and device-count configurations and records JSON results.

Usage:
    python scripts/sweep.py [--grids 128x128 1024x1024 ...]
        [--kernels reference pallas] [--devices 1 2 4 8]
        [--iters N] [--repeats R] [-o sweep_results.json]
        [--platform cpu] (forces an 8-virtual-device CPU platform for
        multi-device rows without TPU hardware, like tests/conftest.py)
"""

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


GRID_SCENES = {
    # nx, ny, iters, accel — from the shipped input_*.params files.
    "128x128": (128, 128, 40000, 0.005),
    "128x256": (128, 256, 40000, 0.005),
    "256x256": (256, 256, 80000, 0.005),
    "1024x1024": (1024, 1024, 20000, 0.01),
    "2048x1024": (2048, 1024, 20000, 0.01),
    "4096x1024": (4096, 1024, 20000, 0.01),
    "8192x1024": (8192, 1024, 20000, 0.01),
    "16384x1024": (16384, 1024, 20000, 0.01),
    # The reference's hybrid-report stress grid (report_mpi/report.tex:859);
    # no shipped .params file, parameters follow the >=1024-wide scenes.
    "131072x128": (131072, 128, 20000, 0.01),
    # Small wide grid for functional (interpret-mode) transposed-x
    # sharded sweep rows — CPU-tractable stand-in for the wide stress
    # grids' sharding structure.
    "512x64": (512, 64, 2000, 0.005),
    # Tiny grids for functional ring-kernel rows: the interpret TPU
    # simulator (which the ring kernel's remote DMAs require on CPU)
    # costs ~ms per cell-step, so ring rows need a far smaller cell x
    # iteration budget than the plain interpret rows above. 128x32 is
    # wide (nx >= 2*ny) so its sharding plan transposes, covering the
    # TransposedRingShardImpl structure.
    "64x64": (64, 64, 100, 0.005),
    "128x32": (128, 32, 100, 0.005),
}

# Grids that exist ONLY for interpret-mode functional rows. Compiling
# a tiny SHARDED pallas program on the real chip crashed the remote
# compile helper and took the TPU session down for an hour+ (CLAUDE.md)
# — refuse rather than risk the shared session.
INTERPRET_ONLY = {"512x64", "64x64", "128x32"}


def run_config(grid, kernel, n_devices, iters, repeats, platform=None):
    import os

    import jax
    import jax.numpy as jnp
    from lbm_tpu.params import Params
    from lbm_tpu.obstacles import generate_obstacles, num_non_obstacles_r
    from lbm_tpu.state import initial_state

    # "ring" = the v9 sharded VMEM-resident ring kernel
    # (parallel/resident_ring.py): the pallas path with
    # LBM_SHARD_RESIDENT=1, always routed through the sharded builders
    # (a 1-device ring closes on itself). "ring-inplace" additionally
    # forces the single-buffer in-place mode (production trigger:
    # ~75-MB shards, e.g. 16384x1024 over 8 devices) on the tiny
    # functional grids.
    ring = kernel in ("ring", "ring-inplace")
    kernel_impl = "pallas" if ring else kernel
    if ring:
        os.environ["LBM_SHARD_RESIDENT"] = "1"
    else:
        os.environ.pop("LBM_SHARD_RESIDENT", None)
    if kernel == "ring-inplace":
        os.environ["LBM_RESIDENT_INPLACE"] = "1"
    else:
        os.environ.pop("LBM_RESIDENT_INPLACE", None)

    nx, ny, default_iters, accel = GRID_SCENES[grid]
    # An environment pinned to CPU (JAX_PLATFORMS=cpu, the documented
    # override) is as safe as --platform cpu — refusing it was a false
    # positive (review finding). Decided from the flag and the env var,
    # NOT jax.default_backend(): probing the backend INITIALISES it,
    # and on a down tunnel this protective guard would hang before it
    # could refuse (CLAUDE.md's default_backend hazard).
    env_cpu = os.environ.get(
        "JAX_PLATFORMS", ""
    ).split(",")[0].strip().lower() == "cpu"
    if env_cpu and platform is None:
        # The axon sitecustomize re-registers the tunnel plugin even
        # when JAX_PLATFORMS=cpu is exported (CLAUDE.md: the env var
        # alone loses to it) — measured here: an env-cpu sweep row
        # recorded backend "tpu". Honour the export with the config
        # override too; without this the guard below would trust an
        # env var the runtime ignores and compile an interpret-only
        # grid on the chip.
        jax.config.update("jax_platforms", "cpu")
    if grid in INTERPRET_ONLY and platform != "cpu" and not env_cpu:
        raise RuntimeError(
            f"{grid} is an interpret-only functional grid; run it "
            "with --platform cpu (tiny sharded Mosaic compiles have "
            "crashed the shared TPU session — CLAUDE.md)"
        )
    iters = iters or min(default_iters, 2000)
    params = Params(nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
                    density=np.float32(0.1), accel=np.float32(accel),
                    omega=np.float32(1.85))
    obstacles = generate_obstacles(nx, ny)
    inv = num_non_obstacles_r(obstacles)
    obs_dev = jnp.asarray(obstacles)
    cells0 = initial_state(params)

    if n_devices > 1 or ring:
        from lbm_tpu.parallel.decomp import make_mesh
        from lbm_tpu.parallel.halo import make_sharded_simulate, shard_inputs

        mesh = make_mesh(n_devices)
        if ring:
            # A non-qualifying config would silently fall back to the
            # blocked path and be recorded under the wrong kernel name
            # — fail the row instead (shared guard, also used by
            # __graft_entry__ and tpu_mosaic_check).
            from lbm_tpu.parallel.resident_ring import ring_planned

            if not ring_planned(params, mesh, iters):
                raise RuntimeError(
                    f"{grid}@{n_devices}dev/{iters}it did not select the "
                    "ring impl"
                )
        simulate = make_sharded_simulate(params, mesh, kernel=kernel_impl)
        # params/kernel select the same placement plan_sharding chose
        # (x-decomposed for wide pallas grids) so the compiled call never
        # reshards inside the timed region.
        cells0, obs_dev = shard_inputs(
            mesh, cells0, obs_dev, params=params, kernel=kernel_impl
        )
    else:
        from lbm_tpu.runner import make_simulate

        simulate = make_simulate(params, kernel=kernel)

    compiled = simulate.lower(cells0, obs_dev, inv).compile()
    c, a = compiled(cells0, obs_dev, inv)
    np.asarray(a)  # untimed first execution (program-load overhead)

    best = float("inf")
    for _ in range(repeats):
        cells0 = initial_state(params)
        if n_devices > 1 or ring:
            from lbm_tpu.parallel.halo import shard_inputs as si

            cells0, _ = si(mesh, cells0, obs_dev, params=params,
                           kernel=kernel_impl)
        jax.block_until_ready(cells0)
        t0 = time.perf_counter()
        c, a = compiled(cells0, obs_dev, inv)
        np.asarray(a)
        best = min(best, time.perf_counter() - t0)
    backend = jax.default_backend()
    row = {
        "grid": grid, "kernel": kernel, "devices": n_devices,
        "iters": iters, "seconds": best,
        "glups": nx * ny * iters / best / 1e9,
        "backend": backend,
    }
    if backend != "tpu":
        # Virtual-device rows prove the sharded program end-to-end but
        # share host cores (and run pallas in interpret mode) — they are
        # NOT a hardware scaling measurement (docs/PERF.md).
        row["mode"] = "functional-not-hardware"
    return row


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--grids", nargs="+", default=["128x128", "256x256", "1024x1024"])
    p.add_argument("--kernels", nargs="+", default=["auto"])
    p.add_argument("--devices", nargs="+", type=int, default=[1])
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("-o", "--output", default="sweep_results.json")
    p.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force the jax platform (cpu provisions a virtual device "
             "mesh sized to max(--devices))",
    )
    p.add_argument(
        "--append", action="store_true",
        help="merge into the existing output file instead of replacing "
             "it (rows with the same grid/kernel/devices/backend are "
             "updated in place)",
    )
    args = p.parse_args(argv)

    if args.platform == "cpu":
        from lbm_tpu.parallel.decomp import provision_virtual_cpu

        provision_virtual_cpu(max(args.devices))

    def key(r):
        return (r.get("grid"), r.get("kernel"), r.get("devices"),
                r.get("backend"))

    out = Path(args.output)
    results = []

    def flush_results():
        # Written after EVERY row: TPU cells run in-process (a hung
        # tunnel call is not an Exception), so incremental writes keep
        # the completed rows if the sweep stalls mid-run.
        rows = results
        if args.append and out.exists():
            merged = {key(r): r for r in json.loads(out.read_text())}
            merged.update({key(r): r for r in results})
            rows = list(merged.values())
        out.write_text(json.dumps(rows, indent=2) + "\n")

    def intended_backend():
        # For ERROR rows (which never reach jax.default_backend()):
        # without a backend field their merge key could never collide
        # with the prior success row's, so a regressed config kept both
        # the stale success AND the new error (review finding). Must
        # return what a SUCCESS row records in the same environment
        # (jax.default_backend()) without initialising a backend: a
        # success row from this very run is the ground truth when one
        # exists; otherwise normalise the explicit platform — the first
        # JAX_PLATFORMS entry, with the axon tunnel plugin registering
        # as 'tpu' (review finding: the old exact-match missed
        # 'axon,cpu' and a bare-CPU machine, leaving stale success rows
        # undeduplicated next to their error rows).
        import os

        for r in results:
            if "error" not in r and "backend" in r:
                return r["backend"]
        if args.platform:
            return args.platform
        first = os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip()
        if first == "axon":
            return "tpu"
        return first.lower() or "unknown"

    for grid, kernel, nd in itertools.product(args.grids, args.kernels, args.devices):
        try:
            r = run_config(grid, kernel, nd, args.iters, args.repeats,
                           platform=args.platform)
        except Exception as exc:  # record failures, keep sweeping
            r = {"grid": grid, "kernel": kernel, "devices": nd,
                 "backend": intended_backend(),
                 "error": f"{type(exc).__name__}: {exc}"}
        print(json.dumps(r), flush=True)
        results.append(r)
        flush_results()
    return 0


if __name__ == "__main__":
    sys.exit(main())
