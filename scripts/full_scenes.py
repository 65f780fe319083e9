#!/usr/bin/env python3
"""Full-scale cross-kernel validation for the goldenless scenes.

The reference ships 8 official scenes but golden outputs for only 4
(check/ data; check_commands.txt:1-5); its four production-size grids
(2048x1024 .. 16384x1024, input_*.params) were validated on the cluster
only by eyeballing Reynolds numbers and timing sweeps (js_procs/). This
harness gives those scenes a real acceptance gate the reference never
had: run each FULL scene end-to-end twice — once on the production
(auto-selected Pallas) kernel and once on the portable jnp reference
path — and require the two 20000-step av_vels trajectories and final
|u| fields to agree by check.py's own max-%-diff formula
(check/check.py:83-99) within a budget far under its 1% tolerance.

Because both kernels share `_bgk_update` (ops/reference.py), the only
legal divergence is f32 reassociation of block/reduction order, so the
gate is tight (default 0.3% — same budget as the golden drift gate).

Artifact: docs/artifacts/full_scenes.json (scene -> reynolds, GLUPS,
max %diffs, pass). TPU-intended (the jnp leg of 16384x1024 is ~1 min on
one v5e chip and hours on CPU); each leg runs in its own timeout-guarded
subprocess so a half-dead tunnel cannot hang the harness (CLAUDE.md).

Usage: python scripts/full_scenes.py [--scenes 2048x1024 ...]
           [--scene-dir /root/reference] [--gate-pct 0.3]
           [-o docs/artifacts/full_scenes.json]
"""

import argparse
import json
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# The four official scenes whose goldens don't exist (the other four are
# gated against the reference's own data by scripts/validate_scenes.py).
SCENES = ["2048x1024", "4096x1024", "8192x1024", "16384x1024"]
GATE_PCT = 0.3


def _child_env(platform: str | None) -> dict | None:
    """Environment for a CLI leg. ``--platform cpu`` must also strip the
    axon sitecustomize from PYTHONPATH: the tunnel plugin re-registers
    itself programmatically and beats the JAX_PLATFORMS env var in a
    child process (CLAUDE.md; same pattern as the CLI subprocess
    tests)."""
    if platform is None:
        return None
    import os

    env = dict(os.environ)
    if platform == "tpu":
        # The tunnelled TPU registers its platform as 'axon', not
        # 'tpu' (CLAUDE.md) — exporting JAX_PLATFORMS=tpu there fails
        # the plugin lookup. '--platform tpu' therefore means "the
        # ambient accelerator": inherit the environment unchanged
        # unless it is pinned to cpu, which we refuse loudly rather
        # than silently running the hours-long CPU legs.
        ambient = env.get("JAX_PLATFORMS", "").split(",")[0].strip()
        if ambient.lower() == "cpu":
            raise RuntimeError(
                "--platform tpu requested but JAX_PLATFORMS=cpu is "
                "exported; unset it (or export your TPU platform "
                "name) so the CLI legs can see the accelerator"
            )
        return env
    env["JAX_PLATFORMS"] = platform
    if platform == "cpu":
        parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                 if p and "axon_site" not in p]
        env["PYTHONPATH"] = os.pathsep.join(parts)
    return env


def _run_cli(scene: str, scene_dir: Path, kernel: str, workdir: Path,
             timeout: float, platform: str | None = None,
             extra_args: list | None = None) -> dict:
    """One end-to-end CLI run; returns parsed stdout + output paths."""
    av = workdir / f"{scene}.{kernel}.av_vels.dat"
    fs = workdir / f"{scene}.{kernel}.final_state.dat"
    cmd = [
        sys.executable, "-m", "lbm_tpu",
        str(scene_dir / f"input_{scene}.params"),
        str(scene_dir / f"obstacles_{scene}.dat"),
        "--kernel", kernel,
        "--av-vels-file", str(av),
        "--final-state-file", str(fs),
        *(extra_args or []),
    ]
    t0 = time.perf_counter()
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                             timeout=timeout, env=_child_env(platform))
    except subprocess.TimeoutExpired:
        # Return (don't raise) so a timed-out STALL RETRY falls into the
        # "keep the slow-but-complete run" branch instead of aborting the
        # scene, and a timed-out first leg gets an infra-classified row
        # ("timed out" is in fail_row's infra markers).
        return {"error": f"CLI leg timed out after {timeout:.0f}s",
                "wall_seconds": round(time.perf_counter() - t0, 2)}
    wall = time.perf_counter() - t0
    if res.returncode != 0:
        return {"error": res.stderr[-1000:], "wall_seconds": round(wall, 2)}
    m_rey = re.search(r"Reynolds number:\s+(\S+)", res.stdout)
    m_cmp = re.search(r"Compute time:\s+(\S+)", res.stdout)
    if m_rey is None or m_cmp is None:
        return {"error": f"unexpected CLI stdout: {res.stdout[-500:]!r}",
                "wall_seconds": round(wall, 2)}
    return {
        "reynolds": float(m_rey.group(1)),
        "compute_seconds": float(m_cmp.group(1)),
        "wall_seconds": round(wall, 2),
        "av_vels_file": av,
        "final_state_file": fs,
    }


def _scene_cells_iters(scene: str, scene_dir: Path) -> tuple:
    from lbm_tpu.params import load_params

    p = load_params(scene_dir / f"input_{scene}.params")
    return p.nx * p.ny, p.max_iters


def _steady_state_glups(scene: str, scene_dir: Path,
                        kernel: str = "auto") -> dict:
    """Measure the scene shape's warm steady-state rate with the bench
    harness's discipline (untimed first execution, host-fetch-fenced
    timing, best of repeats — bench.measure_subprocess, THE shared
    measurement path). Cheap after a full CLI leg: the compilation
    cache is warm, so this is ~one program load + a few 2000-step
    executions."""
    from lbm_tpu.params import load_params

    p = load_params(scene_dir / f"input_{scene}.params")
    from bench import measure_subprocess

    m = measure_subprocess(p.nx, p.ny, 2000, kernel=kernel, repeats=2,
                           timeout_s=900.0)
    if "glups" in m:
        return {"steady_state_glups": round(m["glups"], 2),
                "backend": m.get("backend")}
    return {"steady_state_error": m["error"][:300]}


def run_scene(scene: str, scene_dir: Path, workdir: Path,
              gate_pct: float, timeout: float,
              platform: str | None = None,
              jnp_chunk_iters: int | None = None,
              stall_retries: int = 1) -> dict:
    from lbm_tpu.io import _diff

    out = {"scene": scene, "gate_pct": gate_pct}
    legs = {}
    cells, iters = _scene_cells_iters(scene, scene_dir)

    def leg_row(leg):
        return {
            "reynolds": leg["reynolds"],
            "compute_seconds": leg["compute_seconds"],
            "wall_seconds": leg["wall_seconds"],
            "glups": round(cells * iters / leg["compute_seconds"] / 1e9, 2),
        }

    def fail_row(kernel, leg):
        # Distinguish infrastructure loss (tunnelled-TPU worker
        # crash/restart, unavailability — rerunnable) from a
        # deterministic failure of the kernels themselves, so a
        # flaky tunnel doesn't read as a correctness regression in
        # the artifact (same split as bench.py's retry logic).
        infra = any(s in leg["error"] for s in (
            "UNAVAILABLE", "worker process crashed", "timed out",
            "DEADLINE_EXCEEDED"))
        out.update({"pass": False, "kernel": kernel,
                    "error": leg["error"],
                    "error_kind": "infra" if infra else "deterministic"})
        return out

    # Production leg first, with stall detection (round-3 verdict: a leg
    # whose compute_seconds implied a rate ~50x below steady state was
    # recorded as the scene's GLUPS — the tunnelled TPU's per-program
    # first-execution stall, and degraded-session periods, land in the
    # single-shot Compute phase). After the run, measure the shape's
    # true steady-state rate (warm cache; untimed first execution);
    # if the leg's implied rate is under half of it, re-run the leg up
    # to ``stall_retries`` times and keep the fastest, annotating the
    # row ``stall_dominated`` if it never recovers. Skipped on forced-
    # CPU runs (tests), where there is no stall to detect and the
    # steady measurement would dwarf the legs.
    leg = _run_cli(scene, scene_dir, "auto", workdir, timeout,
                   platform=platform)
    if "error" in leg:
        return fail_row("auto", leg)
    steady = {} if platform == "cpu" else _steady_state_glups(
        scene, scene_dir
    )
    ss = steady.get("steady_state_glups")
    attempts = 0
    while (ss and cells * iters / leg["compute_seconds"] / 1e9 < 0.5 * ss
           and attempts < stall_retries):
        attempts += 1
        retry = _run_cli(scene, scene_dir, "auto", workdir, timeout,
                         platform=platform)
        if "error" in retry:
            break  # keep the slow-but-complete run
        if retry["compute_seconds"] < leg["compute_seconds"]:
            leg = retry
    legs["auto"] = leg
    out["production"] = leg_row(leg)
    out["production"].update(steady)
    if ss:
        implied = out["production"]["glups"]
        out["production"]["stall_dominated"] = implied < 0.5 * ss
        if attempts:
            out["production"]["stall_retries"] = attempts

    # The jnp leg of the big scenes runs minutes in ONE device
    # execution, which the tunnelled TPU's transport reproducibly
    # kills (worker crash at 16384x1024, ~145 s); --chunk-iters
    # bounds each execution with an identical trajectory. The
    # production leg stays unchunked — it is the timed artifact.
    extra = (["--chunk-iters", str(jnp_chunk_iters)]
             if jnp_chunk_iters else None)
    leg = _run_cli(scene, scene_dir, "reference", workdir, timeout,
                   platform=platform, extra_args=extra)
    if "error" in leg:
        return fail_row("reference", leg)
    legs["reference"] = leg
    out["jnp_reference"] = leg_row(leg)

    # Cross-kernel trajectory fingerprint: av_vels col 1 (one scalar per
    # timestep — the whole trajectory), final_state col 5 (|u| per cell),
    # compared with check.py's formula via the library's single
    # implementation of it (io._diff, the same one the golden gates use).
    ref_av = np.loadtxt(legs["reference"]["av_vels_file"], usecols=[1])
    sim_av = np.loadtxt(legs["auto"]["av_vels_file"], usecols=[1])
    assert ref_av.size == sim_av.size, "step-count mismatch between legs"
    ref_u = np.loadtxt(legs["reference"]["final_state_file"], usecols=[5])
    sim_u = np.loadtxt(legs["auto"]["final_state_file"], usecols=[5])
    assert ref_u.size == sim_u.size, "cell-count mismatch between legs"
    av_pct = abs(float(_diff(ref_av, sim_av, gate_pct).max_diff_pcnt))
    u_pct = abs(float(_diff(ref_u, sim_u, gate_pct).max_diff_pcnt))
    out["max_av_vels_pct"] = av_pct
    out["max_final_state_pct"] = u_pct
    out["pass"] = av_pct <= gate_pct and u_pct <= gate_pct
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenes", nargs="+", default=SCENES)
    p.add_argument("--scene-dir", default="/root/reference",
                   help="directory holding input_*.params / "
                        "obstacles_*.dat (tests point this at tiny "
                        "synthetic scenes)")
    p.add_argument("--gate-pct", type=float, default=GATE_PCT)
    p.add_argument("--timeout", type=float, default=3600.0,
                   help="per-leg subprocess timeout (first execution on "
                        "the tunnelled TPU can stall minutes)")
    p.add_argument("-o", "--output", default="docs/artifacts/full_scenes.json")
    p.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force the jax platform in the CLI legs (tests use cpu; "
             "the artifact is TPU-intended)",
    )
    p.add_argument(
        "--jnp-chunk-iters", type=int, default=2000, metavar="N",
        help="bound the jnp leg's single device executions to N steps "
             "(0 disables); identical trajectory, dodges the tunnelled "
             "TPU's long-execution watchdog",
    )
    p.add_argument(
        "--append", action="store_true",
        help="merge into the existing artifact: re-run scenes replace "
             "their rows, other scenes' rows are kept",
    )
    p.add_argument(
        "--stall-retries", type=int, default=1, metavar="N",
        help="re-run a production leg up to N times when its implied "
             "rate is under half the measured steady-state GLUPS "
             "(stall detection; 0 disables retries but still annotates)",
    )
    args = p.parse_args(argv)

    results = {
        "gate_pct": args.gate_pct,
        "note": (
            "cross-kernel acceptance for the goldenless official scenes: "
            "production (auto Pallas) vs portable jnp trajectories over "
            "the full scene length, check.py's max-%-diff formula. "
            "production.steady_state_glups is the shape's warm rate via "
            "the bench harness (untimed first execution); legs whose "
            "single-shot compute implied <0.5x of it were retried and "
            "are flagged stall_dominated if they never recovered "
            "(the tunnelled TPU's first-execution stall, docs/PERF.md "
            "methodology #4)"
        ),
        "scenes": [],
    }
    with tempfile.TemporaryDirectory() as td:
        for scene in args.scenes:
            try:
                r = run_scene(scene, Path(args.scene_dir).resolve(), Path(td),
                              args.gate_pct, args.timeout,
                              platform=args.platform,
                              jnp_chunk_iters=args.jnp_chunk_iters or None,
                              stall_retries=args.stall_retries)
            except Exception as exc:  # record, keep going
                r = {"scene": scene, "pass": False,
                     "error": f"{type(exc).__name__}: {exc}"[:500]}
            print(json.dumps(r), flush=True)
            results["scenes"].append(r)
    out = Path(args.output)
    if args.append and out.exists():
        prev = json.loads(out.read_text())
        redone = {s["scene"] for s in results["scenes"]}
        kept = [s for s in prev.get("scenes", []) if s["scene"] not in redone]
        results["scenes"] = kept + results["scenes"]
    results["ok"] = all(s.get("pass") for s in results["scenes"])
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(f"{'PASS' if results['ok'] else 'FAIL'} -> {out}")
    return 0 if results["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
