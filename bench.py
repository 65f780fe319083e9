"""Headline benchmark: GLUPS (giga lattice-updates per second) at
1024x1024 on the available accelerator, vs the reference's best cluster
result (6.2 GLUPS: 1024^2 x 20000 iters / 3.38 s on 112 Broadwell cores,
report_mpi/report.tex:109-112, BASELINE.md).

The headline JSON {"metric", "value", "unit", "vs_baseline"} is printed
the MOMENT the first successful measurement lands (round-3 postmortem:
an outer driver timeout killed the old end-of-run print before any line
appeared — BENCH_r03.json rc=124, empty). On TPU, secondary JSON lines
then follow for the reference's stress grids — 131072x128 first (vs the
reference's 4-node hybrid: 445.66 s / 20000 iters = 0.753 GLUPS,
report_mpi/report.tex:859), then 16384x1024 (the weak-scaling
north-star shape, vs the same 6.2 GLUPS cluster rate) — and the
headline is re-printed after EVERY stress line, so the driver's
last-complete-JSON-line parse lands on the 1024^2 headline no matter
where a kill falls (BENCH_r04 rc=124 recorded a stress row instead).

Measurement rules for the tunnelled TPU (docs/PERF.md): state is created
on-device (host uploads run ~35 MB/s), the freshly compiled program gets
one untimed execution (remote program load costs ~70-120 s), timing is
fenced by fetching av_vels to host (block_until_ready alone can return
early on donated outputs), and the best of several repeats is reported.
The TPU session can be down for stretches; retry before falling back.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_GLUPS = 6.2  # reference's 112-core MPI best at 1024^2
BASELINE_GLUPS_WIDE = 0.753  # 131072x128: 4-node hybrid, 445.66 s / 20000

# Stress grids (short-iteration steady-state rate): the reference's
# hardest cases, where >=600 MB states used to run at ~half rate.
# 131072x128 runs FIRST: when the driver's window truncates phase 2,
# the grid with the stalest driver capture should be the one that made
# it out (VERDICT r4 — the r04 kill cost exactly this row, leaving
# r02's 27.75 as its last driver evidence).
STRESS_GRIDS = [
    ("GLUPS_131072x128", 131072, 128, 2000, BASELINE_GLUPS_WIDE),
    ("GLUPS_16384x1024", 16384, 1024, 2000, BASELINE_GLUPS),
]


def _enable_compilation_cache() -> None:
    """Persist compiled programs (LBM_COMPILATION_CACHE overrides the
    location, empty string disables). Compiles are outside the timed
    region, but the ~40-120 s remote compile per program is the main
    exposure to tunnel flakiness on repeat benches — a warm cache skips
    it entirely."""
    import os

    cache = os.environ.get("LBM_COMPILATION_CACHE", "/root/repo/.jax_cache")
    if cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def bench(nx: int = 1024, ny: int = 1024, iters: int = 10000,
          kernel: str = "auto", repeats: int = 3):
    import jax
    import jax.numpy as jnp

    _enable_compilation_cache()

    from lbm_tpu.obstacles import generate_obstacles, num_non_obstacles_r
    from lbm_tpu.params import Params
    from lbm_tpu.runner import make_simulate
    from lbm_tpu.state import initial_state

    params = Params(
        nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
        density=np.float32(0.1), accel=np.float32(0.01), omega=np.float32(1.85),
    )
    obstacles = generate_obstacles(nx, ny)
    inv = num_non_obstacles_r(obstacles)
    cells0 = initial_state(params)
    obs_dev = jnp.asarray(obstacles)

    simulate = make_simulate(params, kernel=kernel, n_iters=iters)
    compiled = simulate.lower(cells0, obs_dev, inv).compile()
    c, a = compiled(cells0, obs_dev, inv)
    np.asarray(a)  # untimed first execution

    best = float("inf")
    av_np = None
    for _ in range(repeats):
        cells0 = initial_state(params)
        jax.block_until_ready(cells0)
        t0 = time.perf_counter()
        c, a = compiled(cells0, obs_dev, inv)
        av_np = np.asarray(a)  # host fetch fences the timing
        best = min(best, time.perf_counter() - t0)
    assert av_np is not None and np.isfinite(av_np).all(), "trajectory diverged"
    return nx * ny * iters / best / 1e9, best


def _tpu_probe(timeout_s: float = 60.0) -> str:
    """Probe the accelerator in a subprocess (a dead tunnel can hang
    the caller, so never probe in-process). Returns 'tpu' (alive),
    'no-tpu' (jax works but on another backend — retrying cannot
    conjure a TPU; review finding: the old boolean probe reported a
    CPU-only environment as 'TPU alive' and then timed out the
    hardware-sized measurement repeatedly), or 'down'."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "print(float((jnp.ones((8,128))+1).sum()));"
        "print('BACKEND=' + jax.default_backend())"
    )
    try:
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return "down"
    if res.returncode != 0:
        return "down"
    return "tpu" if "BACKEND=tpu" in res.stdout else "no-tpu"


def _error_kind(err: str) -> str:
    """Canonical identity of a measurement error: digits and path-like
    tokens stripped, truncated — so two attempts of the same
    deterministic failure compare equal even when the message embeds
    per-run temp paths, device addresses, or timings."""
    import re

    kind = re.sub(r"/[^\s:]+", "<path>", err)
    kind = re.sub(r"0x[0-9a-fA-F]+|\d+", "<n>", kind)
    return kind[:160]


def main() -> int:
    kernel = sys.argv[1] if len(sys.argv) > 1 else "auto"

    # Two-phase budget (round-3 postmortem: the driver's outer timeout
    # killed the bench before it printed ANYTHING — BENCH_r03.json was
    # rc=124 with an empty tail — because the old single 4200 s budget
    # was sized for TPU-outage survival, not for the driver's window,
    # and the headline was only printed after the whole loop resolved).
    # Phase 1 [LBM_BENCH_FIRST_BUDGET_S, default 900 s]: get ONE
    #   measurement and print the headline JSON the moment it succeeds
    #   (or a fallback/failure line when the phase expires) — so a kill
    #   at ANY later point still leaves a parsable headline behind.
    # Phase 2 [remainder of LBM_BENCH_BUDGET_S]: stress grids, then
    #   re-print the headline as the final line (the driver records the
    #   last JSON line; a mid-stress kill leaves the latest complete
    #   line, which is always a real measurement).
    #
    # The tunnelled TPU session drops out for stretches — an hour+ after
    # a Mosaic crash (CLAUDE.md). Every hardware measurement runs in a
    # timeout-guarded subprocess: a hung device call on a half-dead
    # tunnel is not an Exception, so an in-process measurement could
    # hang forever. A measurement that FAILS while the TPU is alive is a
    # real failure (diverged trajectory, compile error), reported as
    # such rather than mislabeled as unavailability (review finding).
    import os

    deadline_first = time.monotonic() + float(
        os.environ.get("LBM_BENCH_FIRST_BUDGET_S", "900")
    )
    # 2700 s default: the driver's window killed two rounds' benches at
    # the old 4200 s (BENCH_r03/r04 rc=124), so the budget must fit
    # INSIDE the window with margin — outage-retry headroom is phase 1's
    # job, not a licence to overrun. Manual runs override via the env.
    deadline_total = time.monotonic() + float(
        os.environ.get("LBM_BENCH_BUDGET_S", "2700")
    )
    def acquire_headline(deadline):
        """Probe-and-measure until one 1024^2 measurement lands or the
        deadline passes; returns ``(headline_or_None, state)``. State
        classifies the miss: ``no_tpu`` (no TPU backend exists here —
        retrying cannot conjure one), ``deterministic`` (TPU ALIVE but
        the measurement failed reproducibly — a real regression), or
        plain unavailability (probe/measurement timeouts)."""
        st = {"last_error": None, "no_tpu": False, "deterministic": False}
        same_error = 0
        hard_errors = 0
        attempt = 0
        while time.monotonic() < deadline:
            probe = _tpu_probe()
            if probe == "no-tpu":
                st["no_tpu"] = True
                return None, st
            if probe == "tpu":
                remaining = deadline - time.monotonic()
                line = _stress_line(
                    "GLUPS_1024x1024", 1024, 1024, 10000, kernel,
                    BASELINE_GLUPS, repeats=3,
                    # Cap per-attempt timeout so one compile stall cannot
                    # eat the whole budget; floor it above the documented
                    # worst-case compile+first-exec (~240 s).
                    timeout_s=min(780.0, max(remaining, 300.0)),
                )
                if "value" in line:
                    return line, st
                err = line.get("error", "no output")
                # Compare error IDENTITY, not text: per-run paths/
                # addresses/timings vary between attempts of the same
                # deterministic failure (review finding).
                kind = _error_kind(err)
                same_error = same_error + 1 if kind == st["last_error"] else 1
                st["last_error"] = kind
                if "timeout" not in kind:
                    hard_errors += 1
                print(json.dumps({"attempt": attempt, "error": err[:300]}),
                      file=sys.stderr, flush=True)
                if "timeout" not in kind and (same_error >= 2
                                              or hard_errors >= 4):
                    st["deterministic"] = True
                    return None, st
            attempt += 1
            if deadline - time.monotonic() > 30:
                time.sleep(30)
        return None, st

    def fail_line(st):
        # The TPU was ALIVE and the measurement failed anyway (compile
        # error, diverged trajectory): a real regression, not
        # unavailability — report it as a failure (no "value" key,
        # nonzero exit) instead of letting a CPU fallback number
        # masquerade as the headline (review finding).
        print(json.dumps({
            "metric": "GLUPS_1024x1024",
            "error": f"tpu_measurement_failed: {st['last_error'][:240]}",
        }))
        return 1

    headline, st = acquire_headline(deadline_first)
    if headline is None:
        if st["deterministic"]:
            return fail_line(st)
        import jax

        jax.config.update("jax_platforms", "cpu")
        glups, dt = bench(kernel="reference", iters=200, repeats=1)
        if st["no_tpu"]:
            note = "no_tpu_backend_cpu_fallback"
        elif st["last_error"]:
            note = f"tpu_timeout_cpu_fallback: {st['last_error'][:200]}"
        else:
            note = "tpu_unavailable_cpu_fallback"
        print(json.dumps({
            "metric": "GLUPS_1024x1024",
            "value": round(glups, 4),
            "unit": "GLUPS",
            "vs_baseline": round(glups / BASELINE_GLUPS, 4),
            "note": note,
        }), flush=True)
        if st["no_tpu"]:
            return 0
        # The tunnelled TPU drops out for stretches of an hour+
        # (CLAUDE.md); the fallback line above already guarantees a
        # parsable headline, so spend the REST of the total budget
        # re-probing — a recovered TPU then replaces the fallback as
        # the driver's last JSON line (review finding: the old flow
        # returned here with ~55 min of LBM_BENCH_BUDGET_S unused).
        headline, st = acquire_headline(deadline_total)
        if headline is None:
            if st["deterministic"]:
                return fail_line(st)
            return 0  # the CPU fallback stays the last (honest) line

    # FIRST: the headline, flushed immediately — from here on, a driver
    # kill at any point still leaves a real TPU number in the output.
    print(json.dumps(headline), flush=True)

    # Phase 2: stress grids within the remaining total budget. The
    # headline is RE-PRINTED after every stress line (not just at the
    # end): the driver records the last complete JSON line, so a kill
    # landing anywhere in phase 2 still parses as the 1024^2 headline
    # (VERDICT r4 — the r04 kill left a stress row as "parsed").
    for metric, nx, ny, iters, base in STRESS_GRIDS:
        remaining = deadline_total - time.monotonic()
        if remaining < 120:
            print(json.dumps({"metric": metric,
                              "skipped": "bench budget exhausted"}),
                  file=sys.stderr, flush=True)
            continue
        line = _stress_line(metric, nx, ny, iters, kernel, base,
                            timeout_s=min(900.0, remaining))
        print(json.dumps(line), flush=True)
        print(json.dumps(headline), flush=True)
    return 0


def measure_subprocess(nx, ny, iters, kernel: str = "auto",
                       repeats: int = 2, timeout_s: float = 900.0,
                       env: dict | None = None) -> dict:
    """One hardware measurement in a timeout-guarded subprocess — THE
    shared harness (scripts/ab_kernel.py delegates here, so the
    measurement discipline lives in exactly one place). ``env`` adds
    trace-time knobs for A/B runs. Returns {'glups', 'best_s'} or
    {'error'}."""
    import os
    import subprocess

    code = (
        "import json, sys; sys.path.insert(0, sys.argv[1]);"
        "from bench import bench; import jax;"
        f"g, t = bench(nx={nx}, ny={ny}, iters={iters},"
        f" kernel={kernel!r}, repeats={repeats});"
        # Provenance: which backend actually measured — so harness
        # artifacts can never pass off a CPU run as a hardware row
        # (review finding).
        "print('RESULT ' + json.dumps({'glups': g, 'best_s': t,"
        " 'backend': jax.default_backend()}))"
    )
    here = os.path.dirname(os.path.abspath(__file__))
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    try:
        res = subprocess.run(
            [sys.executable, "-c", code, here],
            capture_output=True, text=True, timeout=timeout_s, cwd=here,
            env=full_env,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout_s:.0f}s"}
    for line in res.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    return {
        "error": (res.stderr.strip().splitlines() or ["no output"])[-1][:300],
    }


def _stress_line(metric, nx, ny, iters, kernel, base,
                 repeats: int = 2, timeout_s: float = 900.0) -> dict:
    """One metric line for the driver from a subprocess measurement."""
    m = measure_subprocess(nx, ny, iters, kernel, repeats, timeout_s)
    if "glups" in m:
        line = {
            "metric": metric,
            "value": round(m["glups"], 4),
            "unit": "GLUPS",
            "vs_baseline": round(m["glups"] / base, 4),
        }
        # Provenance rides into the emitted line too — without it the
        # headline/stress lines themselves could pass off a CPU run as
        # a hardware row (review finding).
        if "backend" in m:
            line["backend"] = m["backend"]
        return line
    return {"metric": metric, "error": m["error"]}


if __name__ == "__main__":
    sys.exit(main())
