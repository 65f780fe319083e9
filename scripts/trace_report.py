"""Per-op time table from a jax.profiler trace — the gprof flat-profile
analogue (the reference archived gprof output naming its hot functions,
/root/reference/profiling/v0_128x128.txt:7-9; this summarises where the
TPU step's time goes instead of hand-waving from totals).

Two modes:

- ``--capture``: run a short 1024x1024 simulation with the production
  kernel under profiling.trace (same hook as ``lbm_tpu --trace DIR``),
  then summarise the capture.
- ``TRACEDIR`` positional: summarise an existing trace directory (e.g.
  one written by ``python -m lbm_tpu ... --trace DIR``).

The profiler writes Chrome-trace JSON (plugins/profile/*/…trace.json.gz);
this aggregates complete events by (process, op name) and prints the top
entries by total duration, writing docs/profiles/trace_ops_1024.json.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(tracedir: str, iters: int) -> None:
    import numpy as np

    import bench

    bench._enable_compilation_cache()
    from lbm_tpu.obstacles import generate_obstacles
    from lbm_tpu.params import Params
    from lbm_tpu.runner import run_simulation

    params = Params(nx=1024, ny=1024, max_iters=iters, reynolds_dim=10,
                    density=np.float32(0.1), accel=np.float32(0.01),
                    omega=np.float32(1.85))
    obstacles = generate_obstacles(params.nx, params.ny)
    # One untraced run first: the traced region should hold steady-state
    # execution, not the one-off remote program load (docs/PERF.md).
    run_simulation(params, obstacles, kernel="auto")
    res = run_simulation(params, obstacles, kernel="auto",
                         trace_dir=tracedir)
    print(f"captured: compute={res.timings['compute']:.3f}s "
          f"({params.nx * params.ny * iters / res.timings['compute'] / 1e9:.2f} GLUPS)")


def summarise(tracedir: str, top: int = 25) -> dict:
    paths = sorted(glob.glob(
        os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True
    )) or sorted(glob.glob(
        os.path.join(tracedir, "**", "*.trace.json"), recursive=True
    ))
    if not paths:
        raise FileNotFoundError(f"no trace.json(.gz) under {tracedir}")
    path = paths[-1]
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    procs = {}
    threads = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e.get("pid")] = e.get("args", {}).get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e.get("pid"), e.get("tid"))] = (
                e.get("args", {}).get("name", "")
            )

    # Self-time accounting: spans on one (pid, tid) track NEST (the
    # module span covers the while loop covers the kernel call), so
    # summing raw durations triple-counts the same wall time and
    # understates every op's device share ~3x (review finding,
    # confirmed against the committed artifact). A gprof FLAT profile
    # reports SELF time: each span's duration minus its immediate
    # children's.
    tracks = defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        # The device's "XLA Modules" lane is an AGGREGATE over the
        # "XLA Ops" lane (the whole executable as one span) — counting
        # both double-counts every wall second on a second track that
        # per-track self-time cannot see (review finding).
        if "Module" in threads.get((e.get("pid"), e.get("tid")), ""):
            continue
        tracks[(e.get("pid"), e.get("tid"))].append(e)

    agg = defaultdict(lambda: [0.0, 0.0, 0])  # self_us, total_us, count
    for (pid, _tid), evs in tracks.items():
        proc = procs.get(pid, str(pid))
        # Parents first at equal start times (longer duration = outer).
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # [event, child_us]
        for e in evs:
            while stack and stack[-1][0]["ts"] + stack[-1][0]["dur"] \
                    <= e["ts"]:
                done, child = stack.pop()
                key = (proc, done.get("name", "?"))
                agg[key][0] += max(0.0, done["dur"] - child)
                agg[key][1] += done["dur"]
                agg[key][2] += 1
            if stack:
                stack[-1][1] += e["dur"]
            stack.append([e, 0.0])
        while stack:
            done, child = stack.pop()
            key = (proc, done.get("name", "?"))
            agg[key][0] += max(0.0, done["dur"] - child)
            agg[key][1] += done["dur"]
            agg[key][2] += 1

    rows = sorted(
        ({"process": p, "op": n, "self_us": round(s, 1),
          "total_us": round(d, 1), "count": c,
          "avg_us": round(d / max(c, 1), 2)}
         for (p, n), (s, d, c) in agg.items()),
        key=lambda r: -r["self_us"],
    )
    # The gprof-flat-profile analogue is the DEVICE rows; host rows are
    # wrappers (fences, dispatch) and only useful as context.
    is_dev = lambda r: "TPU" in r["process"] or "/device" in r["process"].lower()
    dev = [r for r in rows if is_dev(r)]
    host = [r for r in rows if not is_dev(r)]
    device_total = sum(r["self_us"] for r in dev)
    for r in dev:
        r["pct_device"] = (
            round(100 * r["self_us"] / device_total, 2)
            if device_total else None
        )
    return {"trace_file": path, "device_total_us": round(device_total, 1),
            "ops": dev[:top] or rows[:top], "host_context": host[:8]}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tracedir", nargs="?", default="/tmp/lbm_trace")
    ap.add_argument("--capture", action="store_true",
                    help="run a traced 1024x1024 simulation first")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("-o", "--output",
                    default="docs/profiles/trace_ops_1024.json")
    args = ap.parse_args()

    if args.capture:
        capture(args.tracedir, args.iters)
    report = summarise(args.tracedir)
    from pathlib import Path
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    print(f"{'process':<28} {'op':<40} {'self_us':>10} "
          f"{'total_us':>10} {'count':>7} {'pct':>6}")
    for r in report["ops"]:
        print(f"{r['process'][:27]:<28} {r['op'][:39]:<40} "
              f"{r['self_us']:>10.1f} {r['total_us']:>10.1f} "
              f"{r['count']:>7} {(r.get('pct_device') or 0):>6.2f}")
    return 0


if __name__ == "__main__":
    main()
