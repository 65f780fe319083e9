#!/usr/bin/env python3
"""Reproducible full-scene golden validation (the claims in docs/PERF.md
as a committed artifact): run every official scene end-to-end through
the CLI, validate with the REFERENCE'S OWN checker (check/check.py,
tolerance 1%) where its golden final_state exists, and emit one JSON
artifact scene -> max %diff -> pass.

The reference ran this via `make check REF_*=...` per grid
(check_commands.txt:1-5); the two large final_state goldens were
stripped from this mirror (.MISSING_LARGE_BLOBS), so 256x256 and
1024x1024 validate av_vels with check.py's own formula (col 1, max
percentage diff, check/check.py:83-99).

Every scene runs under BOTH f32 associations (the drift-budget gate,
VERDICT r2 #4): the fast default (the paired equilibrium association)
and the reference's term-by-term association (LBM_PAIRED_EQ=0). The
artifact records both; ``ok`` additionally requires the fast path's max
diff <= DRIFT_BUDGET_PCT (0.3%), so future reassociating optimisations
cannot stack silently toward the 1% cliff.

Usage: python scripts/validate_scenes.py [--kernel auto]
           [-o docs/artifacts/validate_scenes.json] [--scenes 128x128 ...]
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
REFERENCE = Path("/root/reference")
CHECK = REFERENCE / "check"

SCENES = ["128x128", "128x256", "256x256", "1024x1024"]
TOLERANCE = 1.0  # check.py's default max %diff gate
# Budget for the fast path's reassociation drift: well under the 1%
# cliff so individually-harmless reassociations can't stack silently.
DRIFT_BUDGET_PCT = 0.3
# The two f32 associations: the shipping default and the reference's.
ASSOCIATIONS = {
    "fast": {},  # the paired equilibrium (the default; omega-absorbed
    #              relax stays opt-in via LBM_OMEGA_EQ and is NOT here)
    "reference_assoc": {"LBM_PAIRED_EQ": "0"},
}


def max_pct_diff(ref: np.ndarray, sim: np.ndarray) -> float:
    """check.py's max %diff, via the library's single implementation of
    the formula (io._diff — also used by lbm_tpu.check and the golden
    pytest gates; one place owns the acceptance semantics)."""
    from lbm_tpu.io import _diff

    return abs(float(_diff(ref, sim, tolerance=TOLERANCE).max_diff_pcnt))


def run_scene(scene: str, kernel: str, workdir: Path,
              env_overrides: dict | None = None) -> dict:
    av = workdir / f"{scene}.av_vels.dat"
    fs = workdir / f"{scene}.final_state.dat"
    cmd = [
        sys.executable, "-m", "lbm_tpu",
        str(REFERENCE / f"input_{scene}.params"),
        str(REFERENCE / f"obstacles_{scene}.dat"),
        "--kernel", kernel,
        "--av-vels-file", str(av),
        "--final-state-file", str(fs),
    ]
    env = None
    if env_overrides:
        import os

        env = dict(os.environ)
        env.update(env_overrides)
    t0 = time.perf_counter()
    res = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=3600,
        env=env,
    )
    wall = time.perf_counter() - t0
    if res.returncode != 0:
        return {"scene": scene, "pass": False,
                "error": res.stderr[-1000:], "wall_seconds": wall}
    m_rey = re.search(r"Reynolds number:\s+(\S+)", res.stdout)
    m_cmp = re.search(r"Compute time:\s+(\S+)", res.stdout)
    if m_rey is None or m_cmp is None:
        return {"scene": scene, "pass": False, "wall_seconds": wall,
                "error": f"unexpected CLI stdout: {res.stdout[-500:]!r}"}
    reynolds = float(m_rey.group(1))
    compute = float(m_cmp.group(1))

    out = {
        "scene": scene,
        "kernel": kernel,
        "reynolds": reynolds,
        "compute_seconds": compute,
        "wall_seconds": round(wall, 2),
    }

    ref_fs = CHECK / f"{scene}.final_state.dat"
    if ref_fs.exists():
        # The real acceptance gate: the reference's own checker.
        chk = subprocess.run(
            [sys.executable, str(CHECK / "check.py"),
             f"--ref-av-vels-file={CHECK}/{scene}.av_vels.dat",
             f"--ref-final-state-file={ref_fs}",
             f"--av-vels-file={av}", f"--final-state-file={fs}"],
            capture_output=True, text=True, timeout=600,
        )
        # check.py prints "{:.2g}%": plain or scientific notation.
        pcts = re.findall(r"= (-?[\d.]+(?:[eE][+-]?\d+)?)%", chk.stdout)
        out["checker"] = "reference check.py (both files)"
        out["max_av_vels_pct"] = float(pcts[0]) if pcts else None
        out["max_final_state_pct"] = (
            float(pcts[1]) if len(pcts) > 1 else None
        )
        out["pass"] = (
            chk.returncode == 0 and "Both tests passed!" in chk.stdout
        )
    else:
        # Golden final_state stripped from the mirror: validate the
        # trajectory fingerprint with the same formula.
        ref_av = np.loadtxt(CHECK / f"{scene}.av_vels.dat", usecols=[1])
        sim_av = np.loadtxt(av, usecols=[1])
        assert ref_av.size == sim_av.size, "step-count mismatch"
        out["checker"] = "check.py formula, av_vels only (golden final_state stripped)"
        out["max_av_vels_pct"] = max_pct_diff(ref_av, sim_av)
        out["pass"] = abs(out["max_av_vels_pct"]) <= TOLERANCE
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenes", nargs="+", default=SCENES)
    p.add_argument("--kernel", default="auto")
    p.add_argument("-o", "--output",
                   default="docs/artifacts/validate_scenes.json")
    p.add_argument(
        "--append", action="store_true",
        help="merge into the existing artifact: rows for the re-run "
             "(scene, association) pairs are replaced, other scenes' "
             "rows kept (same contract as sweep.py --append)",
    )
    args = p.parse_args(argv)

    results = {
        # No parent backend probe (a down tunnel would hang before the
        # first guarded scene subprocess, CLAUDE.md); scenes record
        # their own failures per-case.
        "kernel": args.kernel,
        "tolerance_pct": TOLERANCE,
        "drift_budget_pct": DRIFT_BUDGET_PCT,
        "timing_note": (
            "single-shot CLI runs can absorb the tunnelled TPU's "
            "transient first-execution stall (~1-5 min, random per "
            "program; docs/PERF.md methodology #4) in the Compute "
            "phase; steady-state rates are measured by bench.py"
        ),
        "scenes": [],
    }
    with tempfile.TemporaryDirectory() as td:
        for scene in args.scenes:
            for assoc, env_over in ASSOCIATIONS.items():
                try:
                    r = run_scene(scene, args.kernel, Path(td),
                                  env_overrides=env_over)
                except Exception as exc:  # record, keep validating
                    r = {"scene": scene, "pass": False,
                         "error": f"{type(exc).__name__}: {exc}"[:500]}
                r["association"] = assoc
                if assoc == "fast" and r.get("pass"):
                    # The drift-budget gate on top of check.py's 1%.
                    worst = max(
                        abs(r.get("max_av_vels_pct") or 0.0),
                        abs(r.get("max_final_state_pct") or 0.0),
                    )
                    r["within_drift_budget"] = worst <= DRIFT_BUDGET_PCT
                    r["pass"] = r["pass"] and r["within_drift_budget"]
                print(json.dumps(r), flush=True)
                results["scenes"].append(r)
    out = Path(args.output)
    if args.append and out.exists():
        prev = json.loads(out.read_text())
        redone = {(s["scene"], s.get("association"))
                  for s in results["scenes"]}
        kept = [s for s in prev.get("scenes", [])
                if (s["scene"], s.get("association")) not in redone]
        results["scenes"] = kept + results["scenes"]
    results["ok"] = all(s.get("pass") for s in results["scenes"])
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(f"{'PASS' if results['ok'] else 'FAIL'} -> {out}")
    return 0 if results["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
