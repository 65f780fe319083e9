"""Profiling and roofline reporting.

The reference's observability was gettimeofday phase timers
(d2q9-bgk.c:174-226), gprof flat profiles (profiling/), and Intel Advisor
rooflines (roofline/). The TPU equivalents here:

- :class:`PhaseTimers` — the same 4-phase init/compute/collate/total
  breakdown;
- :func:`trace` — a jax.profiler trace context manager (view in
  TensorBoard / xprof);
- :func:`roofline_report` — GLUPS, effective HBM bandwidth and FLOP/s
  for a measured run against the chip's peaks (the Advisor-roofline
  analogue). The fused step's arithmetic intensity under this model is
  FLOPS_PER_CELL / BYTES_PER_CELL_F32_MASK ≈ 1.7 FLOP/B — higher than
  the reference's 0.43–0.53 (report_mpi/report.tex:158) because TPU
  flops count the divide/sqrt expansions, but equally far below the
  ridge: the kernel is memory-bound on every listed chip (docs/PERF.md
  "Cost model" uses these exact constants).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

# Per-cell cost model of the fused step (d2q9-bgk.c:284-335): 9 reads +
# 9 writes of f32 distributions + the obstacle mask byte(s), ~130 flops
# (incl. divides/sqrt expansions), 1 sqrt. docs/PERF.md derives its
# roofline ceilings from the same constants (v5e: 819 GB/s / 76 B/cell
# ≈ 10.8 GLUPS).
BYTES_PER_CELL_F32_MASK = (9 + 9) * 4 + 4
FLOPS_PER_CELL = 130

# Peak specs per chip generation: HBM GB/s and the chip's peak dense
# TFLOP/s envelope (the bf16 MXU rate — docs/PERF.md's ridge uses it:
# v5e 197e3 / 819 ≈ 240 FLOP/B). The VPU-only LBM kernel cannot reach
# this envelope, so flops_utilisation reads low by construction; it
# exists to show how memory-bound the kernel is, not as a VPU target.
CHIP_PEAKS = {
    "v5e": {"hbm_gbps": 819, "tflops_peak": 197.0},
    "v5p": {"hbm_gbps": 2765, "tflops_peak": 459.0},
    "v4": {"hbm_gbps": 1228, "tflops_peak": 275.0},
}


@dataclasses.dataclass
class PhaseTimers:
    """init/compute/collate wall-clock phases (d2q9-bgk.c:174-226)."""

    _marks: dict = dataclasses.field(default_factory=dict)
    elapsed: dict = dataclasses.field(default_factory=dict)

    def start(self, phase: str) -> None:
        self._marks[phase] = time.perf_counter()

    def stop(self, phase: str) -> None:
        self.elapsed[phase] = time.perf_counter() - self._marks.pop(phase)

    @contextlib.contextmanager
    def phase(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def report(self) -> str:
        lines = []
        for name in ("init", "compute", "collate", "total"):
            if name in self.elapsed:
                lines.append(
                    "Elapsed %s time:\t\t\t%.6f (s)" % (name.capitalize(), self.elapsed[name])
                )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a region (TensorBoard-viewable)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def roofline_report(
    nx: int, ny: int, iters: int, seconds: float, chip: str = "v5e",
    steps_per_pass: int = 1,
) -> dict:
    """Throughput vs the chip's bandwidth/compute roofs.

    ``steps_per_pass``: steps the measured kernel advances per HBM pass
    (pallas_fused._kernel_fused: physical traffic per step is
    BYTES_PER_CELL / depth, so the bandwidth ceiling scales up by
    depth). Pass the value the run actually used — the automatic
    schedule is shape-aware: chip-resident states auto-select the
    VMEM-resident kernel at G=100 steps per pass
    (pallas_resident.resident_gsteps), blocked runs take depth 2 under
    ~50 MB per lattice buffer, 8 for large lanes<=128 layouts and 4
    otherwise (pallas_fused._depth_preference). A wrong value
    over/under-reports HBM utilisation proportionally —
    scripts/plot_roofline.py mirrors the selection logic instead of
    hardcoding a tier.
    """
    cells = nx * ny * iters
    glups = cells / seconds / 1e9
    bytes_per_step = BYTES_PER_CELL_F32_MASK / steps_per_pass
    gbps = cells * bytes_per_step / seconds / 1e9
    gflops = cells * FLOPS_PER_CELL / seconds / 1e9
    try:
        peaks = CHIP_PEAKS[chip]
    except KeyError:
        # A silent v5e fallback would misstate utilisation for other
        # chips by their real bandwidth ratio (review finding).
        raise ValueError(
            f"unknown chip {chip!r}; known: {sorted(CHIP_PEAKS)}"
        ) from None
    ai = FLOPS_PER_CELL / bytes_per_step
    return {
        "glups": glups,
        "effective_gbps": gbps,
        "effective_gflops": gflops,
        "hbm_utilisation": gbps / peaks["hbm_gbps"],
        "flops_utilisation": gflops / (peaks["tflops_peak"] * 1e3),
        "arithmetic_intensity": ai,
        # Bandwidth speed-of-light for this kernel on this chip
        # (docs/PERF.md: v5e 819/76 ≈ 10.8 GLUPS unfused, 21.6 fused).
        "ceiling_glups": peaks["hbm_gbps"] / bytes_per_step,
        "bound": "memory"
        if ai < peaks["tflops_peak"] * 1e3 / peaks["hbm_gbps"]
        else "compute",
    }
