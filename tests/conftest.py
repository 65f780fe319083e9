"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initialises, so sharded paths are testable without TPU hardware — the
TPU-native answer to the reference's "multi-node only testable on the real
cluster" gap (SURVEY.md §4).
"""

from lbm_tpu.parallel.decomp import provision_virtual_cpu

provision_virtual_cpu(8)

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")
CHECK = REFERENCE / "check"


def reference_available() -> bool:
    return CHECK.is_dir()


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference golden data not mounted"
)


@pytest.fixture(scope="session")
def params_128():
    from lbm_tpu.params import load_params

    return load_params(REFERENCE / "input_128x128.params")


@pytest.fixture(scope="session")
def obstacles_128(params_128):
    from lbm_tpu.obstacles import load_obstacles

    return load_obstacles(
        REFERENCE / "obstacles_128x128.dat", params_128.nx, params_128.ny
    )


@pytest.fixture(scope="session")
def golden_av_vels_128():
    return np.loadtxt(CHECK / "128x128.av_vels.dat", usecols=[1])


_SESSION_T0 = None


def pytest_sessionstart(session):
    # Wall-clock origin for the full-suite record below; a module global
    # rather than TerminalReporter._sessionstarttime, which does not
    # exist in this pytest version (the attribute crash cost a 25-min
    # green run its record).
    global _SESSION_T0
    import time as _time

    _SESSION_T0 = _time.time()


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Record each passing FULL-profile run (`make test-full`, i.e.
    `pytest tests/ -m ""`) in docs/artifacts/test_full_record.json —
    VERDICT r4 #4: the fast profile is re-proven every round, but
    nothing recorded when the full 26-slow-test suite last passed.
    Partial invocations (per-file, -k, fast profile) are not records of
    the full suite and are skipped."""
    if (
        exitstatus != 0
        or config.getoption("markexpr")
        or config.getoption("keyword")
        or [pathlib.Path(a).name for a in config.args] != ["tests"]
    ):
        return
    stats = terminalreporter.stats
    counts = {k: len(stats.get(k, [])) for k in
              ("passed", "failed", "skipped", "deselected")}
    if counts["deselected"] or not counts["passed"]:
        return
    import datetime
    import json
    import time as _time

    record = {
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "profile": "full",
        **counts,
        "duration_s": (
            round(_time.time() - _SESSION_T0, 1) if _SESSION_T0 else None
        ),
    }
    out = pathlib.Path(__file__).parent.parent / "docs" / "artifacts" \
        / "test_full_record.json"
    try:
        try:
            history = json.loads(out.read_text()) if out.exists() else []
        except ValueError:
            # Corrupt existing artifact (this hook rewrites the file —
            # a killed run can truncate it): start fresh rather than
            # turning a green 23-minute full run into an INTERNALERROR
            # (review finding; JSONDecodeError is a ValueError).
            history = []
        if not isinstance(history, list):
            history = []
        history = (history + [record])[-10:]
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(history, indent=2) + "\n")
        terminalreporter.write_line(f"full-suite record -> {out}")
    except OSError:
        pass  # a read-only checkout must not fail the suite
