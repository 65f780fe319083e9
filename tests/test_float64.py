"""Float64 validation mode: reproduces the golden data's original
double-precision trajectory to ~1e-10 % (vs ~1e-2 % for f32 drift).

Runs in a subprocess because jax_enable_x64 is process-global.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from conftest import CHECK, REFERENCE, requires_reference

REPO = Path(__file__).resolve().parent.parent


@requires_reference
def test_f64_prefix_matches_golden_exactly(tmp_path):
    av = tmp_path / "av.dat"
    fs = tmp_path / "fs.dat"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "from lbm_tpu.cli import main\n"
        f"main(['{REFERENCE}/input_128x128.params',"
        f"'{REFERENCE}/obstacles_128x128.dat','--kernel','reference',"
        f"'--precision','float64','--iters','2000',"
        f"'--av-vels-file','{av}','--final-state-file','{fs}'])\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=REPO,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    sim = np.loadtxt(av, usecols=[1])
    ref = np.loadtxt(CHECK / "128x128.av_vels.dat", usecols=[1])[:2000]
    pct = 100.0 * np.abs((ref - sim) / ref)
    # Measured 5.5e-11 % at step 2000 — the README's "~1e-10 % in
    # float64 mode" claim, with 20x headroom for platform variation.
    assert pct.max() < 1e-9, f"f64 should match golden near-exactly, got {pct.max():.2e}%"
