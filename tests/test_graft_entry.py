"""The driver-facing contract of ``__graft_entry__``.

The round driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(n)`` on a virtual CPU mesh; until now nothing in the
suite imported the module, so a refactor of the underlying APIs
(Params fields, fused_step signature, halo entry points) could break
the driver's gate without any test going red.
"""

import subprocess
import sys

import jax
import numpy as np
import pytest


def test_entry_returns_jittable_step_and_args():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    cells, tot_u = out
    assert cells.shape == args[0].shape
    assert cells.dtype == args[0].dtype
    np.testing.assert_array_equal(np.isfinite(np.asarray(cells)), True)
    assert np.isfinite(float(tot_u))


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    # dryrun_multichip self-provisions its own virtual mesh in a
    # subprocess, so it is safe to invoke from the 8-device suite
    # process; 2 devices keeps the eight sharding configs cheap.
    res = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ok" in res.stdout
