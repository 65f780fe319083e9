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
