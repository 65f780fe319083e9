"""Scene parameter loading — the ``.params`` file contract.

Mirrors the reference's 7-field parameter file format
(``d2q9-bgk.c:522-528``): one value per line —

    nx ny maxIters reynolds_dim density accel omega

All floating-point parameters are float32, matching the reference's
``float`` precision throughout (``d2q9-bgk.c:66-87``).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass(frozen=True)
class Params:
    """Simulation parameters (the reference's ``t_param``, d2q9-bgk.c:66-87).

    Only the scene-level fields live here; decomposition-related fields
    (rank, num_rows, ...) are a property of the device mesh and live in
    :mod:`lbm_tpu.parallel.decomp`.
    """

    nx: int
    ny: int
    max_iters: int
    reynolds_dim: int
    density: np.float32
    accel: np.float32
    omega: np.float32
    # Working precision: float32 matches the reference artifact; float64
    # matches the golden data's original double-precision code (CPU
    # validation runs with jax_enable_x64).
    dtype: type = np.float32

    def __post_init__(self) -> None:
        if self.nx <= 0 or self.ny <= 0:
            raise ValueError(f"grid dims must be positive, got {self.nx}x{self.ny}")
        if self.max_iters <= 0:
            raise ValueError(f"maxIters must be positive, got {self.max_iters}")
        d = np.dtype(self.dtype).type
        object.__setattr__(self, "dtype", d)
        # Normalise float fields to the working precision.
        object.__setattr__(self, "density", d(self.density))
        object.__setattr__(self, "accel", d(self.accel))
        object.__setattr__(self, "omega", d(self.omega))

    @property
    def viscosity(self):
        """Kinematic viscosity: (1/6)(2/omega - 1) (d2q9-bgk.c:676)."""
        d = self.dtype
        return d(1.0) / d(6.0) * (d(2.0) / self.omega - d(1.0))

    @property
    def accel_w1(self):
        """Axis-speed forcing weight density*accel/9 (d2q9-bgk.c:237)."""
        return self.dtype(self.density * self.accel / self.dtype(9.0))

    @property
    def accel_w2(self):
        """Diagonal-speed forcing weight density*accel/36 (d2q9-bgk.c:238)."""
        return self.dtype(self.density * self.accel / self.dtype(36.0))


def ensure_dtype_computable(params: "Params") -> None:
    """Refuse float64 params in a non-x64 process: jnp would silently
    truncate to f32 and the results would be relabelled float64 on the
    way out (the CLI enables x64 before building; library callers —
    sharded or not — must too)."""
    import jax

    if params.dtype == np.float64 and not jax.config.jax_enable_x64:
        raise ValueError(
            "params.dtype is float64 but jax_enable_x64 is disabled; "
            "call jax.config.update('jax_enable_x64', True) before "
            "building the simulation"
        )


def load_params(path: str | Path, dtype: type = np.float32) -> Params:
    """Parse a 7-line ``.params`` scene file (d2q9-bgk.c:522-528)."""
    path = Path(path)
    fields = ("nx", "ny", "maxIters", "reynolds_dim", "density", "accel", "omega")
    try:
        lines = path.read_text().split()
    except OSError as exc:
        raise FileNotFoundError(f"could not open input parameter file: {path}") from exc
    if len(lines) < len(fields):
        missing = fields[len(lines)]
        raise ValueError(f"could not read param file: {missing}")
    vals = lines[: len(fields)]
    try:
        return Params(
            nx=int(vals[0]),
            ny=int(vals[1]),
            max_iters=int(vals[2]),
            reynolds_dim=int(vals[3]),
            density=np.dtype(dtype).type(vals[4]),
            accel=np.dtype(dtype).type(vals[5]),
            omega=np.dtype(dtype).type(vals[6]),
            dtype=dtype,
        )
    except ValueError as exc:
        raise ValueError(f"could not parse param file {path}: {exc}") from exc
