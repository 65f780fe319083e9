"""Compute ops: the accelerate-flow forcing and the fused
collide-stream kernel, in a portable jnp form (:mod:`lbm_tpu.ops.reference`)
and a fused Pallas TPU form (:mod:`lbm_tpu.ops.pallas_fused`).
"""

from lbm_tpu.ops.reference import (
    accelerate_flow,
    collide_stream,
    fused_step,
)

__all__ = ["accelerate_flow", "collide_stream", "fused_step"]
