"""Time-step models (MAC and CIP solvers) and the simulator façade."""

from fluid2d_tpu.models.cip import cip_step
from fluid2d_tpu.models.mac import mac_step
from fluid2d_tpu.models.simulator import FluidSimulator

__all__ = ["FluidSimulator", "cip_step", "mac_step"]
