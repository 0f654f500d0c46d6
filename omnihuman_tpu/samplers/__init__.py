from omnihuman_tpu.samplers.fm_solvers import (
    FlowDPMSolver,
    FlowUniPCSolver,
    get_sampling_sigmas,
    retrieve_timesteps,
)

__all__ = [
    "FlowUniPCSolver", "FlowDPMSolver",
    "get_sampling_sigmas", "retrieve_timesteps",
]
