from ti_tpu.sampling.integrators import (
    ODESolution,
    sample_ode,
    sample_ode_dopri5,
    sample_sde,
)

__all__ = ["ODESolution", "sample_ode", "sample_ode_dopri5", "sample_sde"]
