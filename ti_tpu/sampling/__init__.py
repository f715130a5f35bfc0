from ti_tpu.sampling.integrators import (
    ODESolution,
    dopri5_stepper,
    sample_ode,
    sample_ode_dopri5,
    sample_ode_quad_dlogp,
    sample_sde,
)

__all__ = [
    "ODESolution",
    "dopri5_stepper",
    "sample_ode",
    "sample_ode_dopri5",
    "sample_ode_quad_dlogp",
    "sample_sde",
]
