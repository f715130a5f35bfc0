"""ti_tpu — TPU-native thermodynamic interpolation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
olsson-group/thermodynamic-interpolation: temperature-conditioned
stochastic-interpolant generative models for molecular thermodynamics
(TFEP free energies, ESS) and kinetics (reweighted gEDMD Koopman spectra).

Subpackages
-----------
- ``ti_tpu.interpolants``: pure-functional interpolant schedules
- ``ti_tpu.models``: velocity-field networks (MLP, cPaiNN) in flax
- ``ti_tpu.ops``: divergence estimators, graph aggregation, Kabsch
- ``ti_tpu.sampling``: lax.scan ODE/SDE integrators with dlogp carry
- ``ti_tpu.losses``: antithetic interpolant-regression losses
- ``ti_tpu.gedmd``: random-Fourier-feature Koopman operator/generator spectra
- ``ti_tpu.analysis``: ESS, TFEP free energies, z-matrices, reweighting
- ``ti_tpu.data``: host-side ingest (ADW csv, MDQM9 npy/sdf) + synthetic data
- ``ti_tpu.train``: training loops (Adam, clip, plateau LR, NaN-guard, orbax)
- ``ti_tpu.parallel``: mesh/sharding helpers for chain- and data-parallelism
"""

__version__ = "0.1.0"

# Make an explicit JAX_PLATFORMS=cpu (etc.) env pin effective even when a
# sitecustomize has pinned jax_platforms through jax.config — see
# ti_tpu/utils/platform.py. Must run before anything initializes backends.
from ti_tpu.utils.platform import honor_env_platforms as _honor_env_platforms

_honor_env_platforms()
del _honor_env_platforms

# Persistent XLA compilation cache (opt-out: TI_TPU_NO_COMPILE_CACHE=1).
# Every CLI process recompiles the same samplers otherwise — see
# ti_tpu/utils/compile_cache.py for rationale and knobs.
from ti_tpu.utils.compile_cache import enable_compile_cache as _enable_compile_cache

_enable_compile_cache()
del _enable_compile_cache
