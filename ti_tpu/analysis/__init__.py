from ti_tpu.analysis.potentials import AsymmetricDoubleWell, BoltzmannDensity1D
from ti_tpu.analysis.weights import (
    calc_ess,
    calc_importance_weights,
    calc_log_mvnormal_pzs,
    calc_ti_weights,
    filter_iqr,
    weights_filter_iqr,
)
from ti_tpu.analysis.free_energy import (
    calc_bg_dF,
    calc_phis_bg,
    calc_phis_bg_tfep,
    calc_phis_tfep,
    calc_tfep_dF,
    bootstrap_ci,
)

__all__ = [
    "AsymmetricDoubleWell",
    "BoltzmannDensity1D",
    "calc_ess",
    "calc_importance_weights",
    "calc_log_mvnormal_pzs",
    "calc_ti_weights",
    "filter_iqr",
    "weights_filter_iqr",
    "calc_bg_dF",
    "calc_phis_bg",
    "calc_phis_bg_tfep",
    "calc_phis_tfep",
    "calc_tfep_dF",
    "bootstrap_ci",
]
