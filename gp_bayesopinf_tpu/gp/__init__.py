"""gp: Gaussian-process regression layer.

Exact GP marginal-likelihood hyperparameter fitting (batched multi-restart
optimization over all modes at once) and closed-form state / time-derivative
estimation with uncertainty, including the least-squares weight root sqrtW.
"""

from .nlml import nlml, BoxTransform
from .fit import fit_gp_hyperparameters, FitResult
from .estimates import gp_estimates, GPEstimates
from .gp import GaussianProcess, fit_gaussian_processes

__all__ = [
    "nlml",
    "BoxTransform",
    "fit_gp_hyperparameters",
    "FitResult",
    "gp_estimates",
    "GPEstimates",
    "GaussianProcess",
    "fit_gaussian_processes",
]
