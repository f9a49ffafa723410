"""bayes: Gaussian posteriors over ROM operators / ODE parameters,
vmapped posterior-ensemble prediction, and the regularization auto-search.
"""

from .posterior import OperatorPosterior, BayesianROM, BayesianODE
from .regsearch import auto_regularize, KernelScreenSpec, RegSearchResult

__all__ = [
    "OperatorPosterior",
    "BayesianROM",
    "BayesianODE",
    "auto_regularize",
    "KernelScreenSpec",
    "RegSearchResult",
]
