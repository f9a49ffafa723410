"""solve: device-resident ODE integration and weighted least squares."""

from .ivp import rk4_solve, dirk2_solve, stability_mask
from .lstsq import (
    WeightedLSTSQ,
    TikhonovLSTSQ,
    MatrixTikhonovLSTSQ,
    weighted_lstsq_fit,
)

__all__ = [
    "rk4_solve",
    "dirk2_solve",
    "stability_mask",
    "WeightedLSTSQ",
    "TikhonovLSTSQ",
    "MatrixTikhonovLSTSQ",
    "weighted_lstsq_fit",
]
