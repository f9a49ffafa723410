"""models: full-order ("truth") models for data generation, in JAX.

Device-resident, jittable equivalents of the reference's truth solvers
(``models/ode_models.py``, ``models/pde_models.py``): the SEIRD epidemic
ODEs, the 1-D compressible Euler equations with upwind finite differences,
and the (cubic) forced heat equation with Dirichlet boundary conditions.
"""

from .seird import SEIRD, SEIRD2
from .euler import Euler
from .heat import HeatBimodal, CubicHeatBimodal

__all__ = ["SEIRD", "SEIRD2", "Euler", "HeatBimodal", "CubicHeatBimodal"]
