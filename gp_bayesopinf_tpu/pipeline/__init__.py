"""pipeline: end-to-end experiment drivers (the reference's L4 layer).

Three pipelines mirror the reference experiment suites:

* ``odes``       — Bayesian parameter estimation for SEIRD2
  (reference ``ODEs/``).
* ``pdes``       — GP-BayesOpInf for the compressible Euler equations,
  single trajectory, quadratic POD ROM (reference ``PDEs/``).
* ``pdes_multi`` — multi-trajectory operator inference for the cubic heat
  equation with inputs (reference ``PDEsMulti/``).

Each pipeline is a composition of pure, tested stage functions; the CLI
(``cli.py``) mirrors the reference's argparse surface and
``experiments.py`` records the paper workload grids (experiments.sh).
"""

from . import configs
from .odes import run_seird
from .pdes import run_euler
from .pdes_multi import run_heat_multi

__all__ = ["configs", "run_seird", "run_euler", "run_heat_multi"]
