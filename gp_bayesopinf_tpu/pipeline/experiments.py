"""The paper's workload grids (reference ``*/experiments.sh``).

Each entry is the argument tuple for the corresponding pipeline runner;
``run_all`` executes a named suite. The reference runs all of these with
``--ndraws 600``.
"""

from typing import Dict, Tuple

# (t_max, num_samples, noiselevel, num_regression_points, num_pod_modes)
EULER_WORKLOADS: Dict[str, Tuple] = {
    # PDEs/experiments.sh:13-19 — noise/regression-point sweeps, r sweep.
    "ex1a": (0.06, 200, 0.03, 400, 6),
    "ex1b": (0.06, 200, 0.03, 50, 6),
    "ex1c": (0.06, 200, 0.03, 3200, 6),
    "ex1d": (0.06, 200, 0.01, 400, 6),  # 1% noise (reference label)
    "ex1e": (0.06, 200, 0.05, 400, 6),  # 5% noise (reference label)
    "ex1r8": (0.06, 200, 0.03, 400, 8),
    # PDEs/experiments.sh:22-26 — sparse-data workloads.
    "ex2a": (0.06, 50, 0.01, 400, 6),
    "ex2b": (0.06, 50, 0.01, 50, 6),
    "ex2c": (0.06, 50, 0.01, 3200, 6),
    "ex2d": (0.06, 20, 0.01, 400, 6),
    "ex2e": (0.06, 80, 0.01, 400, 6),
}

# (t_max, num_samples, noiselevel, num_regression_points)
SEIRD_WORKLOADS: Dict[str, Tuple] = {
    # ODEs/experiments.sh:11-18.
    "ex1a": (90, 90, 0.10, 360),
    "ex1c": (60, 60, 0.10, 240),  # reference labels: no ex1b/ex2b
    "ex1d": (120, 120, 0.10, 480),
    "ex2a": (120, 10, 0.05, 480),
    "ex2c": (60, 10, 0.05, 240),
    "ex2d": (90, 10, 0.05, 360),
}

# (t_max, num_samples, noiselevel, num_regression_points, num_pod_modes)
HEAT_WORKLOADS: Dict[str, Tuple] = {
    # PDEsMulti/experiments.sh:6.
    "ex3": (1.0, 20, 0.05, 80, 5),
}

NDRAWS_PAPER = 600


def run_workload(pipeline: str, name: str, ndraws: int = NDRAWS_PAPER, **kw):
    """Run one named workload from the paper grids."""
    if pipeline == "euler":
        from .pdes import run_euler

        t, n, nz, m, r = EULER_WORKLOADS[name]
        return run_euler((0.0, t), n, nz, m, r, ndraws=ndraws, **kw)
    if pipeline == "seird":
        from .odes import run_seird

        t, n, nz, m = SEIRD_WORKLOADS[name]
        return run_seird((0.0, t), n, nz, m, ndraws=ndraws, **kw)
    if pipeline == "heat":
        from .pdes_multi import run_heat_multi

        t, n, nz, m, r = HEAT_WORKLOADS[name]
        return run_heat_multi((0.0, t), n, nz, m, r, ndraws=ndraws, **kw)
    raise ValueError(f"unknown pipeline '{pipeline}'")
