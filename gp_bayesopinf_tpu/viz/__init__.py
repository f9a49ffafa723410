"""viz: matplotlib plotting of GP fits and posterior ensembles
(host-side; mirrors the reference's ``codebase/baseplots.py`` +
per-pipeline ``step4_plot.py`` semantics)."""

from .baseplots import COLORS, BasePlotter
from .plotters import (
    MultiTrajectoryPlotter,
    ODEPlotter,
    ReducedPlotter,
    StatePlotter,
)

__all__ = [
    "COLORS",
    "BasePlotter",
    "MultiTrajectoryPlotter",
    "ODEPlotter",
    "ReducedPlotter",
    "StatePlotter",
]
