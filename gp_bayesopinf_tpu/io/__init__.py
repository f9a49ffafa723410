"""io: HDF5 artifact persistence (reference-compatible schemas) and
checkpointing."""

from .hdf5 import (
    save_bayesian_ode,
    load_bayesian_ode,
    save_bayesian_rom,
    load_bayesian_rom,
    export_result,
)

__all__ = [
    "save_bayesian_ode",
    "load_bayesian_ode",
    "save_bayesian_rom",
    "load_bayesian_rom",
    "export_result",
]
