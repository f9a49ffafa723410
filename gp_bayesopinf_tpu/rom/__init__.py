"""rom: proper-orthogonal-decomposition bases and polynomial-structure
reduced-order models (the native replacement for the reference's ``opinf``
dependency surface, SURVEY.md section 2 component P-7)."""

from .basis import PODBasis, EulerScaledBasis, QuadraticLiftedBasis, shift
from .operators import (
    operator_dims,
    operator_splits,
    blocked_gamma_diag,
    extract_operators,
    assemble_data_matrix,
    rom_rhs,
)
from .model import GalerkinROM

__all__ = [
    "PODBasis",
    "EulerScaledBasis",
    "QuadraticLiftedBasis",
    "shift",
    "operator_dims",
    "operator_splits",
    "blocked_gamma_diag",
    "extract_operators",
    "assemble_data_matrix",
    "rom_rhs",
    "GalerkinROM",
]
