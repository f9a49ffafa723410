"""ops: low-level TPU compute primitives.

Closed-form RBF/derivative kernel Gram assembly, SPD linear-algebra helpers
(Cholesky solves, inverse matrix square roots), and compressed quadratic
feature maps. Everything here is pure, jittable, and batchable with ``vmap``.
"""

from .rbf import (
    rbf,
    rbf_gram,
    derivative_gram,
    lstsq_kernel_matrices,
)
from .chol import (
    cho_solve_psd,
    spd_cholesky,
    spd_inverse_sqrt,
    solve_psd,
)
from .quadratic import (
    ckron,
    ckron_indices,
    state_input_kron,
)

__all__ = [
    "rbf",
    "rbf_gram",
    "derivative_gram",
    "lstsq_kernel_matrices",
    "cho_solve_psd",
    "spd_cholesky",
    "spd_inverse_sqrt",
    "solve_psd",
    "ckron",
    "ckron_indices",
    "state_input_kron",
]
