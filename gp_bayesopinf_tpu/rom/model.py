"""Continuous-time Galerkin reduced-order model.

Functional equivalent of the ``opinf.models.ContinuousModel`` capability
the reference relies on (``predict`` with an IVP method, operator
extraction, data-matrix assembly; reference ``codebase/bayes.py:295-361``).
The model object holds only *static* metadata (structure string, sizes,
integrator choice); operator values are passed explicitly so that posterior
draws vmap over operators without touching the model object.
"""

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from .operators import (
    assemble_data_matrix,
    extract_operators,
    rom_rhs,
    rom_rhs_jacobian,
    total_dim,
)
from ..solve.ivp import dirk2_solve, rk4_solve


@dataclasses.dataclass(frozen=True)
class GalerkinROM:
    """Polynomial-structure continuous ROM: dq/dt = Ohat @ features(q, u).

    Attributes
    ----------
    structure : operator-structure string, e.g. "cAH" or "cAHBN".
    state_dimension : r.
    input_dimension : m (0 for autonomous models).
    ivp_method : "rk4" (non-stiff, reference RK45) or "dirk2" (stiff,
        reference BDF).
    substeps : integrator substeps per output interval.
    """

    structure: str
    state_dimension: int
    input_dimension: int = 0
    ivp_method: str = "rk4"
    substeps: int = 8

    @property
    def operator_dimension(self) -> int:
        """Number of regression unknowns d per operator row."""
        return total_dim(self.structure, self.state_dimension, self.input_dimension)

    def data_matrix(
        self, states: jnp.ndarray, inputs: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """(k, d) regression features from (r, k) states [+ (m, k) inputs]."""
        return assemble_data_matrix(states, inputs, self.structure)

    def extract_operators(self, Ohat: jnp.ndarray):
        return extract_operators(
            Ohat, self.structure, self.state_dimension, self.input_dimension
        )

    def rhs(
        self,
        Ohat: jnp.ndarray,
        t,
        q: jnp.ndarray,
        input_func: Optional[Callable] = None,
    ) -> jnp.ndarray:
        u = None if input_func is None else jnp.atleast_1d(input_func(t))
        return rom_rhs(
            Ohat, q, u, self.structure, self.state_dimension, self.input_dimension
        )

    def predict(
        self,
        Ohat: jnp.ndarray,
        q0: jnp.ndarray,
        t_eval: jnp.ndarray,
        input_func: Optional[Callable] = None,
    ) -> jnp.ndarray:
        """Integrate the ROM for given operators. vmap over Ohat for
        posterior ensembles.

        Returns
        -------
        (r, k) array of ROM states at ``t_eval``.
        """

        def f(t, q):
            return self.rhs(Ohat, t, q, input_func)

        if self.ivp_method == "rk4":
            return rk4_solve(f, q0, t_eval, substeps=self.substeps)
        if self.ivp_method == "dirk2":

            def jac(t, q):
                u = None if input_func is None else jnp.atleast_1d(input_func(t))
                return rom_rhs_jacobian(
                    Ohat, q, u, self.structure,
                    self.state_dimension, self.input_dimension,
                )

            return dirk2_solve(f, q0, t_eval, jac=jac, substeps=self.substeps)
        raise ValueError(f"unknown ivp_method '{self.ivp_method}'")
