"""Forced 1-D heat equation with Dirichlet BCs (truth model for the
multi-trajectory pipeline), plus the cubic-reaction variant.

Behavioral spec: reference ``models/pde_models.py:572-1133``:

    q_t = kappa q_xx [- q^3] + f(x, t),    q(0,t)=left_bc, q(L,t)=right_bc
    f(x, t) = a sin(2 pi t) / (1 + 100 (x - 1/4)^2)
            + b sin(4 pi t) / (1 + 100 (x - 3/4)^2)

Second-order finite differences in space; the stiff system is integrated
with the L-stable DIRK solver (reference uses scipy BDF with the analytic
Jacobian, ``pde_models.py:776-840``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..solve.ivp import dirk2_solve


@dataclasses.dataclass(frozen=True)
class HeatBimodal:
    spatial_domain: np.ndarray  # (N+2,) including boundary points
    left_bc: float = 0.0
    right_bc: float = 1.0
    diffusion: float = 1e-2
    a: float = 1.0
    b: float = 1.0
    substeps: int = 2

    num_variables = 1

    @property
    def x(self):
        """Interior grid points."""
        return np.asarray(self.spatial_domain)[1:-1]

    @property
    def N(self) -> int:
        return len(self.spatial_domain) - 2

    @property
    def dx(self) -> float:
        sd = np.asarray(self.spatial_domain)
        return float(sd[1] - sd[0])

    # -- precomputed operators (host-side, cheap) --------------------------------
    def _operators(self):
        dof = self.N
        dx2inv = self.diffusion / self.dx**2
        A = (
            np.diag(np.full(dof - 1, dx2inv), -1)
            + np.diag(np.full(dof, -2 * dx2inv))
            + np.diag(np.full(dof - 1, dx2inv), 1)
        )
        c = np.zeros(dof)
        c[0] = self.left_bc * dx2inv
        c[-1] = self.right_bc * dx2inv
        B = np.column_stack(
            [
                1.0 / (1.0 + 100.0 * (self.x - 0.25) ** 2),
                1.0 / (1.0 + 100.0 * (self.x - 0.75) ** 2),
            ]
        )
        return jnp.asarray(A), jnp.asarray(c), jnp.asarray(B)

    @property
    def stiffness(self):
        return self._operators()[0]

    @property
    def constant(self):
        return self._operators()[1]

    @property
    def input_matrix(self):
        return self._operators()[2]

    # -- forcing -------------------------------------------------------------------
    @staticmethod
    def oscillators(t, a, b):
        return jnp.stack(
            [a * jnp.sin(2.0 * jnp.pi * t), b * jnp.sin(4.0 * jnp.pi * t)]
        )

    # -- initial conditions ----------------------------------------------------------
    @staticmethod
    def initial_conditions(x, alpha, beta):
        """Closed-form IC family (reference ``pde_models.py:728-752``)."""
        x = jnp.asarray(x)
        L = x[-1] - x[0]
        h1 = 6.0 * jnp.exp(-x) * x * (L - x) ** 3
        h2 = 10.0 * jnp.exp(x) * x * (L - x) * jnp.sin(x / (L * 6.0))
        nonhom = alpha + (beta - alpha) / L * (x - x[0])
        return h1 - h2 + nonhom

    # -- dynamics -----------------------------------------------------------------------
    def _rhs_terms(self, t, q, A, c, B):
        return c + A @ q + B @ self.oscillators(t, self.a, self.b)

    def derivative(self, t, q):
        """Interior-DOF RHS."""
        A, c, B = self._operators()
        return self._rhs_terms(t, q, A, c, B)

    def jacobian(self, t, q):
        return self._operators()[0]

    def solve(self, initial_conditions, timepoints) -> jnp.ndarray:
        """Integrate; returns (N+2, k) including boundary rows.

        Accepts ICs with or without the boundary points (reference
        ``pde_models.py:808-824`` validates boundary consistency).
        """
        q0 = jnp.asarray(initial_conditions)
        if q0.shape[0] == self.N + 2:
            q0 = q0[1:-1]
        A, c, B = self._operators()

        def f(t, q):
            return self._rhs(t, q, A, c, B)

        def jac(t, q):
            return self._jac(t, q, A)

        t_eval = jnp.asarray(timepoints)
        sol = dirk2_solve(f, q0, t_eval, jac=jac, substeps=self.substeps)
        left = jnp.full((1, t_eval.shape[0]), self.left_bc, dtype=sol.dtype)
        right = jnp.full((1, t_eval.shape[0]), self.right_bc, dtype=sol.dtype)
        return jnp.concatenate([left, sol, right], axis=0)

    # rhs/jacobian hooks shared with the cubic subclass ---------------------------
    def _rhs(self, t, q, A, c, B):
        return self._rhs_terms(t, q, A, c, B)

    def _jac(self, t, q, A):
        return A

    # -- noise ---------------------------------------------------------------------------
    def noise(self, key, states, noise_level=0.0):
        """Relative Gaussian noise on interior points, sparing the initial
        column and boundary rows (reference ``pde_models.py:842-877``)."""
        if not noise_level:
            return states
        interior = states[1:-1, 1:]
        noised = interior + (noise_level * interior) * jax.random.normal(
            key, interior.shape, dtype=states.dtype
        )
        body = jnp.concatenate(
            [states[0:1, 1:], noised, states[-1:, 1:]], axis=0
        )
        return jnp.concatenate([states[:, :1], body], axis=1)


@dataclasses.dataclass(frozen=True)
class CubicHeatBimodal(HeatBimodal):
    """Heat equation with a cubic reaction term -q^3
    (reference ``pde_models.py:1082-1133``)."""

    def _rhs(self, t, q, A, c, B):
        return self._rhs_terms(t, q, A, c, B) - q**3

    def _jac(self, t, q, A):
        return A - jnp.diag(3.0 * q * q)

    def derivative(self, t, q):
        A, c, B = self._operators()
        return self._rhs(t, q, A, c, B)

    def jacobian(self, t, q):
        return self._jac(t, q, self._operators()[0])
