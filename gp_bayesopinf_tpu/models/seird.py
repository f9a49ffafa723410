"""SEIRD epidemic models (truth models for the ODE pipeline).

Behavioral spec: reference ``models/ode_models.py:322-494``. Two
parameterizations:

* ``SEIRD``  — six parameters (N, beta, delta, gamma, alpha, rho).
* ``SEIRD2`` — four parameters (p1, p2, p3, p4) = (beta/N, delta,
  (1-alpha)gamma, alpha*rho); the estimation target, LINEAR in parameters:

      dS/dt = -p1 S I
      dE/dt =  p1 S I - p2 E
      dI/dt =  p2 E - p3 I - p4 I
      dR/dt =  p3 I
      dD/dt =  p4 I

The truncated-normal noise model keeps states in [0, 1] and exact zeros
exactly zero (reference ``ode_models.py:281-318``).
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..solve.ivp import rk4_solve


def _truncnorm_noise(key, states, noise_level):
    """Truncated-normal noise: support [0, 1] per state, zeros stay zero.

    The standardized truncated draw happens in float32 (erf-inverse in
    emulated f64 does not compile on TPU; noise realization needs no
    more precision) and is applied in the states' dtype."""
    iszero = jnp.abs(states) < 5e-16
    std = jnp.where(iszero, 1e-3, jnp.abs(noise_level * states))
    # Standardized truncation bounds, as in scipy.stats.truncnorm:
    a = jnp.minimum(0.0, -states / std).astype(jnp.float32)
    b = jnp.maximum(0.0, (1.0 - states) / std).astype(jnp.float32)
    z = jax.random.truncated_normal(
        key, a, b, shape=states.shape, dtype=jnp.float32
    )
    noised = states + std * z.astype(states.dtype)
    return jnp.where(iszero, 0.0, noised)


@dataclasses.dataclass(frozen=True)
class SEIRD2:
    """Four-parameter SEIRD reparameterization."""

    parameters: tuple = (0.00025, 0.1, 0.099, 0.005)
    substeps: int = 4

    LABELS = ("Susceptible", "Exposed", "Infected", "Recovered", "Deceased")
    num_variables = 5
    num_parameters = 4

    @staticmethod
    def convert_parameters(params6):
        """(N, beta, delta, gamma, alpha, rho) -> (p1, p2, p3, p4)."""
        N, beta, delta, gamma, alpha, rho = params6
        return jnp.array([beta / N, delta, (1 - alpha) * gamma, alpha * rho])

    def derivative(self, t, state, parameters=None):
        p1, p2, p3, p4 = (
            self.parameters if parameters is None else tuple(parameters)
        )
        S, E, I = state[0], state[1], state[2]
        dS = -p1 * S * I
        dE = -dS - p2 * E
        dR = p3 * I
        dD = p4 * I
        dI = p2 * E - dR - dD
        return jnp.stack([dS, dE, dI, dR, dD])

    def solve(self, initial_conditions, timepoints, parameters=None):
        """(5, k) trajectory over ``timepoints`` (fixed-step RK4 on device)."""
        params = (
            jnp.asarray(self.parameters)
            if parameters is None
            else jnp.asarray(parameters)
        )

        def f(t, q):
            return self.derivative(t, q, params)

        return rk4_solve(
            f, jnp.asarray(initial_conditions), jnp.asarray(timepoints),
            substeps=self.substeps,
        )

    def noise(self, key, states, noise_level=0.0):
        if not noise_level:
            return states
        return _truncnorm_noise(key, states, noise_level)

    @staticmethod
    def data_matrix(states: jnp.ndarray) -> jnp.ndarray:
        """Stacked (5k, 4) data matrix for the coupled linear-in-parameters
        regression (behavioral spec: reference ``ODEs/config_seird.py:29-43``).

        Row blocks follow the equation order (dS, dE, dI, dR, dD).
        """
        S, E, I = states[0], states[1], states[2]
        SI = S * I
        Z = jnp.zeros_like(S)
        blk_S = jnp.stack([-SI, Z, Z, Z], axis=1)
        blk_E = jnp.stack([SI, -E, Z, Z], axis=1)
        blk_I = jnp.stack([Z, E, -I, -I], axis=1)
        blk_R = jnp.stack([Z, Z, I, Z], axis=1)
        blk_D = jnp.stack([Z, Z, Z, I], axis=1)
        return jnp.concatenate([blk_S, blk_E, blk_I, blk_R, blk_D], axis=0)

    @staticmethod
    def data_matrix_blocks(states: jnp.ndarray) -> jnp.ndarray:
        """(5, k, 4) per-equation blocks of ``data_matrix`` (for the
        block-weighted least-squares path)."""
        S, E, I = states[0], states[1], states[2]
        SI = S * I
        Z = jnp.zeros_like(S)
        return jnp.stack(
            [
                jnp.stack([-SI, Z, Z, Z], axis=1),
                jnp.stack([SI, -E, Z, Z], axis=1),
                jnp.stack([Z, E, -I, -I], axis=1),
                jnp.stack([Z, Z, I, Z], axis=1),
                jnp.stack([Z, Z, Z, I], axis=1),
            ]
        )


@dataclasses.dataclass(frozen=True)
class SEIRD(SEIRD2):
    """Six-parameter SEIRD model (N, beta, delta, gamma, alpha, rho)."""

    parameters: tuple = (1000.0, 0.25, 0.1, 0.1, 0.01, 0.05)
    num_parameters = 6

    def derivative(self, t, state, parameters=None):
        N, beta, delta, gamma, alpha, rho = (
            self.parameters if parameters is None else tuple(parameters)
        )
        S, E, I = state[0], state[1], state[2]
        dS = -beta * S * I / N
        dE = -dS - delta * E
        dD = alpha * rho * I
        dR = (1 - alpha) * gamma * I
        dI = delta * E - dR - dD
        return jnp.stack([dS, dE, dI, dR, dD])
