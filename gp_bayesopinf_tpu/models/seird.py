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
import numpy as np

from ..solve.ivp import rk4_solve


def _truncnorm_noise_np(rng, states, noise_level):
    """Host-NumPy twin of :func:`_truncnorm_noise` (same distribution —
    the reference's truncated-normal noise model,
    ``models/ode_models.py`` — sampled by CDF inversion,
    ``ndtri(ndtr(a) + u (ndtr(b) - ndtr(a)))``, scipy.stats.truncnorm's
    own default method without its 0.8 s package import). Used by the
    pipeline's data-generation stage so a fresh process pays neither jax
    tracing/compiles for the draw programs nor heavyweight imports."""
    from scipy.special import ndtr, ndtri

    states = np.asarray(states, np.float64)
    iszero = np.abs(states) < 5e-16
    std = np.where(iszero, 1e-3, np.abs(noise_level * states))
    a = np.minimum(0.0, -states / std)
    b = np.maximum(0.0, (1.0 - states) / std)
    cdf_a = ndtr(a)
    u = rng.uniform(size=states.shape)
    z = ndtri(cdf_a + u * (ndtr(b) - cdf_a))
    return np.where(iszero, 0.0, states + std * z)


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

    def solve(self, initial_conditions, timepoints, parameters=None,
              strict=False):
        """(5, k) trajectory over ``timepoints`` (fixed-step RK4 on device).

        With ``strict=True`` the initial conditions must sum to the
        population (N for the 6-parameter model, 1 for the normalized
        reparameterization) — the reference's fail-fast IC validation
        (``models/ode_models.py:246-279``).
        """
        if strict:
            import numpy as np

            N = self.parameters[0] if self.num_parameters == 6 else 1.0
            total = float(np.sum(np.asarray(initial_conditions)))
            if abs(total - N) > 1e-12 * max(1.0, abs(N)):
                raise ValueError(
                    f"initial conditions sum to {total}, not {N}"
                )
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

    def _rhs_np(self, parameters=None):
        """NumPy right-hand side (host truth solves, ``solve_host``)."""
        import numpy as np

        p1, p2, p3, p4 = (
            self.parameters if parameters is None else tuple(parameters)
        )

        def f(t, q):
            S, E, I = q[0], q[1], q[2]
            dS = -p1 * S * I
            dE = -dS - p2 * E
            dR = p3 * I
            dD = p4 * I
            dI = p2 * E - dR - dD
            return np.array([dS, dE, dI, dR, dD])

        return f

    def solve_host(self, initial_conditions, timepoints, parameters=None):
        """Host twin of :meth:`solve` (identical RK4 stepping).

        Truth-model data generation is the reference's scipy-on-host L1
        stage; pipelines call this instead of the traced ``solve`` so the
        stage costs milliseconds instead of per-call retraces and
        remote-compile round trips. The 4-parameter model dispatches to
        the native C++ core's RK4 (``native/gpboi_native.cpp``,
        ``gpboi_seird2_solve`` — same stepping, same FP expression order):
        the pure-Python interpreter overhead of ``rk4_solve_np`` is
        ~100 us per substep, which at the prediction grid (500 points x 8
        substeps) costs seconds per pipeline run for microseconds of
        arithmetic.
        """
        import numpy as np

        params = self.parameters if parameters is None else parameters
        if self.num_parameters == 4 and len(tuple(np.asarray(params))) == 4:
            from .. import native as native_mod

            if native_mod.available():
                return native_mod.seird2_solve(
                    np.asarray(params, np.float64),
                    initial_conditions,
                    timepoints,
                    substeps=self.substeps,
                )
        from ..solve.ivp import rk4_solve_np

        return rk4_solve_np(
            self._rhs_np(parameters),
            initial_conditions,
            timepoints,
            substeps=self.substeps,
        )

    def noise(self, key, states, noise_level=0.0):
        if not noise_level:
            return states
        return _truncnorm_noise(key, states, noise_level)

    def noise_host(self, rng, states, noise_level=0.0):
        """Host-NumPy noise twin (:func:`_truncnorm_noise_np`): same
        truncated-normal model drawn with a NumPy ``Generator`` — the
        pipeline derives it deterministically from the threaded key."""
        if not noise_level:
            return np.asarray(states)
        return _truncnorm_noise_np(rng, states, noise_level)

    # -- visualization ------------------------------------------------------------
    @classmethod
    def plot(cls, time_domain, states, ls=".", ax=None):
        """Overlay all state variables on one axes (reference
        ``models/ode_models.py:148-171``)."""
        import matplotlib.pyplot as plt
        import numpy as np

        if ax is None:
            _, ax = plt.subplots(1, 1, figsize=(12, 6))
        t = np.asarray(time_domain)
        for var, label in zip(np.asarray(states), cls.LABELS):
            ax.plot(t, var, ls, lw=2, label=label)
        ax.set_xlim(left=t[0])
        ax.set_xlabel("$t$")
        ax.set_ylabel("States")
        ax.legend()
        return ax.get_figure(), ax

    @classmethod
    def plot_phase(cls, t, states, variables=(0, 1), fig=None):
        """Two state trajectories + their phase portrait (reference
        ``models/ode_models.py:172-239``): stacked time series on the left,
        phase plot on the right."""
        import matplotlib.pyplot as plt
        import numpy as np

        states = np.asarray(states)
        if len(states) != 2:
            states = np.array([states[variables[0]], states[variables[1]]])
        if fig is None:
            fig = plt.figure(constrained_layout=True, figsize=(9, 4))
            spec = fig.add_gridspec(
                nrows=2, ncols=2, hspace=0.1, wspace=0.15,
                width_ratios=[1.5, 1], height_ratios=[1, 1],
            )
            fig.add_subplot(spec[0, 0])
            fig.add_subplot(spec[1, 0])
            fig.add_subplot(spec[:, 1])
        axes = fig.axes
        if len(axes) != 3:
            raise ValueError("figure should have 3 Axes")

        t = np.asarray(t)
        axes[0].plot(t, states[0], "C0", lw=1)
        axes[0].plot([t[0]], [states[0, 0]], "ko")
        axes[1].plot(t, states[1], "C1", lw=1)
        axes[1].plot([t[0]], [states[1, 0]], "ko")
        axes[2].plot(states[0], states[1], "C3", lw=1)
        axes[2].plot([states[0, 0]], [states[1, 0]], "ko")

        axes[0].set_xticks([])
        axes[0].set_ylabel(cls.LABELS[variables[0]])
        axes[1].set_xlabel("$t$")
        axes[1].set_ylabel(cls.LABELS[variables[1]])
        fig.align_ylabels([axes[0], axes[1]])
        axes[2].set_xlabel(cls.LABELS[variables[0]])
        axes[2].set_ylabel(cls.LABELS[variables[1]])
        axes[2].set_title("Phase plot")
        return fig

    def cah_operators(self, params: jnp.ndarray) -> jnp.ndarray:
        """Quadratic "cAH" operator rows equivalent to ``derivative``.

        The SEIRD2 right-hand side is exactly quadratic in the state, so a
        parameter vector defines operator rows over the compressed features
        ``[1, q, ckron(q)]`` (``ops.quadratic.ckron`` ordering) with

            O @ features == derivative(t, q, params)   for all q.

        This maps posterior parameter draws onto the ensemble-screening
        megakernel's operator layout so the ODE pipeline's regularization
        search (reference ``ODEs/step3_estimate.py`` 20-draw screen) can
        run on the fused quadratic screen instead of per-draw integration.

        Parameters
        ----------
        params : (4,) or (1, 4) array — SEIRD2 parameters; a (6,) or
            (1, 6) array is converted via ``convert_parameters`` first.

        Returns
        -------
        (5, 21) operator matrix ``[c | A | H]``.
        """
        params = jnp.asarray(params).reshape(-1)
        if params.shape[0] == 6:
            params = self.convert_parameters(params)
        p1, p2, p3, p4 = params[0], params[1], params[2], params[3]
        r = self.num_variables
        d = 1 + r + r * (r + 1) // 2
        # Column layout: [0] constant; [1 + j] linear in q_j;
        # [1 + r + (i(i+1)/2 + j)] quadratic q_i q_j (i >= j, ckron order).
        colA = lambda j: 1 + j
        colH = lambda i, j: 1 + r + i * (i + 1) // 2 + j
        O = jnp.zeros((r, d), dtype=params.dtype)
        O = O.at[0, colH(2, 0)].set(-p1)  # dS = -p1 S I
        O = O.at[1, colH(2, 0)].set(p1)  # dE = p1 S I - p2 E
        O = O.at[1, colA(1)].set(-p2)
        O = O.at[2, colA(1)].set(p2)  # dI = p2 E - (p3 + p4) I
        O = O.at[2, colA(2)].set(-(p3 + p4))
        O = O.at[3, colA(2)].set(p3)  # dR = p3 I
        O = O.at[4, colA(2)].set(p4)  # dD = p4 I
        return O

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

    def _rhs_np(self, parameters=None):
        import numpy as np

        N, beta, delta, gamma, alpha, rho = (
            self.parameters if parameters is None else tuple(parameters)
        )

        def f(t, q):
            S, E, I = q[0], q[1], q[2]
            dS = -beta * S * I / N
            dE = -dS - delta * E
            dD = alpha * rho * I
            dR = (1 - alpha) * gamma * I
            dI = delta * E - dR - dD
            return np.array([dS, dE, dI, dR, dD])

        return f
