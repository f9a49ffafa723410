"""1-D compressible Euler equations on a periodic domain (truth model for
the PDEs pipeline).

Behavioral spec: reference ``models/pde_models.py:116-568``. Conservative
variables (rho, rho v, rho e) with ideal-gas closure (gamma = 1.4) are
integrated with first-order upwind differences; the specific-volume
variables (v, p, 1/rho) induce a purely quadratic structure and are the
learning variables. The periodic upwind stencil is a ``jnp.roll`` — the
same data motion the reference uses with numpy, and one XLA fusion here.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Euler:
    """Periodic 1-D Euler solver in conservative variables.

    Parameters
    ----------
    spatial_domain : (nx,) uniform grid (periodic; do not repeat the
        endpoint).
    substeps : RK4 substeps per output interval. The explicit CFL limit for
        the reference's flagship setup (dx = 0.01, |v| + c ~ 180) is about
        5.6e-5; the default resolves it for the 401-point/0.15s grid.
    """

    spatial_domain: np.ndarray
    substeps: int = 12
    cfl_safety: float = 0.4

    gamma = 1.4
    num_variables = 3

    @property
    def dx(self) -> float:
        return float(self.spatial_domain[1] - self.spatial_domain[0])

    # -- variable transforms ---------------------------------------------------
    @staticmethod
    def split(states):
        return jnp.split(states, 3, axis=0)

    @classmethod
    def lift(cls, states):
        """[rho, rho v, rho e] -> [v, p, 1/rho] (specific-volume lifting)."""
        rho, rho_v, rho_e = cls.split(states)
        v = rho_v / rho
        p = (cls.gamma - 1.0) * (rho_e - 0.5 * rho * v * v)
        return jnp.concatenate([v, p, 1.0 / rho], axis=0)

    @classmethod
    def unlift(cls, lifted):
        """[v, p, 1/rho] -> [rho, rho v, rho e]."""
        v, p, zeta = cls.split(lifted)
        rho = 1.0 / zeta
        rho_v = rho * v
        rho_e = p / (cls.gamma - 1.0) + 0.5 * rho * v * v
        return jnp.concatenate([rho, rho_v, rho_e], axis=0)

    @classmethod
    def lift_ddts(cls, states, ddts):
        """Chain rule: conservative d/dt -> specific-volume d/dt."""
        rho, rho_v, _ = cls.split(states)
        drho, drho_v, drho_e = cls.split(ddts)
        v = rho_v / rho
        dv = (drho_v - drho * v) / rho
        dp = (cls.gamma - 1.0) * (drho_e - rho_v * dv - drho * v * v / 2.0)
        dzeta = -drho / (rho * rho)
        return jnp.concatenate([dv, dp, dzeta], axis=0)

    # -- initial conditions -----------------------------------------------------
    def initial_conditions(self, init_params) -> jnp.ndarray:
        """Periodic-cubic-spline ICs in the learning variables [v, p, 1/rho].

        ``init_params`` = three density knots then three velocity knots at
        x0 + (0, L/3, 2L/3); pressure is constant 1e5
        (reference ``pde_models.py:240-289``).
        """
        import scipy.interpolate

        x = np.asarray(self.spatial_domain)
        L = x[-1] - x[0]
        nodes = np.array([0.0, L / 3.0, 2.0 * L / 3.0, L]) + x[0]
        rho0 = np.concatenate([init_params[:3], init_params[:1]])
        v0 = np.concatenate([init_params[3:], init_params[3:4]])
        v = scipy.interpolate.CubicSpline(nodes, v0, bc_type="periodic")(x)
        rho = scipy.interpolate.CubicSpline(nodes, rho0, bc_type="periodic")(x)
        p = 1e5 * np.ones_like(v)
        return jnp.asarray(np.concatenate([v, p, 1.0 / rho]))

    # -- dynamics ----------------------------------------------------------------
    def derivative(self, t, state):
        """Upwind semi-discrete RHS in CONSERVATIVE variables."""
        rho, rho_v, rho_e = self.split(state)
        v = rho_v / rho
        p = (self.gamma - 1.0) * (rho_e - 0.5 * rho_v * v)

        def ddx(w):
            return (w - jnp.roll(w, 1, axis=0)) / self.dx

        return -jnp.concatenate(
            [ddx(rho_v), ddx(rho_v * v + p), ddx((rho_e + p) * v)], axis=0
        )

    def solve(self, initial_conditions, timepoints) -> jnp.ndarray:
        """Integrate from specific-volume ICs; returns lifted (3nx, k).

        The substep count is chosen per call from the CFL limit evaluated
        at the initial condition and the LARGEST output interval, so
        non-uniform sample grids (sparse random snapshot times,
        reference ``PDEs/step1_generate_data.py:48-56``) remain stable.
        ``timepoints`` must be a concrete array (data generation runs
        outside jit).
        """
        from ..solve.ivp import rk4_solve

        ics = np.asarray(initial_conditions)
        v, p, zeta = np.split(ics, 3)
        rho = 1.0 / zeta
        sound = np.sqrt(self.gamma * np.abs(p) / rho)
        speed = float(np.max(np.abs(v) + sound))
        dt_cfl = self.cfl_safety * self.dx / max(speed, 1e-30)

        t_np = np.asarray(timepoints)
        max_gap = float(np.max(np.diff(t_np)))
        substeps = max(self.substeps, int(np.ceil(max_gap / dt_cfl)))

        q0 = self.unlift(jnp.asarray(initial_conditions))
        sol = rk4_solve(
            self.derivative, q0, jnp.asarray(timepoints), substeps=substeps
        )
        return self.lift(sol)

    # -- noise --------------------------------------------------------------------
    def noise(self, key, states, noise_level=0.0):
        """Scale-relative Gaussian noise applied in conservative variables;
        the initial-condition column stays clean
        (reference ``pde_models.py:353-391``)."""
        if not noise_level:
            return states
        unlifted = self.unlift(states[:, 1:])
        scale = jnp.concatenate(
            [
                jnp.full_like(var, noise_level * (var.max() - var.min()))
                for var in self.split(unlifted)
            ],
            axis=0,
        )
        noised = unlifted + scale * jax.random.normal(
            key, unlifted.shape, dtype=unlifted.dtype
        )
        return jnp.concatenate([states[:, :1], self.lift(noised)], axis=1)
