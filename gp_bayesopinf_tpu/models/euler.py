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

    # -- visualization ------------------------------------------------------------
    # Host-side matplotlib renderings of solved trajectories (reference
    # ``models/pde_models.py:414-568``). Imports are lazy so the compute
    # path never pays for matplotlib.
    def _format_space_axes(self, axes):
        x = np.asarray(self.spatial_domain)
        axes[-1].set_xlim(x[0], x[-1])
        axes[-1].set_xlabel(r"$x$")
        axes[0].set_ylabel("Velocity")
        axes[1].set_ylabel("Pressure")
        axes[2].set_ylabel("Density")

    def plot_space(self, vpzeta):
        """Velocity / pressure / density over space at one instant.
        ``vpzeta`` is a (3nx,) lifted state (reference
        ``pde_models.py:414-436``)."""
        import matplotlib.pyplot as plt

        v, p, zeta = (np.asarray(a) for a in self.split(jnp.asarray(vpzeta)))
        fig, axes = plt.subplots(3, 1, sharex=True)
        x = np.asarray(self.spatial_domain)
        axes[0].plot(x, v)
        axes[1].plot(x, p)
        axes[2].plot(x, 1.0 / zeta)
        self._format_space_axes(axes)
        return fig, axes

    def plot_time(self, t, series):
        """One lifted variable at a fixed spatial point over time
        (reference ``pde_models.py:438-457``)."""
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 1, figsize=(6, 2))
        ax.plot(np.asarray(t), np.asarray(series))
        ax.set_xlim(float(t[0]), float(t[-1]))
        ax.set_xlabel(r"$t$")
        return fig, ax

    def plot_traces(self, t, vpzeta, nlocs: int = 20, cmap=None, isdata=False):
        """Time traces of all three variables at ``nlocs`` spatial points,
        colored by location with a colorbar (reference
        ``pde_models.py:459-488``)."""
        import matplotlib.colors as mcolors
        import matplotlib.pyplot as plt

        t = np.asarray(t)
        v, p, zeta = (np.asarray(a) for a in self.split(jnp.asarray(vpzeta)))
        nx = v.shape[0]
        xlocs = np.linspace(0, nx, nlocs + 1, dtype=int)[:-1]
        xlocs += max(xlocs[1] // 2, 0) if nlocs > 1 else 0
        cmap = cmap or plt.cm.twilight
        colors = cmap(np.linspace(0, 1, nlocs + 1)[:-1])

        fig, axes = plt.subplots(3, 1, sharex=True, figsize=(12, 6))
        style = dict(lw=1)
        for j, c in zip(xlocs, colors):
            ls = "." if isdata else "-"
            axes[0].plot(t, v[j], ls, color=c, **style)
            axes[1].plot(t, p[j], ls, color=c, **style)
            axes[2].plot(t, 1.0 / zeta[j], ls, color=c, **style)
        axes[-1].set_xlim(t[0], t[-1])
        axes[-1].set_xlabel(r"$t$")
        axes[0].set_ylabel("Velocity")
        axes[1].set_ylabel("Pressure")
        axes[2].set_ylabel("Density")

        x = np.asarray(self.spatial_domain)
        mappable = plt.cm.ScalarMappable(
            norm=mcolors.Normalize(vmin=0, vmax=1),
            cmap=mcolors.LinearSegmentedColormap.from_list(
                "euler", cmap(np.linspace(0, 1, 400)), N=nlocs
            ),
        )
        cbar = fig.colorbar(mappable, ax=axes, pad=0.015)
        cbar.set_ticks(x[xlocs] / (x[-1] - x[0]))
        cbar.set_ticklabels([f"{xx:.2f}" for xx in x[xlocs]])
        cbar.set_label(r"spatial coordinate $x$")
        return fig, axes

    def plot_spacetime(self, t, vpzeta):
        """pcolormesh of velocity/pressure/density over space-time
        (reference ``pde_models.py:490-520``)."""
        import matplotlib.pyplot as plt

        arr = np.asarray(vpzeta)
        if arr.ndim != 2:
            raise ValueError("argument 'vpzeta' must be two dimensional")
        v, p, zeta = (np.asarray(a) for a in self.split(jnp.asarray(arr)))
        x = np.asarray(self.spatial_domain)
        X, T = np.meshgrid(x, np.asarray(t), indexing="ij")

        fig, axes = plt.subplots(3, 1, sharex=True, sharey=True, figsize=(6, 6))
        for var, ax, title in zip(
            (v, p, 1.0 / zeta), axes, ("Velocity", "Pressure", "Density")
        ):
            cdata = ax.pcolormesh(X, T, var, shading="nearest", cmap="viridis")
            fig.colorbar(cdata, ax=ax, extend="both")
            ax.set_ylabel(r"$t$")
            ax.set_title(title)
        axes[-1].set_xlabel(r"$x$")
        return fig, axes

    def animate(self, profile, skip: int = 20, saveas=None):
        """Animate a lifted (3nx, k) trajectory; returns the
        ``FuncAnimation`` (``.to_jshtml()`` embeds it in a notebook;
        reference ``pde_models.py:522-568`` returns the HTML directly)."""
        import matplotlib.animation as manimation
        import matplotlib.pyplot as plt

        profile = np.asarray(profile)
        if profile.ndim != 2:
            raise ValueError("two-dimensional data required for animation")
        data = np.split(profile, 3, axis=0)
        x = np.asarray(self.spatial_domain)

        fig, axes = plt.subplots(3, 1, sharex=True, figsize=(6, 6), dpi=150)
        lines = [ax.plot([], [])[0] for ax in axes]

        def update(index):
            for line, var in zip(lines, data):
                line.set_data(x, var[:, index * skip])
            axes[0].set_title(rf"$t = t_{{{index * skip}}}$")
            return lines

        for ax, var in zip(axes, data):
            ax.set_ylim(var.min() * 0.95, var.max() * 1.05)
        self._format_space_axes(axes)

        ani = manimation.FuncAnimation(
            fig, update, frames=profile.shape[1] // skip, interval=30,
            blit=True,
        )
        plt.close(fig)
        if saveas:
            ani.save(saveas)
        return ani

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
