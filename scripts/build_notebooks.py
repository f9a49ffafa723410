"""Generate the demo notebooks in examples/ (capability parity with the
reference's notebook set: ``models/seird.ipynb``, ``models/heat.ipynb``,
``ODEs/test.ipynb``).

The notebooks are committed artifacts; this script is their source of
truth so they can be regenerated (and kept output-free) mechanically:

    python scripts/build_notebooks.py
"""

import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "examples")

PLATFORM_CELL = """\
import os

import jax

# Demos run anywhere: default to CPU unless the caller opts into an
# accelerator (set GPBOI_NB_PLATFORM=tpu on a TPU host). Must happen
# before any jax computation.
jax.config.update("jax_platforms", os.environ.get("GPBOI_NB_PLATFORM", "cpu"))

import numpy as np
import matplotlib.pyplot as plt

import jax.numpy as jnp"""


def nb(cells):
    book = nbf.v4.new_notebook()
    book["metadata"]["kernelspec"] = {
        "display_name": "Python 3",
        "language": "python",
        "name": "python3",
    }
    book["cells"] = [
        nbf.v4.new_markdown_cell(src) if kind == "md"
        else nbf.v4.new_code_cell(src)
        for kind, src in cells
    ]
    return book


# --------------------------- seird.ipynb --------------------------------------
seird = nb([
    ("md", "# Epidemiological Model Simulations\n\n"
     "Forward simulations of the SEIRD family on the accelerator\n"
     "(`gp_bayesopinf_tpu.models.seird`; capability mirror of the\n"
     "reference notebook `models/seird.ipynb`). The five-compartment\n"
     "model is reparameterized to the four regression unknowns the\n"
     "operator-inference pipeline estimates."),
    ("code", PLATFORM_CELL + "\n\nfrom gp_bayesopinf_tpu.models.seird import SEIRD2\n"
     "from gp_bayesopinf_tpu.utils import key_from_seed"),
    ("md", "## SEIRD model\n\n"
     "Epidemiological parameters $(N, \\beta, \\delta, \\gamma, \\alpha, \\rho)$\n"
     "map to the four regression parameters\n"
     "$(\\beta/N,\\ \\delta,\\ (1-\\alpha)\\gamma,\\ \\alpha\\rho)$\n"
     "(`SEIRD2.convert_parameters`). Integration is a fixed-step RK4\n"
     "`lax.scan` on the device."),
    ("code", """\
N = 1.0
beta, delta, gamma, alpha, rho = 0.25, 0.1, 0.1, 0.05, 0.05
E0, I0, R0, D0 = 0.005, 0.001, 0.0, 0.0
S0 = N - E0 - I0 - R0 - D0

params4 = SEIRD2.convert_parameters((N, beta, delta, gamma, alpha, rho))
seird = SEIRD2(parameters=tuple(np.asarray(params4)))
t = np.linspace(0, 200, 500)
solution = seird.solve([S0, E0, I0, R0, D0], t, strict=True)
solution.shape"""),
    ("code", """\
# Plot the solution without noise.
seird.plot(t, solution, ls="-")
plt.show()"""),
    ("code", """\
# Plot the solution with multiplicative truncated-normal noise (the
# reference's noise model, kept nonnegative for count-like variables).
noisy = seird.noise(key_from_seed(0), solution, 0.1)
fig, ax = seird.plot(t, noisy)
ax.set_ylim(top=1.4)
ax.legend(loc="upper center", ncol=5)
plt.show()"""),
    ("code", """\
# Phase-plane view (susceptible vs infected).
seird.plot_phase(t, solution, variables=(0, 2))
plt.show()"""),
])

# --------------------------- heat.ipynb ---------------------------------------
heat = nb([
    ("md", "# Heat Simulations\n\n"
     "Solution behavior for the forced cubic heat equation\n"
     "(`gp_bayesopinf_tpu.models.heat.CubicHeatBimodal`; capability\n"
     "mirror of the reference notebook `models/heat.ipynb`).\n\n"
     "$$\\frac{\\partial q}{\\partial t} = \\kappa\\,\\frac{\\partial^2 q}"
     "{\\partial x^2} - q^3 + f(x, t),\\qquad x \\in (0, 1),$$\n\n"
     "with Dirichlet boundary conditions $q(0,t)=\\alpha$, $q(1,t)=\\beta$\n"
     "and the bimodal forcing\n"
     "$f(x,t) = a\\,e^{-(x-1/4)^2/0.005}\\sin(2\\pi t)"
     " + b\\,e^{-(x-3/4)^2/0.005}\\sin(4\\pi t)$.\n"
     "Time stepping is an implicit SDIRK2 scheme whose Newton systems are\n"
     "tridiagonal and solved with an $O(N)$ Thomas solve under `lax.scan`."),
    ("code", PLATFORM_CELL + "\n\nfrom gp_bayesopinf_tpu.models.heat import CubicHeatBimodal"),
    ("code", """\
alpha, beta = 0.0, 1.0
kappa = 5e-3
x = np.linspace(0, 1, 500)
t = np.linspace(0, 2, 500)

model = CubicHeatBimodal(x, alpha, beta, diffusion=kappa, a=1.0, b=1.0)
q0 = x * (1 - x) + x  # smooth initial profile compatible with the BCs
solution = model.solve(q0, t)
solution.shape"""),
    ("code", """\
fig, axes = model.plot_spacetime(t, solution, nlines=12)
axes[0].set_title("profiles in space")
axes[1].set_title("traces in time")
plt.show()"""),
    ("code", """\
# Render the animation to a file (HTML display works in a live kernel:
# from IPython.display import HTML; HTML(anim.to_jshtml())). Subsampled
# frames keep the GIF render quick.
anim = model.animate(np.asarray(solution)[:, ::5], saveas="heat_cubic.gif")"""),
    ("md", "A bimodal forcing with opposite-sign amplitudes drives the two\n"
     "humps against each other; the cubic reaction saturates the response."),
    ("code", """\
model2 = CubicHeatBimodal(x, alpha, beta, diffusion=kappa, a=1.0, b=-2.0)
solution2 = model2.solve(q0, t)
fig, axes = model2.plot_spacetime(t, solution2, nlines=12)
plt.show()"""),
])

# --------------------------- gp_backends.ipynb --------------------------------
gpnb = nb([
    ("md", "# Dual-backend GP fitting\n\n"
     "The framework fits GP hyperparameters with two independent\n"
     "implementations and cross-checks them, the way the reference fork\n"
     "compared sklearn against gpytorch (`ODEs/test.ipynb`,\n"
     "`ODEs/main.py:89-182`):\n\n"
     "1. **Primary (JAX/TPU)** — `gp.fit.fit_gp_hyperparameters`: one\n"
     "   batched program screening all (mode × restart) starts with Adam,\n"
     "   then a damped-Newton polish and an exact full-data re-rank.\n"
     "2. **Second backend (C++)** — `native.fit_gp`: serial projected\n"
     "   L-BFGS restarts on the exact NLML, no JAX anywhere\n"
     "   (`native/gpboi_native.cpp`; scipy fallback if the shared library\n"
     "   is not built)."),
    ("code", PLATFORM_CELL + "\n\n"
     "from gp_bayesopinf_tpu.gp import fit_gaussian_processes\n"
     "from gp_bayesopinf_tpu.gp.nlml import nlml\n"
     "from gp_bayesopinf_tpu.models.seird import SEIRD2\n"
     "from gp_bayesopinf_tpu.utils import key_from_seed"),
    ("code", """\
# Noisy observations of the infected compartment (the reference notebook
# loads the same kind of sampled SEIRD trajectory from .npy files).
CONSTANT_VALUE_BOUNDS = (1e-8, 1e5)
LENGTH_SCALE_BOUNDS = (0.1, 100)
NOISE_LEVEL_BOUNDS = (1e-16, 0.5)
N_RESTARTS_OPTIMIZER = 100

seird = SEIRD2()
t_dense = np.linspace(0, 90, 500)
rng = np.random.default_rng(21092023)
t_train = np.sort(rng.choice(np.arange(91.0), 60, replace=False))
truth = np.asarray(seird.solve([0.994, 0.005, 0.001, 0.0, 0.0], t_train))
y_train = truth[2] * (1 + 0.10 * rng.standard_normal(t_train.size))"""),
    ("code", """\
# Backend 1: the batched JAX fitter (here a 1-row batch).
gp = fit_gaussian_processes(
    t_dense, t_train, y_train[None],
    constant_bounds=CONSTANT_VALUE_BOUNDS,
    length_scale_bounds=LENGTH_SCALE_BOUNDS,
    noise_level_bounds=NOISE_LEVEL_BOUNDS,
    n_restarts_optimizer=N_RESTARTS_OPTIMIZER,
    key=key_from_seed(0),
)[0]
print(gp)"""),
    ("code", """\
# Backend 2: the native C++ fit (projected L-BFGS, exact NLML).
from gp_bayesopinf_tpu import native

(s2_n, ell_n, chi_n), nlml_n = native.fit_gp(
    t_train, y_train, CONSTANT_VALUE_BOUNDS, LENGTH_SCALE_BOUNDS,
    NOISE_LEVEL_BOUNDS, n_restarts=N_RESTARTS_OPTIMIZER, seed=0,
)
nlml_jax = float(nlml(
    jnp.log(jnp.array([gp.constant, gp.length_scale, gp.noise_level])),
    jnp.asarray(t_train), jnp.asarray(y_train),
))
print(f"JAX    backend: sigma^2={gp.constant:.4e} ell={gp.length_scale:.4e} "
      f"chi={gp.noise_level:.4e}  NLML={nlml_jax:.6f}")
print(f"native backend: sigma^2={s2_n:.4e} ell={ell_n:.4e} "
      f"chi={chi_n:.4e}  NLML={nlml_n:.6f}")"""),
    ("code", """\
# Posterior means/stds from both backends on the dense grid, compared the
# way the reference compared sklearn vs gpytorch (allclose at rtol=1e-1 —
# ODEs/main.py:155,182; independent optimizers land in the same basin).
from gp_bayesopinf_tpu.gp.gp import GaussianProcess

mean_a, std_a = (np.asarray(v) for v in gp.predict(t_dense))
gp_native = GaussianProcess(
    t_training=jnp.asarray(t_train), y=jnp.asarray(y_train),
    constant=s2_n, length_scale=ell_n, noise_level=chi_n,
)
mean_b, std_b = (np.asarray(v) for v in gp_native.predict(t_dense))
print("means allclose(rtol=1e-1):", np.allclose(mean_a, mean_b, rtol=1e-1, atol=1e-3))
print("stds  allclose(rtol=1e-1):", np.allclose(std_a, std_b, rtol=1e-1, atol=1e-3))"""),
    ("code", """\
plt.figure(figsize=(10, 6))
plt.plot(t_dense, mean_a, "b-", label="JAX mean")
plt.fill_between(t_dense, mean_a - 2 * std_a, mean_a + 2 * std_a,
                 alpha=0.25, label="JAX 95%")
plt.plot(t_dense, mean_b, "r--", label="native mean")
plt.plot(t_train, y_train, "k.", ms=5, label="noisy samples")
plt.xlabel("t")
plt.ylabel("infected")
plt.legend()
plt.show()"""),
])


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, book in [("seird.ipynb", seird), ("heat.ipynb", heat),
                       ("gp_backends.ipynb", gpnb)]:
        path = os.path.join(OUT, name)
        nbf.write(book, path)
        print("wrote", path)


if __name__ == "__main__":
    main()
