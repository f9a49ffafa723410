"""Batched multi-restart GP hyperparameter fitting.

The reference fits one sklearn GP per POD mode, each with 1 + n_restarts
serial L-BFGS-B runs (``codebase/gpkernels.py:302-308``,
``PDEs/config_euler.py:103`` uses 100 restarts) — thousands of sequential
small Cholesky factorizations on CPU. Here the whole (modes x restarts)
population is ONE jitted computation: ``vmap`` over restarts, ``vmap`` over
modes, L-BFGS (optax, zoom line search) on the box-transformed NLML, fixed
iteration count for static shapes, best-restart selection by final NLML.

Restart-seeding convention mirrors sklearn: restart 0 starts from the
kernel's default values projected into the bounds (sigma2 = ell = chi = 1);
the rest are sampled log-uniform inside the bounds.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .nlml import BoxTransform, nlml_in_box


class FitResult(NamedTuple):
    """Fitted hyperparameters for a batch of GPs."""

    sigma2: jnp.ndarray  # (...,) RBF variance per GP
    ell: jnp.ndarray  # (...,) length scale per GP
    chi: jnp.ndarray  # (...,) white-noise level per GP
    nlml: jnp.ndarray  # (...,) final negative log marginal likelihood


def _initial_z(box: BoxTransform, key, n_restarts: int) -> jnp.ndarray:
    """(n_restarts + 1, 3) starting points in unconstrained coordinates."""
    default = box.from_log_params(jnp.zeros(3))  # sigma2 = ell = chi = 1
    u = jax.random.uniform(key, (n_restarts, 3))
    # log-uniform over the box; keep strictly interior for finite logits.
    log_params = box.lo + (box.hi - box.lo) * (0.02 + 0.96 * u)
    zs = jax.vmap(box.from_log_params)(log_params)
    return jnp.concatenate([default[None, :], zs], axis=0)


def _minimize_one(z0, box, t, y, maxiter):
    """Run L-BFGS from one starting point; return (z_final, nlml_final)."""
    fun = partial(nlml_in_box, box=box, t=t, y=y)
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry, _):
        z, state = carry
        value, grad = value_and_grad(z, state=state)
        # Freeze on non-finite values/grads: zero updates keep the iterate.
        bad = ~(jnp.isfinite(value) & jnp.all(jnp.isfinite(grad)))
        grad = jnp.where(bad, jnp.zeros_like(grad), grad)
        value = jnp.where(bad, jnp.array(1e30, value.dtype), value)
        updates, state = opt.update(
            grad, state, z, value=value, grad=grad, value_fn=fun
        )
        updates = jnp.where(bad, jnp.zeros_like(updates), updates)
        z = optax.apply_updates(z, updates)
        return (z, state), None

    state0 = opt.init(z0)
    (z_fin, _), _ = jax.lax.scan(step, (z0, state0), None, length=maxiter)
    val = fun(z_fin)
    # Never return a point worse than the start (line-search divergence guard).
    val0 = fun(z0)
    better = val < val0
    z_fin = jnp.where(better, z_fin, z0)
    return z_fin, jnp.where(better, val, val0)


@partial(jax.jit, static_argnames=("n_restarts", "maxiter"))
def fit_gp_hyperparameters(
    t: jnp.ndarray,
    Y: jnp.ndarray,
    box: BoxTransform,
    key: jax.Array,
    n_restarts: int = 50,
    maxiter: int = 80,
) -> FitResult:
    """Fit RBF+white GP hyperparameters for every row of Y at once.

    Parameters
    ----------
    t : (m,) or (r, m) array
        Training times, shared across modes or per-mode (the ODE pipeline's
        unsynced sampling gives each state variable its own times,
        reference ``ODEs/step1_generate_data.py:124-136``).
    Y : (r, m) array
        Training observations, one row per state variable / POD mode.
    box : BoxTransform
        Log-space hyperparameter bounds.
    key : PRNG key for restart sampling.
    n_restarts : int
        Number of random restarts in addition to the default start.
    maxiter : int
        L-BFGS iterations (static; fixed-length scan).

    Returns
    -------
    FitResult with (r,)-shaped fields.
    """
    r = Y.shape[0]
    if t.ndim == 1:
        T = jnp.broadcast_to(t, (r, t.shape[0]))
    else:
        T = t

    keys = jax.random.split(key, r)

    def fit_one_mode(t_i, y_i, key_i):
        z0s = _initial_z(box, key_i, n_restarts)
        z_fins, vals = jax.vmap(
            lambda z0: _minimize_one(z0, box, t_i, y_i, maxiter)
        )(z0s)
        vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
        best = jnp.argmin(vals)
        log_params = box.to_log_params(z_fins[best])
        return jnp.exp(log_params), vals[best]

    params, vals = jax.vmap(fit_one_mode)(T, Y, keys)
    return FitResult(params[:, 0], params[:, 1], params[:, 2], vals)
