"""Exact GP negative log marginal likelihood (NLML) and bound handling.

The kernel is k(t,t') = sigma2 * exp(-(t-t')^2 / (2 ell^2)) + chi * delta,
the same three-hyperparameter family the reference fits with sklearn's
``ConstantKernel * RBF + WhiteKernel`` (``codebase/gpkernels.py:553-557``).

    NLML(theta) = 1/2 y^T K^{-1} y + 1/2 log|K| + m/2 log(2 pi),
    theta = (log sigma2, log ell, log chi).

Bound constraints are enforced with a smooth logistic reparameterization
(``BoxTransform``): optimizing unconstrained z with
log theta = lo + (hi - lo) * sigmoid(z) keeps every iterate strictly inside
the box while letting optima asymptote to the boundary — the jit-friendly
equivalent of sklearn's L-BFGS-B bound clipping. Hyperparameter parity with
sklearn is therefore statistical, not bitwise, exactly as the reference
itself tolerates between its two GP backends (``ODEs/main.py:131-182``,
rtol=1e-1); downstream estimate parity is exact given equal hyperparameters.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.chol import unrolled_cho_solve, unrolled_cholesky

# Problems at or below this size use the unrolled Cholesky/solves on TPU
# backends: XLA's batched Cholesky custom call is latency-bound for small
# matrices (the 606-instance (64, 64) screening factorization measured
# 606 ms/flagship fit, ~9 GFLOP/s, round 3) while the unrolled
# straight-line graph runs as wide VPU ops over the vmapped batch.
UNROLL_MAX = 96


def nlml(
    log_params: jnp.ndarray,
    t: jnp.ndarray,
    y: jnp.ndarray,
    method: str = "auto",
) -> jnp.ndarray:
    """Negative log marginal likelihood of the RBF+white GP.

    Parameters
    ----------
    log_params : (3,) array
        (log sigma2, log ell, log chi).
    t : (m,) array of training times.
    y : (m,) array of training targets.
    method : "auto" (unrolled factorization for m <= UNROLL_MAX on TPU,
        XLA custom call otherwise), "chol", or "unrolled".

    Returns
    -------
    Scalar NLML. Non-finite Cholesky failures surface as +inf so that
    restart selection discards them.
    """
    sigma2, ell, chi = jnp.exp(log_params)
    m = t.shape[0]
    diff = t[:, None] - t[None, :]
    K = sigma2 * jnp.exp(-(diff * diff) / (2.0 * ell * ell))
    K = K + chi * jnp.eye(m, dtype=K.dtype)

    if method == "auto":
        method = (
            "unrolled"
            if m <= UNROLL_MAX and jax.default_backend() == "tpu"
            else "chol"
        )
    if method == "unrolled":
        L = unrolled_cholesky(K)
        alpha = unrolled_cho_solve(L, y)
    else:
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), y)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    val = 0.5 * (y @ alpha) + 0.5 * logdet + 0.5 * m * jnp.log(2.0 * jnp.pi)
    return jnp.where(jnp.isfinite(val), val, jnp.inf)


class BoxTransform(NamedTuple):
    """Smooth bijection from unconstrained R^n onto a log-space box.

    log theta = lo + (hi - lo) * sigmoid(z). ``lo``/``hi`` are the natural
    logs of the hyperparameter bounds (e.g. the reference's
    CONSTANT_VALUE_BOUNDS / LENGTH_SCALE_BOUNDS / NOISE_LEVEL_BOUNDS,
    ``PDEs/config_euler.py:100-102``).
    """

    lo: jnp.ndarray  # (n,) log-space lower bounds
    hi: jnp.ndarray  # (n,) log-space upper bounds

    def to_log_params(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.lo + (self.hi - self.lo) * jax.nn.sigmoid(z)

    def from_log_params(self, log_params: jnp.ndarray) -> jnp.ndarray:
        # Clip strictly inside the box so the logit is finite.
        frac = (log_params - self.lo) / (self.hi - self.lo)
        frac = jnp.clip(frac, 1e-6, 1.0 - 1e-6)
        return jnp.log(frac) - jnp.log1p(-frac)

    @staticmethod
    def from_bounds(constant_bounds, length_scale_bounds, noise_level_bounds):
        """Build the transform from (lo, hi) hyperparameter bound pairs."""
        lo = jnp.log(jnp.array(
            [constant_bounds[0], length_scale_bounds[0], noise_level_bounds[0]]
        ))
        hi = jnp.log(jnp.array(
            [constant_bounds[1], length_scale_bounds[1], noise_level_bounds[1]]
        ))
        return BoxTransform(lo, hi)


def nlml_in_box(
    z: jnp.ndarray, box: BoxTransform, t, y, method: str = "auto"
) -> jnp.ndarray:
    """NLML as a function of the unconstrained coordinates."""
    return nlml(box.to_log_params(z), t, y, method=method)
