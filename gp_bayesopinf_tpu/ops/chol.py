"""SPD linear-algebra helpers: Cholesky solves and inverse matrix square
roots, written to be jittable and batchable (``vmap`` adds leading axes).

The reference computes ``sqrtW = (C + eta I)^{-1/2}`` with a dense ``eigh``
and *raises* when the regularized covariance is not SPD
(``codebase/gpkernels.py:496-504``). Raising is not jit-compatible, so here
every routine returns a validity flag alongside the result; user-facing
wrappers outside jit can turn the flag into the reference's actionable
error ("increase eta").
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def cho_solve_psd(K: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = b for symmetric positive-definite K via Cholesky."""
    L = jnp.linalg.cholesky(K)
    return jax.scipy.linalg.cho_solve((L, True), b)


def solve_psd(K: jnp.ndarray, B: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve K X = B via Cholesky, also returning the factor for reuse."""
    L = jnp.linalg.cholesky(K)
    return jax.scipy.linalg.cho_solve((L, True), B), L


def spd_cholesky(C: jnp.ndarray, eta: float = 0.0):
    """Lower Cholesky factor of (C + eta I) plus an SPD validity flag.

    The cheap alternative to ``spd_inverse_sqrt`` for weighting least
    squares: with C + eta I = L L^T, applying L^{-1} (one triangular
    solve) reproduces the same weighted norm as multiplying by the
    symmetric inverse square root — ||L^{-1} x||_2^2 = x^T (C+eta I)^{-1} x
    — without any eigendecomposition (SURVEY.md section 7, 'sqrtW at
    m'=3200' reformulation).
    """
    n = C.shape[-1]
    L = jnp.linalg.cholesky(C + eta * jnp.eye(n, dtype=C.dtype))
    ok = jnp.all(jnp.isfinite(jnp.diagonal(L, axis1=-2, axis2=-1)))
    return L, ok


def spd_inverse_sqrt(
    C: jnp.ndarray, eta: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (C + eta I)^{-1/2} via symmetric eigendecomposition.

    Parameters
    ----------
    C : (n, n) symmetric array.
    eta : float >= 0
        Diagonal regularization added before inversion.

    Returns
    -------
    inv_sqrt : (n, n) array
        Symmetric inverse square root V diag(1/sqrt(w)) V^T.
    ok : bool scalar array
        True iff every eigenvalue of (C + eta I) is strictly positive
        (the reference raises otherwise, ``gpkernels.py:500-503``).
    """
    n = C.shape[-1]
    w, V = jnp.linalg.eigh(C + eta * jnp.eye(n, dtype=C.dtype))
    ok = jnp.all(w > 0)
    # Guard the rsqrt so invalid configurations produce finite garbage that
    # the caller masks out, rather than NaNs that poison whole batches.
    w_safe = jnp.where(w > 0, w, 1.0)
    inv_sqrt = (V * jax.lax.rsqrt(w_safe)[..., None, :]) @ jnp.swapaxes(V, -1, -2)
    return inv_sqrt, ok
