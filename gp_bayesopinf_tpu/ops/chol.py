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


# ---- unrolled small-matrix routines ---------------------------------------
# XLA's batched Cholesky/triangular-solve custom calls are latency-bound on
# TPU for small matrices (sequential column loops of tiny dynamic-sliced
# ops): the fit's Adam screen spent 606 ms/flagship-call in a batched
# (606, 64, 64) factorization (measured round 3, ~9 GFLOP/s). These
# unrolled variants emit a STATIC straight-line graph of full-matrix
# vector ops — under ``vmap`` every step is one wide VPU op over the whole
# batch, and plain JAX autodiff differentiates them with no custom-call
# rules. Use for static n <= ~128; the graph has O(n) ops of O(n^2) work.


def unrolled_cholesky(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of a small SPD matrix, fully unrolled.

    ``A`` is (n, n) with n static and modest (<= ~128). Batch with
    ``vmap``. Non-SPD inputs surface as NaNs in the factor (masked by
    callers), matching ``jnp.linalg.cholesky`` semantics.

    Each unrolled step slices down to the TRAILING submatrix (static
    shape per step), so total memory traffic is the n^3/3 of the actual
    factorization — a first full-matrix-update version was 3x the traffic
    and measurably slower than the XLA custom call at the flagship batch.
    """
    n = A.shape[-1]
    cols = []
    for j in range(n):
        d = jnp.sqrt(A[0, 0])
        col = A[:, 0] / d  # (n - j,), col[0] == d
        cols.append(jnp.pad(col, (j, 0)))
        if j < n - 1:
            tail = col[1:]
            A = A[1:, 1:] - tail[:, None] * tail[None, :]
    return jnp.stack(cols, axis=1)


def unrolled_solve_lower(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L x = b (lower triangular, small static n), unrolled."""
    n = L.shape[-1]
    idx = jnp.arange(n)
    x = b
    for j in range(n):
        xj = x[j] / L[j, j]
        # Eliminate column j from the remaining rows; keep x[j] = xj.
        x = jnp.where(idx > j, x - xj * L[:, j], x)
        x = x.at[j].set(xj)
    return x


def unrolled_solve_upper_t(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = b (L lower triangular, small static n), unrolled."""
    n = L.shape[-1]
    idx = jnp.arange(n)
    x = b
    for j in reversed(range(n)):
        xj = x[j] / L[j, j]
        x = jnp.where(idx < j, x - xj * L[j, :], x)
        x = x.at[j].set(xj)
    return x


def unrolled_cho_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = b from the unrolled factor."""
    return unrolled_solve_upper_t(L, unrolled_solve_lower(L, b))


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
