"""Low-rank GP weight roots: the m'-scaling factorization (SURVEY §2e).

The reference's single most expensive protected operation is the per-mode
(m' x m') eigendecomposition of the derivative-posterior covariance
``C + eta I`` (reference ``codebase/gpkernels.py:496-504``, guarded by a
600 s watchdog at ``PDEs/step2_fitgps.py:61``). Dense factorization is
O(m'^3) and walls out around m' ~ 8-16k.

This module exploits the *structure* of C instead: for the smooth RBF
kernel, ``C = K_zz - K_zy K_yy^{-1} K_yz`` is numerically low rank — its
spectrum decays super-exponentially past p ~ O(span/ell) (the classical
bound for analytic kernels; see PAPERS.md "Scaling Gaussian Process
Regression with Derivatives" and "Fast Matrix Square Roots ..."). A
*pivoted Cholesky* run to tolerance gives ``C ~= U U^T`` with p << m'
columns WITHOUT ever forming the (m' x m') matrix: it touches only
``diag(C)`` and p on-demand rows, each assembled from closed-form kernel
entries in O(m' m). Total cost O(m' (p^2 + p m)) time, O(m' p) memory —
m' = 100k is in reach on one host.

The weight root follows exactly from Woodbury: with the thin SVD
``U = Q S R^T`` and ``lam = S^2``,

    (C + eta I)^{-1/2}
        = eta^{-1/2} (I - Q diag(1 - sqrt(eta / (eta + lam))) Q^T)

so *applying* the symmetric inverse square root — the only thing the
downstream weighted regression needs — is two (m' x p) matmuls per
right-hand side: MXU-shaped work, shardable over the m' axis.

Everything here runs in NumPy float64 on the host, per the repo's
hybrid-precision policy (no native f64 on TPU; ``utils/hostmath``): the
host work is O(m' p^2), not O(m'^3), so the policy now *scales*.
"""

from typing import NamedTuple, Optional

import numpy as np

# Pivoted-Cholesky stopping tolerance as a fraction of the eta*I
# regularizer (``lowrank_gp_estimates(tol_factor=None)`` reads this).
# Set by the round-5 fidelity sweep (docs/lowrank_weight_root.md): the
# value at which the ex1c (m'=3200) stable count lands within ~1% of the
# dense exact-sqrtW path.
DEFAULT_TOL_FACTOR = 1e-8

__all__ = [
    "LowRankWeightRoot",
    "lowrank_gp_estimates",
    "LowRankEstimates",
]


class LowRankWeightRoot(NamedTuple):
    """Factored form of (C + eta I)^{-1/2} = (I - Q g Q^T) / sqrt(eta).

    ``Q`` is (m', p) with orthonormal columns, ``gain`` is
    ``1 - sqrt(eta / (eta + lam))`` for the p retained eigenvalues
    ``lam`` of C.
    """

    Q: np.ndarray  # (m', p)
    gain: np.ndarray  # (p,)
    lam: np.ndarray  # (p,)
    eta: float
    resid: float  # max remaining diag of the Cholesky residual

    @property
    def rank(self) -> int:
        return self.Q.shape[1]

    def apply(self, X: np.ndarray) -> np.ndarray:
        """(C + eta I)^{-1/2} @ X without forming the (m', m') root.

        ``X`` is (m',) or (m', d). O(m' p d) — two thin matmuls.
        """
        vec = X.ndim == 1
        if vec:
            X = X[:, None]
        Y = (X - self.Q @ (self.gain[:, None] * (self.Q.T @ X))) / np.sqrt(
            self.eta
        )
        return Y[:, 0] if vec else Y

    def dense(self) -> np.ndarray:
        """Materialize the (m', m') symmetric inverse root (tests only)."""
        m = self.Q.shape[0]
        return (
            np.eye(m) - (self.Q * self.gain[None, :]) @ self.Q.T
        ) / np.sqrt(self.eta)

    def covariance(self) -> np.ndarray:
        """Dense C ~= Q diag(lam) Q^T from the retained eigenpairs — for
        consumers of the reference's ``ddt_covariance`` artifact (e.g. the
        derivative-comparison export, ``PDEs/main.py:208-255``); the
        neglected tail is below the factorization tolerance."""
        return (self.Q * self.lam[None, :]) @ self.Q.T


class LowRankEstimates(NamedTuple):
    """Per-mode GP estimation products with a factored weight root.

    The low-rank analogue of ``gp.estimates.GPEstimates``: same
    ``state_estimate`` / ``ddt_estimate`` (identical math), but the
    weight root is kept in Woodbury form instead of a dense matrix.
    """

    state_estimate: np.ndarray  # (m',)
    ddt_estimate: np.ndarray  # (m',)
    root: LowRankWeightRoot


def _pivoted_cholesky_C(
    t_est: np.ndarray,
    K_zy: np.ndarray,
    V: np.ndarray,
    diag_C: np.ndarray,
    sigma2: float,
    ell: float,
    tol: float,
    max_rank: int,
):
    """Pivoted Cholesky of C = K_zz - K_zy K_yy^{-1} K_yz, rows on demand.

    ``V = K_yy^{-1} K_yz`` (m, m') is precomputed; row j of C is then
    closed-form K_zz[j, :] minus one (m,)-dot-(m, m') product. Standard
    left-looking pivoted Cholesky (Harbrecht/Peters/Schneider scheme)
    with the residual diagonal as the pivot rule; stops when the largest
    remaining diagonal falls below ``tol``.
    """
    mp = t_est.shape[0]
    ell2 = ell * ell
    d = diag_C.copy()
    # Column-major: the inner update reads cols[:, :p] (contiguous
    # panels) every iteration — F-order keeps the dgemv streaming.
    cols = np.empty((mp, min(max_rank, mp)), dtype=np.float64, order="F")
    pivots = []
    p = 0
    while p < min(max_rank, mp):
        j = int(np.argmax(d))
        dj = d[j]
        if dj <= tol:
            break
        # Row j of C from closed-form kernel entries (never the full K_zz).
        dz = t_est[j] - t_est
        row = (sigma2 / ell2) * (1.0 - dz * dz / ell2) * np.exp(
            -(dz * dz) / (2.0 * ell2)
        )
        row -= K_zy[j] @ V
        if p:
            row = row - cols[:, :p] @ cols[j, :p]
        ljj = np.sqrt(dj)
        col = row / ljj
        col[j] = ljj
        cols[:, p] = col
        d = np.maximum(d - col * col, 0.0)
        d[j] = 0.0
        pivots.append(j)
        p += 1
    return cols[:, :p], float(d.max() if mp else 0.0)


def _C_matmat(
    t_est: np.ndarray,
    K_zy: np.ndarray,
    V: np.ndarray,
    sigma2: float,
    ell: float,
    Q: np.ndarray,
    block: int = 2048,
) -> np.ndarray:
    """C @ Q assembled blockwise from closed-form kernel entries.

    Never materializes the (m' x m') matrix: each row block of K_zz is
    built, multiplied, and discarded — O(m' block) memory, O(m'^2 p)
    flops (host BLAS)."""
    mp = t_est.shape[0]
    ell2 = ell * ell
    VQ = V @ Q  # (m, p)

    steps = np.diff(t_est)
    # linspace spacings carry ~eps*t_max representation jitter, which is
    # ~1e-11 RELATIVE to the step at m' ~ 3e4 — compare against the step
    # size, not exactly (a 1e-9-relative grid perturbation moves kernel
    # entries by ~1e-9 |k'|, far below the factorization tolerance).
    if mp > 1 and steps.size and np.allclose(
        steps, steps[0], rtol=1e-9, atol=0.0
    ):
        # Uniform estimation grid (the pipelines' linspaces): K_zz is
        # symmetric Toeplitz — one kernel profile of 2m'-1 lags and an
        # FFT-based multiply, O(m' log m' p) instead of O(m'^2 p) with
        # O(m'^2) transcendentals.
        import scipy.linalg

        dz = t_est - t_est[0]
        prof = (
            (sigma2 / ell2)
            * (1.0 - dz * dz / ell2)
            * np.exp(-(dz * dz) / (2.0 * ell2))
        )
        KQ = scipy.linalg.matmul_toeplitz((prof, prof), Q)
        return KQ - K_zy @ VQ

    out = np.empty((mp, Q.shape[1]), dtype=np.float64)
    for s in range(0, mp, block):
        e = min(s + block, mp)
        dz = t_est[s:e, None] - t_est[None, :]
        Kblk = (
            (sigma2 / ell2)
            * (1.0 - dz * dz / ell2)
            * np.exp(-(dz * dz) / (2.0 * ell2))
        )
        out[s:e] = Kblk @ Q - K_zy[s:e] @ VQ
    return out


def lowrank_gp_estimates(
    t: np.ndarray,
    y: np.ndarray,
    t_est: np.ndarray,
    sigma2: float,
    ell: float,
    chi: float,
    eta: float = 1e-8,
    tol_factor: Optional[float] = None,
    max_rank: Optional[int] = None,
    refine: bool = True,
) -> LowRankEstimates:
    """GP estimates with a rank-adaptive factored weight root.

    Same estimation math as ``gp.estimates.gp_estimates`` (reference
    ``codebase/gpkernels.py:445-504``) but O(m' p^2) instead of O(m'^3):
    the derivative-posterior covariance is factorized by on-demand
    pivoted Cholesky (see module docstring).

    Parameters
    ----------
    tol_factor
        Pivoted-Cholesky stopping tolerance as a fraction of ``eta``
        (None = module default ``DEFAULT_TOL_FACTOR``); the neglected
        tail of C is then invisible next to the eta*I regularization
        the reference already adds. The fidelity bound vs the dense
        exact-sqrtW semantics is measured in
        ``docs/lowrank_weight_root.md`` (round-5 tolerance sweep).
    max_rank
        Cap on the retained rank (default min(m', 4 + m' // 2)); hitting
        the cap signals C is not numerically low rank at this tolerance
        — callers should fall back to the dense path.
    refine
        Run one Rayleigh-Ritz pass over the pivoted-Cholesky subspace:
        re-assemble ``C @ Q`` exactly from kernel blocks (O(m'^2 p),
        still far below the dense O(m'^3)) and re-diagonalize. Pivoted
        Cholesky's subtractive row updates carry a larger backward-error
        constant than LAPACK eigh; the refinement restores eigh-grade
        accuracy of the retained eigenpairs (measured ~400x on the
        defining identity || W (C+eta I) W - I ||).
    """
    t = np.asarray(t, np.float64)
    y = np.asarray(y, np.float64)
    t_est = np.asarray(t_est, np.float64)
    sigma2 = float(sigma2)
    ell = float(ell)
    chi = float(chi)
    m = t.shape[0]
    ell2 = ell * ell

    # Training Gram and cross blocks (closed forms; ops/rbf.py docstring).
    dyy = t[:, None] - t[None, :]
    K_yy = sigma2 * np.exp(-(dyy * dyy) / (2.0 * ell2)) + chi * np.eye(m)
    dzy = t_est[:, None] - t[None, :]
    kappa_zy = sigma2 * np.exp(-(dzy * dzy) / (2.0 * ell2))
    K_zy = -dzy * kappa_zy / ell2

    import scipy.linalg

    cho = scipy.linalg.cho_factor(K_yy, lower=True)
    alpha = scipy.linalg.cho_solve(cho, y)
    state = kappa_zy @ alpha
    ddt = K_zy @ alpha

    V = scipy.linalg.cho_solve(cho, K_zy.T)  # (m, m')
    diag_C = sigma2 / ell2 - np.einsum("im,mi->i", K_zy, V)
    diag_C = np.maximum(diag_C, 0.0)

    if max_rank is None:
        max_rank = min(t_est.shape[0], 4 + t_est.shape[0] // 2)
    if tol_factor is None:
        tol_factor = DEFAULT_TOL_FACTOR
    tol = tol_factor * eta
    U, resid = _pivoted_cholesky_C(
        t_est, K_zy, V, diag_C, sigma2, ell, tol, max_rank
    )
    if U.shape[1] >= max_rank and resid > tol:
        # Not numerically low rank at this tolerance: dense eigh fallback
        # (the reference's semantics, codebase/gpkernels.py:496-504). The
        # Woodbury form with p = m' is the exact symmetric inverse root.
        mp = t_est.shape[0]
        dzz = t_est[:, None] - t_est[None, :]
        K_zz = (
            (sigma2 / ell2)
            * (1.0 - dzz * dzz / ell2)
            * np.exp(-(dzz * dzz) / (2.0 * ell2))
        )
        cross = K_zy @ V
        C = K_zz - 0.5 * (cross + cross.T)
        lam, Q = np.linalg.eigh(C)
        lam = np.maximum(lam[::-1], 0.0)
        Q = Q[:, ::-1]
        gain = 1.0 - np.sqrt(eta / (eta + lam))
        root = LowRankWeightRoot(Q, gain, lam, eta, 0.0)
        return LowRankEstimates(state, ddt, root)

    # Woodbury inverse square root from the thin SVD of the factor.
    Q, s, _ = np.linalg.svd(U, full_matrices=False)
    lam = s * s
    keep = lam > 0.0
    Q, lam = Q[:, keep], lam[keep]
    if refine and Q.shape[1]:
        # Rayleigh-Ritz on span(Q) with an exactly re-assembled C @ Q.
        B = _C_matmat(t_est, K_zy, V, sigma2, ell, Q)
        M = Q.T @ B
        M = 0.5 * (M + M.T)
        lam, S = np.linalg.eigh(M)
        order = np.argsort(lam)[::-1]
        lam, S = lam[order], S[:, order]
        keep = lam > 0.0
        lam, S = lam[keep], S[:, keep]
        Q = Q @ S
    gain = 1.0 - np.sqrt(eta / (eta + lam))
    root = LowRankWeightRoot(Q, gain, lam, eta, resid)
    return LowRankEstimates(state, ddt, root)
