"""Weighted, regularized least squares via one batched SVD.

The Bayesian regression at the center of GP-BayesOpInf solves, for each
operator row i = 1..r,

    min_o || D o - z_i ||^2_{W_i} + lambda^2 || o ||^2,

with W_i = sqrtW_i^T sqrtW_i from the GP derivative covariance; the
posterior is N(mean_i, P_i^{-1}) with P_i = (sqrtW_i D)^T (sqrtW_i D)
+ lambda^2 I (behavioral spec: reference ``codebase/wlstsq.py:156-212``
delegating to ``opinf.lstsq.L2Solver``, and the precision assembly at
``PDEs/step3_estimate.py:84-89``).

TPU-first reformulation: weight each block once, take ONE batched SVD
``sqrtW_i D = U_i S_i V_i^T``, and express everything downstream
spectrally:

    mean_i(lambda)      = V_i diag(S_i / (S_i^2 + lambda^2)) U_i^T z~_i
    P_i(lambda)         = V_i diag(S_i^2 + lambda^2) V_i^T
    sample_i(lambda)    = mean_i + V_i (xi / sqrt(S_i^2 + lambda^2)),
                          xi ~ N(0, I_d)

so the entire regularization grid search (81 candidates x 20 draws x 2
time domains in the reference, ``PDEs/step3_estimate.py:22``) reuses the
factorization — no per-candidate refactor, no explicit covariance inverse,
and posterior sampling never materializes a covariance matrix.

Block structure: the reference stacks per-variable / per-trajectory blocks
with ``scipy.linalg.block_diag`` (``ODEs/step3_estimate.py:211``,
``PDEsMulti/step3_estimate.py:253-262``). Here weights are kept as a
(r, B, m, m) batch and applied blockwise as batched matmuls — the same
math without materializing (B*m)^2 block-diagonal zeros.
"""

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class WeightedLSTSQ(NamedTuple):
    """Spectral factorization of the weighted regression problems.

    Shapes: r problems, d unknowns per problem, M = B*m weighted rows.
    """

    U: jnp.ndarray  # (r, M, d) left singular vectors
    S: jnp.ndarray  # (r, d) singular values
    V: jnp.ndarray  # (r, d, d) right singular vectors (columns)
    Utz: jnp.ndarray  # (r, d) U^T @ z-tilde
    Dt: jnp.ndarray  # (r, M, d) weighted data matrices (sqrtW D)
    zt: jnp.ndarray  # (r, M) weighted right-hand sides

    @property
    def num_problems(self) -> int:
        return self.S.shape[0]

    @property
    def num_unknowns(self) -> int:
        return self.S.shape[1]

    # ---- posterior mean -----------------------------------------------------
    def solve(self, lam) -> jnp.ndarray:
        """Posterior mean rows for scalar (or per-row) regularizer lambda.

        Returns
        -------
        (r, d) array.
        """
        lam = jnp.asarray(lam, dtype=self.S.dtype)
        lam2 = jnp.broadcast_to(lam * lam, (self.num_problems,))
        filt = self.S / (self.S * self.S + lam2[:, None])  # (r, d)
        return jnp.einsum("rij,rj->ri", self.V, filt * self.Utz)

    def solve_tikhonov(self, gamma_diag: jnp.ndarray) -> jnp.ndarray:
        """Posterior mean with a diagonal Tikhonov regularizer.

        gamma_diag : (d,) or (r, d) — diagonal of Gamma; solves the normal
        equations (D~^T D~ + diag(gamma^2)) o = D~^T z~ directly (the
        ``opinf.lstsq.TikhonovSolver`` capability of reference C-7).
        """
        gamma_diag = jnp.broadcast_to(
            jnp.asarray(gamma_diag, dtype=self.S.dtype),
            (self.num_problems, self.num_unknowns),
        )
        DtD = jnp.einsum("rmi,rmj->rij", self.Dt, self.Dt)
        A = DtD + jax.vmap(jnp.diag)(gamma_diag * gamma_diag)
        b = jnp.einsum("rmi,rm->ri", self.Dt, self.zt)
        return jnp.linalg.solve(A, b[..., None])[..., 0]

    def solve_tikhonov_matrix(self, Gamma: jnp.ndarray) -> jnp.ndarray:
        """Posterior mean with a full-matrix Tikhonov regularizer.

        Gamma : (d, d) shared across rows, or (r, d, d) per row — the
        general ``opinf.lstsq.TikhonovSolver`` regularizer surface
        (reference ``codebase/wlstsq.py:179-181``; the per-row form is the
        ``WeightedLSTSQSolverMulti`` capability, ``wlstsq.py:215-304``,
        without replicating its ``__init__`` recursion bug).

        Solves the normal equations
        (D~^T D~ + Gamma^T Gamma) o = D~^T z~ per row, batched.
        """
        return self._tikhonov_normal_eqs(Gamma)[0]

    def posterior_tikhonov(self, Gamma: jnp.ndarray):
        """(means, precisions) under a general Tikhonov regularizer.

        The Bayesian precision generalizes the reference's per-row
        ``(sqrtW D)^T (sqrtW D) + reg^2 I`` assembly
        (``PDEs/step3_estimate.py:84-89``) with Gamma^T Gamma in place of
        the scalar ridge. Accepts the same shapes as
        ``solve_tikhonov_matrix``.
        """
        return self._tikhonov_normal_eqs(Gamma)

    def _tikhonov_normal_eqs(self, Gamma: jnp.ndarray):
        """(means, precisions) of the per-row normal equations
        (D~^T D~ + Gamma^T Gamma) o = D~^T z~, with shape validation."""
        Gamma = jnp.asarray(Gamma, dtype=self.S.dtype)
        r, d = self.num_problems, self.num_unknowns
        if Gamma.shape == (d, d):
            Gamma = jnp.broadcast_to(Gamma[None], (r, d, d))
        elif Gamma.shape != (r, d, d):
            raise ValueError(
                f"Gamma shape {Gamma.shape} is neither {(d, d)} nor "
                f"{(r, d, d)}"
            )
        DtD = jnp.einsum("rmi,rmj->rij", self.Dt, self.Dt)
        P = DtD + jnp.einsum("rki,rkj->rij", Gamma, Gamma)
        b = jnp.einsum("rmi,rm->ri", self.Dt, self.zt)
        return jnp.linalg.solve(P, b[..., None])[..., 0], P

    # ---- posterior covariance spectrum ---------------------------------------
    def precision_eigs(self, lam):
        """Eigenvalues (S^2 + lambda^2) of each row's precision matrix.

        The eigenvectors are the columns of V. Requires M >= d (true for
        every reference workload) so that V spans R^d.
        """
        lam = jnp.asarray(lam, dtype=self.S.dtype)
        lam2 = jnp.broadcast_to(lam * lam, (self.num_problems,))
        return self.S * self.S + lam2[:, None]

    def posterior_spd(self, lam) -> jnp.ndarray:
        """True iff every row posterior covariance is SPD (finite, positive).

        Mirrors the reference's LinAlgError -> "not positive definite" ->
        retryable-None translation (``PDEs/step3_estimate.py:90-95``).
        """
        eigs = self.precision_eigs(lam)
        return jnp.all(eigs > 0) & jnp.all(jnp.isfinite(eigs))

    # ---- posterior sampling ---------------------------------------------------
    def sample(self, lam, key, ndraws: int) -> jnp.ndarray:
        """Draw operator-row samples from N(mean, P^{-1}).

        Returns
        -------
        (ndraws, r, d) array.
        """
        mean = self.solve(lam)  # (r, d)
        eigs = self.precision_eigs(lam)  # (r, d)
        scale = jax.lax.rsqrt(jnp.maximum(eigs, 1e-300))
        xi = jax.random.normal(
            key, (ndraws, self.num_problems, self.num_unknowns), dtype=self.S.dtype
        )
        dev = jnp.einsum("rij,nrj->nri", self.V, xi * scale[None])
        return mean[None] + dev

    def tikhonov(self) -> "TikhonovLSTSQ":
        """Precompute the normal equations for repeated diagonal-Tikhonov
        solves (``TikhonovLSTSQ``): the O(M d^2) Gram contraction happens
        once, after which every candidate regularizer costs one batched
        (d x d) Cholesky."""
        DtD = jnp.einsum("rmi,rmj->rij", self.Dt, self.Dt)
        Dtz = jnp.einsum("rmi,rm->ri", self.Dt, self.zt)
        return TikhonovLSTSQ(DtD, Dtz)

    def matrix_tikhonov(self, Gamma: jnp.ndarray) -> "MatrixTikhonovLSTSQ":
        """Precompute for a search over SCALED full-matrix regularizers
        ``scale * Gamma`` (``MatrixTikhonovLSTSQ``): one Gram contraction
        plus one Gamma^T Gamma per row, after which every candidate scale
        costs a batched (d x d) Cholesky. Gamma: (d, d) shared or
        (r, d, d) per row — the general ``opinf.lstsq.TikhonovSolver``
        surface (reference ``codebase/wlstsq.py:179-181``)."""
        Gamma = jnp.asarray(Gamma, dtype=self.S.dtype)
        r, d = self.num_problems, self.num_unknowns
        if Gamma.shape == (d, d):
            Gamma = jnp.broadcast_to(Gamma[None], (r, d, d))
        elif Gamma.shape != (r, d, d):
            raise ValueError(
                f"Gamma shape {Gamma.shape} is neither {(d, d)} nor "
                f"{(r, d, d)}"
            )
        DtD = jnp.einsum("rmi,rmj->rij", self.Dt, self.Dt)
        Dtz = jnp.einsum("rmi,rm->ri", self.Dt, self.zt)
        G2 = jnp.einsum("rki,rkj->rij", Gamma, Gamma)
        return MatrixTikhonovLSTSQ(DtD, Dtz, G2)

    def covariances(self, lam) -> jnp.ndarray:
        """Dense posterior covariances (r, d, d) — for export/persistence."""
        eigs = self.precision_eigs(lam)
        inv = 1.0 / eigs
        return jnp.einsum("rik,rk,rjk->rij", self.V, inv, self.V)

    def precisions(self, lam) -> jnp.ndarray:
        """Dense posterior precisions (r, d, d)."""
        eigs = self.precision_eigs(lam)
        return jnp.einsum("rik,rk,rjk->rij", self.V, eigs, self.V)


class TikhonovLSTSQ(NamedTuple):
    """Normal equations of the weighted regression, precomputed once, for
    regularizer searches over NON-spherical (diagonal) Tikhonov matrices.

    The spectral reuse in ``WeightedLSTSQ`` (one SVD shared by every
    candidate) only works for scalar ridges lambda^2 I — a general
    diagonal Gamma is not diagonalized by the data's singular vectors. For
    a search over diagonal candidates (e.g. the per-operator-block
    two-parameter regularizer of ``pipeline.scaled``), the right
    factorization is the one the reference's ``opinf.lstsq.TikhonovSolver``
    uses per solve (normal equations + Cholesky,
    ``codebase/wlstsq.py:179-181`` behavioral surface), amortized: the
    O(M d^2) Gram contraction happens once here, and each candidate costs
    one batched (r, d, d) Cholesky — MXU-friendly and cheap at ROM sizes.

    Shapes: r independent row problems, d unknowns each.
    """

    DtD: jnp.ndarray  # (r, d, d) Gram matrices (sqrtW D)^T (sqrtW D)
    Dtz: jnp.ndarray  # (r, d) right-hand sides (sqrtW D)^T z-tilde

    @property
    def num_problems(self) -> int:
        return self.DtD.shape[0]

    @property
    def num_unknowns(self) -> int:
        return self.DtD.shape[-1]

    def _broadcast_gamma(self, gamma_diag) -> jnp.ndarray:
        return jnp.broadcast_to(
            jnp.asarray(gamma_diag, dtype=self.DtD.dtype),
            (self.num_problems, self.num_unknowns),
        )

    def precision_cholesky(self, gamma_diag) -> jnp.ndarray:
        """Lower Cholesky factors of P = DtD + diag(gamma^2), (r, d, d)."""
        g = self._broadcast_gamma(gamma_diag)
        P = self.DtD + jax.vmap(jnp.diag)(g * g)
        return jnp.linalg.cholesky(P)

    def solve(self, gamma_diag) -> jnp.ndarray:
        """Posterior mean rows (r, d) for a diagonal regularizer.

        ``gamma_diag``: scalar, (d,), or (r, d). Matches
        ``WeightedLSTSQ.solve_tikhonov`` (oracle-tested) but reuses the
        precomputed Gram matrices.
        """
        L = self.precision_cholesky(gamma_diag)
        return jax.scipy.linalg.cho_solve(
            (L, True), self.Dtz[..., None]
        )[..., 0]

    def sample(self, gamma_diag, key, ndraws: int) -> jnp.ndarray:
        """Draw (ndraws, r, d) operator samples from N(mean, P^{-1}).

        With P = L L^T, x = L^{-T} xi has covariance P^{-1}; the mean is
        the Tikhonov solution. Same posterior semantics as
        ``WeightedLSTSQ.sample`` generalized beyond spherical ridges
        (reference precision assembly: ``PDEs/step3_estimate.py:84-89``).
        """
        L = self.precision_cholesky(gamma_diag)
        mean = jax.scipy.linalg.cho_solve(
            (L, True), self.Dtz[..., None]
        )[..., 0]
        xi = jax.random.normal(
            key,
            (ndraws, self.num_problems, self.num_unknowns),
            dtype=self.DtD.dtype,
        )
        # Solve L^T x = xi for every draw: batch (r) over the triangular
        # solve, with draws stacked as right-hand-side columns.
        dev = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2),
            jnp.moveaxis(xi, 0, -1),  # (r, d, ndraws)
            lower=False,
        )
        return mean[None] + jnp.moveaxis(dev, -1, 0)

    def posterior_spd(self, gamma_diag) -> jnp.ndarray:
        """True iff every row precision is SPD (finite Cholesky)."""
        L = self.precision_cholesky(gamma_diag)
        diag = jnp.diagonal(L, axis1=-2, axis2=-1)
        return jnp.all(jnp.isfinite(diag)) & jnp.all(diag > 0)


class MatrixTikhonovLSTSQ(NamedTuple):
    """Normal equations precomputed for a search over SCALED full-matrix
    Tikhonov regularizers ``scale_i * Gamma_i`` (one fixed Gamma per row,
    a scalar multiplier searched).

    This is the per-row-Gamma capability of the reference's
    ``opinf.lstsq.TikhonovSolver`` / ``WeightedLSTSQSolverMulti`` surface
    (``codebase/wlstsq.py:179-181, 215-304``) made searchable at grid
    cost: P_i(s) = D~_i^T D~_i + s_i^2 Gamma_i^T Gamma_i, so each
    candidate is one batched (r, d, d) Cholesky — no refactorization.
    Build via ``WeightedLSTSQ.matrix_tikhonov``.
    """

    DtD: jnp.ndarray  # (r, d, d) Gram matrices
    Dtz: jnp.ndarray  # (r, d) right-hand sides
    G2: jnp.ndarray  # (r, d, d) Gamma^T Gamma per row

    @property
    def num_problems(self) -> int:
        return self.DtD.shape[0]

    @property
    def num_unknowns(self) -> int:
        return self.DtD.shape[-1]

    def precision_cholesky(self, scale) -> jnp.ndarray:
        """Lower Cholesky factors of P = DtD + scale^2 GtG, (r, d, d).

        ``scale``: scalar or (r,) per-row multipliers.
        """
        s = jnp.broadcast_to(
            jnp.asarray(scale, dtype=self.DtD.dtype), (self.num_problems,)
        )
        P = self.DtD + (s * s)[:, None, None] * self.G2
        return jnp.linalg.cholesky(P)

    def solve(self, scale) -> jnp.ndarray:
        """Posterior mean rows (r, d); matches
        ``WeightedLSTSQ.solve_tikhonov_matrix(scale * Gamma)``."""
        L = self.precision_cholesky(scale)
        return jax.scipy.linalg.cho_solve(
            (L, True), self.Dtz[..., None]
        )[..., 0]

    def sample(self, scale, key, ndraws: int) -> jnp.ndarray:
        """Draw (ndraws, r, d) operator samples from N(mean, P^{-1})."""
        L = self.precision_cholesky(scale)
        mean = jax.scipy.linalg.cho_solve(
            (L, True), self.Dtz[..., None]
        )[..., 0]
        xi = jax.random.normal(
            key,
            (ndraws, self.num_problems, self.num_unknowns),
            dtype=self.DtD.dtype,
        )
        dev = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2),
            jnp.moveaxis(xi, 0, -1),
            lower=False,
        )
        return mean[None] + jnp.moveaxis(dev, -1, 0)

    def posterior_spd(self, scale) -> jnp.ndarray:
        """True iff every row precision is SPD (finite Cholesky)."""
        L = self.precision_cholesky(scale)
        diag = jnp.diagonal(L, axis1=-2, axis2=-1)
        return jnp.all(jnp.isfinite(diag)) & jnp.all(diag > 0)


def weighted_lstsq_fit(
    D_blocks: jnp.ndarray,
    weight_roots: jnp.ndarray,
    rhs: jnp.ndarray,
    weights_are_cholesky: bool = False,
    svd_fn=None,
) -> WeightedLSTSQ:
    """Weight the blocks and factorize every row problem at once.

    Parameters
    ----------
    D_blocks : (B, m, d) array
        Unweighted data-matrix blocks. B = 1 for the single-trajectory ROM
        regression; B = #state-variables for the ODE parameter problem
        (block-specific rows of the model data matrix,
        ``ODEs/config_seird.py:29-43``); B = #trajectories for the
        multi-trajectory regression.
    weight_roots : (r, B, m, m) array, or nested sequence of factored roots
        Weight roots per problem row and block. By default these are
        multiplicative roots R with W = R^T R (the GP ``sqrtW`` matrices).
        With ``weights_are_cholesky=True`` they are lower Cholesky factors
        L of the weighted-norm INVERSE (the GP derivative covariance
        C + eta I = L L^T) and are applied as L^{-1} via triangular
        solves — the same weighted problem without an eigendecomposition.
        A non-array argument is treated as factored symmetric roots
        (``gp.lowrank.LowRankWeightRoot``), one per problem row — or a
        length-r sequence of length-B sequences — applied via two thin
        matmuls each without materializing any (m x m) matrix (the
        m'-scaling path, SURVEY §2e); ``weights_are_cholesky`` is ignored
        for factored roots.
    rhs : (r, B, m) array
        Unweighted right-hand sides (GP ddt estimates).
    svd_fn : optional callable (r, M, d) -> (U, S, V)
        Alternative thin-SVD implementation; pass
        ``functools.partial(parallel.sharded.tall_skinny_svd, mesh=...,
        spec=...)`` to factorize with the long M = B*m axis sharded over a
        device mesh (the m'-scaling path, SURVEY.md section 2e). Default:
        one batched dense SVD.

    Returns
    -------
    WeightedLSTSQ (batched over the r problems).
    """
    if not isinstance(weight_roots, (jnp.ndarray, np.ndarray)):
        return _weighted_lstsq_fit_factored(
            D_blocks, weight_roots, rhs, svd_fn=svd_fn
        )
    r, B, m, _ = weight_roots.shape
    d = D_blocks.shape[-1]
    if D_blocks.shape != (B, m, d):
        raise ValueError(f"D_blocks shape {D_blocks.shape} != {(B, m, d)}")
    if rhs.shape != (r, B, m):
        raise ValueError(f"rhs shape {rhs.shape} != {(r, B, m)}")
    if B * m < d:
        raise ValueError("underdetermined problem: need B*m >= d")

    if weights_are_cholesky:
        Db = jnp.broadcast_to(D_blocks[None], (r, B, m, d))
        Dt = jax.scipy.linalg.solve_triangular(
            weight_roots, Db, lower=True
        ).reshape(r, B * m, d)
        zt = jax.scipy.linalg.solve_triangular(
            weight_roots, rhs[..., None], lower=True
        ).reshape(r, B * m)
    else:
        Dt = jnp.einsum(
            "rbij,bjd->rbid", weight_roots, D_blocks
        ).reshape(r, B * m, d)
        zt = jnp.einsum("rbij,rbj->rbi", weight_roots, rhs).reshape(r, B * m)

    if svd_fn is not None:
        U, S, V = svd_fn(Dt)
    else:
        U, S, Vt = jnp.linalg.svd(Dt, full_matrices=False)
        V = jnp.swapaxes(Vt, -1, -2)
    Utz = jnp.einsum("rmd,rm->rd", U, zt)
    return WeightedLSTSQ(U, S, V, Utz, Dt, zt)


def _weighted_lstsq_fit_factored(D_blocks, roots, rhs, svd_fn=None):
    """Factored-root weighting: host-f64 NumPy end to end.

    ``roots`` is a length-r sequence of ``gp.lowrank.LowRankWeightRoot``
    (B = 1) or of length-B sequences of them. Each root is applied as two
    thin (m x p) matmuls (``LowRankWeightRoot.apply``) — the dense
    (m x m) root of the reference's ``sqrtW @ D`` weighting
    (``codebase/gpkernels.py:496-504`` product) never exists. The
    factorization itself is direct LAPACK (no tracing/compilation);
    outputs are host-committed f64 arrays exactly like the dense host
    path, so downstream accelerator placement is unchanged.
    """
    from ..utils.hostmath import host_device

    D_np = np.asarray(D_blocks, np.float64)
    if D_np.ndim == 2:
        D_np = D_np[None]
    rhs_np = np.asarray(rhs, np.float64)
    B, m, d = D_np.shape
    r = rhs_np.shape[0]
    if rhs_np.shape != (r, B, m):
        raise ValueError(f"rhs shape {rhs_np.shape} != {(r, B, m)}")
    if B * m < d:
        raise ValueError("underdetermined problem: need B*m >= d")
    # A factored root is itself a NamedTuple — detect rows by the
    # ``apply`` protocol, not by sequence type.
    roots = [[row] if hasattr(row, "apply") else list(row) for row in roots]
    if len(roots) != r or any(len(row) != B for row in roots):
        raise ValueError(
            f"factored roots must be r={r} rows of B={B} blocks"
        )

    Dt = np.stack(
        [
            np.concatenate([roots[i][b].apply(D_np[b]) for b in range(B)])
            for i in range(r)
        ]
    )  # (r, B*m, d)
    zt = np.stack(
        [
            np.concatenate(
                [roots[i][b].apply(rhs_np[i, b]) for b in range(B)]
            )
            for i in range(r)
        ]
    )  # (r, B*m)

    if svd_fn is not None:
        U, S, V = svd_fn(jnp.asarray(Dt))
        U, S, V = np.asarray(U), np.asarray(S), np.asarray(V)
    else:
        U, S, Vt = np.linalg.svd(Dt, full_matrices=False)
        V = np.swapaxes(Vt, -1, -2)
    Utz = np.einsum("rmd,rm->rd", U, zt)

    dev = host_device()
    put = lambda x: jax.device_put(jnp.asarray(x), dev)
    return WeightedLSTSQ(put(U), put(S), put(V), put(Utz), put(Dt), put(zt))
