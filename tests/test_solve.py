"""Weighted LSTSQ spectral solver and IVP integrators."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_impl as ref
from gp_bayesopinf_tpu.solve import (
    weighted_lstsq_fit,
    rk4_solve,
    dirk2_solve,
    stability_mask,
)


@pytest.fixture
def problem(rng):
    B, m, d, r = 3, 40, 6, 4
    D = rng.standard_normal((B, m, d))
    X = rng.standard_normal((r, B, m, m)) / np.sqrt(m)
    sqrtW = np.einsum("rbij,rbkj->rbik", X, X) + 0.5 * np.eye(m)
    rhs = rng.standard_normal((r, B, m))
    return D, sqrtW, rhs


def test_solve_matches_oracle(problem):
    D, sqrtW, rhs = problem
    fac = weighted_lstsq_fit(jnp.asarray(D), jnp.asarray(sqrtW), jnp.asarray(rhs))
    for lam in (1e-8, 1e-2, 1.0, 100.0):
        means, precisions = ref.weighted_lstsq_solve(D, sqrtW, rhs, lam)
        np.testing.assert_allclose(fac.solve(lam), means, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            fac.precisions(lam), precisions, rtol=1e-8, atol=1e-8
        )


def test_covariance_is_precision_inverse(problem):
    D, sqrtW, rhs = problem
    fac = weighted_lstsq_fit(jnp.asarray(D), jnp.asarray(sqrtW), jnp.asarray(rhs))
    lam = 0.1
    covs = np.asarray(fac.covariances(lam))
    precs = np.asarray(fac.precisions(lam))
    for i in range(covs.shape[0]):
        np.testing.assert_allclose(
            covs[i] @ precs[i], np.eye(covs.shape[1]), atol=1e-8
        )


def test_tikhonov_diagonal(problem):
    D, sqrtW, rhs = problem
    fac = weighted_lstsq_fit(jnp.asarray(D), jnp.asarray(sqrtW), jnp.asarray(rhs))
    d = D.shape[-1]
    gamma = np.linspace(0.5, 2.0, d)
    got = np.asarray(fac.solve_tikhonov(jnp.asarray(gamma)))
    # Oracle: per-row normal equations with diag regularizer.
    for i in range(sqrtW.shape[0]):
        Dt = np.vstack([sqrtW[i, b] @ D[b] for b in range(D.shape[0])])
        zt = np.concatenate([sqrtW[i, b] @ rhs[i, b] for b in range(D.shape[0])])
        expect = np.linalg.solve(Dt.T @ Dt + np.diag(gamma**2), Dt.T @ zt)
        np.testing.assert_allclose(got[i], expect, rtol=1e-8)


def test_tikhonov_full_matrix(problem):
    """General (non-diagonal) Tikhonov, shared and per-row Gamma.

    The ``opinf.lstsq.TikhonovSolver`` matrix-regularizer surface
    (reference ``codebase/wlstsq.py:179-181``) and the per-row
    ``WeightedLSTSQSolverMulti`` capability (``wlstsq.py:215-304``).
    """
    D, sqrtW, rhs = problem
    fac = weighted_lstsq_fit(jnp.asarray(D), jnp.asarray(sqrtW), jnp.asarray(rhs))
    r, d = sqrtW.shape[0], D.shape[-1]
    rng = np.random.default_rng(7)

    def oracle(i, G):
        Dt = np.vstack([sqrtW[i, b] @ D[b] for b in range(D.shape[0])])
        zt = np.concatenate([sqrtW[i, b] @ rhs[i, b] for b in range(D.shape[0])])
        P = Dt.T @ Dt + G.T @ G
        return np.linalg.solve(P, Dt.T @ zt), P

    # Shared full-matrix Gamma (non-diagonal, well-conditioned).
    G = rng.standard_normal((d, d)) * 0.3 + np.eye(d)
    got = np.asarray(fac.solve_tikhonov_matrix(jnp.asarray(G)))
    means, precs = fac.posterior_tikhonov(jnp.asarray(G))
    for i in range(r):
        expect, P = oracle(i, G)
        np.testing.assert_allclose(got[i], expect, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(means)[i], expect, rtol=1e-8,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(precs)[i], P, rtol=1e-8,
                                   atol=1e-8)

    # Per-row Gamma_i (the WeightedLSTSQSolverMulti capability).
    Gs = rng.standard_normal((r, d, d)) * 0.3 + np.eye(d)
    got = np.asarray(fac.solve_tikhonov_matrix(jnp.asarray(Gs)))
    for i in range(r):
        expect, _ = oracle(i, Gs[i])
        np.testing.assert_allclose(got[i], expect, rtol=1e-8, atol=1e-10)

    with pytest.raises(ValueError):
        fac.solve_tikhonov_matrix(jnp.ones((d + 1, d)))


def test_sampling_moments(problem):
    """Posterior samples must match the analytic mean/covariance."""
    D, sqrtW, rhs = problem
    fac = weighted_lstsq_fit(jnp.asarray(D), jnp.asarray(sqrtW), jnp.asarray(rhs))
    lam = 0.5
    draws = np.asarray(fac.sample(lam, jax.random.PRNGKey(3), 20000))
    mean = np.asarray(fac.solve(lam))
    cov = np.asarray(fac.covariances(lam))
    np.testing.assert_allclose(
        draws.mean(axis=0), mean, atol=5e-2 * np.abs(mean).max() + 1e-3
    )
    emp = np.einsum("nri,nrj->rij", draws - mean, draws - mean) / draws.shape[0]
    assert np.max(np.abs(emp - cov)) < 0.1 * np.abs(cov).max()


def test_tikhonov_lstsq_precomputed(problem):
    """TikhonovLSTSQ (amortized normal equations) must reproduce the
    direct ``solve_tikhonov`` path and deliver correct posterior draw
    moments for a non-spherical diagonal regularizer."""
    from gp_bayesopinf_tpu.solve import TikhonovLSTSQ

    D, sqrtW, rhs = problem
    fac = weighted_lstsq_fit(
        jnp.asarray(D), jnp.asarray(sqrtW), jnp.asarray(rhs)
    )
    tik = fac.tikhonov()
    assert isinstance(tik, TikhonovLSTSQ)
    d = D.shape[-1]
    gamma = np.linspace(0.5, 2.0, d)

    # Mean parity with the per-call normal-equations path (oracle-tested
    # above in test_tikhonov_diagonal).
    np.testing.assert_allclose(
        np.asarray(tik.solve(jnp.asarray(gamma))),
        np.asarray(fac.solve_tikhonov(jnp.asarray(gamma))),
        rtol=1e-8,
        atol=1e-10,
    )
    # Scalar and per-row broadcasting agree with the spectral solver.
    np.testing.assert_allclose(
        np.asarray(tik.solve(0.7)),
        np.asarray(fac.solve(0.7)),
        rtol=1e-7,
        atol=1e-9,
    )
    assert bool(tik.posterior_spd(jnp.asarray(gamma)))

    # Sampling moments: mean and covariance P^{-1} with
    # P = Dt^T Dt + diag(gamma^2).
    draws = np.asarray(
        tik.sample(jnp.asarray(gamma), jax.random.PRNGKey(11), 20000)
    )
    mean = np.asarray(tik.solve(jnp.asarray(gamma)))
    np.testing.assert_allclose(
        draws.mean(axis=0), mean, atol=5e-2 * np.abs(mean).max() + 1e-3
    )
    for i in range(sqrtW.shape[0]):
        Dt = np.vstack([sqrtW[i, b] @ D[b] for b in range(D.shape[0])])
        P = Dt.T @ Dt + np.diag(gamma**2)
        cov = np.linalg.inv(P)
        emp = (
            np.einsum("ni,nj->ij", draws[:, i] - mean[i], draws[:, i] - mean[i])
            / draws.shape[0]
        )
        assert np.max(np.abs(emp - cov)) < 0.1 * np.abs(cov).max()


def test_matrix_tikhonov_lstsq_precomputed(problem):
    """MatrixTikhonovLSTSQ (amortized scaled full-matrix Gamma search)
    must reproduce ``solve_tikhonov_matrix(scale * Gamma)`` at every
    candidate scale and deliver correct posterior draw moments."""
    from gp_bayesopinf_tpu.solve import MatrixTikhonovLSTSQ

    D, sqrtW, rhs = problem
    fac = weighted_lstsq_fit(
        jnp.asarray(D), jnp.asarray(sqrtW), jnp.asarray(rhs)
    )
    r, d = sqrtW.shape[0], D.shape[-1]
    rng = np.random.default_rng(13)
    Gs = rng.standard_normal((r, d, d)) * 0.3 + np.eye(d)
    mt = fac.matrix_tikhonov(jnp.asarray(Gs))
    assert isinstance(mt, MatrixTikhonovLSTSQ)

    # Mean parity with the direct (oracle-tested) matrix path across a
    # scale sweep, including per-row scales.
    for scale in (0.3, 2.0):
        np.testing.assert_allclose(
            np.asarray(mt.solve(scale)),
            np.asarray(fac.solve_tikhonov_matrix(scale * jnp.asarray(Gs))),
            rtol=1e-7,
            atol=1e-9,
        )
    scales = np.linspace(0.5, 1.5, r)
    got = np.asarray(mt.solve(jnp.asarray(scales)))
    for i in range(r):
        Dt = np.vstack([sqrtW[i, b] @ D[b] for b in range(D.shape[0])])
        zt = np.concatenate(
            [sqrtW[i, b] @ rhs[i, b] for b in range(D.shape[0])]
        )
        G = scales[i] * Gs[i]
        expect = np.linalg.solve(Dt.T @ Dt + G.T @ G, Dt.T @ zt)
        np.testing.assert_allclose(got[i], expect, rtol=1e-7, atol=1e-9)
    assert bool(mt.posterior_spd(1.0))

    # Sampling moments: covariance (Dt^T Dt + s^2 G^T G)^{-1}.
    draws = np.asarray(mt.sample(1.0, jax.random.PRNGKey(17), 20000))
    mean = np.asarray(mt.solve(1.0))
    np.testing.assert_allclose(
        draws.mean(axis=0), mean, atol=5e-2 * np.abs(mean).max() + 1e-3
    )
    for i in range(r):
        Dt = np.vstack([sqrtW[i, b] @ D[b] for b in range(D.shape[0])])
        P = Dt.T @ Dt + Gs[i].T @ Gs[i]
        cov = np.linalg.inv(P)
        emp = (
            np.einsum(
                "ni,nj->ij", draws[:, i] - mean[i], draws[:, i] - mean[i]
            )
            / draws.shape[0]
        )
        assert np.max(np.abs(emp - cov)) < 0.1 * np.abs(cov).max()

    with pytest.raises(ValueError):
        fac.matrix_tikhonov(jnp.ones((d + 1, d)))


def test_blocked_gamma_diag():
    """Per-operator-block diagonal regularizer layout ("cAH": lam2 on the
    quadratic columns, lam1 elsewhere)."""
    from gp_bayesopinf_tpu.rom import blocked_gamma_diag, operator_splits

    r = 4
    g = np.asarray(
        blocked_gamma_diag("cAH", r, lams={"c": 2.0, "A": 2.0, "H": 30.0})
    )
    spans = dict(
        (name, (a, b)) for name, a, b in operator_splits("cAH", r)
    )
    assert g.shape == (1 + r + r * (r + 1) // 2,)
    assert np.all(g[spans["c"][0] : spans["A"][1]] == 2.0)
    assert np.all(g[spans["H"][0] : spans["H"][1]] == 30.0)
    # Letters absent from lams fall back to the default.
    g2 = np.asarray(
        blocked_gamma_diag("cAHB", r, m=2, lams={"H": 5.0}, default=1.0)
    )
    assert np.all(g2[spans["H"][0] : spans["H"][1]] == 5.0)
    assert np.all(g2[: spans["H"][0]] == 1.0) and np.all(
        g2[spans["H"][1] :] == 1.0
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        blocked_gamma_diag("cAH", r, lams={"X": 1.0})


def test_per_row_regularizer(problem):
    """C-8 capability: a different scalar lambda per row."""
    D, sqrtW, rhs = problem
    fac = weighted_lstsq_fit(jnp.asarray(D), jnp.asarray(sqrtW), jnp.asarray(rhs))
    lams = np.array([1e-3, 1e-1, 1.0, 10.0])
    got = np.asarray(fac.solve(jnp.asarray(lams)))
    for i, lam in enumerate(lams):
        means, _ = ref.weighted_lstsq_solve(D, sqrtW, rhs, lam)
        np.testing.assert_allclose(got[i], means[i], rtol=1e-8, atol=1e-10)


# ---- integrators ----------------------------------------------------------------
def test_rk4_seird(rng):
    p = np.array([0.00025, 0.1, 0.099, 0.005])
    q0 = np.array([994.0, 5.0, 1.0, 0.0, 0.0])
    t = np.linspace(0, 200, 500)
    expect = ref.solve_seird2(p, q0, t)

    def _rhs(tt, q):
        S, E, I = q[0], q[1], q[2]
        dS = -p[0] * S * I
        dE = -dS - p[1] * E
        dR = p[2] * I
        dD = p[3] * I
        dI = p[1] * E - dR - dD
        return jnp.stack([dS, dE, dI, dR, dD])

    got = np.asarray(rk4_solve(_rhs, jnp.asarray(q0), jnp.asarray(t), substeps=4))
    scale = np.abs(expect).max()
    assert np.max(np.abs(got - expect)) < 1e-5 * scale


def test_dirk2_stiff_linear():
    """Stiff linear system: DIRK must remain stable and accurate where the
    explicit method at the same step count blows up."""
    lam = np.array([-1.0, -100.0, -10000.0])
    q0 = np.ones(3)
    t = np.linspace(0, 1.0, 101)

    def f(tt, q):
        return jnp.asarray(lam) * q

    got = np.asarray(dirk2_solve(f, jnp.asarray(q0), jnp.asarray(t), substeps=4))
    expect = np.exp(lam[:, None] * t[None, :])
    assert np.all(np.isfinite(got))
    assert np.max(np.abs(got - expect)) < 2e-3


def test_dirk2_cubic_heat_vs_scipy(rng):
    x = np.linspace(0, 1, 60)
    A, c, B = ref.heat_operators(x, 0.0, 1.0, 1e-2)
    q0 = np.asarray(
        6 * np.exp(-x) * x * (1 - x) ** 3
        - 10 * np.exp(x) * x * (1 - x) * np.sin(x / 6)
        + x
    )[1:-1]
    t = np.linspace(0, 2, 100)
    expect = ref.solve_cubic_heat(q0, t, A, c, B, 1.0, -2.0, rtol=1e-8, atol=1e-10)

    Aj, cj, Bj = jnp.asarray(A), jnp.asarray(c), jnp.asarray(B)

    def f(tt, q):
        u = jnp.stack([jnp.sin(2 * jnp.pi * tt), -2.0 * jnp.sin(4 * jnp.pi * tt)])
        return cj + Aj @ q - q**3 + Bj @ u

    def jac(tt, q):
        return Aj - jnp.diag(3 * q * q)

    got = np.asarray(
        dirk2_solve(f, jnp.asarray(q0), jnp.asarray(t), jac=jac, substeps=4)
    )
    scale = np.abs(expect).max()
    assert np.max(np.abs(got - expect)) < 2e-3 * scale


def test_stability_mask():
    k, n = 20, 3
    good = np.zeros((n, k))
    bad_amp = np.zeros((n, k)); bad_amp[1, -1] = 100.0
    bad_nan = np.zeros((n, k)); bad_nan[0, 5] = np.nan
    sols = jnp.asarray(np.stack([good, bad_amp, bad_nan]))
    shift = jnp.zeros(n)
    limits = jnp.full(n, 5.0)
    mask = stability_mask(sols, shift, limits)
    assert mask.tolist() == [True, False, False]


def test_cholesky_weight_path_matches_sqrtw(rng):
    """The Cholesky-weighted regression (no eigendecomposition) must give
    the same posterior as explicit sqrtW weighting."""
    import scipy.linalg as la
    from gp_bayesopinf_tpu.ops import spd_cholesky, spd_inverse_sqrt

    B, m, d, r = 2, 30, 5, 3
    D = jnp.asarray(rng.standard_normal((B, m, d)))
    rhs = jnp.asarray(rng.standard_normal((r, B, m)))
    # Per-row/block SPD covariances C.
    X = rng.standard_normal((r, B, m, m)) / np.sqrt(m)
    C = np.einsum("rbij,rbkj->rbik", X, X) + 0.1 * np.eye(m)

    eta = 1e-6
    sqrtW = np.empty_like(C)
    chols = np.empty_like(C)
    for i in range(r):
        for b in range(B):
            sw, ok1 = spd_inverse_sqrt(jnp.asarray(C[i, b]), eta)
            L, ok2 = spd_cholesky(jnp.asarray(C[i, b]), eta)
            assert bool(ok1) and bool(ok2)
            sqrtW[i, b] = np.asarray(sw)
            chols[i, b] = np.asarray(L)

    fac_sw = weighted_lstsq_fit(D, jnp.asarray(sqrtW), rhs)
    fac_ch = weighted_lstsq_fit(
        D, jnp.asarray(chols), rhs, weights_are_cholesky=True
    )
    for lam in (1e-6, 1e-2, 1.0):
        np.testing.assert_allclose(
            np.asarray(fac_sw.solve(lam)), np.asarray(fac_ch.solve(lam)),
            rtol=1e-7, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(fac_sw.precisions(lam)),
            np.asarray(fac_ch.precisions(lam)),
            rtol=1e-6, atol=1e-7,
        )


def test_gp_estimates_chol_method(rng):
    """gp_estimates(method='chol') factors C + eta I."""
    from gp_bayesopinf_tpu.gp import gp_estimates

    t = np.sort(rng.uniform(0, 1, 25)); t[0], t[-1] = 0, 1
    y = np.sin(5 * t)
    te = np.linspace(0, 1, 30)
    est_e = gp_estimates(jnp.asarray(t), jnp.asarray(y), jnp.asarray(te),
                         1.5, 0.2, 1e-5, eta=1e-6, method="eigh")
    est_c = gp_estimates(jnp.asarray(t), jnp.asarray(y), jnp.asarray(te),
                         1.5, 0.2, 1e-5, eta=1e-6, method="chol")
    np.testing.assert_allclose(
        np.asarray(est_c.state_estimate), np.asarray(est_e.state_estimate)
    )
    L = np.asarray(est_c.weight_root)
    np.testing.assert_allclose(
        L @ L.T, np.asarray(est_c.ddt_covariance) + 1e-6 * np.eye(30),
        atol=1e-10,
    )
