"""Kernel closed forms, SPD helpers, and quadratic feature maps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_impl as ref
from gp_bayesopinf_tpu.ops import (
    lstsq_kernel_matrices,
    rbf,
    spd_inverse_sqrt,
    ckron,
    ckron_indices,
    state_input_kron,
)

S2, ELL, CHI = 2.3, 0.17, 1e-4


@pytest.fixture
def grids(rng):
    t = np.sort(rng.uniform(0, 1, 25))
    t_est = np.linspace(0, 1, 40)
    return t, t_est


def test_kernel_matrices_match_oracle(grids):
    t, t_est = grids
    K = lstsq_kernel_matrices(jnp.asarray(t), jnp.asarray(t_est), S2, ELL, CHI)
    Kyy, kzy, Kzy, Kzz = ref.kernel_matrices(t, t_est, S2, ELL, CHI)
    np.testing.assert_allclose(K.K_yy, Kyy, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(K.kappa_zy, kzy, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(K.K_zy, Kzy, rtol=1e-12, atol=1e-11)
    np.testing.assert_allclose(K.K_zz, Kzz, rtol=1e-12, atol=1e-10)


def test_derivative_kernel_identities(grids):
    """K_zy must equal d/dt1 kappa and K_zz = d2/dt1dt2 kappa (autodiff)."""
    t, t_est = grids
    kap = lambda a, b: S2 * jnp.exp(-((a - b) ** 2) / (2 * ELL**2))
    d1 = jax.grad(kap, argnums=0)
    d12 = jax.grad(d1, argnums=1)

    K = lstsq_kernel_matrices(jnp.asarray(t), jnp.asarray(t_est), S2, ELL, CHI)
    d1_vals = jax.vmap(lambda a: jax.vmap(lambda b: d1(a, b))(jnp.asarray(t)))(
        jnp.asarray(t_est)
    )
    np.testing.assert_allclose(K.K_zy, d1_vals, rtol=1e-12, atol=1e-11)

    te = jnp.asarray(t_est)
    d12_vals = jax.vmap(lambda a: jax.vmap(lambda b: d12(a, b))(te))(te)
    np.testing.assert_allclose(K.K_zz, d12_vals, rtol=1e-12, atol=1e-10)


def test_spd_inverse_sqrt(rng):
    X = rng.standard_normal((30, 30))
    C = X @ X.T
    inv_sqrt, ok = spd_inverse_sqrt(jnp.asarray(C), eta=1e-6)
    assert bool(ok)
    # (C + eta I)^{-1/2} squared times (C + eta I) = identity.
    prod = inv_sqrt @ inv_sqrt @ (C + 1e-6 * np.eye(30))
    np.testing.assert_allclose(prod, np.eye(30), atol=1e-8)


def test_spd_inverse_sqrt_flags_indefinite():
    C = jnp.diag(jnp.array([1.0, -0.5, 2.0]))
    _, ok = spd_inverse_sqrt(C, eta=0.0)
    assert not bool(ok)


def test_ckron_ordering():
    q = jnp.array([2.0, 3.0, 5.0])
    expect = [4.0, 6.0, 9.0, 10.0, 15.0, 25.0]  # (00),(10),(11),(20),(21),(22)
    np.testing.assert_allclose(ckron(q), expect)
    rows, cols = ckron_indices(3)
    assert rows.tolist() == [0, 1, 1, 2, 2, 2]
    assert cols.tolist() == [0, 0, 1, 0, 1, 2]


def test_ckron_matrix_matches_columnwise(rng):
    Q = jnp.asarray(rng.standard_normal((4, 7)))
    batch = ckron(Q)
    for j in range(7):
        np.testing.assert_allclose(batch[:, j], ckron(Q[:, j]))


def test_state_input_kron(rng):
    u = jnp.array([2.0, -1.0])
    q = jnp.array([1.0, 3.0, 4.0])
    np.testing.assert_allclose(
        state_input_kron(u, q), [2, 6, 8, -1, -3, -4.0]
    )
    U = jnp.asarray(rng.standard_normal((2, 5)))
    Q = jnp.asarray(rng.standard_normal((3, 5)))
    batch = state_input_kron(U, Q)
    for j in range(5):
        np.testing.assert_allclose(batch[:, j], state_input_kron(U[:, j], Q[:, j]))


def test_unrolled_cholesky_and_solves(rng):
    """Unrolled small-matrix Cholesky/solves match LAPACK, incl. grads."""
    import jax
    from gp_bayesopinf_tpu.ops.chol import (
        unrolled_cho_solve,
        unrolled_cholesky,
        unrolled_solve_lower,
        unrolled_solve_upper_t,
    )

    n = 17
    X = rng.standard_normal((n, n))
    A = jnp.asarray(X @ X.T + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))

    L = unrolled_cholesky(A)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(A)), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(unrolled_solve_lower(L, b)),
        np.linalg.solve(np.asarray(L), np.asarray(b)), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(unrolled_solve_upper_t(L, b)),
        np.linalg.solve(np.asarray(L).T, np.asarray(b)), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(unrolled_cho_solve(L, b)),
        np.linalg.solve(np.asarray(A), np.asarray(b)), rtol=1e-8
    )

    # vmap over a batch.
    B, k = 5, 9
    Xs = rng.standard_normal((B, k, k))
    As = jnp.asarray(np.einsum("bij,bkj->bik", Xs, Xs) + k * np.eye(k))
    Ls = jax.vmap(unrolled_cholesky)(As)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(Ls[i]), np.linalg.cholesky(np.asarray(As[i])), rtol=1e-9
        )

    # Autodiff parity: gradient of logdet via unrolled factor equals the
    # gradient through jnp.linalg.cholesky.
    def logdet_unrolled(A):
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(unrolled_cholesky(A))))

    def logdet_lapack(A):
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(A))))

    # The unrolled factorization reads only the lower triangle, so its
    # cotangent lands there (off-diagonals carry both symmetric copies);
    # symmetrizing recovers the LAPACK gradient d logdet / dA = A^{-1}.
    g1 = jax.grad(logdet_unrolled)(A)
    g2 = jax.grad(logdet_lapack)(A)
    np.testing.assert_allclose(
        np.asarray(g1 + g1.T) / 2.0, np.asarray(g2), rtol=1e-7, atol=1e-10
    )


def test_nlml_unrolled_matches_chol(rng):
    """The screening NLML path is numerically the same function."""
    import jax
    from gp_bayesopinf_tpu.gp.nlml import nlml

    m = 33
    t = jnp.asarray(np.sort(rng.uniform(0, 1, m)))
    y = jnp.asarray(np.sin(7 * np.asarray(t)) + 0.1 * rng.standard_normal(m))
    lp = jnp.asarray(np.log([0.8, 0.1, 1e-3]))
    v1 = nlml(lp, t, y, method="chol")
    v2 = nlml(lp, t, y, method="unrolled")
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-10)
    g1 = jax.grad(nlml)(lp, t, y, method="chol")
    g2 = jax.grad(nlml)(lp, t, y, method="unrolled")
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8)
