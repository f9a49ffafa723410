"""Independent NumPy/SciPy oracle for parity tests.

Implements the GP-BayesOpInf math (derivative-kernel GP estimation,
weighted regularized least squares, posterior moments, truth-model ODE
right-hand sides) directly from the formulas with scipy's LAPACK-backed
routines — the same numerical route the reference takes — WITHOUT importing
or copying the reference. Used as the ground truth for the JAX/TPU
implementation and as the CPU wall-clock baseline in ``bench.py``.
"""

import numpy as np
import scipy.linalg as la
import scipy.integrate


# ---- GP kernel matrices -------------------------------------------------------
def kernel_matrices(t, t_est, sigma2, ell, chi):
    """K_yy, kappa_zy, K_zy, K_zz for the RBF+white kernel."""
    ell2 = ell * ell

    def kappa(a, b):
        d = a[:, None] - b[None, :]
        return sigma2 * np.exp(-(d * d) / (2 * ell2))

    K_yy = kappa(t, t) + chi * np.eye(t.size)
    kappa_zy = kappa(t_est, t)
    K_zy = -(t_est[:, None] - t[None, :]) * kappa_zy / ell2
    dzz = t_est[:, None] - t_est[None, :]
    K_zz = (1 - dzz * dzz / ell2) * kappa(t_est, t_est) / ell2
    return K_yy, kappa_zy, K_zy, K_zz


def estimates_and_weights(t, y, t_est, sigma2, ell, chi, eta=1e-8):
    """State/ddt estimates, ddt covariance, and sqrtW (scipy route)."""
    K_yy, kappa_zy, K_zy, K_zz = kernel_matrices(t, t_est, sigma2, ell, chi)
    cho = la.cho_factor(K_yy)
    alpha = la.cho_solve(cho, y)
    state = kappa_zy @ alpha
    ddt = K_zy @ alpha
    cross = K_zy @ la.cho_solve(cho, K_zy.T)
    C = K_zz - 0.5 * (cross + cross.T)
    w, V = la.eigh(C + eta * np.eye(t_est.size))
    assert np.all(w > 0), "covariance not SPD; increase eta"
    sqrtW = (V / np.sqrt(w)) @ V.T
    return state, ddt, C, sqrtW


def gp_nlml(t, y, sigma2, ell, chi):
    """Exact negative log marginal likelihood."""
    K_yy = kernel_matrices(t, t, sigma2, ell, chi)[0]
    cho = la.cho_factor(K_yy)
    alpha = la.cho_solve(cho, y)
    logdet = 2 * np.sum(np.log(np.diag(cho[0])))
    return 0.5 * y @ alpha + 0.5 * logdet + 0.5 * t.size * np.log(2 * np.pi)


# ---- weighted regularized least squares ---------------------------------------
def weighted_lstsq_solve(D_blocks, sqrtW, rhs, lam):
    """Solve each row problem min ||D o - z||_W^2 + lam^2 ||o||^2.

    D_blocks: (B, m, d); sqrtW: (r, B, m, m); rhs: (r, B, m).
    Returns means (r, d) and precisions (r, d, d).
    """
    r, B, m, _ = sqrtW.shape
    d = D_blocks.shape[-1]
    means, precisions = [], []
    for i in range(r):
        Dt = np.vstack([sqrtW[i, b] @ D_blocks[b] for b in range(B)])
        zt = np.concatenate([sqrtW[i, b] @ rhs[i, b] for b in range(B)])
        A = np.vstack([Dt, lam * np.eye(d)])
        b = np.concatenate([zt, np.zeros(d)])
        mean = np.linalg.lstsq(A, b, rcond=None)[0]
        means.append(mean)
        precisions.append(Dt.T @ Dt + lam**2 * np.eye(d))
    return np.array(means), np.array(precisions)


# ---- truth-model right-hand sides ----------------------------------------------
def seird2_rhs(t, state, p):
    S, E, I = state[0], state[1], state[2]
    dS = -p[0] * S * I
    dE = -dS - p[1] * E
    dR = p[2] * I
    dD = p[3] * I
    dI = p[1] * E - dR - dD
    return np.array([dS, dE, dI, dR, dD])


def solve_seird2(p, q0, t_eval, rtol=1e-8, atol=1e-10):
    return scipy.integrate.solve_ivp(
        seird2_rhs, (t_eval[0], t_eval[-1]), q0, t_eval=t_eval,
        args=(p,), rtol=rtol, atol=atol, method="RK45",
    ).y


GAMMA_EULER = 1.4


def euler_conservative_rhs(t, state, dx):
    rho, rho_v, rho_e = np.split(state, 3)
    v = rho_v / rho
    p = (GAMMA_EULER - 1) * (rho_e - 0.5 * rho_v * v)

    def ddx(w):
        return (w - np.roll(w, 1)) / dx

    return -np.concatenate([ddx(rho_v), ddx(rho_v * v + p), ddx((rho_e + p) * v)])


def solve_euler(q0_cons, t_eval, dx, rtol=1e-5, atol=1e-8):
    return scipy.integrate.solve_ivp(
        euler_conservative_rhs, (t_eval[0], t_eval[-1]), q0_cons,
        t_eval=t_eval, args=(dx,), rtol=rtol, atol=atol, method="RK45",
    ).y


def heat_operators(x_full, left_bc, right_bc, kappa):
    """Interior stiffness matrix, BC constant vector, input matrix."""
    dx = x_full[1] - x_full[0]
    x = x_full[1:-1]
    n = x.size
    dx2inv = kappa / dx**2
    A = (
        np.diag(np.full(n - 1, dx2inv), -1)
        + np.diag(np.full(n, -2 * dx2inv))
        + np.diag(np.full(n - 1, dx2inv), 1)
    )
    c = np.zeros(n)
    c[0], c[-1] = left_bc * dx2inv, right_bc * dx2inv
    B = np.column_stack(
        [1 / (1 + 100 * (x - 0.25) ** 2), 1 / (1 + 100 * (x - 0.75) ** 2)]
    )
    return A, c, B


def solve_cubic_heat(q0_interior, t_eval, A, c, B, a, b, rtol=1e-5, atol=1e-8):
    def rhs(t, q):
        u = np.array([a * np.sin(2 * np.pi * t), b * np.sin(4 * np.pi * t)])
        return c + A @ q - q**3 + B @ u

    def jac(t, q):
        return A - np.diag(3 * q * q)

    return scipy.integrate.solve_ivp(
        rhs, (t_eval[0], t_eval[-1]), q0_interior, t_eval=t_eval,
        method="BDF", jac=jac, rtol=rtol, atol=atol,
    ).y
