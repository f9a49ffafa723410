"""Squared-exponential (RBF) kernel and its closed-form derivative kernels.

For the kernel

    kappa(t, t') = sigma2 * exp(-(t - t')^2 / (2 ell^2))

the Gaussian-process derivative estimates need (see reference
``codebase/gpkernels.py:612-649`` for the behavioral spec):

    K_yy = kappa(t, t) + chi * I                      (m, m)
    kappa_zy = kappa(t_est, t)                        (m', m)
    K_zy = d/dt1 kappa(t_est, t) = -(dt / ell^2) * kappa(t_est, t)
    K_zz = d^2/(dt1 dt2) kappa(t_est, t_est)
         = (1 - dt^2 / ell^2) / ell^2 * kappa(t_est, t_est)

All functions take explicit hyperparameters so they vmap cleanly over a
batch of GPs (one per POD mode / state variable). Hyperparameters may be
scalars or leading-batched arrays.

The fused assembly ``lstsq_kernel_matrices`` computes all four matrices in
one jitted call: pairwise differences are formed once per (row-set, col-set)
pair and every matrix is an elementwise function of them, which XLA fuses
into a single VPU pass over each output tile — the TPU-appropriate
replacement for the reference's three separate ``rbf_eval`` calls.
"""

from typing import NamedTuple

import jax.numpy as jnp


def rbf(t1: jnp.ndarray, t2: jnp.ndarray, sigma2, ell) -> jnp.ndarray:
    """Evaluate kappa(t1, t2) = sigma2 * exp(-(t1-t2)^2 / (2 ell^2)).

    Parameters
    ----------
    t1 : (m1,) array
    t2 : (m2,) array
    sigma2, ell : scalars (or arrays broadcastable against (m1, m2))

    Returns
    -------
    (m1, m2) array
    """
    diff = t1[:, None] - t2[None, :]
    return sigma2 * jnp.exp(-(diff * diff) / (2.0 * ell * ell))


def rbf_gram(t: jnp.ndarray, sigma2, ell, chi) -> jnp.ndarray:
    """K_yy = kappa(t, t) + chi * I — the noisy training Gram matrix."""
    m = t.shape[0]
    return rbf(t, t, sigma2, ell) + chi * jnp.eye(m, dtype=t.dtype)


def derivative_gram(t_est: jnp.ndarray, t: jnp.ndarray, sigma2, ell):
    """First- and second-derivative kernel blocks.

    Returns
    -------
    K_zy : (m', m) array
        Cross-covariance of (dq/dt at t_est) with (q at t).
    K_zz : (m', m') array
        Covariance of (dq/dt at t_est) with itself.
    """
    ell2 = ell * ell
    dzy = t_est[:, None] - t[None, :]
    kzy = sigma2 * jnp.exp(-(dzy * dzy) / (2.0 * ell2))
    K_zy = -dzy * kzy / ell2

    dzz = t_est[:, None] - t_est[None, :]
    kzz = sigma2 * jnp.exp(-(dzz * dzz) / (2.0 * ell2))
    K_zz = (1.0 - dzz * dzz / ell2) * kzz / ell2
    return K_zy, K_zz


class KernelMatrices(NamedTuple):
    """All Gram blocks needed by the GP-BayesOpInf least-squares stage."""

    K_yy: jnp.ndarray  # (m, m)   kappa(t,t) + chi I
    kappa_zy: jnp.ndarray  # (m', m)  kappa(t_est, t)
    K_zy: jnp.ndarray  # (m', m)  d1 kappa(t_est, t)
    K_zz: jnp.ndarray  # (m', m') d1 d2 kappa(t_est, t_est)


def lstsq_kernel_matrices(
    t: jnp.ndarray,
    t_est: jnp.ndarray,
    sigma2,
    ell,
    chi,
) -> KernelMatrices:
    """Fused assembly of every kernel matrix used downstream.

    Parameters
    ----------
    t : (m,) array
        Training sample times.
    t_est : (m',) array
        Estimation (regression) times.
    sigma2, ell, chi : scalars
        RBF variance, length scale, and white-noise level.

    Returns
    -------
    KernelMatrices
    """
    ell2 = ell * ell

    dyy = t[:, None] - t[None, :]
    K_yy = sigma2 * jnp.exp(-(dyy * dyy) / (2.0 * ell2))
    K_yy = K_yy + chi * jnp.eye(t.shape[0], dtype=K_yy.dtype)

    dzy = t_est[:, None] - t[None, :]
    kappa_zy = sigma2 * jnp.exp(-(dzy * dzy) / (2.0 * ell2))
    K_zy = -dzy * kappa_zy / ell2

    dzz = t_est[:, None] - t_est[None, :]
    kzz = sigma2 * jnp.exp(-(dzz * dzz) / (2.0 * ell2))
    K_zz = (1.0 - dzz * dzz / ell2) * kzz / ell2

    return KernelMatrices(K_yy, kappa_zy, K_zy, K_zz)
