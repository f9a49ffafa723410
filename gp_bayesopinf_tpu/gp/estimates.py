"""GP state / time-derivative estimation and least-squares weights.

Given fitted kernel hyperparameters (sigma2, ell, chi) and training data
(t, y), compute at the estimation times t_est:

    state_estimate  y~ = kappa_zy K_yy^{-1} y                    (m',)
    ddt_estimate    z~ = K_zy K_yy^{-1} y                        (m',)
    ddt_covariance  C  = K_zz - K_zy K_yy^{-1} K_yz (symmetrized)
    sqrtW              = (C + eta I)^{-1/2}  via eigh            (m', m')

Behavioral spec: reference ``codebase/gpkernels.py:445-504`` (math) and
``612-649`` (assembly). The TPU-native difference: this is a single pure
function of arrays, so fitting r POD modes is one ``vmap`` + ``jit`` —
batched Cholesky and batched eigh on device — instead of r serial
scipy calls.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.rbf import lstsq_kernel_matrices
from ..ops.chol import spd_cholesky, spd_inverse_sqrt
from ..utils.aotcache import aot_jit, register_namedtuple


class GPEstimates(NamedTuple):
    """Per-GP estimation products for the Bayesian regression.

    ``weight_root`` is either the symmetric inverse square root
    (C + eta I)^{-1/2} (``method="eigh"``; the reference's sqrtW) or the
    lower Cholesky factor L of (C + eta I) (``method="chol"``; weights
    applied downstream as L^{-1} via a triangular solve). Both define the
    SAME weighted regression and posterior.
    """

    state_estimate: jnp.ndarray  # (m',)
    ddt_estimate: jnp.ndarray  # (m',)
    ddt_covariance: jnp.ndarray  # (m', m')
    weight_root: jnp.ndarray  # (m', m')
    ok: jnp.ndarray  # () bool: (C + eta I) was SPD

    @property
    def sqrtW(self):
        """Reference-compatible alias (meaningful for method='eigh')."""
        return self.weight_root


# GPEstimates crosses the aot_jit export boundary below.
register_namedtuple(GPEstimates, "gp_bayesopinf_tpu.GPEstimates")


@aot_jit(static_argnames=("method",), host=True)
def batched_gp_estimates(T, Y, t_est, sigma2, ell, chi, eta, method="eigh"):
    """All-modes ``gp_estimates`` as ONE host-f64 program.

    This is the package's second most expensive program to build per
    process (the vmapped f64 kernel assembly + Cholesky + weight-root
    graph took ~4 min of XLA:CPU compile on a 1-core container, round 3),
    and the old per-call ``host_jit(vmap(lambda ...))`` wrapper also
    re-TRACED it on every ``fit_gaussian_processes`` call.  Module-level
    ``aot_jit(host=True)`` fixes both: one trace per signature per
    machine, served from the serialized-program cache afterwards.

    Parameters match ``gp_estimates`` with a leading mode axis on
    ``T``/``Y``/hyperparameters; ``eta`` must be a scalar ARRAY (the AOT
    cache bypasses on Python-scalar leaves).
    """
    fn = lambda t, y, s2, l, c: gp_estimates(  # noqa: E731
        t, y, t_est, s2, l, c, eta=eta, method=method
    )
    return jax.vmap(fn)(T, Y, sigma2, ell, chi)


def default_weight_method() -> str:
    """'chol' on TPU backends (f64 eigh is emulated and ~30x more work),
    'eigh' elsewhere (reference-parity sqrtW artifacts)."""
    import jax as _jax

    return "chol" if _jax.default_backend() == "tpu" else "eigh"


def numpy_batched_gp_estimates(T, Y, t_est, sigma2, ell, chi, eta,
                               method="eigh") -> GPEstimates:
    """Direct-LAPACK (NumPy/SciPy) twin of ``batched_gp_estimates``.

    Same math to LAPACK roundoff — kernel assembly per ``ops.rbf``
    closed forms, Cholesky solves, and the eigh/chol weight root of
    reference ``codebase/gpkernels.py:445-504`` — but with NO tracing,
    lowering, or XLA compilation.  That matters per *process*: the host
    XLA program cannot be served from the AOT export cache on
    accelerator sessions (the cross-platform call segfault, CLAUDE.md),
    so every fresh process re-paid ~2 s of trace+XLA:CPU compile for
    milliseconds of arithmetic.  Outputs are host-committed jax arrays,
    exactly like the host-XLA path, so downstream device placement is
    unchanged.
    """
    import numpy as np
    import scipy.linalg as la

    from ..utils.hostmath import host_device

    T = np.asarray(T, np.float64)
    Y = np.atleast_2d(np.asarray(Y, np.float64))
    if T.ndim == 1:
        T = np.broadcast_to(T, Y.shape)
    te = np.asarray(t_est, np.float64)
    s2s = np.broadcast_to(np.asarray(sigma2, np.float64), (Y.shape[0],))
    ells = np.broadcast_to(np.asarray(ell, np.float64), (Y.shape[0],))
    chis = np.broadcast_to(np.asarray(chi, np.float64), (Y.shape[0],))
    eta = float(np.asarray(eta))

    states, ddts, covs, roots, oks = [], [], [], [], []
    eye_est = np.eye(te.size)
    for i in range(Y.shape[0]):
        t, y = T[i], Y[i]
        s2, l, c = float(s2s[i]), float(ells[i]), float(chis[i])
        ell2 = l * l

        dyy = t[:, None] - t[None, :]
        K_yy = s2 * np.exp(-(dyy * dyy) / (2.0 * ell2)) + c * np.eye(t.size)
        dzy = te[:, None] - t[None, :]
        kappa_zy = s2 * np.exp(-(dzy * dzy) / (2.0 * ell2))
        K_zy = -dzy * kappa_zy / ell2
        dzz = te[:, None] - te[None, :]
        K_zz = (
            (1.0 - dzz * dzz / ell2)
            * (s2 * np.exp(-(dzz * dzz) / (2.0 * ell2)))
            / ell2
        )

        cho = la.cho_factor(K_yy, lower=True)
        alpha = la.cho_solve(cho, y)
        states.append(kappa_zy @ alpha)
        ddts.append(K_zy @ alpha)
        V = la.cho_solve(cho, K_zy.T)
        cross = K_zy @ V
        C = K_zz - 0.5 * (cross + cross.T)
        covs.append(C)

        if method == "eigh":
            w, Q = la.eigh(C + eta * eye_est)
            oks.append(bool(np.all(w > 0)))
            w_safe = np.where(w > 0, w, 1.0)
            roots.append((Q / np.sqrt(w_safe)) @ Q.T)
        elif method == "chol":
            try:
                L = la.cholesky(C + eta * eye_est, lower=True)
                oks.append(True)
            except la.LinAlgError:
                L = np.full_like(C, np.nan)
                oks.append(False)
            roots.append(L)
        else:
            raise ValueError(f"unknown weight method '{method}'")

    dev = host_device()
    put = lambda x: jax.device_put(jnp.asarray(np.stack(x)), dev)
    return GPEstimates(
        put(states), put(ddts), put(covs), put(roots),
        jax.device_put(jnp.asarray(np.asarray(oks)), dev),
    )


def gp_estimates(
    t: jnp.ndarray,
    y: jnp.ndarray,
    t_est: jnp.ndarray,
    sigma2,
    ell,
    chi,
    eta: float = 1e-8,
    method: str = "eigh",
) -> GPEstimates:
    """Compute GP estimates and the weight root for one state variable.

    Batch over modes with ``jax.vmap`` (all arguments support a leading
    batch axis; hyperparameters may be per-mode scalars).

    Parameters
    ----------
    t : (m,) array
        Training sample times.
    y : (m,) array
        Training observations for this state variable / POD mode.
    t_est : (m',) array
        Estimation (regression) times.
    sigma2, ell, chi : scalars
        Fitted kernel hyperparameters.
    eta : float >= 0
        Regularization for the weight-matrix inversion (reference default
        1e-8; CLI flag ``--gpreg``).
    method : "eigh" (explicit sqrtW via eigendecomposition — reference
        parity, exposes the sqrtW artifact) or "chol" (Cholesky factor of
        C + eta I; same weighted regression at a fraction of the cost —
        the fast path on TPU, where f64 eigh is emulated and slow).
    """
    K = lstsq_kernel_matrices(t, t_est, sigma2, ell, chi)

    L = jnp.linalg.cholesky(K.K_yy)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)  # K_yy^{-1} y
    state = K.kappa_zy @ alpha
    ddt = K.K_zy @ alpha

    # C = K_zz - K_zy K_yy^{-1} K_yz, symmetrized against roundoff.
    V = jax.scipy.linalg.cho_solve((L, True), K.K_zy.T)  # (m, m')
    cross = K.K_zy @ V
    C = K.K_zz - 0.5 * (cross + cross.T)

    if method == "eigh":
        root, ok = spd_inverse_sqrt(C, eta)
    elif method == "chol":
        root, ok = spd_cholesky(C, eta)
    else:
        raise ValueError(f"unknown weight method '{method}'")
    return GPEstimates(state, ddt, C, root, ok)


def gp_predict(
    t: jnp.ndarray,
    y: jnp.ndarray,
    t_query: jnp.ndarray,
    sigma2,
    ell,
    chi,
):
    """Posterior predictive mean and standard deviation at query times.

    Matches the semantics of ``sklearn.GaussianProcessRegressor.predict``
    with ``return_std=True`` (reference ``codebase/gpkernels.py:350-365``):
    the predictive std is that of the latent function under the fitted
    kernel, where the white-noise term contributes to the prior variance
    at the query points (sklearn includes the full kernel diagonal).

    Returns
    -------
    mean : (k,) array
    std : (k,) array
    """
    from ..ops.rbf import rbf

    m = t.shape[0]
    K_yy = rbf(t, t, sigma2, ell) + chi * jnp.eye(m, dtype=t.dtype)
    k_sy = rbf(t_query, t, sigma2, ell)

    L = jnp.linalg.cholesky(K_yy)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)
    mean = k_sy @ alpha

    # var = kernel diag at query - k_sy K_yy^{-1} k_ys.
    Vs = jax.scipy.linalg.cho_solve((L, True), k_sy.T)  # (m, k)
    prior_diag = sigma2 + chi  # kappa(t*,t*) + white noise diagonal
    var = prior_diag - jnp.sum(k_sy * Vs.T, axis=1)
    var = jnp.maximum(var, 0.0)
    return mean, jnp.sqrt(var)
