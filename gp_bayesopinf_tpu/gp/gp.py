"""User-facing Gaussian-process objects.

``fit_gaussian_processes`` is the batched pipeline entry point: it fits the
hyperparameters of ALL state variables / POD modes in one jitted
multi-restart optimization and computes every estimation product
(state/ddt estimates, ddt covariance, sqrtW) with one batched call —
replacing the reference's per-mode loop of sklearn fits
(``PDEs/step2_fitgps.py:67-102``).

``GaussianProcess`` is a thin per-mode view with the reference wrapper's
API surface (``codebase/gpkernels.py:299-504``): ``predict``,
``prediction_bounds``, ``__call__`` (kernel evaluation),
``compute_lstsq_matrices``, ``save``/``load``, plus the estimation
attributes ``state_estimate``, ``ddt_estimate``, ``ddt_covariance``,
``sqrtW``, ``t_estimation``.
"""

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .estimates import gp_estimates, gp_predict
from .fit import FitResult, fit_gp_hyperparameters
from .nlml import BoxTransform
from ..ops.rbf import rbf


@dataclasses.dataclass
class GaussianProcess:
    """One fitted RBF+white GP for a single state variable."""

    t_training: jnp.ndarray
    y: jnp.ndarray
    constant: float  # sigma^2
    length_scale: float  # ell
    noise_level: float  # chi

    # Estimation products (populated by compute_lstsq_matrices).
    t_estimation: Optional[jnp.ndarray] = None
    state_estimate: Optional[jnp.ndarray] = None
    ddt_estimate: Optional[jnp.ndarray] = None
    ddt_covariance: Optional[jnp.ndarray] = None
    sqrtW: Optional[jnp.ndarray] = None  # weight root (see weight_method)
    weight_method: str = "eigh"  # 'eigh': sqrtW = (C+eta I)^{-1/2};
    #                              'chol': sqrtW holds chol(C+eta I)

    @property
    def nsamples(self) -> int:
        return int(self.t_training.shape[0])

    def __str__(self):
        return "\n\t".join(
            [
                "Gaussian radial basis function kernel (TPU)",
                r"k(t, t') = \sigma^2 exp(-(t - t')^2 / (2 \ell^2)) + \chi I",
                rf"\sigma^2 = {self.constant:.4e}",
                rf"\ell = {self.length_scale:.4e}",
                rf"\chi = {self.noise_level:.4e}",
            ]
        )

    # -- prediction --------------------------------------------------------------
    def predict(self, t):
        """Posterior mean and std at times t."""
        return gp_predict(
            self.t_training,
            self.y,
            jnp.asarray(t),
            self.constant,
            self.length_scale,
            self.noise_level,
        )

    def prediction_bounds(self, t, kind: str = "95%"):
        mean, std = self.predict(t)
        width = {"std": 1.0, "95%": 1.96, "2std": 2.0, "3std": 3.0}.get(kind)
        if width is None:
            raise ValueError(kind)
        return mean - width * std, mean, mean + width * std

    def __call__(self, t, tprime):
        """Kernel evaluation k(t, t') including the white-noise diagonal."""
        t = jnp.asarray(t)
        tprime = jnp.asarray(tprime)
        K = rbf(t, tprime, self.constant, self.length_scale)
        same = t[:, None] == tprime[None, :]
        return K + self.noise_level * same.astype(K.dtype)

    def rbf_eval(self, t1, t2):
        return rbf(jnp.asarray(t1), jnp.asarray(t2), self.constant, self.length_scale)

    # -- estimation --------------------------------------------------------------
    def compute_lstsq_matrices(self, t_est, eta: float = 1e-8, method="eigh"):
        """Populate state/ddt estimates and the weight root at estimation
        times (reference ``gpkernels.py:612-649``)."""
        t_est = jnp.asarray(t_est)
        est = gp_estimates(
            self.t_training,
            self.y,
            t_est,
            self.constant,
            self.length_scale,
            self.noise_level,
            eta=eta,
            method=method,
        )
        self.weight_method = method
        if not bool(est.ok):
            raise ValueError(
                "inverse covariance not positive definite, increase eta"
            )
        self.t_estimation = t_est
        self.state_estimate = est.state_estimate
        self.ddt_estimate = est.ddt_estimate
        self.ddt_covariance = est.ddt_covariance
        self.sqrtW = est.weight_root
        return self

    # -- persistence ----------------------------------------------------------------
    _EST_FIELDS = (
        "t_estimation",
        "state_estimate",
        "ddt_estimate",
        "ddt_covariance",
        "sqrtW",
    )

    def save(self, path: str):
        """Persist the fitted GP INCLUDING its estimation products, so a
        loaded GP is immediately usable without recomputing
        ``compute_lstsq_matrices`` — the reference joblib-dumps the whole
        fitted wrapper the same way (``codebase/gpkernels.py:423-430``)."""
        payload = dict(
            t_training=np.asarray(self.t_training),
            y=np.asarray(self.y),
            constant=self.constant,
            length_scale=self.length_scale,
            noise_level=self.noise_level,
        )
        if self.state_estimate is not None:
            payload["weight_method"] = self.weight_method
            for name in self._EST_FIELDS:
                value = getattr(self, name)
                if value is not None:
                    payload[name] = np.asarray(value)
        np.savez(path, **payload)

    @staticmethod
    def load(path: str) -> "GaussianProcess":
        with np.load(path) as z:
            gp = GaussianProcess(
                jnp.asarray(z["t_training"]),
                jnp.asarray(z["y"]),
                float(z["constant"]),
                float(z["length_scale"]),
                float(z["noise_level"]),
            )
            if "state_estimate" in z:
                gp.weight_method = str(z["weight_method"])
                for name in GaussianProcess._EST_FIELDS:
                    if name in z:
                        setattr(gp, name, jnp.asarray(z[name]))
        return gp


def fit_gaussian_processes(
    time_domain_training,
    time_domain_sampled,
    snapshots_sampled,
    constant_bounds=(1e-5, 1e5),
    length_scale_bounds=(1e-5, 1e2),
    noise_level_bounds=(1e-16, 1e2),
    n_restarts_optimizer: int = 50,
    gp_regularizer: float = 1e-8,
    key=None,
    adam_steps: int = 100,
    polish_iters: int = 10,
    weight_method: Optional[str] = None,
):
    """Fit GPs to every row of ``snapshots_sampled`` — one batched solve.

    Parameters mirror the reference step-2 entry point
    (``PDEs/step2_fitgps.py:67-102`` + the ``config_<problem>.py`` bound
    constants). ``time_domain_sampled`` may be (m,) shared or (r, m)
    per-variable (unsynced ODE sampling).

    Returns
    -------
    list of ``GaussianProcess`` (estimation products populated).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    Y = jnp.atleast_2d(jnp.asarray(snapshots_sampled))
    t_s = jnp.asarray(time_domain_sampled)
    t_est = jnp.asarray(time_domain_training)

    box = BoxTransform.from_bounds(
        constant_bounds, length_scale_bounds, noise_level_bounds
    )
    fit: FitResult = fit_gp_hyperparameters(
        t_s, Y, box, key,
        n_restarts=n_restarts_optimizer,
        adam_steps=adam_steps,
        polish_iters=polish_iters,
    )

    from .estimates import batched_gp_estimates, default_weight_method

    weight_method = weight_method or default_weight_method()
    T = jnp.broadcast_to(t_s, Y.shape) if t_s.ndim == 1 else t_s
    # Estimation factorizations need true f64 — host CPU device (see
    # utils.hostmath); tiny work, LAPACK-grade accuracy. The module-level
    # AOT-cached program avoids re-tracing per call / per process.
    ests = batched_gp_estimates(
        T, Y, t_est, fit.sigma2, fit.ell, fit.chi,
        jnp.asarray(gp_regularizer, jnp.float64), method=weight_method,
    )

    if not bool(jnp.all(ests.ok)):
        bad = np.where(~np.asarray(ests.ok))[0]
        raise ValueError(
            f"inverse covariance not positive definite for modes {bad.tolist()}"
            ", increase eta"
        )

    gps = []
    for i in range(Y.shape[0]):
        gp = GaussianProcess(
            T[i],
            Y[i],
            float(fit.sigma2[i]),
            float(fit.ell[i]),
            float(fit.chi[i]),
            t_estimation=t_est,
            state_estimate=ests.state_estimate[i],
            ddt_estimate=ests.ddt_estimate[i],
            ddt_covariance=ests.ddt_covariance[i],
            sqrtW=ests.weight_root[i],
            weight_method=weight_method,
        )
        gps.append(gp)
    return gps
