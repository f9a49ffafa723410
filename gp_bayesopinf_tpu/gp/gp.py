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

# ``weight_method="auto"`` switches to the factored low-rank weight root
# (gp/lowrank.py) at this many estimation points — where the dense
# (m' x m') factorization starts to dominate (same threshold as
# pipeline.scaled; reference watchdogged cost: codebase/gpkernels.py:496-504
# under PDEs/step2_fitgps.py:61).
LOWRANK_MIN_POINTS = 1024


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
    #                              'chol': sqrtW holds chol(C+eta I);
    #                              'lowrank': factored root in lowrank_root
    lowrank_root: Optional[object] = None  # gp.lowrank.LowRankWeightRoot

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
        if self.lowrank_root is not None:
            root = self.lowrank_root
            payload["lowrank_Q"] = np.asarray(root.Q)
            payload["lowrank_gain"] = np.asarray(root.gain)
            payload["lowrank_lam"] = np.asarray(root.lam)
            payload["lowrank_eta"] = float(root.eta)
            payload["lowrank_resid"] = float(root.resid)
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
            if "lowrank_Q" in z:
                from .lowrank import LowRankWeightRoot

                gp.lowrank_root = LowRankWeightRoot(
                    z["lowrank_Q"], z["lowrank_gain"], z["lowrank_lam"],
                    float(z["lowrank_eta"]), float(z["lowrank_resid"]),
                )
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
    adam_steps: int = 60,
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
    import os

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

    from .estimates import default_weight_method

    weight_method = weight_method or "auto"
    if weight_method == "auto":
        weight_method = (
            "lowrank"
            if t_est.shape[0] >= LOWRANK_MIN_POINTS
            else default_weight_method()
        )
    T = jnp.broadcast_to(t_s, Y.shape) if t_s.ndim == 1 else t_s

    # Hyperparameters sync to the host here either way — estimation is
    # host-f64 work (utils.hostmath policy).
    sigma2 = np.asarray(fit.sigma2, np.float64)
    ell = np.asarray(fit.ell, np.float64)
    chi = np.asarray(fit.chi, np.float64)

    if weight_method == "lowrank":
        return _fit_lowrank_gps(
            T, Y, t_est, sigma2, ell, chi, float(gp_regularizer)
        )

    # Estimation factorizations need true f64 — host LAPACK (see
    # utils.hostmath); tiny work, LAPACK-grade accuracy. Default path is
    # direct NumPy/SciPy (zero per-process tracing/compilation — the host
    # XLA program can't be AOT-served on accelerator sessions, CLAUDE.md);
    # GPBOI_NP_EST=0 restores the batched host-XLA program.
    from .estimates import batched_gp_estimates, numpy_batched_gp_estimates

    if os.environ.get("GPBOI_NP_EST", "1") != "0":
        ests = numpy_batched_gp_estimates(
            T, Y, t_est, sigma2, ell, chi, gp_regularizer,
            method=weight_method,
        )
    else:
        ests = batched_gp_estimates(
            T, Y, t_est, jnp.asarray(sigma2), jnp.asarray(ell),
            jnp.asarray(chi), jnp.asarray(gp_regularizer, jnp.float64),
            method=weight_method,
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
            float(sigma2[i]),
            float(ell[i]),
            float(chi[i]),
            t_estimation=t_est,
            state_estimate=ests.state_estimate[i],
            ddt_estimate=ests.ddt_estimate[i],
            ddt_covariance=ests.ddt_covariance[i],
            sqrtW=ests.weight_root[i],
            weight_method=weight_method,
        )
        gps.append(gp)
    return gps


def _fit_lowrank_gps(T, Y, t_est, sigma2, ell, chi, eta):
    """Per-mode factored-root estimation (``gp.lowrank``): O(m' p^2)
    pivoted-Cholesky + Woodbury roots instead of dense (m' x m')
    factorizations — the m'-scaling path (SURVEY §2e), now reachable from
    the reference workloads (ex1c/ex2c at m'=3200,
    ``/root/reference/PDEs/experiments.sh:14,24``).

    The dense ``ddt_covariance``/``sqrtW`` attributes stay ``None``; the
    factored root lives in ``GaussianProcess.lowrank_root`` and downstream
    regressions apply it via ``LowRankWeightRoot.apply`` (two thin
    matmuls per right-hand side)."""
    from .lowrank import lowrank_gp_estimates
    from ..utils.hostmath import host_device

    T_np = np.asarray(T, np.float64)
    Y_np = np.asarray(Y, np.float64)
    te = np.asarray(t_est, np.float64)
    dev = host_device()
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    gps = []
    for i in range(Y_np.shape[0]):
        est = lowrank_gp_estimates(
            T_np[i], Y_np[i], te,
            float(sigma2[i]), float(ell[i]), float(chi[i]), eta=eta,
        )
        gps.append(
            GaussianProcess(
                jnp.asarray(T_np[i]),
                jnp.asarray(Y_np[i]),
                float(sigma2[i]),
                float(ell[i]),
                float(chi[i]),
                t_estimation=jnp.asarray(te),
                state_estimate=put(est.state_estimate),
                ddt_estimate=put(est.ddt_estimate),
                weight_method="lowrank",
                lowrank_root=est.root,
            )
        )
    return gps
