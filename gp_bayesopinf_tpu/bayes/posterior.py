"""Gaussian posteriors over model operators / parameters and vmapped
posterior-ensemble prediction.

Behavioral spec: reference ``codebase/bayes.py``. ``BayesianROM`` holds one
Gaussian per operator-matrix row (``bayes.py:244-393``); ``BayesianODE``
holds a single Gaussian over the physical ODE parameters
(``bayes.py:97-241``). The TPU-native difference is in *prediction*: where
the reference draws serially and integrates each draw with scipy
(``bayes.py:81-94``), here sampling is one batched matmul and the whole
ensemble integrates as a single ``vmap`` over draws with instability
handled by masks (``solve.ivp.stability_mask``).

Posterior sampling uses covariance factors F (cov = F F^T): from the
regression's spectral form F = V diag(1/sqrt(S^2 + lambda^2)), or from a
loaded dense covariance via Cholesky. Draw = mean + F @ xi.
"""

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..rom.model import GalerkinROM
from ..solve.ivp import finite_mask, rk4_solve, stability_mask
from ..solve.lstsq import WeightedLSTSQ
from ..utils.aotcache import aot_jit


def ensemble_dtype():
    """Default integration dtype for posterior ensembles: float32 on TPU
    (no native f64 — emulation is slow to compile and run), full precision
    elsewhere."""
    import jax as _jax

    return jnp.float32 if _jax.default_backend() == "tpu" else None


# -- ensemble programs --------------------------------------------------------
#
# The vmapped ensemble integrations are the pipelines' hottest repeated
# programs, and both ``BayesianROM`` and ``BayesianODE`` build them from
# per-call closures. Hoisting them to module level with the (frozen,
# hashable, stably-repr'd) model object as a *static* argument gives two
# caching wins: jax.jit keys on (function identity, statics, avals), so
# repeat calls in-process — the 600-draw ensemble followed by the new-IC
# generalization ensemble, every reg-search objective evaluation — reuse
# one compiled program; and ``aot_jit`` persists the traced+lowered
# program across processes (utils.aotcache). A caller-supplied
# ``input_func`` has no stable repr, so that variant caches in-process
# only (keyed by function identity via lru_cache).


@aot_jit(static_argnames=("model",))
def _ode_ensemble(params, q0, t, *, model):
    """Batched truth-model solves over posterior parameter draws."""
    solve = lambda p: model.solve(q0, t, parameters=p)
    return jax.vmap(solve)(params)


@aot_jit(static_argnames=("model",))
def _rom_ensemble(ohats, q0, t, *, model):
    """Batched autonomous-ROM integrations over operator draws."""
    predict = lambda O: model.predict(O, q0, t, None)
    return jax.vmap(predict)(ohats)


def _validity_mask(draws, stability_envelope):
    """Finite/envelope rejection mask, co-located with the draws.

    The envelope statistics are usually host-committed f64 (they come
    from the hostmath estimation products) while the draws are
    accelerator-committed integration output — mixing commitments in one
    eager op raises, so the envelope is moved to the draws' device and
    compared in the draws' dtype (the integration precision: comparing
    an f32 trajectory against an f64 envelope adds no information)."""
    if stability_envelope is None:
        return finite_mask(draws)
    shift, limits = stability_envelope
    dev = list(draws.devices())[0]
    shift = jax.device_put(jnp.asarray(shift).astype(draws.dtype), dev)
    limits = jax.device_put(jnp.asarray(limits).astype(draws.dtype), dev)
    return stability_mask(draws, shift, limits)


@functools.lru_cache(maxsize=None)
def _rom_ensemble_with_inputs(model, input_func):
    def run(ohats, q0, t):
        predict = lambda O: model.predict(O, q0, t, input_func)
        return jax.vmap(predict)(ohats)

    return jax.jit(run)


class OperatorPosterior(NamedTuple):
    """Row-wise Gaussian posterior: N(means[i], F_i F_i^T) per row i."""

    means: jnp.ndarray  # (r, d)
    cov_factors: jnp.ndarray  # (r, d, d)

    @property
    def nrows(self) -> int:
        return self.means.shape[0]

    @property
    def ncols(self) -> int:
        return self.means.shape[1]

    @staticmethod
    def from_lstsq(lstsq: WeightedLSTSQ, lam) -> "OperatorPosterior":
        """Posterior from the weighted regression at regularizer lambda."""
        means = lstsq.solve(lam)
        eigs = lstsq.precision_eigs(lam)  # (r, d)
        scale = jax.lax.rsqrt(jnp.maximum(eigs, 1e-300))
        factors = lstsq.V * scale[:, None, :]
        return OperatorPosterior(means, factors)

    @staticmethod
    def from_moments(means, covs) -> "OperatorPosterior":
        """Posterior from dense means/covariances (e.g. loaded artifacts)."""
        means = jnp.atleast_2d(jnp.asarray(means))
        covs = jnp.asarray(covs)
        if covs.ndim == 2:
            covs = covs[None]
        factors = jnp.linalg.cholesky(covs)
        return OperatorPosterior(means, factors)

    def covariances(self) -> jnp.ndarray:
        return jnp.einsum("rik,rjk->rij", self.cov_factors, self.cov_factors)

    def sample(self, key, ndraws: int) -> jnp.ndarray:
        """(ndraws, r, d) operator draws."""
        xi = jax.random.normal(
            key, (ndraws, self.nrows, self.ncols), dtype=self.means.dtype
        )
        return self.means[None] + jnp.einsum("rij,nrj->nri", self.cov_factors, xi)


@dataclasses.dataclass(frozen=True)
class BayesianROM:
    """Bayesian reduced-order model: operator posterior + ROM structure."""

    model: GalerkinROM
    posterior: OperatorPosterior
    regularizer: Optional[float] = None

    @property
    def ndims(self) -> int:
        return self.model.state_dimension

    @property
    def means(self) -> jnp.ndarray:
        return self.posterior.means

    @property
    def covs(self) -> jnp.ndarray:
        return self.posterior.covariances()

    def rvs(self, key, ndraws: int = 1) -> jnp.ndarray:
        """Operator draws (ndraws, r, d)."""
        return self.posterior.sample(key, ndraws)

    def predict(
        self,
        key,
        initial_conditions: jnp.ndarray,
        timepoints: jnp.ndarray,
        input_func: Optional[Callable] = None,
    ) -> jnp.ndarray:
        """One posterior draw integrated through the ROM (r, k)."""
        Ohat = self.posterior.sample(key, 1)[0]
        return self.model.predict(Ohat, initial_conditions, timepoints, input_func)

    def solution_posterior(
        self,
        key,
        initial_conditions: jnp.ndarray,
        timepoints: jnp.ndarray,
        ndraws: int = 100,
        input_func: Optional[Callable] = None,
        stability_envelope=None,
        dtype=None,
    ):
        """Vmapped posterior ensemble.

        Parameters
        ----------
        stability_envelope : optional (shift (r,), limits (r,)) pair; when
            given, draws outside the reference's 5x-amplitude envelope (or
            non-finite) are masked invalid (``PDEs/main.py:126-143``).
        dtype : optional integration dtype. TPUs have no native f64 —
            XLA emulation inflates compile and runtime — so pipelines pass
            float32 on TPU backends (``ensemble_dtype()``); sampling stays
            in the posterior's precision either way.

        Returns
        -------
        draws : (ndraws, r, k) array.
        valid : (ndraws,) bool mask.
        """
        ohats = self.posterior.sample(key, ndraws)
        q0 = jnp.asarray(initial_conditions)
        t = jnp.asarray(timepoints)
        if dtype is not None:
            ohats, q0, t = ohats.astype(dtype), q0.astype(dtype), t.astype(dtype)
        # Ensembles run on the accelerator even when the posterior moments
        # were computed host-side (true-f64 policy, utils.hostmath). The
        # explicit target device matters: device_put with NO device is a
        # no-op for host-committed arrays, and jit follows committed
        # inputs — without it the whole vmapped integration lands on the
        # 1-core host (measured: ~10 s vs ~0.2 s for the SEIRD ex1a
        # 600-draw ensemble).
        from ..utils.hostmath import to_accelerator

        ohats, q0, t = to_accelerator((ohats, q0, t))

        if input_func is None:
            draws = _rom_ensemble(ohats, q0, t, model=self.model)
        else:
            try:
                program = _rom_ensemble_with_inputs(self.model, input_func)
            except TypeError:  # unhashable model/input_func: trace inline
                predict = lambda O: self.model.predict(O, q0, t, input_func)
                program = lambda o, q, tt: jax.vmap(predict)(o)
            draws = program(ohats, q0, t)

        valid = _validity_mask(draws, stability_envelope)
        return draws, valid


@dataclasses.dataclass(frozen=True)
class BayesianODE:
    """Bayesian posterior over physical ODE parameters.

    ``model`` must expose ``solve(initial_conditions, timepoints,
    parameters=...)`` (duck-typed like the reference's requirement of a
    ``parameters`` attribute + ``solve``, ``bayes.py:148-151``).
    """

    model: object
    posterior: OperatorPosterior  # r = 1 row, d = num params
    regularizer: Optional[float] = None

    @property
    def mean(self) -> jnp.ndarray:
        return self.posterior.means[0]

    @property
    def cov(self) -> jnp.ndarray:
        return self.posterior.covariances()[0]

    @property
    def num_params(self) -> int:
        return self.posterior.ncols

    def rvs(self, key, ndraws: int = 1, nonnegative: bool = False) -> jnp.ndarray:
        """Parameter draws (ndraws, d).

        With ``nonnegative=True``, draws with any negative component are
        replaced by the first nonnegative draw from an 8x oversample — the
        mask-based analogue of the reference's resample-until-valid loop
        (``bayes.py:174-191``); if no oversample is valid the mean is used.
        """
        if not nonnegative:
            return self.posterior.sample(key, ndraws)[:, 0, :]
        OVER = 8
        pool = self.posterior.sample(key, ndraws * OVER)[:, 0, :]
        pool = pool.reshape(ndraws, OVER, -1)
        ok = jnp.all(pool >= 0, axis=-1)  # (ndraws, OVER)
        first = jnp.argmax(ok, axis=1)
        chosen = jnp.take_along_axis(pool, first[:, None, None], axis=1)[:, 0]
        any_ok = jnp.any(ok, axis=1)
        return jnp.where(any_ok[:, None], chosen, self.mean[None])

    def predict(self, key, initial_conditions, timepoints):
        """One posterior draw integrated through the ODE (n, k)."""
        params = self.rvs(key, 1)[0]
        return self.model.solve(initial_conditions, timepoints, parameters=params)

    def solution_posterior(
        self,
        key,
        initial_conditions,
        timepoints,
        ndraws: int = 100,
        stability_envelope=None,
        dtype=None,
    ):
        """Vmapped ensemble over parameter draws.

        Returns (draws (ndraws, n, k), valid (ndraws,)).
        """
        params = self.rvs(key, ndraws)
        q0 = jnp.asarray(initial_conditions)
        t = jnp.asarray(timepoints)
        if dtype is not None:
            params, q0, t = (
                params.astype(dtype), q0.astype(dtype), t.astype(dtype)
            )
        # Explicit accelerator placement — see the note in
        # BayesianROM.solution_posterior.
        from ..utils.hostmath import to_accelerator

        params, q0, t = to_accelerator((params, q0, t))
        try:
            draws = _ode_ensemble(params, q0, t, model=self.model)
        except TypeError:  # unhashable duck-typed model: trace inline
            solve = lambda p: self.model.solve(q0, t, parameters=p)
            draws = jax.vmap(solve)(params)
        valid = _validity_mask(draws, stability_envelope)
        return draws, valid
