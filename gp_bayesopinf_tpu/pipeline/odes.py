"""SEIRD parameter-estimation pipeline (reference ``ODEs/``).

Stages (reference ``ODEs/main.py:17-232``):

1. sample a noisy trajectory (optionally per-variable unsynced times and
   integer-only sampling, ``ODEs/step1_generate_data.py``),
2. fit one GP per state variable — here a single batched fit,
3. build the 5-block data matrix / block-weighted regression and select
   the regularizer (``ODEs/step3_estimate.py``),
4. posterior ensemble over the prediction domain + a generalization test
   from unseen initial conditions (``ODEs/main.py:216-232``).

The reference's fork also runs a second, independent GP backend and
prints numerical comparisons (``ODEs/main.py:131-182``); the analogue
here is ``crosscheck=True``, which recomputes the GP estimation products
with NumPy/SciPy (LAPACK) at the fitted hyperparameters and reports the
max deviations.
"""

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .configs import SEIRDConfig
from ..models import SEIRD2
from ..gp import fit_gaussian_processes
from ..solve import weighted_lstsq_fit
from ..bayes.posterior import ensemble_dtype
from ..bayes import OperatorPosterior, BayesianODE, auto_regularize
from ..utils import key_from_seed, split_tree, TimedBlock


@dataclasses.dataclass
class SEIRDResult:
    model: SEIRD2
    bayesian_model: BayesianODE
    regularizer: float
    time_domain: np.ndarray
    true_states: np.ndarray
    sample_times: List[np.ndarray]
    snapshots: np.ndarray
    t_estimation: np.ndarray
    gps: list
    draws: np.ndarray  # (ndraws, 5, k)
    valid: np.ndarray  # (ndraws,)
    newic_draws: Optional[np.ndarray] = None
    newic_valid: Optional[np.ndarray] = None
    crosscheck: Optional[Dict[str, float]] = None


def sample_trajectory(
    key,
    model: SEIRD2,
    config: SEIRDConfig,
    training_span,
    num_samples: int,
    noiselevel: float,
    synced: bool = False,
    integersonly: bool = True,
):
    """Noisy snapshots with optionally per-variable sample times
    (reference ``ODEs/step1_generate_data.py:93-137``; the paper runs use
    synced=False, integersonly=True)."""
    t0, t1 = training_span
    nvars = model.num_variables

    def draw_times(k):
        if integersonly:
            choices = jax.random.choice(
                k, int(t1), shape=(num_samples,), replace=False
            )
            t = jnp.sort(choices.astype(jnp.result_type(float)))
        else:
            t = jnp.sort(
                jax.random.uniform(k, (num_samples,), minval=t0, maxval=t1)
            )
        return t.at[0].set(t0).at[-1].set(t1)

    key_t, key_n = jax.random.split(key)
    q0 = jnp.asarray(config.initial_conditions)
    if synced:
        t = draw_times(key_t)
        snaps = model.noise(key_n, model.solve(q0, t), noiselevel)
        sample_times = jnp.broadcast_to(t, (nvars, num_samples))
    else:
        tkeys = jax.random.split(key_t, nvars)
        nkeys = jax.random.split(key_n, nvars)
        rows, times = [], []
        for i in range(nvars):
            t = draw_times(tkeys[i])
            noised = model.noise(nkeys[i], model.solve(q0, t), noiselevel)
            rows.append(noised[i])
            times.append(t)
        snaps = jnp.stack(rows)
        sample_times = jnp.stack(times)
    return sample_times, snaps


def run_seird(
    training_span=(0.0, 90.0),
    num_samples: int = 90,
    noiselevel: float = 0.10,
    num_regression_points: int = 360,
    gp_regularizer: float = 1e-8,
    ndraws: int = 100,
    config: Optional[SEIRDConfig] = None,
    synced: bool = False,
    integersonly: bool = True,
    crosscheck: bool = False,
    verbose: bool = True,
) -> SEIRDResult:
    """Run the SEIRD experiment start to finish (reference CLI surface:
    ``python3 main.py T_MAX NUMSAMPLES NOISELEVEL NUMPTS --ndraws N``)."""
    config = config or SEIRDConfig()
    keys = split_tree(
        key_from_seed(config.seed),
        ["sample", "fit", "search", "draws", "newic"],
    )
    model = SEIRD2(
        parameters=tuple(
            np.asarray(SEIRD2.convert_parameters(config.true_parameters6))
        ),
        substeps=config.substeps,
    )
    t_pred = np.asarray(config.time_domain)
    q0 = np.asarray(config.initial_conditions)

    # Step 1 — data generation. Truth solves run on the host CPU device:
    # this is the reference's L1 stage (scipy there), and sequential f64
    # scans are emulation-bound on TPU.
    with TimedBlock("generating training data"):
        with jax.default_device(jax.devices("cpu")[0]):
            true_states = model.solve(q0, t_pred)
            sample_times, snapshots = sample_trajectory(
                keys["sample"], model, config, training_span,
                num_samples, noiselevel, synced=synced, integersonly=integersonly,
            )
        true_states, sample_times, snapshots = jax.device_put(
            (true_states, sample_times, snapshots)
        )

    # Step 2 — batched GP fits.
    t_est = np.linspace(training_span[0], training_span[1], num_regression_points)
    with TimedBlock("fitting Gaussian processes (batched)\n"):
        gps = fit_gaussian_processes(
            t_est,
            sample_times,
            snapshots,
            constant_bounds=config.gp_bounds.constant,
            length_scale_bounds=config.gp_bounds.length_scale,
            noise_level_bounds=config.gp_bounds.noise_level,
            n_restarts_optimizer=config.gp_bounds.n_restarts,
            gp_regularizer=gp_regularizer,
            key=keys["fit"],
        )
        if verbose:
            for i, gp in enumerate(gps):
                print(f"[{model.LABELS[i]}] {gp}".replace("\n\t", "  "))

    xcheck = _crosscheck(gps, t_est, gp_regularizer) if crosscheck else None

    # Step 3 — regression + regularization search.
    with TimedBlock("constructing posterior hyperparameters\n"):
        state_est = jnp.stack([gp.state_estimate for gp in gps])
        D_blocks = model.data_matrix_blocks(state_est)
        sqrtW = jnp.stack([gp.sqrtW for gp in gps])[None]
        rhs = jnp.stack([gp.ddt_estimate for gp in gps])[None]
        fac = weighted_lstsq_fit(
            D_blocks, sqrtW, rhs,
            weights_are_cholesky=(gps[0].weight_method == "chol"),
        )

        predict_fn = lambda O, q, t: model.solve(q, t, parameters=O[0])
        res = auto_regularize(
            fac,
            [predict_fn],
            jnp.asarray(state_est[:, 0])[None],
            t_pred,
            t_est,
            state_est[None],
            keys["search"],
            grid=config.reg_grid,
            ndraws=20,
            verbose=verbose,
        )
        posterior = OperatorPosterior.from_lstsq(fac, res.regularizer)
        bayesian_model = BayesianODE(model, posterior, res.regularizer)

    # Step 4 — posterior ensembles.
    with TimedBlock("sampling posterior distribution"):
        shift = jnp.mean(state_est, axis=1)
        limits = 5.0 * jnp.max(jnp.abs(state_est - shift[:, None]), axis=1)
        draws, valid = bayesian_model.solution_posterior(
            keys["draws"], q0, t_pred, ndraws=ndraws,
            dtype=ensemble_dtype(),
            stability_envelope=(shift, limits),
        )
        if verbose and int((~valid).sum()):
            print(f"\n{int((~valid).sum())}/{ndraws} DRAWS UNSTABLE")

    # Generalization test from unseen initial conditions.
    newic_draws, newic_valid = bayesian_model.solution_posterior(
        keys["newic"],
        np.asarray(config.test_initial_conditions),
        t_pred,
        ndraws=ndraws,
        dtype=ensemble_dtype(),
    )

    return SEIRDResult(
        model=model,
        bayesian_model=bayesian_model,
        regularizer=res.regularizer,
        time_domain=t_pred,
        true_states=np.asarray(true_states),
        sample_times=[np.asarray(t) for t in sample_times],
        snapshots=np.asarray(snapshots),
        t_estimation=t_est,
        gps=gps,
        draws=np.asarray(draws),
        valid=np.asarray(valid),
        newic_draws=np.asarray(newic_draws),
        newic_valid=np.asarray(newic_valid),
        crosscheck=xcheck,
    )


def _crosscheck(gps, t_est, eta) -> Dict[str, float]:
    """Recompute estimation products with NumPy/SciPy (LAPACK) at the same
    hyperparameters and report max deviations — the independent-backend
    check the reference fork performs (``ODEs/main.py:131-182``)."""
    import scipy.linalg as la

    worst = {"state_estimate": 0.0, "ddt_estimate": 0.0, "sqrtW": 0.0}
    for gp in gps:
        t = np.asarray(gp.t_training)
        y = np.asarray(gp.y)
        te = np.asarray(t_est)
        s2, ell, chi = gp.constant, gp.length_scale, gp.noise_level
        ell2 = ell * ell

        def kap(a, b):
            d = a[:, None] - b[None, :]
            return s2 * np.exp(-(d * d) / (2 * ell2))

        Kyy = kap(t, t) + chi * np.eye(t.size)
        kzy = kap(te, t)
        Kzy = -(te[:, None] - t[None, :]) * kzy / ell2
        dzz = te[:, None] - te[None, :]
        Kzz = (1 - dzz * dzz / ell2) * kap(te, te) / ell2

        cho = la.cho_factor(Kyy)
        alpha = la.cho_solve(cho, y)
        state = kzy @ alpha
        ddt = Kzy @ alpha
        cross = Kzy @ la.cho_solve(cho, Kzy.T)
        C = Kzz - 0.5 * (cross + cross.T)
        w, V = la.eigh(C + eta * np.eye(te.size))
        sqrtW = (V / np.sqrt(w)) @ V.T

        worst["state_estimate"] = max(
            worst["state_estimate"],
            float(np.max(np.abs(np.asarray(gp.state_estimate) - state))),
        )
        worst["ddt_estimate"] = max(
            worst["ddt_estimate"],
            float(np.max(np.abs(np.asarray(gp.ddt_estimate) - ddt))),
        )
        denom = max(float(np.max(np.abs(sqrtW))), 1e-300)
        worst["sqrtW"] = max(
            worst["sqrtW"],
            float(np.max(np.abs(np.asarray(gp.sqrtW) - sqrtW))) / denom,
        )
    print("Backend crosscheck (JAX vs LAPACK), max abs deviations:")
    for k, v in worst.items():
        print(f"  {k}: {v:.3e}")
    return worst
