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
here is ``crosscheck=True``, which (a) recomputes the GP estimation
products with NumPy/SciPy (LAPACK) at the fitted hyperparameters and
reports the max deviations, and (b) re-FITS every GP with the
independent native C++ backend (projected L-BFGS on the exact NLML,
``native/gpboi_native.cpp``), rebuilds the parameter posterior through a
NumPy/SciPy route, and compares the resulting posterior means/stds with
``np.allclose(rtol=1e-1)`` — the fork's sklearn-vs-gpytorch posterior
comparison, able to catch a wrong optimum in ``gp/fit.py``.
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
from ..bayes import (
    OperatorPosterior,
    BayesianODE,
    KernelScreenSpec,
    auto_regularize,
)
from ..utils import host_rng, key_from_seed, split_tree, TimedBlock
from ..utils.hostmath import to_accelerator


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

    # Everything in this stage is host NumPy — the reference's
    # scipy/numpy L1 layer (``ODEs/step1_generate_data.py``). The RNG is
    # derived deterministically from the threaded key (utils.keys
    # .host_rng), so a fresh pipeline process pays zero jax tracing or
    # compilation here (measured 1.5 s of small draw-program compiles
    # per cold process before this).
    rng = host_rng(key)

    def draw_times():
        if integersonly:
            t = np.sort(
                rng.choice(int(t1), size=num_samples, replace=False)
            ).astype(np.float64)
        else:
            t = np.sort(rng.uniform(t0, t1, size=num_samples))
        t[0], t[-1] = t0, t1
        return t

    q0 = np.asarray(config.initial_conditions)
    if synced:
        t = draw_times()
        snaps = model.noise_host(rng, model.solve_host(q0, t), noiselevel)
        sample_times = np.broadcast_to(t, (nvars, num_samples))
    else:
        rows, times = [], []
        for i in range(nvars):
            t = draw_times()
            noised = model.noise_host(
                rng, model.solve_host(q0, t), noiselevel
            )
            rows.append(noised[i])
            times.append(t)
        snaps = np.stack(rows)
        sample_times = np.stack(times)
    return jnp.asarray(sample_times), jnp.asarray(snaps)


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

    # Step 1 — data generation. Truth solves run as host NumPy: this is
    # the reference's L1 stage (scipy there); a traced scan would retrace
    # and remote-compile per call for milliseconds of f64 arithmetic
    # (solve.ivp.rk4_solve_np). Random draws (times, noise) stay in jax.
    with TimedBlock("generating training data"):
        true_states = model.solve_host(q0, t_pred)
        with jax.default_device(jax.devices("cpu")[0]):
            sample_times, snapshots = sample_trajectory(
                keys["sample"], model, config, training_span,
                num_samples, noiselevel, synced=synced, integersonly=integersonly,
            )
        # Explicit accelerator placement: device_put with no target does
        # not move host-committed arrays, and jit follows commitment.
        true_states, sample_times, snapshots = to_accelerator(
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
        jax.block_until_ready([gp.sqrtW for gp in gps])  # honest stage timing
        if verbose:
            for i, gp in enumerate(gps):
                print(f"[{model.LABELS[i]}] {gp}".replace("\n\t", "  "))

    xcheck = _crosscheck(gps, t_est, gp_regularizer) if crosscheck else None

    # Step 3 — regression + regularization search.
    with TimedBlock("constructing posterior hyperparameters\n"):
        state_est = jnp.stack([gp.state_estimate for gp in gps])
        D_blocks = model.data_matrix_blocks(state_est)
        rhs = jnp.stack([gp.ddt_estimate for gp in gps])[None]
        if gps[0].weight_method == "lowrank":
            fac = weighted_lstsq_fit(
                D_blocks, [[gp.lowrank_root for gp in gps]], rhs
            )
        else:
            sqrtW = jnp.stack([gp.sqrtW for gp in gps])[None]
            fac = weighted_lstsq_fit(
                D_blocks, sqrtW, rhs,
                weights_are_cholesky=(gps[0].weight_method == "chol"),
            )

        # SEIRD2's RHS is exactly quadratic, so parameter draws map to
        # "cAH" operator rows (``model.cah_operators``) and the search's
        # grid screen runs on the fused ensemble megakernel on TPU
        # (generic per-draw integration elsewhere — identical decisions,
        # pinned by tests/test_seird_kernel.py).
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
            rom=KernelScreenSpec(
                structure="cAH",
                state_dimension=model.num_variables,
                substeps=model.substeps,
            ),
            operator_map=model.cah_operators,
        )
        posterior = OperatorPosterior.from_lstsq(fac, res.regularizer)
        bayesian_model = BayesianODE(model, posterior, res.regularizer)
        jax.block_until_ready(posterior)  # honest stage timing

    # Dual-backend posterior comparison: independent native fit ->
    # NumPy/SciPy estimation + regression -> posterior, compared like the
    # reference fork compares its sklearn and gpytorch posteriors.
    if crosscheck:
        with TimedBlock("second-backend (native) posterior crosscheck\n"):
            mean2, cov2, hypers2 = _second_backend_posterior(
                gps, t_est, gp_regularizer, res.regularizer, config
            )
            xcheck.update(_compare_posteriors(bayesian_model, mean2, cov2,
                                              verbose=verbose))

    # Step 4 — posterior ensembles. Stage timing forces a REAL readback
    # (np.asarray): under the axon tunnel ``block_until_ready`` returns at
    # enqueue time, which previously hid the execution + transfer outside
    # the timed blocks (in the result assembly).
    with TimedBlock("sampling posterior distribution"):
        shift = jnp.mean(state_est, axis=1)
        limits = 5.0 * jnp.max(jnp.abs(state_est - shift[:, None]), axis=1)
        draws, valid = bayesian_model.solution_posterior(
            keys["draws"], q0, t_pred, ndraws=ndraws,
            dtype=ensemble_dtype(),
            stability_envelope=(shift, limits),
        )
        draws, valid = np.asarray(draws), np.asarray(valid)
        if verbose and int((~valid).sum()):
            print(f"\n{int((~valid).sum())}/{ndraws} DRAWS UNSTABLE")

    # Generalization test from unseen initial conditions (reuses the
    # ensemble program compiled for the sampling stage above).
    with TimedBlock("new-IC generalization ensemble"):
        newic_draws, newic_valid = bayesian_model.solution_posterior(
            keys["newic"],
            np.asarray(config.test_initial_conditions),
            t_pred,
            ndraws=ndraws,
            dtype=ensemble_dtype(),
        )
        newic_draws = np.asarray(newic_draws)
        newic_valid = np.asarray(newic_valid)

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
        draws=draws,
        valid=valid,
        newic_draws=newic_draws,
        newic_valid=newic_valid,
        crosscheck=xcheck,
    )


def _estimates_np(t, y, te, s2, ell, chi, eta):
    """NumPy/SciPy (LAPACK) GP estimation products: state, ddt, sqrtW."""
    import scipy.linalg as la

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
    return state, ddt, sqrtW


def _crosscheck(gps, t_est, eta) -> Dict[str, float]:
    """Recompute estimation products with NumPy/SciPy (LAPACK) at the same
    hyperparameters and report max deviations — the exact-parity half of
    the reference fork's dual-backend check (``ODEs/main.py:131-182``)."""
    worst = {"state_estimate": 0.0, "ddt_estimate": 0.0, "sqrtW": 0.0}
    te = np.asarray(t_est)
    for gp in gps:
        state, ddt, sqrtW = _estimates_np(
            np.asarray(gp.t_training), np.asarray(gp.y), te,
            gp.constant, gp.length_scale, gp.noise_level, eta,
        )
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


def _second_backend_posterior(gps, t_est, eta, lam, config, n_restarts=25):
    """Independently re-fit every GP and rebuild the parameter posterior.

    The second backend is the native C++ core (projected L-BFGS on the
    exact NLML, ``native.fit_gp``; scipy L-BFGS-B fallback when the shared
    library is absent). Estimation and the blockwise-weighted regression
    are then re-derived entirely in NumPy/SciPy, so NOTHING of the JAX
    fitting path is reused — a fitting bug in ``gp/fit.py`` shows up as a
    posterior mismatch, exactly like the reference fork's sklearn-vs-
    gpytorch comparison (``ODEs/main.py:89-182``).

    Returns (mean (4,), cov (4, 4), hyperparameters (5, 3)).
    """
    from .. import native as native_mod

    b = config.gp_bounds
    te = np.asarray(t_est)
    states, ddts, sqrtWs, hypers = [], [], [], []
    for i, gp in enumerate(gps):
        t = np.asarray(gp.t_training)
        y = np.asarray(gp.y)
        if native_mod.available():
            (s2, ell, chi), _ = native_mod.fit_gp(
                t, y, b.constant, b.length_scale, b.noise_level,
                n_restarts=n_restarts, seed=1000 + i,
            )
        else:  # scipy L-BFGS-B over the same exact NLML
            import scipy.optimize

            lo = np.log([b.constant[0], b.length_scale[0], b.noise_level[0]])
            hi = np.log([b.constant[1], b.length_scale[1], b.noise_level[1]])
            rng = np.random.default_rng(1000 + i)

            def nlml_np(z):
                s2_, ell_, chi_ = np.exp(z)
                d = t[:, None] - t[None, :]
                K = s2_ * np.exp(-(d * d) / (2 * ell_ * ell_)) + chi_ * np.eye(t.size)
                try:
                    L = np.linalg.cholesky(K)
                except np.linalg.LinAlgError:
                    return 1e30
                a = np.linalg.solve(L.T, np.linalg.solve(L, y))
                return float(
                    0.5 * y @ a + np.sum(np.log(np.diag(L)))
                    + 0.5 * t.size * np.log(2 * np.pi)
                )

            best = (np.inf, np.zeros(3))
            starts = [np.clip(np.zeros(3), lo, hi)]
            starts += list(rng.uniform(lo, hi, (n_restarts, 3)))
            for z0 in starts:
                r_ = scipy.optimize.minimize(
                    nlml_np, z0, method="L-BFGS-B", bounds=list(zip(lo, hi))
                )
                if r_.fun < best[0]:
                    best = (r_.fun, r_.x)
            s2, ell, chi = np.exp(best[1])
        hypers.append((s2, ell, chi))
        state, ddt, sqrtW = _estimates_np(t, y, te, s2, ell, chi, eta)
        states.append(state)
        ddts.append(ddt)
        sqrtWs.append(sqrtW)

    D_blocks = np.asarray(SEIRD2.data_matrix_blocks(np.stack(states)))
    d = D_blocks.shape[-1]
    Dt = np.vstack([sqrtWs[k] @ D_blocks[k] for k in range(len(gps))])
    zt = np.concatenate([sqrtWs[k] @ ddts[k] for k in range(len(gps))])
    A = np.vstack([Dt, lam * np.eye(d)])
    rhs_aug = np.concatenate([zt, np.zeros(d)])
    mean = np.linalg.lstsq(A, rhs_aug, rcond=None)[0]
    precision = Dt.T @ Dt + lam * lam * np.eye(d)
    cov = np.linalg.inv(precision)
    return mean, cov, np.asarray(hypers)


def _compare_posteriors(bayesian_model, mean2, cov2, verbose=True):
    """Print/return the reference fork's posterior comparison statistics
    (abs/rel diffs, Frobenius norm, ``np.allclose(rtol=1e-1)``;
    ``ODEs/main.py:131-182``)."""
    mean1 = np.asarray(bayesian_model.mean, dtype=np.float64)
    cov1 = np.asarray(bayesian_model.cov, dtype=np.float64)
    std1 = np.sqrt(np.diag(cov1))
    std2 = np.sqrt(np.diag(cov2))
    stats = {
        "posterior_mean_absdiff": float(np.max(np.abs(mean1 - mean2))),
        "posterior_mean_reldiff": float(
            np.max(np.abs(mean1 - mean2) / np.maximum(np.abs(mean2), 1e-300))
        ),
        "posterior_std_reldiff": float(
            np.max(np.abs(std1 - std2) / np.maximum(std2, 1e-300))
        ),
        "posterior_cov_frob": float(np.linalg.norm(cov1 - cov2)),
        "posterior_mean_allclose": bool(np.allclose(mean1, mean2, rtol=1e-1)),
        "posterior_std_allclose": bool(np.allclose(std1, std2, rtol=1e-1)),
    }
    if verbose:
        print("Dual-backend posterior comparison (JAX fit vs native fit):")
        print(f"  means JAX:    {mean1}")
        print(f"  means native: {mean2}")
        print(f"  stds  JAX:    {std1}")
        print(f"  stds  native: {std2}")
        for k, v in stats.items():
            print(f"  {k}: {v}")
    return stats
