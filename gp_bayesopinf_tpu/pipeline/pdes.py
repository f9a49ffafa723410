"""Compressible-Euler GP-BayesOpInf pipeline, single trajectory
(reference ``PDEs/``).

Stages (reference ``PDEs/main.py:18-255``):

1. solve the Euler truth model, sample noisy snapshots,
2. POD compression with the nondimensionalizing Euler basis,
3. one GP per reduced mode — here a single batched fit,
4. quadratic "cAH" ROM regression with the GP weights, regularization
   auto-search, Bayesian operator posterior,
5. vmapped posterior ensemble with the 5x-amplitude stability filter,
   decompressed back to the full state space,
6. optional derivative-estimate comparison data (GP vs finite
   differences vs lifted intrusive truth, ``PDEs/main.py:208-255``).
"""

import dataclasses
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .configs import EulerConfig
from ..models import Euler
from ..gp import fit_gaussian_processes
from ..rom import EulerScaledBasis, GalerkinROM
from ..solve import weighted_lstsq_fit
from ..bayes.posterior import ensemble_dtype
from ..bayes import OperatorPosterior, BayesianROM, auto_regularize
from ..utils import key_from_seed, split_tree, TimedBlock
from ..utils.hostmath import to_accelerator


@dataclasses.dataclass
class EulerResult:
    model: Euler
    basis: EulerScaledBasis
    rom: GalerkinROM
    bayesian_model: BayesianROM
    regularizer: float
    time_domain: np.ndarray
    true_states: np.ndarray
    time_domain_sampled: np.ndarray
    snapshots_sampled: np.ndarray
    snapshots_compressed: np.ndarray
    t_estimation: np.ndarray
    gps: list
    draws_compressed: np.ndarray  # (ndraws, r, k)
    valid: np.ndarray
    draws: Optional[np.ndarray] = None  # decompressed (ndraws_valid, n, k)
    svdvals: Optional[np.ndarray] = None
    ddtdata: Optional[Dict[str, np.ndarray]] = None


def run_euler(
    training_span=(0.0, 0.06),
    num_samples: int = 200,
    noiselevel: float = 0.03,
    num_regression_points: int = 400,
    num_pod_modes: int = 6,
    gp_regularizer: float = 1e-8,
    ndraws: int = 100,
    config: Optional[EulerConfig] = None,
    decompress_draws: bool = True,
    ddtdata: bool = False,
    weight_method: Optional[str] = None,
    verbose: bool = True,
) -> EulerResult:
    """Run the Euler experiment start to finish (reference CLI:
    ``python3 main.py T_MAX NUMSAMPLES NOISE NUMPTS NUMPODMODES``;
    flagship ex1a = (0.06, 200, 0.03, 400, 6), ``PDEs/experiments.sh:13``).

    ``weight_method`` (None = "auto") selects the GP weight-root
    factorization — "eigh"/"chol" dense, "lowrank" factored pivoted
    Cholesky + Woodbury; "auto" switches to lowrank at m' >= 1024
    (``gp.gp.LOWRANK_MIN_POINTS``), so ex1c/ex2c (m'=3200) run factored
    by default. Pass "chol" to force the dense path for comparison."""
    config = config or EulerConfig()
    keys = split_tree(
        key_from_seed(config.seed), ["sample", "noise", "fit", "search", "draws"]
    )
    model = Euler(config.spatial_domain, substeps=config.fom_substeps)
    t_pred = np.asarray(config.time_domain)
    q0_full = np.asarray(model.initial_conditions(np.asarray(config.init_params)))

    # Step 1 — data generation (host CPU device; see odes.py note).
    with TimedBlock("generating training data"):
        with jax.default_device(jax.devices("cpu")[0]):
            true_states = model.solve(q0_full, t_pred)
            t_sampled = np.sort(
                np.asarray(
                    jax.random.uniform(
                        keys["sample"], (num_samples,),
                        minval=training_span[0], maxval=training_span[1],
                    )
                )
            )
            t_sampled[0], t_sampled[-1] = training_span
            snapshots = model.noise(
                keys["noise"], model.solve(q0_full, t_sampled), noiselevel
            )

    # Step 2a — POD compression. The SVD runs on the host CPU device
    # (true f64; the TPU's emulated-f64 SVD is inaccurate and can NaN —
    # see utils.hostmath); compressed coordinates then move on-device.
    with TimedBlock(f"reducing states to {num_pod_modes} dimensions"):
        with jax.default_device(jax.devices("cpu")[0]):
            basis = EulerScaledBasis.fit(
                snapshots, num_vectors=num_pod_modes,
                v_ref=config.v_ref, rho_ref=config.rho_ref,
            )
            snapshots_compressed = basis.compress(snapshots)
        # Explicit accelerator placement (device_put with no target
        # does not move host-committed arrays).
        snapshots_compressed = to_accelerator(snapshots_compressed)

    # Step 2b — batched GP fits on the reduced coordinates.
    t_est = np.linspace(
        training_span[0], training_span[1], num_regression_points
    )
    with TimedBlock("fitting Gaussian processes (batched)\n"):
        gps = fit_gaussian_processes(
            t_est,
            t_sampled,
            snapshots_compressed,
            constant_bounds=config.gp_bounds.constant,
            length_scale_bounds=config.gp_bounds.length_scale,
            noise_level_bounds=config.gp_bounds.noise_level,
            n_restarts_optimizer=config.gp_bounds.n_restarts,
            gp_regularizer=gp_regularizer,
            key=keys["fit"],
            weight_method=weight_method,
        )
        if verbose:
            for i, gp in enumerate(gps):
                print(f"[mode {i}] {gp}".replace("\n\t", "  "))

    # Step 3 — ROM regression + regularization search.
    rom = GalerkinROM(
        config.structure,
        state_dimension=num_pod_modes,
        ivp_method=config.ivp_method,
        substeps=config.rom_substeps,
    )
    with TimedBlock("constructing posterior hyperparameters\n"):
        state_est = jnp.stack([gp.state_estimate for gp in gps])
        D = rom.data_matrix(state_est)[None]  # (1, m', d)
        rhs = jnp.stack([gp.ddt_estimate for gp in gps])[:, None]  # (r, 1, m')
        if gps[0].weight_method == "lowrank":
            # Factored roots (m' >= 1024, e.g. ex1c/ex2c at m'=3200):
            # applied as thin matmuls, never materializing (m' x m').
            fac = weighted_lstsq_fit(
                D, [gp.lowrank_root for gp in gps], rhs
            )
        else:
            sqrtW = jnp.stack([gp.sqrtW for gp in gps])[:, None]
            fac = weighted_lstsq_fit(
                D, sqrtW, rhs,
                weights_are_cholesky=(gps[0].weight_method == "chol"),
            )

        predict_fn = lambda O, q, t: rom.predict(O, q, t)
        res = auto_regularize(
            fac,
            [predict_fn],
            state_est[:, 0][None],
            t_pred,
            t_est,
            state_est[None],
            keys["search"],
            grid=config.reg_grid,
            ndraws=20,
            verbose=verbose,
            rom=rom,
        )
        posterior = OperatorPosterior.from_lstsq(fac, res.regularizer)
        bayesian_model = BayesianROM(rom, posterior, res.regularizer)

    # Sampling — vmapped ensemble with the amplitude filter.
    with TimedBlock("sampling posterior distribution"):
        qbar = jnp.mean(snapshots_compressed, axis=1)
        bound = 5.0 * jnp.max(
            jnp.abs(snapshots_compressed - qbar[:, None]), axis=1
        )
        draws_c, valid = bayesian_model.solution_posterior(
            keys["draws"],
            snapshots_compressed[:, 0],
            t_pred,
            ndraws=ndraws,
            dtype=ensemble_dtype(),
            stability_envelope=(qbar, bound),
        )
        # Real readback inside the timed stage (block_until_ready returns
        # at enqueue under the axon tunnel; see odes.py).
        draws_c, valid = np.asarray(draws_c), np.asarray(valid)
        if verbose and int((~valid).sum()):
            print(f"\n{int((~valid).sum())}/{ndraws} draws unstable")

    draws_full = None
    if decompress_draws:
        valid_np = np.asarray(valid)
        with jax.default_device(jax.devices("cpu")[0]):
            decompress = jax.jit(basis.decompress)
            draws_full = np.stack(
                [np.asarray(decompress(jnp.asarray(np.asarray(d))))
                 for d in np.asarray(draws_c)[valid_np]]
            ) if valid_np.any() else np.zeros(
                (0,) + (basis.full_dimension, t_pred.size)
            )

    result = EulerResult(
        model=model,
        basis=basis,
        rom=rom,
        bayesian_model=bayesian_model,
        regularizer=res.regularizer,
        time_domain=t_pred,
        true_states=np.asarray(true_states),
        time_domain_sampled=t_sampled,
        snapshots_sampled=np.asarray(snapshots),
        snapshots_compressed=np.asarray(snapshots_compressed),
        t_estimation=t_est,
        gps=gps,
        draws_compressed=np.asarray(draws_c),
        valid=np.asarray(valid),
        draws=draws_full,
        svdvals=np.asarray(basis.svdvals),
    )

    if ddtdata:
        result.ddtdata = _derivative_comparison_data(
            model, basis, gps, config, t_sampled, snapshots_compressed,
            t_est, keys["draws"], ndraws,
        )
    return result


def _derivative_comparison_data(
    model, basis, gps, config, t_sampled, snapshots_compressed, t_est,
    key, ndraws,
) -> Dict[str, np.ndarray]:
    """GP derivative moments vs finite differences vs intrusive truth
    (reference ``PDEs/main.py:208-255``). Host-side (f64 truth math)."""
    import contextlib
    ctx = jax.default_device(jax.devices("cpu")[0])
    with ctx:
        return _derivative_comparison_data_impl(
            model, basis, gps, config, t_sampled, snapshots_compressed,
            t_est, key, ndraws,
        )


def _derivative_comparison_data_impl(
    model, basis, gps, config, t_sampled, snapshots_compressed, t_est,
    key, ndraws,
) -> Dict[str, np.ndarray]:
    dqdtmeans = np.stack([np.asarray(gp.ddt_estimate) for gp in gps])
    # Std of ndraws samples from N(ddt_estimate, ddt_covariance). The
    # covariance is only positive SEMI-definite (it can have numerically
    # negative eigenvalues), so the factor comes from an eigendecomposition
    # with clamped spectrum rather than a Cholesky.
    stds = []
    for i, gp in enumerate(gps):
        kd = jax.random.fold_in(key, i)
        if gp.ddt_covariance is None:  # lowrank path: reconstruct
            cov = jnp.asarray(gp.lowrank_root.covariance())
        else:
            cov = gp.ddt_covariance
        C = 0.5 * (cov + cov.T)
        w, V = jnp.linalg.eigh(C)
        factor = V * jnp.sqrt(jnp.clip(w, 0.0))[None, :]
        z = jax.random.normal(kd, (ndraws, C.shape[0]))
        samples = gp.ddt_estimate[None] + z @ factor.T
        stds.append(np.asarray(jnp.std(samples, axis=0)))
    dqdtstds = np.stack(stds)

    dqdtFD = np.gradient(
        np.asarray(snapshots_compressed), t_sampled, edge_order=2, axis=1
    )

    t_fine = np.linspace(t_est[0], t_est[-1], 1000)
    truth_fine = model.solve(
        np.asarray(model.initial_conditions(np.asarray(config.init_params))),
        t_fine,
    )
    cons = model.unlift(truth_fine)
    dcons = jax.vmap(lambda q: model.derivative(0.0, q), in_axes=1, out_axes=1)(cons)
    dQdt_lifted = model.lift_ddts(cons, dcons)
    dQdt_compressed = basis.entries.T @ basis._pre(dQdt_lifted)

    return {
        "time_domain_FD": t_sampled,
        "ddts_finitedifferences": dqdtFD,
        "time_domain_GP": np.asarray(t_est),
        "ddts_GPmean": dqdtmeans,
        "ddts_GPstd": dqdtstds,
        "time_domain_truth": t_fine,
        "ddts_truth": np.asarray(dQdt_compressed),
    }
