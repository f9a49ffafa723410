"""Multi-trajectory GP-BayesOpInf pipeline: cubic heat equation with
bimodal forcing inputs (reference ``PDEsMulti/``).

Stages (reference ``PDEsMulti/main.py:17-303``):

1. solve the cubic-heat truth model for each training input pair (a, b),
   sample noisy snapshots per trajectory,
2. joint quadratic-lifting POD over all trajectories,
3. GP fits for every (trajectory, mode) pair — one batched fit of L*r GPs,
4. stacked "cAHBN" regression: data matrices vstacked over trajectories,
   per-mode weights block-diagonal over trajectories (applied blockwise),
   regularization search with per-trajectory stability + averaged error,
5. per-trajectory posterior ensembles + a generalization test at unseen
   input parameters.
"""

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .configs import HeatMultiConfig
from ..models import CubicHeatBimodal, HeatBimodal
from ..models.heat import solve_host_stacked
from ..gp import fit_gaussian_processes
from ..rom import QuadraticLiftedBasis, GalerkinROM
from ..solve import weighted_lstsq_fit
from ..bayes.posterior import ensemble_dtype
from ..bayes import OperatorPosterior, BayesianROM, auto_regularize
from ..utils import key_from_seed, split_tree, TimedBlock
from ..utils.hostmath import to_accelerator


def input_func_factory(params):
    """u(t) for a given (a, b) input pair (``config_heat.py:103-113``)."""
    a, b = params

    def input_func(t):
        return HeatBimodal.oscillators(t, a, b)

    return input_func


@dataclasses.dataclass
class HeatMultiResult:
    basis: QuadraticLiftedBasis
    rom: GalerkinROM
    bayesian_model: BayesianROM
    regularizer: float
    time_domain: np.ndarray
    true_states: List[np.ndarray]  # per trajectory (n, k)
    time_domain_sampled: np.ndarray
    snapshots: List[np.ndarray]
    snapshots_compressed: List[np.ndarray]
    t_estimation: np.ndarray
    gps: List[list]  # gps[ell][i]
    draws_compressed: List[np.ndarray]  # per trajectory (ndraws, r, k)
    valid: List[np.ndarray]
    newparam_draws: Optional[np.ndarray] = None
    newparam_valid: Optional[np.ndarray] = None
    newparam_true: Optional[np.ndarray] = None
    spatial_domain: Optional[np.ndarray] = None
    input_parameters: Optional[tuple] = None
    test_parameters: Optional[tuple] = None


def run_heat_multi(
    training_span=(0.0, 1.0),
    num_samples: int = 20,
    noiselevel: float = 0.05,
    num_regression_points: int = 80,
    num_pod_modes: int = 5,
    gp_regularizer: float = 1e-8,
    ndraws: int = 100,
    config: Optional[HeatMultiConfig] = None,
    generalization_test: bool = True,
    verbose: bool = True,
) -> HeatMultiResult:
    """Run the multi-trajectory experiment (reference flagship ex3:
    (1.0, 20, 0.05, 80, 5), ``PDEsMulti/experiments.sh:6``)."""
    config = config or HeatMultiConfig()
    keys = split_tree(
        key_from_seed(config.seed),
        ["sample", "noise", "fit", "search", "draws", "newparam"],
    )
    L = len(config.input_parameters)
    t_pred = np.asarray(config.time_domain)
    x = np.asarray(config.spatial_domain)
    q0_full = np.asarray(
        HeatBimodal.initial_conditions(x, config.left_bc, config.right_bc)
    )

    def make_fom(params):
        a, b = params
        return CubicHeatBimodal(
            x, config.left_bc, config.right_bc, config.diffusion,
            a=a, b=b, substeps=config.fom_substeps,
        )

    # Step 1 — per-trajectory data generation (shared sample times,
    # reference ``PDEsMulti/step1:84-183``).
    with TimedBlock(f"generating training data ({L} trajectories)\n"), \
            jax.default_device(jax.devices("cpu")[0]):
        t_sampled = np.sort(
            np.asarray(
                jax.random.uniform(
                    keys["sample"], (num_samples,),
                    minval=training_span[0], maxval=training_span[1],
                )
            )
        )
        t_sampled[0], t_sampled[-1] = training_span
        nkeys = jax.random.split(keys["noise"], L)
        # Host-NumPy truth solves, all L trajectories stacked into one
        # tridiagonal Newton system (models/heat.py::solve_host_stacked):
        # the traced path would re-trace + recompile per trajectory
        # closure, and a per-trajectory host loop pays the Python
        # stepping overhead L times.
        foms = [make_fom(p) for p in config.input_parameters]
        true_states = list(solve_host_stacked(foms, q0_full, t_pred))
        sampled = solve_host_stacked(foms, q0_full, t_sampled)
        snapshots = [
            np.asarray(fom.noise(nkeys[ell], sampled[ell], noiselevel))
            for ell, fom in enumerate(foms)
        ]

    # Step 2a — joint POD over all trajectories (host-side SVD; see
    # utils.hostmath true-f64 policy).
    with TimedBlock(f"joint POD to {num_pod_modes} modes"):
        with jax.default_device(jax.devices("cpu")[0]):
            basis = QuadraticLiftedBasis.fit(
                np.hstack(snapshots), num_vectors=num_pod_modes
            )
            snapshots_compressed = [basis.compress(s) for s in snapshots]
        # Explicit accelerator placement (device_put with no target
        # does not move host-committed arrays).
        snapshots_compressed = [
            to_accelerator(s) for s in snapshots_compressed
        ]

    # Step 2b — batched GP fits for all (trajectory, mode) pairs at once.
    t_est = np.linspace(
        training_span[0], training_span[1], num_regression_points
    )
    with TimedBlock(f"fitting {L * num_pod_modes} Gaussian processes (batched)\n"):
        stacked = jnp.concatenate(
            [jnp.asarray(s) for s in snapshots_compressed], axis=0
        )  # (L*r, m)
        gps_flat = fit_gaussian_processes(
            t_est,
            t_sampled,
            stacked,
            constant_bounds=config.gp_bounds.constant,
            length_scale_bounds=config.gp_bounds.length_scale,
            noise_level_bounds=config.gp_bounds.noise_level,
            n_restarts_optimizer=config.gp_bounds.n_restarts,
            gp_regularizer=gp_regularizer,
            key=keys["fit"],
        )
        gps = [
            gps_flat[ell * num_pod_modes : (ell + 1) * num_pod_modes]
            for ell in range(L)
        ]

    # Step 3 — stacked regression + regularization search.
    rom = GalerkinROM(
        config.structure,
        state_dimension=num_pod_modes,
        input_dimension=2,
        ivp_method=config.ivp_method,
        substeps=config.rom_substeps,
    )
    input_funcs = [input_func_factory(p) for p in config.input_parameters]
    with TimedBlock("constructing posterior hyperparameters\n"):
        state_ests = [
            jnp.stack([gp.state_estimate for gp in gps[ell]]) for ell in range(L)
        ]
        D_blocks = jnp.stack(
            [
                rom.data_matrix(
                    state_ests[ell], jnp.asarray(input_funcs[ell](jnp.asarray(t_est)))
                )
                for ell in range(L)
            ]
        )  # (L, m', d)
        rhs = jnp.stack(
            [
                jnp.stack([gps[ell][i].ddt_estimate for ell in range(L)])
                for i in range(num_pod_modes)
            ]
        )  # (r, L, m')
        if gps[0][0].weight_method == "lowrank":
            roots = [
                [gps[ell][i].lowrank_root for ell in range(L)]
                for i in range(num_pod_modes)
            ]
            fac = weighted_lstsq_fit(D_blocks, roots, rhs)
        else:
            sqrtW = jnp.stack(
                [
                    jnp.stack([gps[ell][i].sqrtW for ell in range(L)])
                    for i in range(num_pod_modes)
                ]
            )  # (r, L, m', m')
            fac = weighted_lstsq_fit(
                D_blocks, sqrtW, rhs,
                weights_are_cholesky=(gps[0][0].weight_method == "chol"),
            )

        predict_fns = [
            (lambda f: (lambda O, q, t: rom.predict(O, q, t, input_func=f)))(f)
            for f in input_funcs
        ]
        ics = jnp.stack([est[:, 0] for est in state_ests])  # (L, r)
        res = auto_regularize(
            fac,
            predict_fns,
            ics,
            t_pred,
            t_est,
            jnp.stack(state_ests),
            keys["search"],
            grid=config.reg_grid,
            ndraws=20,
            verbose=verbose,
            # PDEsMulti aborts on refinement failure where PDEs falls back
            # to the grid best (``PDEsMulti/step3_estimate.py:207``).
            refine_failure="raise",
            # TPU backends screen through the implicit-SDIRK cAHBN
            # megakernel (inputs pre-evaluated at the integrator
            # abscissae); other backends keep the generic vmapped path.
            rom=rom,
            input_funcs=input_funcs,
        )
        posterior = OperatorPosterior.from_lstsq(fac, res.regularizer)
        bayesian_model = BayesianROM(rom, posterior, res.regularizer)

    # Step 4 — per-trajectory posterior ensembles.
    draws_all, valid_all = [], []
    with TimedBlock("sampling posterior distributions\n"):
        dkeys = jax.random.split(keys["draws"], L)
        for ell in range(L):
            qbar = jnp.mean(state_ests[ell], axis=1)
            bound = 5.0 * jnp.max(
                jnp.abs(state_ests[ell] - qbar[:, None]), axis=1
            )
            draws, valid = bayesian_model.solution_posterior(
                dkeys[ell],
                state_ests[ell][:, 0],
                t_pred,
                ndraws=ndraws,
            dtype=ensemble_dtype(),
                input_func=input_funcs[ell],
                stability_envelope=(qbar, bound),
            )
            draws_all.append(np.asarray(draws))
            valid_all.append(np.asarray(valid))
            if verbose and int((~valid).sum()):
                print(f"trajectory {ell}: {int((~valid).sum())}/{ndraws} unstable")

    result = HeatMultiResult(
        basis=basis,
        rom=rom,
        bayesian_model=bayesian_model,
        regularizer=res.regularizer,
        time_domain=t_pred,
        true_states=true_states,
        time_domain_sampled=t_sampled,
        snapshots=snapshots,
        snapshots_compressed=[np.asarray(s) for s in snapshots_compressed],
        t_estimation=t_est,
        gps=gps,
        draws_compressed=draws_all,
        valid=valid_all,
        spatial_domain=x,
        input_parameters=tuple(config.input_parameters),
        test_parameters=tuple(config.test_parameters),
    )

    # Generalization at unseen input parameters (``main.py:247-303``).
    if generalization_test:
        fom_new = make_fom(config.test_parameters)
        with jax.default_device(jax.devices("cpu")[0]):
            truth_new = np.asarray(fom_new.solve(q0_full, t_pred))
            compressed_new = np.asarray(basis.compress(truth_new))
        draws, valid = bayesian_model.solution_posterior(
            keys["newparam"],
            compressed_new[:, 0],
            t_pred,
            ndraws=ndraws,
            dtype=ensemble_dtype(),
            input_func=input_func_factory(config.test_parameters),
        )
        result.newparam_draws = np.asarray(draws)
        result.newparam_valid = np.asarray(valid)
        result.newparam_true = truth_new
    return result
