"""HDF5 artifact persistence.

Dataset names follow the reference schemas so downstream tooling carries
over:

* Bayesian ODE posterior: ``mean``, ``cov``
  (reference ``codebase/bayes.py:217-241``).
* Bayesian ROM posterior: ``state_dimension``, ``means_{i}``,
  ``covs_{i}``, plus a ``model`` group
  (reference ``codebase/bayes.py:364-393``; the model group stores this
  framework's ROM metadata + operator means rather than an opinf
  pickle).
* Pipeline exports: ``<prefix>_data-reduced.h5`` / ``<prefix>_data-full.h5``
  with the plotter datasets (reference ``PDEs/step4_plot.py:153-184``),
  and ``<prefix>-ddtdata.h5`` (reference ``PDEs/main.py:248-255``).

Note the reference's ``BayesianODE.load`` drops its required model
argument (latent bug, SURVEY.md appendix A); here load takes the model
explicitly.
"""

import os
from typing import Optional

import numpy as np
import h5py

from ..bayes.posterior import BayesianODE, BayesianROM, OperatorPosterior
from ..rom.model import GalerkinROM


def _check_overwrite(path: str, overwrite: bool):
    if os.path.isfile(path) and not overwrite:
        raise FileExistsError(path)


# ---- Bayesian posteriors ------------------------------------------------------
def save_bayesian_ode(bm: BayesianODE, path: str, overwrite: bool = True):
    _check_overwrite(path, overwrite)
    with h5py.File(path, "w") as hf:
        hf.create_dataset("mean", data=np.asarray(bm.mean))
        hf.create_dataset("cov", data=np.asarray(bm.cov))


def load_bayesian_ode(path: str, model) -> BayesianODE:
    with h5py.File(path, "r") as hf:
        mean = hf["mean"][:]
        cov = hf["cov"][:]
    return BayesianODE(model, OperatorPosterior.from_moments(mean[None], cov))


def save_bayesian_rom(bm: BayesianROM, path: str, overwrite: bool = True):
    _check_overwrite(path, overwrite)
    means = np.asarray(bm.means)
    covs = np.asarray(bm.covs)
    with h5py.File(path, "w") as hf:
        hf.create_dataset("state_dimension", data=[bm.ndims])
        for i in range(bm.ndims):
            hf.create_dataset(f"means_{i}", data=means[i])
            hf.create_dataset(f"covs_{i}", data=covs[i])
        grp = hf.create_group("model")
        grp.attrs["structure"] = bm.model.structure
        grp.attrs["state_dimension"] = bm.model.state_dimension
        grp.attrs["input_dimension"] = bm.model.input_dimension
        grp.attrs["ivp_method"] = bm.model.ivp_method
        grp.attrs["substeps"] = bm.model.substeps
        grp.create_dataset("operators", data=means)
        if bm.regularizer is not None:
            grp.attrs["regularizer"] = bm.regularizer


def load_bayesian_rom(path: str) -> BayesianROM:
    with h5py.File(path, "r") as hf:
        r = int(hf["state_dimension"][0])
        means = np.stack([hf[f"means_{i}"][:] for i in range(r)])
        covs = np.stack([hf[f"covs_{i}"][:] for i in range(r)])
        grp = hf["model"]
        rom = GalerkinROM(
            structure=grp.attrs["structure"],
            state_dimension=int(grp.attrs["state_dimension"]),
            input_dimension=int(grp.attrs["input_dimension"]),
            ivp_method=grp.attrs["ivp_method"],
            substeps=int(grp.attrs["substeps"]),
        )
        reg = float(grp.attrs["regularizer"]) if "regularizer" in grp.attrs else None
    return BayesianROM(rom, OperatorPosterior.from_moments(means, covs), reg)


# ---- pipeline exports -----------------------------------------------------------
def export_result(result, prefix: str, overwrite: bool = True):
    """Write pipeline artifacts under ``prefix`` (dispatch on result type)."""
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    name = type(result).__name__
    if name == "SEIRDResult":
        _export_seird(result, prefix, overwrite)
    elif name == "EulerResult":
        _export_euler(result, prefix, overwrite)
    elif name == "HeatMultiResult":
        _export_heat_multi(result, prefix, overwrite)
    else:
        raise TypeError(f"unknown result type {name}")


def _export_seird(r, prefix, overwrite):
    path = f"{prefix}_data.h5"
    _check_overwrite(path, overwrite)
    with h5py.File(path, "w") as hf:
        hf.create_dataset("prediction_time_domain", data=r.time_domain)
        hf.create_dataset("true_states", data=r.true_states)
        hf.create_dataset("sampling_time_domain", data=np.stack(r.sample_times))
        hf.create_dataset("snapshots", data=r.snapshots)
        hf.create_dataset("training_time_domain", data=r.t_estimation)
        hf.create_dataset("draws", data=r.draws)
        hf.create_dataset("draws_valid", data=r.valid)
        if r.newic_draws is not None:
            hf.create_dataset("newic_draws", data=r.newic_draws)
            hf.create_dataset("newic_valid", data=r.newic_valid)
        _write_gp_moments(hf, r.gps, r.t_estimation)
    save_bayesian_ode(r.bayesian_model, f"{prefix}_posterior.h5", overwrite)


def _export_euler(r, prefix, overwrite):
    # Reduced-space data (reference *_data-reduced.h5).
    path = f"{prefix}_data-reduced.h5"
    _check_overwrite(path, overwrite)
    truth_compressed = np.asarray(r.basis.compress(r.true_states))
    with h5py.File(path, "w") as hf:
        hf.create_dataset("sampling_time_domain", data=r.time_domain_sampled)
        hf.create_dataset("training_time_domain", data=r.t_estimation)
        hf.create_dataset("prediction_time_domain", data=r.time_domain)
        hf.create_dataset("snapshots_compressed", data=r.snapshots_compressed)
        hf.create_dataset("true_states_compressed", data=truth_compressed)
        hf.create_dataset("draws_compressed", data=r.draws_compressed)
        hf.create_dataset("draws_valid", data=r.valid)
        _write_gp_moments(hf, r.gps, r.t_estimation)

    # Full-space data (reference *_data-full.h5, incl. the projected truth
    # used by the closeup figure, ``PDEs/plots_paper.py:889-963``).
    path = f"{prefix}_data-full.h5"
    _check_overwrite(path, overwrite)
    with h5py.File(path, "w") as hf:
        hf.create_dataset("sampling_time_domain", data=r.time_domain_sampled)
        hf.create_dataset("training_time_domain", data=r.t_estimation)
        hf.create_dataset("prediction_time_domain", data=r.time_domain)
        hf.create_dataset("snapshots", data=r.snapshots_sampled)
        hf.create_dataset("true_states", data=r.true_states)
        hf.create_dataset(
            "true_states_projected",
            data=np.asarray(r.basis.decompress(truth_compressed)),
        )
        hf.create_dataset(
            "spatial_domain", data=np.asarray(r.model.spatial_domain)
        )
        hf.attrs["num_variables"] = r.model.num_variables
        if r.draws is not None:
            hf.create_dataset("draws", data=r.draws)
    if r.svdvals is not None:
        np.save(f"{prefix}-svdvals.npy", r.svdvals)
    if r.ddtdata is not None:
        path = f"{prefix}-ddtdata.h5"
        _check_overwrite(path, overwrite)
        with h5py.File(path, "w") as hf:
            for k, v in r.ddtdata.items():
                hf.create_dataset(k, data=v)
    save_bayesian_rom(r.bayesian_model, f"{prefix}_posterior.h5", overwrite)


def _export_heat_multi(r, prefix, overwrite, numspatialpoints: int = 8):
    path = f"{prefix}_data.h5"
    _check_overwrite(path, overwrite)

    # Full-state draws are kept at ``numspatialpoints`` spatial rows only
    # (the reference's multi StatePlotter spatially subsamples the same
    # way, ``PDEsMulti/step4_plot.py:294-333``).
    def _decompress_rows(draws, rows):
        return np.stack(
            [np.asarray(r.basis.decompress(d))[rows] for d in draws]
        ) if len(draws) else np.zeros((0, len(rows), len(r.time_domain)))

    n_full = r.true_states[0].shape[0]
    rows = np.linspace(0, n_full - 1, numspatialpoints).astype(int)

    with h5py.File(path, "w") as hf:
        hf.create_dataset("sampling_time_domain", data=r.time_domain_sampled)
        hf.create_dataset("training_time_domain", data=r.t_estimation)
        hf.create_dataset("prediction_time_domain", data=r.time_domain)
        if r.spatial_domain is not None:
            hf.create_dataset("spatial_domain", data=np.asarray(r.spatial_domain))
        hf.create_dataset("spatial_rows", data=rows)
        if r.input_parameters is not None:
            hf.create_dataset(
                "input_parameters", data=np.asarray(r.input_parameters)
            )
        if r.test_parameters is not None:
            hf.create_dataset(
                "test_parameters", data=np.asarray(r.test_parameters)
            )
        for ell in range(len(r.snapshots)):
            grp = hf.create_group(f"trajectory_{ell}")
            grp.create_dataset("snapshots", data=r.snapshots[ell])
            grp.create_dataset("true_states", data=r.true_states[ell])
            grp.create_dataset(
                "snapshots_compressed", data=r.snapshots_compressed[ell]
            )
            grp.create_dataset(
                "true_states_compressed",
                data=np.asarray(r.basis.compress(r.true_states[ell])),
            )
            grp.create_dataset("draws_compressed", data=r.draws_compressed[ell])
            grp.create_dataset("draws_valid", data=r.valid[ell])
            grp.create_dataset(
                "draws_full",
                data=_decompress_rows(
                    r.draws_compressed[ell][np.asarray(r.valid[ell], bool)],
                    rows,
                ),
            )
            _write_gp_moments(grp, r.gps[ell], r.t_estimation)
        if r.newparam_draws is not None:
            grp = hf.create_group("new_trajectory")
            grp.create_dataset("draws_compressed", data=r.newparam_draws)
            grp.create_dataset("draws_valid", data=r.newparam_valid)
            grp.create_dataset("true_states", data=r.newparam_true)
            grp.create_dataset(
                "true_states_compressed",
                data=np.asarray(r.basis.compress(r.newparam_true)),
            )
            grp.create_dataset(
                "draws_full",
                data=_decompress_rows(
                    r.newparam_draws[np.asarray(r.newparam_valid, bool)], rows
                ),
            )
    save_bayesian_rom(r.bayesian_model, f"{prefix}_posterior.h5", overwrite)


def _write_gp_moments(hf, gps, t_est):
    """GP predictive means/stds at the estimation times (plot inputs)."""
    flat = gps if not isinstance(gps[0], (list, tuple)) else [
        g for sub in gps for g in sub
    ]
    means, stds = [], []
    for gp in flat:
        m, s = gp.predict(t_est)
        means.append(np.asarray(m))
        stds.append(np.asarray(s))
    hf.create_dataset("gp_means", data=np.stack(means))
    hf.create_dataset("gp_stds", data=np.stack(stds))
