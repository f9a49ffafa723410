"""Artifact-driven figure regeneration (reference ``*/plots_paper.py``).

Each function reloads the HDF5 artifacts exported by the pipelines
(``io.hdf5.export_result``) and draws a composite figure, so the paper's
figures are reproducible from artifacts alone — the reference's L5 layer
and its schema-regression check (SURVEY.md section 4, golden artifacts).
"""

import os
from typing import Optional, Sequence

import numpy as np
import h5py
import matplotlib.pyplot as plt

from .baseplots import COLORS, BasePlotter
from .plotters import ODEPlotter, ReducedPlotter

NUMDRAWS_FIGURES = 500  # the reference uses 500 of the exported 600 draws


def _load(path):
    if not os.path.isfile(path):
        raise FileNotFoundError(path)
    return h5py.File(path, "r")


def seird_figure(prefix: str, savedir: Optional[str] = None):
    """GP fits + posterior bands for a SEIRD run (``<prefix>_data.h5``)."""
    with _load(f"{prefix}_data.h5") as hf:
        p = ODEPlotter(
            hf["sampling_time_domain"][:],
            hf["training_time_domain"][:],
            hf["prediction_time_domain"][:],
            hf["snapshots"][:],
            hf["true_states"][:],
            hf["gp_means"][:],
            hf["gp_stds"][:],
            hf["draws"][:][:NUMDRAWS_FIGURES],
        )
    figs = {
        "seird_train": p.plot_gp_training_fit(),
        "seird_posterior": p.plot_posterior(),
        "seird_draws": p.plot_posterior(individual=True),
    }
    return _save_or_return(figs, savedir)


def euler_reduced_figure(prefix: str, savedir: Optional[str] = None):
    """Reduced-space GP fits and posterior for an Euler run
    (``<prefix>_data-reduced.h5``)."""
    with _load(f"{prefix}_data-reduced.h5") as hf:
        valid = hf["draws_valid"][:].astype(bool)
        draws = hf["draws_compressed"][:][valid][:NUMDRAWS_FIGURES]
        p = ReducedPlotter(
            hf["sampling_time_domain"][:],
            hf["training_time_domain"][:],
            hf["prediction_time_domain"][:],
            hf["snapshots_compressed"][:],
            None,  # compressed truth is not part of the reduced artifact
            hf["gp_means"][:],
            hf["gp_stds"][:],
            draws,
        )
    figs = {
        "euler_train": p.plot_gp_training_fit(width=3),
        "euler_posterior": p.plot_posterior(),
    }
    return _save_or_return(figs, savedir)


def euler_ddt_figure(prefix: str, savedir: Optional[str] = None, maxmodes=4):
    """Derivative-estimate comparison: GP mean/band vs finite differences
    vs intrusive truth (reference ``PDEs/plots_paper.py:440-542``,
    consuming ``<prefix>-ddtdata.h5``)."""
    with _load(f"{prefix}-ddtdata.h5") as hf:
        t_fd = hf["time_domain_FD"][:]
        fd = hf["ddts_finitedifferences"][:]
        t_gp = hf["time_domain_GP"][:]
        gp_mean = hf["ddts_GPmean"][:]
        gp_std = hf["ddts_GPstd"][:]
        t_truth = hf["time_domain_truth"][:]
        truth = hf["ddts_truth"][:]

    r = min(gp_mean.shape[0], maxmodes)
    fig, axes = plt.subplots(r, 1, figsize=(8, 2 * r), sharex=True)
    for i, ax in enumerate(np.atleast_1d(axes)):
        ax.plot(t_truth, truth[i], color=COLORS["truth"], lw=1.2, label="truth")
        ax.plot(t_fd, fd[i], "o", color=COLORS["data"], ms=2.5,
                label="finite differences")
        ax.plot(t_gp, gp_mean[i], color=COLORS["gp"], lw=1.0, label="GP mean")
        ax.fill_between(
            t_gp, gp_mean[i] - 3 * gp_std[i], gp_mean[i] + 3 * gp_std[i],
            color=COLORS["gp"], alpha=0.25, lw=0,
        )
        ax.set_ylabel(rf"$d\hat{{q}}_{{{i + 1}}}/dt$")
    np.atleast_1d(axes)[0].legend(loc="best", fontsize="small")
    np.atleast_1d(axes)[-1].set_xlabel("$t$")
    return _save_or_return({"euler_ddt": fig}, savedir)


def svdval_decay_figure(prefix: str, savedir: Optional[str] = None):
    """Singular-value decay from the ``<prefix>-svdvals.npy`` side export."""
    svdvals = np.load(f"{prefix}-svdvals.npy")
    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.semilogy(
        np.arange(1, svdvals.size + 1), svdvals / svdvals[0],
        "o-", ms=3, color=COLORS["samplemean"],
    )
    ax.set_xlim(right=min(20, svdvals.size))
    ax.set_ylim(bottom=1e-4)
    ax.set_xlabel("index")
    ax.set_ylabel("normalized singular value")
    return _save_or_return({"svdvals": fig}, savedir)


def heat_multi_figure(prefix: str, savedir: Optional[str] = None):
    """Per-trajectory posterior bands for the multi-trajectory run
    (``<prefix>_data.h5``)."""
    figs = {}
    with _load(f"{prefix}_data.h5") as hf:
        t_s = hf["sampling_time_domain"][:]
        t_tr = hf["training_time_domain"][:]
        t_pr = hf["prediction_time_domain"][:]
        ells = sorted(
            int(k.split("_")[1]) for k in hf.keys() if k.startswith("trajectory_")
        )
        for ell in ells:
            grp = hf[f"trajectory_{ell}"]
            draws = grp["draws_compressed"][:]
            valid = grp["draws_valid"][:].astype(bool)
            draws = draws[valid][:NUMDRAWS_FIGURES]
            comp = grp["snapshots_compressed"][:]
            plotter = BasePlotter(t_s, t_tr, t_pr)
            r = comp.shape[0]
            fig, axes = plt.subplots(r, 1, figsize=(8, 1.8 * r), sharex=True)
            for i, ax in enumerate(np.atleast_1d(axes)):
                plotter.plot_data(ax, comp[i])
                if draws.size:
                    plotter.plot_percentiles(ax, draws[:, i, :])
                    plotter.plot_samplemean(ax, draws[:, i, :].mean(axis=0))
                ax.set_ylabel(rf"$\hat{{q}}_{{{i + 1}}}$")
            np.atleast_1d(axes)[-1].set_xlabel("$t$")
            figs[f"heat_traj{ell}"] = fig
    return _save_or_return(figs, savedir)


def comparison_reduced_figure(
    prefixes: Sequence[str],
    labels: Sequence[str],
    mode: int = 0,
    savedir: Optional[str] = None,
):
    """Side-by-side posterior bands for one reduced mode across several
    runs (the reference's noise/sparsity comparison figures,
    ``PDEs/plots_paper.py:966-1053``; e.g. m' in {50, 400, 3200} or
    noise in {1%, 3%, 5%})."""
    n = len(prefixes)
    fig, axes = plt.subplots(n, 1, figsize=(8, 2.2 * n), sharex=True)
    for ax, prefix, label in zip(np.atleast_1d(axes), prefixes, labels):
        with _load(f"{prefix}_data-reduced.h5") as hf:
            t_pr = hf["prediction_time_domain"][:]
            t_tr = hf["training_time_domain"][:]
            valid = hf["draws_valid"][:].astype(bool)
            draws = hf["draws_compressed"][:][valid][:NUMDRAWS_FIGURES]
            snaps = hf["snapshots_compressed"][:]
            t_s = hf["sampling_time_domain"][:]
        p = BasePlotter(t_s, t_tr, t_pr)
        p.plot_data(ax, snaps[mode])
        if draws.size:
            p.plot_percentiles(ax, draws[:, mode, :])
            p.plot_samplemean(ax, draws[:, mode, :].mean(axis=0))
        ax.set_ylabel(label)
    np.atleast_1d(axes)[-1].set_xlabel("$t$")
    return _save_or_return({f"comparison_mode{mode}": fig}, savedir)


def comparison_full_figure(
    prefixes: Sequence[str],
    labels: Sequence[str],
    spatial_index: int,
    variable: int = 0,
    savedir: Optional[str] = None,
):
    """Full-state posterior comparison at one spatial point across runs
    (``PDEs/plots_paper.py:1056-1152``)."""
    n = len(prefixes)
    fig, axes = plt.subplots(n, 1, figsize=(8, 2.2 * n), sharex=True)
    for ax, prefix, label in zip(np.atleast_1d(axes), prefixes, labels):
        with _load(f"{prefix}_data-full.h5") as hf:
            t_pr = hf["prediction_time_domain"][:]
            t_s = hf["sampling_time_domain"][:]
            truth = hf["true_states"][:]
            draws = hf["draws"][:][:NUMDRAWS_FIGURES]
        nx = truth.shape[0] // 3 if truth.shape[0] % 3 == 0 else truth.shape[0]
        row = variable * nx + spatial_index
        p = BasePlotter(t_s, t_s, t_pr)
        p.plot_truth(ax, truth[row])
        if draws.size:
            p.plot_percentiles(ax, draws[:, row, :])
            p.plot_samplemean(ax, draws[:, row, :].mean(axis=0))
        ax.set_ylabel(label)
    np.atleast_1d(axes)[-1].set_xlabel("$t$")
    return _save_or_return({f"comparison_x{spatial_index}": fig}, savedir)


def _save_or_return(figs: dict, savedir: Optional[str]):
    if savedir is None:
        return figs
    os.makedirs(savedir, exist_ok=True)
    paths = {}
    for name, fig in figs.items():
        path = os.path.join(savedir, f"{name}.pdf")
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        paths[name] = path
    return paths
