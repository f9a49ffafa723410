"""Artifact-driven paper-figure regeneration (reference plots_paper)."""

import numpy as np
import h5py
import matplotlib

matplotlib.use("Agg")

from gp_bayesopinf_tpu.viz import paper


def _write_reduced(path, rng, r=3, m=15, mp=20, k=40, ndraws=8):
    with h5py.File(path, "w") as hf:
        hf.create_dataset("sampling_time_domain", data=np.linspace(0, 1, m))
        hf.create_dataset("training_time_domain", data=np.linspace(0, 1, mp))
        hf.create_dataset("prediction_time_domain", data=np.linspace(0, 2, k))
        hf.create_dataset("snapshots_compressed", data=rng.standard_normal((r, m)))
        hf.create_dataset("draws_compressed", data=rng.standard_normal((ndraws, r, k)))
        hf.create_dataset("draws_valid", data=np.ones(ndraws, dtype=bool))
        hf.create_dataset("gp_means", data=rng.standard_normal((r, mp)))
        hf.create_dataset("gp_stds", data=np.abs(rng.standard_normal((r, mp))))


def test_euler_reduced_and_comparison_figures(tmp_path, rng):
    for name in ("runA", "runB"):
        _write_reduced(str(tmp_path / f"{name}_data-reduced.h5"), rng)
    figs = paper.euler_reduced_figure(str(tmp_path / "runA"))
    assert set(figs) == {"euler_train", "euler_posterior"}
    paths = paper.comparison_reduced_figure(
        [str(tmp_path / "runA"), str(tmp_path / "runB")],
        ["m'=50", "m'=400"],
        savedir=str(tmp_path / "figs"),
    )
    import os

    assert all(os.path.isfile(p) for p in paths.values())


def test_svdval_decay_figure(tmp_path, rng):
    np.save(str(tmp_path / "run-svdvals.npy"), np.sort(rng.uniform(0.01, 10, 30))[::-1])
    figs = paper.svdval_decay_figure(str(tmp_path / "run"))
    assert "svdvals" in figs


def test_ddt_figure(tmp_path, rng):
    with h5py.File(str(tmp_path / "run-ddtdata.h5"), "w") as hf:
        hf.create_dataset("time_domain_FD", data=np.linspace(0, 1, 10))
        hf.create_dataset("ddts_finitedifferences", data=rng.standard_normal((3, 10)))
        hf.create_dataset("time_domain_GP", data=np.linspace(0, 1, 20))
        hf.create_dataset("ddts_GPmean", data=rng.standard_normal((3, 20)))
        hf.create_dataset("ddts_GPstd", data=np.abs(rng.standard_normal((3, 20))))
        hf.create_dataset("time_domain_truth", data=np.linspace(0, 1, 50))
        hf.create_dataset("ddts_truth", data=rng.standard_normal((3, 50)))
    figs = paper.euler_ddt_figure(str(tmp_path / "run"))
    assert "euler_ddt" in figs
