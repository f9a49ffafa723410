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


def _write_reduced_with_truth(path, rng, r=3, m=15, mp=20, k=40, ndraws=8):
    _write_reduced(path, rng, r=r, m=m, mp=mp, k=k, ndraws=ndraws)
    with h5py.File(path, "a") as hf:
        hf.create_dataset(
            "true_states_compressed", data=rng.standard_normal((r, k))
        )


def _write_full(path, rng, nx=12, m=15, mp=20, k=40, ndraws=8):
    with h5py.File(path, "w") as hf:
        hf.create_dataset("sampling_time_domain", data=np.linspace(0, 1, m))
        hf.create_dataset("training_time_domain", data=np.linspace(0, 1, mp))
        hf.create_dataset("prediction_time_domain", data=np.linspace(0, 2, k))
        hf.create_dataset("spatial_domain", data=np.linspace(0, 2, nx))
        hf.create_dataset("snapshots", data=rng.standard_normal((3 * nx, m)))
        hf.create_dataset("true_states", data=rng.standard_normal((3 * nx, k)))
        hf.create_dataset(
            "true_states_projected", data=rng.standard_normal((3 * nx, k))
        )
        hf.create_dataset(
            "draws", data=rng.standard_normal((ndraws, 3 * nx, k))
        )
        hf.attrs["num_variables"] = 3


def _write_ddt(path, rng, r=4, m=15, mp=20):
    with h5py.File(path, "w") as hf:
        hf.create_dataset("time_domain_FD", data=np.linspace(0, 1, m))
        hf.create_dataset("ddts_finitedifferences", data=rng.standard_normal((r, m)))
        hf.create_dataset("time_domain_GP", data=np.linspace(0, 1, mp))
        hf.create_dataset("ddts_GPmean", data=rng.standard_normal((r, mp)))
        hf.create_dataset("ddts_GPstd", data=np.abs(rng.standard_normal((r, mp))))
        hf.create_dataset("time_domain_truth", data=np.linspace(0, 1, 50))
        hf.create_dataset("ddts_truth", data=rng.standard_normal((r, 50)))


def test_euler_composite_figures(tmp_path, rng):
    prefix = str(tmp_path / "exA")
    _write_reduced_with_truth(f"{prefix}_data-reduced.h5", rng, r=4)
    _write_full(f"{prefix}_data-full.h5", rng)
    _write_ddt(f"{prefix}-ddtdata.h5", rng)
    np.save(f"{prefix}-svdvals.npy", np.sort(rng.uniform(0.01, 10, 12))[::-1])

    figs = {}
    figs.update(paper.euler_fomdata_figure(prefix, init_params=(22, 20, 24, 95, 105, 100)))
    figs.update(paper.euler_gpfit_figure(prefix))
    figs.update(paper.euler_dimension_figure(prefix, modes=(1, 2, 3)))
    figs.update(paper.euler_gpfit_and_derivatives_figure(prefix, nmodes=2))
    figs.update(paper.euler_draws_and_iqr_figure(prefix))
    figs.update(paper.euler_romsolution_figure(prefix))
    figs.update(paper.euler_romsolution_figure(prefix, spread=False))
    figs.update(paper.euler_fomsolution_figure(prefix))
    figs.update(paper.euler_fomsolution_closeup_figure(prefix))
    assert {
        "euler_fomdata", "euler_gpfit", "euler_dims", "euler_gpfit_ddts",
        "euler_draws_iqr", "euler_rom_spread", "euler_rom_draws",
        "euler_fom_spread", "euler_closeup",
    } <= set(figs)
    import matplotlib.pyplot as plt

    plt.close("all")


def _write_seird(path, rng, m=10, mp=20, k=40, ndraws=8):
    with h5py.File(path, "w") as hf:
        hf.create_dataset(
            "sampling_time_domain",
            data=np.stack([np.linspace(0, 1, m)] * 5),
        )
        hf.create_dataset("training_time_domain", data=np.linspace(0, 1, mp))
        hf.create_dataset("prediction_time_domain", data=np.linspace(0, 2, k))
        hf.create_dataset("snapshots", data=rng.standard_normal((5, m)))
        hf.create_dataset("true_states", data=rng.standard_normal((5, k)))
        hf.create_dataset("gp_means", data=rng.standard_normal((5, mp)))
        hf.create_dataset("gp_stds", data=np.abs(rng.standard_normal((5, mp))))
        hf.create_dataset("draws", data=rng.standard_normal((ndraws, 5, k)))


def test_seird_comparison_and_icdiff_figures(tmp_path, rng):
    for name in ("s1", "s2", "s3"):
        _write_seird(str(tmp_path / f"{name}_data.h5"), rng)
    figs = paper.seird_solution_comparison_figure(
        [str(tmp_path / n) for n in ("s1", "s2", "s3")],
        ["60 days", "90 days", "120 days"],
    )
    assert "seird_compare" in figs
    figs = paper.seird_icdiff_figure(str(tmp_path / "s1"), str(tmp_path / "s2"))
    assert "seird_icdiff" in figs
    import matplotlib.pyplot as plt

    plt.close("all")


def _write_multi(path, rng, L=3, r=3, m=12, mp=16, k=30, nx=20, ndraws=8):
    with h5py.File(path, "w") as hf:
        hf.create_dataset("sampling_time_domain", data=np.linspace(0, 1, m))
        hf.create_dataset("training_time_domain", data=np.linspace(0, 1, mp))
        hf.create_dataset("prediction_time_domain", data=np.linspace(0, 2, k))
        hf.create_dataset("spatial_domain", data=np.linspace(0, 1, nx))
        hf.create_dataset("spatial_rows", data=np.linspace(0, nx - 1, 6).astype(int))
        hf.create_dataset("input_parameters", data=rng.uniform(-2, 2, (L, 2)))
        hf.create_dataset("test_parameters", data=np.array([1.5, 0.5]))
        for ell in range(L):
            grp = hf.create_group(f"trajectory_{ell}")
            grp.create_dataset("snapshots", data=rng.standard_normal((nx, m)))
            grp.create_dataset("true_states", data=rng.standard_normal((nx, k)))
            grp.create_dataset(
                "snapshots_compressed", data=rng.standard_normal((r, m))
            )
            grp.create_dataset(
                "true_states_compressed", data=rng.standard_normal((r, k))
            )
            grp.create_dataset(
                "draws_compressed", data=rng.standard_normal((ndraws, r, k))
            )
            grp.create_dataset("draws_valid", data=np.ones(ndraws, dtype=bool))
            grp.create_dataset(
                "draws_full", data=rng.standard_normal((ndraws, 6, k))
            )
            grp.create_dataset("gp_means", data=rng.standard_normal((r, mp)))
            grp.create_dataset(
                "gp_stds", data=np.abs(rng.standard_normal((r, mp)))
            )
        new = hf.create_group("new_trajectory")
        new.create_dataset(
            "draws_compressed", data=rng.standard_normal((ndraws, r, k))
        )
        new.create_dataset("draws_valid", data=np.ones(ndraws, dtype=bool))
        new.create_dataset("true_states", data=rng.standard_normal((nx, k)))
        new.create_dataset(
            "true_states_compressed", data=rng.standard_normal((r, k))
        )
        new.create_dataset(
            "draws_full", data=rng.standard_normal((ndraws, 6, k))
        )


def test_heat_multi_composite_figures(tmp_path, rng):
    prefix = str(tmp_path / "ex3")
    _write_multi(f"{prefix}_data.h5", rng)
    figs = {}
    figs.update(paper.heat_samples_figure(prefix))
    figs.update(paper.heat_gpfit_figure(prefix, trajectories=(0, 2)))
    figs.update(paper.heat_romsolution_figure(prefix, trajectories=(0, 1)))
    figs.update(paper.heat_fomsolution_figure(prefix, trajectories=(0, 2)))
    figs.update(paper.heat_newtrajectory_figure(prefix))
    assert {
        "heat_samples", "heat_gpfit", "heat_rom", "heat_fom",
        "heat_newtrajectory",
    } <= set(figs)
    import matplotlib.pyplot as plt

    plt.close("all")


def test_multi_trajectory_plotter_roundtrip(tmp_path, rng):
    from gp_bayesopinf_tpu.viz import MultiTrajectoryPlotter

    L, r, m, mp, k, nd = 2, 3, 10, 12, 20, 5
    p = MultiTrajectoryPlotter(
        np.linspace(0, 1, m),
        np.linspace(0, 1, mp),
        np.linspace(0, 2, k),
        rng.uniform(-2, 2, (L, 2)),
        rng.standard_normal((L, r, m)),
        rng.standard_normal((L, r, k)),
        rng.standard_normal((L, r, mp)),
        np.abs(rng.standard_normal((L, r, mp))),
        rng.standard_normal((L, nd, r, k)),
        test_parameters=np.array([1.5, 0.5]),
        newparam_draws=rng.standard_normal((nd, r, k)),
        newparam_true_compressed=rng.standard_normal((r, k)),
    )
    path = str(tmp_path / "multi.h5")
    p.save(path)
    q = MultiTrajectoryPlotter.load(path)
    np.testing.assert_allclose(q.draws_compressed, p.draws_compressed)
    np.testing.assert_allclose(q.test_parameters, p.test_parameters)
    assert q.num_trajectories == L and q.num_modes == r

    fig1 = q.plot_gp_training_fit()
    fig2 = q.plot_posterior(spread=True)
    fig3 = q.plot_posterior_newparams()
    import matplotlib.pyplot as plt

    for f in (fig1, fig2, fig3):
        assert f is not None
    plt.close("all")


def test_model_level_plots(rng):
    """Model visualization surface (reference pde_models.py:414-568,
    879-1079; ode_models.py:148-239)."""
    import matplotlib.pyplot as plt
    from gp_bayesopinf_tpu.models import Euler, HeatBimodal, SEIRD2

    # Euler plots on a tiny synthetic lifted trajectory.
    x = np.linspace(0, 2, 17)[:-1]
    model = Euler(x)
    t = np.linspace(0, 0.01, 9)
    vpz = np.vstack([
        100 + rng.standard_normal((16, 9)),
        1e5 + rng.standard_normal((16, 9)),
        0.05 + 0.001 * rng.standard_normal((16, 9)),
    ])
    fig, _ = model.plot_space(vpz[:, 0]); plt.close(fig)
    fig, _ = model.plot_time(t, vpz[3]); plt.close(fig)
    fig, _ = model.plot_traces(t, vpz, nlocs=4); plt.close(fig)
    fig, _ = model.plot_spacetime(t, vpz); plt.close(fig)
    ani = model.animate(vpz, skip=3)
    assert ani is not None

    # Heat plots.
    xh = np.linspace(0, 1, 14)
    heat = HeatBimodal(xh, 0.0, 1.0)
    states = rng.standard_normal((14, 9))
    ax = heat.plot_space(states[:, 0]); plt.close(ax.get_figure())
    ax = heat.plot_time(t, states[3]); plt.close(ax.get_figure())
    fig, _ = heat.plot_spacetime(t, states, nlines=3); plt.close(fig)
    ani = heat.animate(states)
    assert ani is not None
    # Interior-only input is padded with the BCs.
    ax = heat.plot_space(states[1:-1, 0]); plt.close(ax.get_figure())

    # SEIRD overlay + phase plots.
    traj = rng.standard_normal((5, 9))
    fig, _ = SEIRD2.plot(t, traj); plt.close(fig)
    fig = SEIRD2.plot_phase(t, traj, variables=(0, 2)); plt.close(fig)


def test_seird_strict_ic_validation():
    from gp_bayesopinf_tpu.models import SEIRD2

    model = SEIRD2()
    t = np.linspace(0, 1, 5)
    good = np.array([0.994, 0.005, 0.001, 0.0, 0.0])
    model.solve(good, t, strict=True)  # sums to 1 — fine
    import pytest

    with pytest.raises(ValueError, match="sum to"):
        model.solve(good * 1.5, t, strict=True)
