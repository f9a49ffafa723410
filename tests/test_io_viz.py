"""HDF5 persistence and plotters."""

import numpy as np
import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")

from gp_bayesopinf_tpu.bayes import BayesianODE, BayesianROM, OperatorPosterior
from gp_bayesopinf_tpu.rom import GalerkinROM
from gp_bayesopinf_tpu.models import SEIRD2
from gp_bayesopinf_tpu.io import (
    save_bayesian_ode,
    load_bayesian_ode,
    save_bayesian_rom,
    load_bayesian_rom,
)
from gp_bayesopinf_tpu.viz import ODEPlotter, ReducedPlotter, StatePlotter


def test_bayesian_ode_roundtrip(tmp_path, rng):
    model = SEIRD2()
    mean = np.abs(rng.standard_normal(4)) * 0.1
    X = rng.standard_normal((4, 4))
    cov = X @ X.T + np.eye(4)
    bm = BayesianODE(model, OperatorPosterior.from_moments(mean[None], cov[None]))
    path = str(tmp_path / "ode.h5")
    save_bayesian_ode(bm, path)
    bm2 = load_bayesian_ode(path, model)
    np.testing.assert_allclose(np.asarray(bm2.mean), mean, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(bm2.cov), cov, rtol=1e-9)


def test_bayesian_rom_roundtrip(tmp_path, rng):
    rom = GalerkinROM("cAH", state_dimension=3, substeps=4)
    d = rom.operator_dimension
    means = rng.standard_normal((3, d))
    covs = np.stack([np.eye(d) * (i + 1) for i in range(3)])
    bm = BayesianROM(rom, OperatorPosterior.from_moments(means, covs), 0.5)
    path = str(tmp_path / "rom.h5")
    save_bayesian_rom(bm, path)
    bm2 = load_bayesian_rom(path)
    assert bm2.model.structure == "cAH"
    assert bm2.model.state_dimension == 3
    assert bm2.regularizer == 0.5
    np.testing.assert_allclose(np.asarray(bm2.means), means, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(bm2.covs), covs, rtol=1e-9)
    # Loaded posterior is usable: draw + integrate.
    draws, valid = bm2.solution_posterior(
        jax.random.PRNGKey(0), jnp.zeros(3), jnp.linspace(0, 0.1, 5), ndraws=3
    )
    assert draws.shape == (3, 3, 5)


def test_overwrite_protection(tmp_path, rng):
    import pytest

    model = SEIRD2()
    bm = BayesianODE(
        model, OperatorPosterior.from_moments(np.ones((1, 4)), np.eye(4)[None])
    )
    path = str(tmp_path / "x.h5")
    save_bayesian_ode(bm, path)
    with pytest.raises(FileExistsError):
        save_bayesian_ode(bm, path, overwrite=False)


def _plotter_args(rng, n=3, m=20, mp=30, k=50):
    return dict(
        sampling_time_domain=np.linspace(0, 1, m),
        training_time_domain=np.linspace(0, 1, mp),
        prediction_time_domain=np.linspace(0, 2, k),
        n=n,
        m=m,
        mp=mp,
        k=k,
    )


def test_ode_plotter_roundtrip(tmp_path, rng):
    a = _plotter_args(rng, n=5)
    p = ODEPlotter(
        a["sampling_time_domain"],
        a["training_time_domain"],
        a["prediction_time_domain"],
        snapshots=rng.standard_normal((5, a["m"])),
        true_states=rng.standard_normal((5, a["k"])),
        gp_means=rng.standard_normal((5, a["mp"])),
        gp_stds=np.abs(rng.standard_normal((5, a["mp"]))),
        draws=rng.standard_normal((7, 5, a["k"])),
    )
    fig1 = p.plot_gp_training_fit()
    fig2 = p.plot_posterior(individual=True)
    assert len(fig1.axes) == 5 and len(fig2.axes) == 5
    path = str(tmp_path / "ode_plot.h5")
    p.save(path)
    p2 = ODEPlotter.load(path)
    np.testing.assert_allclose(p2.draws, p.draws)
    assert p2.labels == p.labels
    assert p2.end_train_index == p.end_train_index


def test_reduced_plotter(tmp_path, rng):
    a = _plotter_args(rng)
    p = ReducedPlotter(
        a["sampling_time_domain"],
        a["training_time_domain"],
        a["prediction_time_domain"],
        snapshots_compressed=rng.standard_normal((3, a["m"])),
        true_states_compressed=rng.standard_normal((3, a["k"])),
        gp_means=rng.standard_normal((3, a["mp"])),
        gp_stds=np.abs(rng.standard_normal((3, a["mp"]))),
        draws_compressed=rng.standard_normal((6, 3, a["k"])),
    )
    fig = p.plot_posterior()
    assert len(fig.axes) == 3
    path = str(tmp_path / "red.h5")
    p.save(path)
    p2 = ReducedPlotter.load(path)
    np.testing.assert_allclose(p2.gp_means, p.gp_means)


def test_state_plotter(tmp_path, rng):
    a = _plotter_args(rng)
    nx, nvars = 12, 2
    p = StatePlotter(
        a["sampling_time_domain"],
        a["training_time_domain"],
        a["prediction_time_domain"],
        spatial_domain=np.linspace(0, 1, nx),
        num_variables=nvars,
        snapshots=rng.standard_normal((nvars * nx, a["m"])),
        true_states=rng.standard_normal((nvars * nx, a["k"])),
        true_states_projected=rng.standard_normal((nvars * nx, a["k"])),
        draws=rng.standard_normal((5, nvars * nx, a["k"])),
        numspatialpoints=3,
    )
    figs = p.plot_posterior()
    assert len(figs) == nvars
    path = str(tmp_path / "state.h5")
    p.save(path)
    p2 = StatePlotter.load(path)
    assert p2.num_variables == nvars
    np.testing.assert_allclose(p2.draws, p.draws)
