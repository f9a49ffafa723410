"""Posteriors, ensembles, and the regularization auto-search."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gp_bayesopinf_tpu.solve import weighted_lstsq_fit
from gp_bayesopinf_tpu.bayes import (
    OperatorPosterior,
    BayesianODE,
    BayesianROM,
    auto_regularize,
)
from gp_bayesopinf_tpu.bayes.regsearch import MAXOPTVAL
from gp_bayesopinf_tpu.rom import GalerkinROM
from gp_bayesopinf_tpu.models import SEIRD2


@pytest.fixture
def linear_problem(rng):
    """Weighted regression whose truth is a known stable linear ROM."""
    r = 3
    A_true = np.diag([-0.6, -1.1, -1.7])
    rom = GalerkinROM("cA", state_dimension=r, substeps=4)
    t = np.linspace(0, 4, 120)
    q0 = np.array([1.0, -0.8, 0.5])
    Q = np.stack([np.exp(np.diag(A_true) * tt) * q0 for tt in t], axis=1)
    dQ = A_true @ Q
    D = np.asarray(rom.data_matrix(jnp.asarray(Q)))[None]  # (1, k, d)
    # Generous weights -> sharp posterior (the fixture's data matrix is
    # mildly ill-conditioned; this keeps ensemble draws near the truth).
    sqrtW = np.broadcast_to(30.0 * np.eye(len(t)), (r, 1, len(t), len(t)))
    rhs = dQ[:, None, :]
    fac = weighted_lstsq_fit(
        jnp.asarray(D), jnp.asarray(sqrtW.copy()), jnp.asarray(rhs.copy())
    )
    return rom, fac, Q, t, q0, A_true


def test_posterior_from_lstsq_moments(linear_problem):
    rom, fac, Q, t, q0, A_true = linear_problem
    post = OperatorPosterior.from_lstsq(fac, 1e-6)
    ops = rom.extract_operators(post.means)
    np.testing.assert_allclose(ops["A"], A_true, atol=1e-6)
    # Covariance factors reproduce the analytic covariance.
    covs = np.asarray(post.covariances())
    np.testing.assert_allclose(covs, np.asarray(fac.covariances(1e-6)), atol=1e-12)


def test_bayesian_rom_ensemble(linear_problem):
    rom, fac, Q, t, q0, _ = linear_problem
    bm = BayesianROM(rom, OperatorPosterior.from_lstsq(fac, 1e-2))
    draws, valid = bm.solution_posterior(
        jax.random.PRNGKey(0), jnp.asarray(q0), jnp.asarray(t), ndraws=32
    )
    assert draws.shape == (32, 3, len(t))
    valid = np.asarray(valid)
    assert valid.sum() >= 24  # most draws stable
    mean = np.asarray(draws)[valid].mean(axis=0)
    assert np.linalg.norm(mean - Q) / np.linalg.norm(Q) < 0.1


def test_bayesian_ode_nonnegative_rvs():
    model = SEIRD2()
    mean = np.array([0.5, 0.5, 0.5, 0.5])
    cov = 0.4 * np.eye(4)  # wide enough that raw draws often go negative
    post = OperatorPosterior.from_moments(mean[None], cov[None])
    bm = BayesianODE(model, post)
    draws = np.asarray(bm.rvs(jax.random.PRNGKey(0), 200, nonnegative=True))
    assert draws.shape == (200, 4)
    assert np.all(draws >= 0)
    raw = np.asarray(bm.rvs(jax.random.PRNGKey(0), 200))
    assert np.any(raw < 0)  # the constraint actually did something


def test_auto_regularize_selects_stable(linear_problem):
    rom, fac, Q, t, q0, _ = linear_problem
    res = auto_regularize(
        fac,
        [lambda O, q, tt: rom.predict(O, q, tt)],
        jnp.asarray(q0)[None],
        jnp.asarray(t),
        jnp.asarray(t),
        jnp.asarray(Q)[None],
        jax.random.PRNGKey(1),
        grid=np.logspace(-10, 2, 9),
        ndraws=8,
        verbose=False,
    )
    assert res.regularizer > 0
    # Clean linear problem: small regularizers should win and be accurate.
    assert res.grid_errors.min() < 0.05
    assert np.isfinite(res.grid_errors).all()


@pytest.mark.slow
def test_auto_regularize_mesh_sharded_grid_matches(linear_problem):
    """Sharding the candidate axis over a device mesh reproduces the
    single-device screen (same per-candidate keys; padding by wrapping is
    discarded; errors agree to compilation-reassociation precision)."""
    from gp_bayesopinf_tpu.parallel.mesh import make_mesh

    rom, fac, Q, t, q0, _ = linear_problem
    kw = dict(
        initial_conditions=jnp.asarray(q0)[None],
        t_pred=jnp.asarray(t),
        t_est=jnp.asarray(t),
        snapshots_est=jnp.asarray(Q)[None],
        key=jax.random.PRNGKey(1),
        grid=np.logspace(-10, 2, 9),  # 9 candidates over 8 devices
        ndraws=8,
        verbose=False,
    )
    predict = [lambda O, q, tt: rom.predict(O, q, tt)]
    res_serial = auto_regularize(fac, predict, **kw)
    res_mesh = auto_regularize(
        fac, predict, mesh=make_mesh({"draw": -1}), **kw
    )
    np.testing.assert_allclose(
        res_serial.grid_errors, res_mesh.grid_errors, rtol=1e-6
    )
    assert np.argmin(res_mesh.grid_errors) == np.argmin(res_serial.grid_errors)
    np.testing.assert_allclose(
        res_mesh.regularizer, res_serial.regularizer, rtol=1e-6
    )

    # The kernel (XLA-twin) objective shards the same way.
    rom2 = GalerkinROM("cAH", state_dimension=3, substeps=4)
    D2 = rom2.data_matrix(jnp.asarray(Q))[None]
    m = Q.shape[1]
    sqrtW2 = jnp.asarray(
        np.broadcast_to(30.0 * np.eye(m), (3, 1, m, m)).copy()
    )
    A_true = np.diag([-0.6, -1.1, -1.7])
    fac2 = weighted_lstsq_fit(D2, sqrtW2, jnp.asarray((A_true @ Q))[:, None, :])
    predict2 = [lambda O, q, tt: rom2.predict(O, q, tt)]
    res_k = auto_regularize(
        fac2, predict2, rom=rom2, use_kernel=True, **kw
    )
    res_km = auto_regularize(
        fac2, predict2, rom=rom2, use_kernel=True,
        mesh=make_mesh({"draw": -1}), **kw
    )
    np.testing.assert_allclose(
        res_k.grid_errors, res_km.grid_errors, rtol=1e-6
    )
    assert np.argmin(res_km.grid_errors) == np.argmin(res_k.grid_errors)
    np.testing.assert_allclose(
        res_km.regularizer, res_k.regularizer, rtol=1e-6
    )


def test_auto_regularize_all_unstable_raises(linear_problem):
    rom, fac, Q, t, q0, _ = linear_problem
    # An envelope of zeros makes every draw "unstable".
    with pytest.raises(ValueError, match="unstable"):
        auto_regularize(
            fac,
            [lambda O, q, tt: rom.predict(O, q, tt)],
            jnp.asarray(q0)[None],
            jnp.asarray(t),
            jnp.asarray(t),
            jnp.zeros_like(jnp.asarray(Q))[None],  # zero amplitudes
            jax.random.PRNGKey(1),
            grid=np.logspace(-8, 0, 3),
            ndraws=4,
            verbose=False,
        )


def test_operator_posterior_sampling_stats(rng):
    means = jnp.asarray(rng.standard_normal((2, 3)))
    covs = []
    for _ in range(2):
        X = rng.standard_normal((3, 3))
        covs.append(X @ X.T + np.eye(3))
    post = OperatorPosterior.from_moments(means, np.stack(covs))
    draws = np.asarray(post.sample(jax.random.PRNGKey(2), 20000))
    emp_mean = draws.mean(axis=0)
    np.testing.assert_allclose(emp_mean, means, atol=0.1)
    for i in range(2):
        emp_cov = np.cov(draws[:, i, :].T)
        np.testing.assert_allclose(emp_cov, covs[i], atol=0.25)


@pytest.mark.slow
def test_auto_regularize_kernel_path_matches(linear_problem):
    """The megakernel-backed grid objective ranks candidates like the
    generic objective (same stability gating; draw noise differs)."""
    rom_ca, fac, Q, t, q0, _ = linear_problem
    # Kernel path needs "cAH"; rebuild the regression with cAH features.
    rom = GalerkinROM("cAH", state_dimension=3, substeps=4)
    D = rom.data_matrix(jnp.asarray(Q))[None]
    sqrtW = jnp.asarray(
        np.broadcast_to(30.0 * np.eye(Q.shape[1]), (3, 1, Q.shape[1], Q.shape[1])).copy()
    )
    A_true = np.diag([-0.6, -1.1, -1.7])
    rhs = jnp.asarray((A_true @ Q)[:, None, :])
    fac2 = __import__("gp_bayesopinf_tpu.solve", fromlist=["weighted_lstsq_fit"]).weighted_lstsq_fit(D, sqrtW, rhs)

    kw = dict(
        initial_conditions=jnp.asarray(q0)[None],
        t_pred=jnp.asarray(t),
        t_est=jnp.asarray(t),
        snapshots_est=jnp.asarray(Q)[None],
        grid=np.logspace(-8, 1, 7),
        ndraws=8,
        verbose=False,
    )
    res_gen = auto_regularize(
        fac2, [lambda O, q, tt: rom.predict(O, q, tt)],
        key=jax.random.PRNGKey(5), **kw,
    )
    res_ker = auto_regularize(
        fac2, [lambda O, q, tt: rom.predict(O, q, tt)],
        key=jax.random.PRNGKey(5), rom=rom, use_kernel=True, **kw,
    )
    # Same stability classification on the grid.
    np.testing.assert_array_equal(
        res_gen.grid_errors >= 1e12, res_ker.grid_errors >= 1e12
    )
    # Errors agree to screening precision where stable.
    ok = res_gen.grid_errors < 1e12
    if ok.any():
        np.testing.assert_allclose(
            res_gen.grid_errors[ok], res_ker.grid_errors[ok], rtol=2e-2, atol=1e-4
        )


@pytest.mark.slow
def test_auto_regularize_cahbn_kernel_path_matches(rng):
    """The implicit-SDIRK cAHBN kernel objective matches the generic
    dirk2 objective's stability decisions and errors (heat-multi path)."""
    from gp_bayesopinf_tpu.solve import weighted_lstsq_fit

    r, nu, k = 3, 2, 25
    rom = GalerkinROM(
        "cAHBN", state_dimension=r, input_dimension=nu,
        ivp_method="dirk2", substeps=2,
    )
    t = np.linspace(0, 1.2, k)

    def input_func(tt):
        return jnp.stack(
            [jnp.sin(2 * jnp.pi * tt), 0.5 * jnp.cos(4 * jnp.pi * tt)]
        )

    A_true = np.diag([-0.8, -1.4, -2.2])
    B_true = 0.3 * rng.standard_normal((r, nu))
    U = np.asarray(input_func(jnp.asarray(t)))  # (nu, k)

    # Synthesize snapshots from the true linear-with-input dynamics.
    Q = np.zeros((r, k))
    Q[:, 0] = 0.2 * rng.standard_normal(r)
    for i in range(1, k):
        h = t[i] - t[i - 1]
        Q[:, i] = Q[:, i - 1] + h * (A_true @ Q[:, i - 1] + B_true @ U[:, i - 1])

    D = rom.data_matrix(jnp.asarray(Q), jnp.asarray(U))[None]
    sqrtW = jnp.asarray(np.broadcast_to(25.0 * np.eye(k), (r, 1, k, k)).copy())
    rhs = jnp.asarray((A_true @ Q + B_true @ U)[:, None, :])
    fac = weighted_lstsq_fit(D, sqrtW, rhs)

    input_funcs = [input_func]
    kw = dict(
        initial_conditions=jnp.asarray(Q[:, 0])[None],
        t_pred=jnp.asarray(t),
        t_est=jnp.asarray(t),
        snapshots_est=jnp.asarray(Q)[None],
        grid=np.logspace(-8, 1, 6),
        ndraws=6,
        verbose=False,
    )
    predict_fns = [
        lambda O, q, tt: rom.predict(O, q, tt, input_func=input_func)
    ]
    # screen_dtype=f32 matches the kernels' precision contract (the
    # documented TPU policy); on CPU the generic path would otherwise
    # integrate in f64 and borderline draws could classify differently.
    res_gen = auto_regularize(
        fac, predict_fns, key=jax.random.PRNGKey(7),
        screen_dtype=jnp.float32, **kw,
    )
    res_ker = auto_regularize(
        fac, predict_fns, key=jax.random.PRNGKey(7),
        rom=rom, use_kernel=True, input_funcs=input_funcs, **kw,
    )
    np.testing.assert_array_equal(
        res_gen.grid_errors >= 1e12, res_ker.grid_errors >= 1e12
    )
    ok = res_gen.grid_errors < 1e12
    if ok.any():
        np.testing.assert_allclose(
            res_gen.grid_errors[ok], res_ker.grid_errors[ok],
            rtol=2e-2, atol=1e-4,
        )
