"""GP estimation parity against the scipy oracle and sklearn NLML/fit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_impl as ref
from gp_bayesopinf_tpu.gp import (
    gp_estimates,
    nlml,
    BoxTransform,
    fit_gp_hyperparameters,
    fit_gaussian_processes,
)

S2, ELL, CHI = 1.8, 0.22, 1e-5


@pytest.fixture
def data(rng):
    t = np.sort(rng.uniform(0, 1, 30))
    t[0], t[-1] = 0.0, 1.0
    y = np.sin(4 * t) + 0.01 * rng.standard_normal(30)
    t_est = np.linspace(0, 1, 50)
    return t, y, t_est


def test_estimates_match_oracle(data):
    """1e-6 parity on state/ddt estimates and sqrtW given hyperparameters
    (BASELINE.json acceptance criterion)."""
    t, y, t_est = data
    est = gp_estimates(jnp.asarray(t), jnp.asarray(y), jnp.asarray(t_est),
                       S2, ELL, CHI, eta=1e-8)
    state, ddt, C, sqrtW = ref.estimates_and_weights(t, y, t_est, S2, ELL, CHI)
    assert bool(est.ok)
    np.testing.assert_allclose(est.state_estimate, state, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(est.ddt_estimate, ddt, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(est.ddt_covariance, C, rtol=1e-7, atol=1e-9)
    # sqrtW inverts eigenvalues down at eta = 1e-8; eigensolver differences
    # between LAPACK and XLA amplify to ~1e-6 of the matrix scale there.
    scale = np.max(np.abs(sqrtW))
    assert np.max(np.abs(np.asarray(est.sqrtW) - sqrtW)) < 5e-6 * scale


def test_sqrtw_property(data):
    """sqrtW @ sqrtW == inv(C + eta I)."""
    t, y, t_est = data
    eta = 1e-6
    est = gp_estimates(jnp.asarray(t), jnp.asarray(y), jnp.asarray(t_est),
                       S2, ELL, CHI, eta=eta)
    W = np.asarray(est.sqrtW @ est.sqrtW)
    prod = W @ (np.asarray(est.ddt_covariance) + eta * np.eye(len(t_est)))
    np.testing.assert_allclose(prod, np.eye(len(t_est)), atol=1e-6)


def test_estimates_batched_vmap(data):
    t, y, t_est = data
    Y = jnp.stack([jnp.asarray(y), 2 * jnp.asarray(y)])
    T = jnp.stack([jnp.asarray(t)] * 2)
    s2 = jnp.array([S2, 2.0]); el = jnp.array([ELL, 0.3]); ch = jnp.array([CHI, 1e-4])
    batched = jax.vmap(
        lambda tt, yy, a, b, c: gp_estimates(tt, yy, jnp.asarray(t_est), a, b, c)
    )(T, Y, s2, el, ch)
    single = gp_estimates(T[1], Y[1], jnp.asarray(t_est), 2.0, 0.3, 1e-4)
    np.testing.assert_allclose(batched.state_estimate[1], single.state_estimate)
    np.testing.assert_allclose(batched.sqrtW[1], single.sqrtW, atol=1e-10)


def test_nlml_matches_oracle(data):
    t, y, _ = data
    ours = nlml(jnp.log(jnp.array([S2, ELL, CHI])), jnp.asarray(t), jnp.asarray(y))
    theirs = ref.gp_nlml(t, y, S2, ELL, CHI)
    np.testing.assert_allclose(float(ours), theirs, rtol=1e-10)


def test_nlml_matches_sklearn(data):
    """Cross-check against sklearn's log_marginal_likelihood."""
    sklearn = pytest.importorskip("sklearn.gaussian_process")
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import ConstantKernel, RBF, WhiteKernel

    t, y, _ = data
    kernel = ConstantKernel(S2, "fixed") * RBF(ELL, "fixed") + WhiteKernel(CHI, "fixed")
    gpr = GaussianProcessRegressor(kernel=kernel, alpha=0.0, optimizer=None)
    gpr.fit(t[:, None], y)
    lml = gpr.log_marginal_likelihood()
    ours = nlml(jnp.log(jnp.array([S2, ELL, CHI])), jnp.asarray(t), jnp.asarray(y))
    np.testing.assert_allclose(float(ours), -lml, rtol=1e-10)


def test_fit_recovers_reasonable_hyperparameters(rng):
    """Fit on data sampled from a known GP: the optimum should score an
    NLML at least as good as the sklearn multi-restart optimum (statistical
    parity; reference's own backends agree only to rtol=1e-1)."""
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import ConstantKernel, RBF, WhiteKernel

    t = np.linspace(0, 1, 60)
    true = (2.0, 0.15, 1e-4)
    Kyy = ref.kernel_matrices(t, t, *true)[0]
    y = np.linalg.cholesky(Kyy) @ rng.standard_normal(60)

    bounds = dict(constant=(1e-5, 1e5), ell=(1e-3, 1e2), chi=(1e-8, 1e0))
    box = BoxTransform.from_bounds(bounds["constant"], bounds["ell"], bounds["chi"])
    fit = fit_gp_hyperparameters(
        jnp.asarray(t), jnp.asarray(y)[None], box,
        jax.random.PRNGKey(0), n_restarts=10,
    )

    kernel = (
        ConstantKernel(1.0, bounds["constant"])
        * RBF(1.0, bounds["ell"])
        + WhiteKernel(1.0, bounds["chi"])
    )
    gpr = GaussianProcessRegressor(kernel=kernel, alpha=0.0, n_restarts_optimizer=10)
    gpr.fit(t[:, None], y)
    sk_nlml = -gpr.log_marginal_likelihood(gpr.kernel_.theta)

    assert float(fit.nlml[0]) < sk_nlml + 0.5, (
        f"ours {float(fit.nlml[0]):.4f} vs sklearn {sk_nlml:.4f}"
    )


def test_rank_full_chunked_matches_unchunked(rng):
    """The candidate-axis-chunked full-data re-rank (the m=2048 HBM-OOM
    fix) returns the same NLML matrix as the single-program path for every
    chunk width, including non-divisors that force padding."""
    from gp_bayesopinf_tpu.gp.fit import _rank_full, _rank_full_chunked

    t = jnp.asarray(np.linspace(0, 1, 40))
    T = jnp.stack([t, t + 0.01])
    Y = jnp.asarray(rng.standard_normal((2, 40)))
    box = BoxTransform.from_bounds((1e-5, 1e5), (1e-3, 1e2), (1e-8, 1e0))
    Z = jnp.asarray(0.5 * rng.standard_normal((2, 7, 3)))

    v_ref = np.asarray(_rank_full(T, Y, box, Z))
    for chunk in (1, 2, 3, 7, 50):
        v = np.asarray(_rank_full_chunked(T, Y, box, Z, chunk=chunk))
        # Different chunk widths compile different batched programs, so
        # reductions may differ by an ulp (measured 4e-16 at chunk=1);
        # the inf/finite stability pattern must match exactly.
        np.testing.assert_array_equal(
            np.isfinite(v), np.isfinite(v_ref), err_msg=f"chunk={chunk}"
        )
        f = np.isfinite(v_ref)
        np.testing.assert_allclose(
            v[f], v_ref[f], rtol=1e-12, err_msg=f"chunk={chunk}"
        )


def test_fit_gaussian_processes_end_to_end(rng):
    """Batched step-2 entry point returns populated GP objects."""
    t = np.sort(rng.uniform(0, 1, 40)); t[0], t[-1] = 0, 1
    Y = np.stack([np.sin(5 * t), np.cos(3 * t)]) + 0.01 * rng.standard_normal((2, 40))
    t_est = np.linspace(0, 1, 30)
    gps = fit_gaussian_processes(
        t_est, t, Y,
        constant_bounds=(1e-5, 1e5),
        length_scale_bounds=(1e-3, 1e2),
        noise_level_bounds=(1e-10, 1e0),
        n_restarts_optimizer=5,
        key=jax.random.PRNGKey(1),
    )
    assert len(gps) == 2
    for gp in gps:
        assert gp.state_estimate.shape == (30,)
        assert gp.sqrtW.shape == (30, 30)
        mean, std = gp.predict(t_est)
        assert np.all(np.isfinite(mean)) and np.all(std >= 0)
        lo, mid, hi = gp.prediction_bounds(t_est)
        assert np.all(lo <= hi)
    # GP state estimate should track the clean signal reasonably.
    err = np.linalg.norm(np.asarray(gps[0].state_estimate) - np.sin(5 * t_est))
    assert err / np.linalg.norm(np.sin(5 * t_est)) < 0.1


def test_gp_save_load_roundtrip_with_estimates(tmp_path, rng):
    """Persistence parity with the reference's joblib dump of the whole
    fitted wrapper (``gpkernels.py:423-430``): a loaded GP carries its
    estimation products and predicts identically, with no recompute."""
    from gp_bayesopinf_tpu.gp.gp import GaussianProcess

    t = jnp.asarray(np.sort(rng.uniform(0, 1, 25)))
    y = jnp.asarray(np.sin(5 * np.asarray(t)) + 0.05 * rng.standard_normal(25))
    gp = GaussianProcess(t, y, 1.4, 0.2, 1e-4)
    gp.compute_lstsq_matrices(np.linspace(0, 1, 30), eta=1e-8)

    path = str(tmp_path / "gp.npz")
    gp.save(path)
    gp2 = GaussianProcess.load(path)

    assert gp2.weight_method == gp.weight_method
    np.testing.assert_allclose(
        np.asarray(gp2.state_estimate), np.asarray(gp.state_estimate)
    )
    np.testing.assert_allclose(np.asarray(gp2.sqrtW), np.asarray(gp.sqrtW))
    m1, s1 = gp.predict(np.linspace(0, 1, 17))
    m2, s2 = gp2.predict(np.linspace(0, 1, 17))
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1))
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1))

    # Hyperparameters-only save still loads (backward compatible).
    gp3 = GaussianProcess(t, y, 1.4, 0.2, 1e-4)
    gp3.save(str(tmp_path / "bare.npz"))
    gp4 = GaussianProcess.load(str(tmp_path / "bare.npz"))
    assert gp4.state_estimate is None
