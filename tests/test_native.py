"""Native C++ core vs the SciPy oracle and the JAX implementation."""

import subprocess
import numpy as np
import jax.numpy as jnp
import pytest

import reference_impl as ref
from gp_bayesopinf_tpu import native


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native.available():
        subprocess.run(["make", "-C", "native"], cwd="/root/repo", check=False)
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")


S2, ELL, CHI = 1.8, 0.22, 1e-5


def test_native_kernel_matrices(rng):
    t = np.sort(rng.uniform(0, 1, 25))
    te = np.linspace(0, 1, 30)
    Kyy, kzy, Kzy, Kzz = native.kernel_matrices(t, te, S2, ELL, CHI)
    e_Kyy, e_kzy, e_Kzy, e_Kzz = ref.kernel_matrices(t, te, S2, ELL, CHI)
    np.testing.assert_allclose(Kyy, e_Kyy, atol=1e-13)
    np.testing.assert_allclose(kzy, e_kzy, atol=1e-13)
    np.testing.assert_allclose(Kzy, e_Kzy, atol=1e-12)
    np.testing.assert_allclose(Kzz, e_Kzz, atol=1e-11)


def test_native_estimates_triple_backend(rng):
    """Native C++, SciPy, and JAX all agree (three-backend crosscheck)."""
    from gp_bayesopinf_tpu.gp import gp_estimates

    t = np.sort(rng.uniform(0, 1, 30))
    y = np.sin(4 * t) + 0.01 * rng.standard_normal(30)
    te = np.linspace(0, 1, 40)

    s_n, d_n, C_n, W_n = native.gp_estimates(t, y, te, S2, ELL, CHI)
    s_s, d_s, C_s, W_s = ref.estimates_and_weights(t, y, te, S2, ELL, CHI)
    est = gp_estimates(jnp.asarray(t), jnp.asarray(y), jnp.asarray(te), S2, ELL, CHI)

    np.testing.assert_allclose(s_n, s_s, atol=1e-10)
    np.testing.assert_allclose(d_n, d_s, atol=1e-9)
    np.testing.assert_allclose(C_n, C_s, atol=1e-9)
    np.testing.assert_allclose(s_n, np.asarray(est.state_estimate), atol=1e-9)
    np.testing.assert_allclose(d_n, np.asarray(est.ddt_estimate), atol=1e-8)
    scale = np.abs(W_s).max()
    assert np.abs(W_n - W_s).max() < 5e-5 * scale
    assert np.abs(W_n - np.asarray(est.sqrtW)).max() < 5e-5 * scale


def test_native_not_spd_raises(rng):
    t = np.array([0.0, 0.1, 0.1, 0.2, 0.3])  # duplicate time, chi = 0
    with pytest.raises(ValueError, match="increase eta"):
        native.gp_estimates(t, np.sin(t), np.linspace(0, 0.3, 10),
                            1.0, 0.2, 0.0, eta=0.0)


def test_native_seird2_solve():
    p = np.array([0.00025, 0.1, 0.099, 0.005])
    q0 = np.array([0.994, 0.005, 0.001, 0.0, 0.0])
    t = np.linspace(0, 200, 300)
    got = native.seird2_solve(p, q0, t, substeps=8)
    expect = ref.solve_seird2(p, q0, t)
    assert np.abs(got - expect).max() < 1e-7


def test_native_nlml_grad_matches_oracle(rng):
    """Native NLML value vs the SciPy oracle; gradient vs finite diffs."""
    t = np.sort(rng.uniform(0, 1, 40))
    y = np.sin(5 * t) + 0.05 * rng.standard_normal(40)
    v, g = native.nlml_grad(t, y, S2, ELL, CHI)
    expect = ref.gp_nlml(t, y, S2, ELL, CHI)
    assert abs(v - expect) < 1e-10 * max(1.0, abs(expect))
    z0 = np.log([S2, ELL, CHI])
    # Central differences carry ~eps_machine*|f|/eps cancellation noise
    # (|f| ~ 2e3 here), so the step and tolerance are sized accordingly.
    eps = 1e-5
    for k in range(3):
        zp, zm = z0.copy(), z0.copy()
        zp[k] += eps
        zm[k] -= eps
        fd = (
            native.nlml_grad(t, y, *np.exp(zp))[0]
            - native.nlml_grad(t, y, *np.exp(zm))[0]
        ) / (2 * eps)
        assert abs(g[k] - fd) < 1e-3 * max(1.0, abs(fd))


def test_native_fit_gp_matches_scipy_lbfgsb(rng):
    """The native projected-L-BFGS multi-restart fitter finds optima at
    least as good as scipy L-BFGS-B restarts over the same NLML — the
    independent second fitting backend (reference fork capability,
    ``ODEs/main.py:89-182``)."""
    import scipy.optimize

    m = 60
    t = np.sort(rng.uniform(0, 1, m))
    dd = t[:, None] - t[None, :]
    K = 1.5 * np.exp(-dd * dd / (2 * 0.12**2)) + 0.02 * np.eye(m)
    y = np.linalg.cholesky(K) @ rng.standard_normal(m)

    bounds = ((1e-5, 1e5), (1e-5, 1e2), (1e-16, 1e2))
    (params, v_native) = native.fit_gp(t, y, *bounds, n_restarts=15, seed=5)
    assert all(np.isfinite(params)) and np.isfinite(v_native)

    lo = np.log([b[0] for b in bounds])
    hi = np.log([b[1] for b in bounds])
    best = np.inf
    for z0 in [np.clip(np.zeros(3), lo, hi)] + list(
        rng.uniform(lo, hi, (15, 3))
    ):
        r_ = scipy.optimize.minimize(
            lambda z: native.nlml_grad(t, y, *np.exp(z)),
            z0, jac=True, method="L-BFGS-B", bounds=list(zip(lo, hi)),
        )
        best = min(best, r_.fun)
    assert v_native <= best + 0.5


def test_native_rom_solve_matches_jax(rng):
    from gp_bayesopinf_tpu.rom import GalerkinROM

    r = 3
    rom = GalerkinROM("cAH", state_dimension=r, substeps=8)
    d = rom.operator_dimension
    Ohat = 0.2 * rng.standard_normal((r, d))
    Ohat[:, 1 : 1 + r] -= 0.8 * np.eye(r)
    q0 = rng.standard_normal(r) * 0.3
    t = np.linspace(0, 2, 80)
    got = native.rom_cah_solve(Ohat, q0, t, substeps=8)
    expect = np.asarray(rom.predict(jnp.asarray(Ohat), jnp.asarray(q0), jnp.asarray(t)))
    np.testing.assert_allclose(got, expect, atol=1e-10)
