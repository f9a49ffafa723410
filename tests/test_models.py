"""Truth models (JAX) vs the scipy solve_ivp oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_impl as ref
from gp_bayesopinf_tpu.models import SEIRD2, SEIRD, Euler, CubicHeatBimodal, HeatBimodal


def test_seird2_solve_matches_scipy():
    model = SEIRD2(substeps=8)
    q0 = np.array([0.994, 0.005, 0.001, 0.0, 0.0])
    t = np.linspace(0, 200, 500)
    got = np.asarray(model.solve(q0, t))
    expect = ref.solve_seird2(np.asarray(model.parameters), q0, t)
    assert np.max(np.abs(got - expect)) < 1e-6


def test_seird_parameter_conversion():
    params6 = np.array([1.0, 0.25, 0.1, 0.1, 0.05, 0.05])
    p = np.asarray(SEIRD2.convert_parameters(params6))
    np.testing.assert_allclose(p, [0.25, 0.1, 0.095, 0.0025])
    # Six- and four-parameter forms must produce the same trajectories.
    q0 = np.array([0.994, 0.005, 0.001, 0.0, 0.0])
    t = np.linspace(0, 100, 200)
    six = np.asarray(SEIRD(parameters=tuple(params6), substeps=8).solve(q0, t))
    four = np.asarray(SEIRD2(parameters=tuple(p), substeps=8).solve(q0, t))
    np.testing.assert_allclose(six, four, atol=1e-9)


def test_seird2_data_matrix_consistency(rng):
    """data_matrix @ p must equal the stacked derivatives (linearity)."""
    model = SEIRD2()
    states = jnp.asarray(rng.uniform(0, 1, (5, 9)))
    p = jnp.asarray(model.parameters)
    D = model.data_matrix(states)
    got = np.asarray(D @ p).reshape(5, 9)
    for j in range(9):
        expect = model.derivative(0.0, states[:, j])
        np.testing.assert_allclose(got[:, j], expect, rtol=1e-12)
    # Block variant stacks identically.
    blocks = np.asarray(model.data_matrix_blocks(states))
    np.testing.assert_allclose(blocks.reshape(45, 4), np.asarray(D))


def test_seird_noise_properties(rng):
    model = SEIRD2()
    t = np.linspace(0, 100, 80)
    states = np.asarray(model.solve(np.array([0.994, 0.005, 0.001, 0, 0]), t))
    noised = np.asarray(model.noise(jax.random.PRNGKey(0), jnp.asarray(states), 0.1))
    assert noised.shape == states.shape
    assert np.all(noised >= 0) and np.all(noised <= 1)
    # Exact zeros stay exactly zero.
    assert np.all(noised[np.abs(states) < 5e-16] == 0)
    # No noise -> unchanged.
    same = model.noise(jax.random.PRNGKey(0), jnp.asarray(states), 0.0)
    np.testing.assert_array_equal(np.asarray(same), states)


@pytest.fixture(scope="module")
def euler_setup():
    x = np.linspace(0, 2, 201)[:-1]
    model = Euler(x, substeps=16)
    init_params = [22, 20, 24, 95, 105, 100]
    q0 = np.asarray(model.initial_conditions(init_params))
    return x, model, q0


def test_euler_lift_roundtrip(euler_setup, rng):
    _, model, q0 = euler_setup
    states = q0[:, None] * (1 + 0.01 * rng.standard_normal((600, 7)))
    back = np.asarray(model.lift(model.unlift(jnp.asarray(states))))
    np.testing.assert_allclose(back, states, rtol=1e-10)


def test_euler_initial_conditions(euler_setup):
    x, model, q0 = euler_setup
    v, p, zeta = np.split(q0, 3)
    np.testing.assert_allclose(p, 1e5)
    # Spline interpolates the knots: rho(x0) = 22, v(x0) = 95.
    np.testing.assert_allclose(1 / zeta[0], 22.0, rtol=1e-12)
    np.testing.assert_allclose(v[0], 95.0, rtol=1e-12)


def test_euler_solve_matches_scipy(euler_setup):
    x, model, q0 = euler_setup
    t = np.linspace(0, 0.03, 81)  # short horizon keeps the oracle cheap
    got = np.asarray(model.solve(q0, t))
    expect_cons = ref.solve_euler(
        np.asarray(model.unlift(jnp.asarray(q0))), t, x[1] - x[0],
        rtol=1e-8, atol=1e-8,
    )
    expect = np.asarray(Euler.lift(jnp.asarray(expect_cons)))
    for blk_g, blk_e in zip(np.split(got, 3), np.split(expect, 3)):
        rel = np.abs(blk_g - blk_e).max() / np.abs(blk_e).max()
        assert rel < 1e-4, rel


def test_euler_lift_ddts(euler_setup):
    """lift_ddts must be the time derivative of lift (chain rule check via
    autodiff)."""
    _, model, q0 = euler_setup
    cons = model.unlift(jnp.asarray(q0))
    dcons = model.derivative(0.0, cons)
    got = np.asarray(model.lift_ddts(cons[:, None], dcons[:, None]))[:, 0]
    expect = np.asarray(
        jax.jvp(lambda s: Euler.lift(s), (cons,), (dcons,))[1]
    )
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-8)


def test_euler_noise(euler_setup):
    x, model, q0 = euler_setup
    t = np.linspace(0, 0.02, 30)
    states = np.asarray(model.solve(q0, t))
    noised = np.asarray(model.noise(jax.random.PRNGKey(1), jnp.asarray(states), 0.03))
    # IC column untouched.
    np.testing.assert_array_equal(noised[:, 0], states[:, 0])
    assert not np.allclose(noised[:, 1:], states[:, 1:])


def test_cubic_heat_solve_matches_scipy():
    x = np.linspace(0, 1, 80)
    model = CubicHeatBimodal(x, 0.0, 1.0, diffusion=1e-2, a=1.0, b=-2.0, substeps=4)
    q0_full = np.asarray(HeatBimodal.initial_conditions(x, 0.0, 1.0))
    t = np.linspace(0, 2, 120)
    got = np.asarray(model.solve(q0_full, t))
    A, c, B = ref.heat_operators(x, 0.0, 1.0, 1e-2)
    expect_int = ref.solve_cubic_heat(
        q0_full[1:-1], t, A, c, B, 1.0, -2.0, rtol=1e-8, atol=1e-10
    )
    # Boundary rows present and exact.
    np.testing.assert_allclose(got[0], 0.0)
    np.testing.assert_allclose(got[-1], 1.0)
    scale = np.abs(expect_int).max()
    assert np.max(np.abs(got[1:-1] - expect_int)) < 2e-3 * scale


def test_heat_solve_host_matches_traced():
    """The host-NumPy DIRK2 twins (solve_host, solve_host_stacked) must
    reproduce the traced solver's stepping to machine precision — they
    are the multi-trajectory pipeline's data-generation path."""
    from gp_bayesopinf_tpu.models.heat import solve_host_stacked

    x = np.linspace(0, 1, 80)
    q0_full = np.asarray(HeatBimodal.initial_conditions(x, 0.0, 1.0))
    t = np.linspace(0, 1, 40)
    params = [(1.0, -2.0), (-1.5, 0.5), (0.0, 2.0)]
    foms = [
        CubicHeatBimodal(x, 0.0, 1.0, diffusion=1e-2, a=a, b=b, substeps=4)
        for a, b in params
    ]
    stacked = solve_host_stacked(foms, q0_full, t)
    for fom, got in zip(foms, stacked):
        traced = np.asarray(fom.solve(q0_full, t))
        host = fom.solve_host(q0_full, t)
        scale = np.abs(traced).max()
        assert np.max(np.abs(host - traced)) < 1e-10 * scale
        assert np.max(np.abs(got - traced)) < 1e-10 * scale
    # The linear base class shares the stacked path.
    lin = [HeatBimodal(x, 0.0, 1.0, a=a, b=b, substeps=2) for a, b in params]
    lst = solve_host_stacked(lin, q0_full, t)
    for fom, got in zip(lin, lst):
        traced = np.asarray(fom.solve(q0_full, t))
        assert np.max(np.abs(got - traced)) < 1e-10 * np.abs(traced).max()


def test_heat_noise():
    x = np.linspace(0, 1, 40)
    model = HeatBimodal(x, 0.0, 1.0)
    states = np.asarray(
        HeatBimodal.initial_conditions(x, 0.0, 1.0)
    )[:, None] * np.ones((1, 10))
    noised = np.asarray(model.noise(jax.random.PRNGKey(0), jnp.asarray(states), 0.05))
    np.testing.assert_array_equal(noised[:, 0], states[:, 0])  # IC clean
    np.testing.assert_array_equal(noised[0], states[0])  # BCs clean
    np.testing.assert_array_equal(noised[-1], states[-1])
    assert not np.allclose(noised[1:-1, 1:], states[1:-1, 1:])
