"""Ensemble screening megakernel: Pallas (interpret mode on CPU) vs the
XLA twin vs direct per-draw integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gp_bayesopinf_tpu.ops.ensemble_pallas import (
    quadratic_ensemble_screen,
    quadratic_ensemble_screen_xla,
)
from gp_bayesopinf_tpu.rom import GalerkinROM


@pytest.fixture
def setup(rng):
    r, G, nd, k = 3, 4, 5, 30
    rom = GalerkinROM("cAH", state_dimension=r, substeps=4)
    d = rom.operator_dimension
    Ohat = 0.25 * rng.standard_normal((G * nd, r, d))
    Ohat[:, :, 1 : 1 + r] -= 0.9 * np.eye(r)[None]
    # Make the draws of the last candidate diverge.
    Ohat[-nd:, :, 1 : 1 + r] += 3.0 * np.eye(r)[None]
    q0 = 0.4 * rng.standard_normal(r)
    t = np.linspace(0, 2.0, k)
    shift = np.zeros(r)
    limits = np.full(r, 10.0)
    snaps = rng.standard_normal((r, k))
    return rom, jnp.asarray(Ohat), jnp.asarray(q0), jnp.asarray(t), shift, limits, snaps, G, nd


def test_xla_screen_matches_direct(setup):
    rom, Ohat, q0, t, shift, limits, snaps, G, nd = setup
    r = rom.state_dimension
    stable, err_sq = quadratic_ensemble_screen_xla(
        Ohat, q0, t, jnp.asarray(shift), jnp.asarray(limits),
        jnp.asarray(snaps), nd=nd, substeps=4,
    )
    # Direct f32 per-draw integration with the rom integrator.
    sols = jax.vmap(
        lambda O: rom.predict(
            O.astype(jnp.float32), q0.astype(jnp.float32), t.astype(jnp.float32)
        )
    )(Ohat)
    sols = np.asarray(sols)  # (N, r, k)
    dev = np.abs(sols - shift[None, :, None]).max(axis=2)
    expect_stable = (dev <= limits[None, :]).all(axis=1) & np.isfinite(
        sols
    ).all(axis=(1, 2))
    got_stable = np.asarray(stable)
    np.testing.assert_array_equal(got_stable, expect_stable)
    # Error accumulation: ||mean_draws(sol) - snaps||_F^2 per candidate.
    mean_direct = sols.reshape(G, nd, r, -1).mean(axis=1)
    expect_err = ((mean_direct - snaps[None]) ** 2).sum(axis=(1, 2))
    got_err = np.asarray(err_sq)
    for g in range(G):
        if got_stable[g * nd : (g + 1) * nd].all():
            np.testing.assert_allclose(
                got_err[g], expect_err[g], rtol=5e-4
            )
    assert not got_stable[-nd:].any()  # sabotaged candidate unstable


def test_pallas_interpret_matches_xla(setup):
    rom, Ohat, q0, t, shift, limits, snaps, G, nd = setup
    s_x, e_x = quadratic_ensemble_screen_xla(
        Ohat, q0, t, jnp.asarray(shift), jnp.asarray(limits),
        jnp.asarray(snaps), nd=nd, substeps=4,
    )
    s_p, e_p = quadratic_ensemble_screen(
        Ohat, q0, t, jnp.asarray(shift), jnp.asarray(limits),
        jnp.asarray(snaps), nd=nd, substeps=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))
    ok = np.asarray(s_x).reshape(G, nd).all(axis=1)
    np.testing.assert_allclose(
        np.asarray(e_p)[ok], np.asarray(e_x)[ok], rtol=2e-4, atol=1e-4
    )


def test_track_error_off(setup):
    rom, Ohat, q0, t, shift, limits, snaps, G, nd = setup
    s, e = quadratic_ensemble_screen_xla(
        Ohat, q0, t, jnp.asarray(shift), jnp.asarray(limits),
        None, nd=nd, substeps=4, track_error=False,
    )
    assert np.all(np.asarray(e) == 0.0)
    assert s.shape == (G * nd,)


def test_lane_padding_is_inert(rng):
    """N not a multiple of 128: padded dummy draws must not change
    stability flags or errors of the real draws (interpret mode)."""
    r, G, nd, k = 2, 3, 7, 12  # N = 21, heavily padded
    d = 1 + r + r * (r + 1) // 2
    Ohat = 0.2 * rng.standard_normal((G * nd, r, d))
    Ohat[:, :, 1 : 1 + r] -= 0.7 * np.eye(r)[None]
    q0 = jnp.asarray(rng.standard_normal(r) * 0.3)
    t = jnp.asarray(np.linspace(0, 1, k))
    shift = jnp.zeros(r)
    limits = jnp.full(r, 8.0)
    snaps = jnp.asarray(rng.standard_normal((r, k)))
    s_p, e_p = quadratic_ensemble_screen(
        jnp.asarray(Ohat), q0, t, shift, limits, snaps,
        nd=nd, substeps=2, interpret=True,
    )
    s_x, e_x = quadratic_ensemble_screen_xla(
        jnp.asarray(Ohat), q0, t, shift, limits, snaps, nd=nd, substeps=2
    )
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x), rtol=2e-4)


# ---- implicit cAHBN kernel --------------------------------------------------
@pytest.fixture
def setup_cahbn(rng):
    from gp_bayesopinf_tpu.ops.ensemble_pallas import _input_stage_times

    r, nu, G, nd, k, substeps = 3, 2, 3, 4, 16, 2
    rom = GalerkinROM(
        "cAHBN", state_dimension=r, input_dimension=nu,
        ivp_method="dirk2", substeps=substeps,
    )
    d = rom.operator_dimension
    Ohat = 0.2 * rng.standard_normal((G * nd, r, d))
    Ohat[:, :, 1 : 1 + r] -= 1.2 * np.eye(r)[None]  # stable linear part
    Ohat[-nd:, :, 1 : 1 + r] += 4.0 * np.eye(r)[None]  # sabotage last cand.
    q0 = 0.3 * rng.standard_normal(r)
    t = np.linspace(0, 1.5, k)

    def input_func(tt):
        return jnp.stack(
            [jnp.sin(2 * jnp.pi * tt), jnp.cos(4 * jnp.pi * tt)], axis=-1
        )

    u_stages = input_func(_input_stage_times(jnp.asarray(t), substeps))
    shift = np.zeros(r)
    limits = np.full(r, 8.0)
    snaps = rng.standard_normal((r, k))
    return (rom, jnp.asarray(Ohat), jnp.asarray(q0), jnp.asarray(t),
            shift, limits, jnp.asarray(u_stages), snaps, G, nd, input_func)


def test_cahbn_xla_twin_matches_generic_dirk2(setup_cahbn):
    """The twin's SDIRK2/Newton discretization reproduces the generic
    device path (rom.predict -> dirk2_solve -> solve_small) decisions."""
    from gp_bayesopinf_tpu.ops.ensemble_pallas import cahbn_ensemble_screen_xla

    (rom, Ohat, q0, t, shift, limits, u_stages, snaps, G, nd,
     input_func) = setup_cahbn
    stable, err_sq = cahbn_ensemble_screen_xla(
        Ohat, q0, t, jnp.asarray(shift), jnp.asarray(limits), u_stages,
        jnp.asarray(snaps), nd=nd, substeps=rom.substeps,
    )
    f32 = jnp.float32
    sols = jax.vmap(
        lambda O: rom.predict(
            O.astype(f32), q0.astype(f32), t.astype(f32),
            input_func=lambda tt: input_func(tt).astype(f32),
        )
    )(Ohat)
    sols = np.asarray(sols)
    dev = np.abs(sols - shift[None, :, None]).max(axis=2)
    expect_stable = (dev <= limits[None, :]).all(axis=1) & np.isfinite(
        sols
    ).all(axis=(1, 2))
    np.testing.assert_array_equal(np.asarray(stable), expect_stable)
    mean_direct = sols.reshape(G, nd, sols.shape[1], -1).mean(axis=1)
    expect_err = ((mean_direct - snaps[None]) ** 2).sum(axis=(1, 2))
    got_stable = np.asarray(stable)
    for g in range(G):
        if got_stable[g * nd : (g + 1) * nd].all():
            np.testing.assert_allclose(
                np.asarray(err_sq)[g], expect_err[g], rtol=1e-3
            )
    assert not got_stable[-nd:].any()


def test_cahbn_pallas_interpret_matches_xla(setup_cahbn):
    from gp_bayesopinf_tpu.ops.ensemble_pallas import (
        cahbn_ensemble_screen,
        cahbn_ensemble_screen_xla,
    )

    (rom, Ohat, q0, t, shift, limits, u_stages, snaps, G, nd,
     _) = setup_cahbn
    s_x, e_x = cahbn_ensemble_screen_xla(
        Ohat, q0, t, jnp.asarray(shift), jnp.asarray(limits), u_stages,
        jnp.asarray(snaps), nd=nd, substeps=rom.substeps,
    )
    s_p, e_p = cahbn_ensemble_screen(
        Ohat, q0, t, jnp.asarray(shift), jnp.asarray(limits), u_stages,
        jnp.asarray(snaps), nd=nd, substeps=rom.substeps, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))
    ok = np.asarray(s_x).reshape(G, nd).all(axis=1)
    np.testing.assert_allclose(
        np.asarray(e_p)[ok], np.asarray(e_x)[ok], rtol=2e-4, atol=1e-4
    )
