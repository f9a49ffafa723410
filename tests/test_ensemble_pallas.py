"""Ensemble screening megakernel: Pallas (interpret mode on CPU) vs the
XLA implementation vs direct per-draw integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gp_bayesopinf_tpu.ops.ensemble_pallas import (
    expand_cah_operators,
    quadratic_ensemble_screen,
    quadratic_ensemble_screen_xla,
)
from gp_bayesopinf_tpu.rom import GalerkinROM
from gp_bayesopinf_tpu.ops.quadratic import ckron


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
    return rom, jnp.asarray(Ohat), jnp.asarray(q0), jnp.asarray(t), shift, limits, G, nd


def test_expand_cah_matches_rhs(rng):
    """Dense-feature operators reproduce the compressed rhs exactly."""
    r, d = 4, 1 + 4 + 10
    Ohat = jnp.asarray(rng.standard_normal((6, r, d)))
    F = expand_cah_operators(Ohat, r)
    q = jnp.asarray(rng.standard_normal(r))
    feats = jnp.concatenate([jnp.ones(1), q, jnp.kron(q, q)])
    for n in range(6):
        via_dense = np.asarray(F[n] @ feats)
        via_ckron = np.asarray(
            Ohat[n] @ jnp.concatenate([jnp.ones(1), q, ckron(q)])
        )
        np.testing.assert_allclose(via_dense, via_ckron, rtol=1e-12)


def test_xla_screen_matches_direct(setup):
    rom, Ohat, q0, t, shift, limits, G, nd = setup
    r = rom.state_dimension
    F = expand_cah_operators(Ohat, r)
    stable, mean_sol = quadratic_ensemble_screen_xla(
        F, q0, t, jnp.asarray(shift), jnp.asarray(limits), substeps=4, nd=nd
    )
    # Direct f32 per-draw integration with the rom integrator.
    sols = jax.vmap(
        lambda O: rom.predict(
            O.astype(jnp.float32), q0.astype(jnp.float32), t.astype(jnp.float32)
        )
    )(Ohat)
    sols = np.asarray(sols)  # (N, r, k)
    N = sols.shape[0]
    dev = np.abs(sols - shift[None, :, None]).max(axis=2)
    expect_stable = (dev <= limits[None, :]).all(axis=1) & np.isfinite(
        sols
    ).all(axis=(1, 2))
    got_stable = np.asarray(stable)
    # Divergence clamps differ (1e6 vs 1e18) but classification must agree.
    np.testing.assert_array_equal(got_stable, expect_stable)
    # Mean over draws per candidate (only meaningful for stable candidates).
    mean_direct = sols.reshape(G, nd, r, -1).mean(axis=1)
    mm = np.asarray(mean_sol)
    for g in range(G):
        if got_stable[g * nd : (g + 1) * nd].all():
            np.testing.assert_allclose(
                mm[g], mean_direct[g], rtol=2e-4, atol=2e-4
            )
    # The sabotaged candidate must be unstable.
    assert not got_stable[-nd:].any()


def test_pallas_interpret_matches_xla(setup):
    rom, Ohat, q0, t, shift, limits, G, nd = setup
    r = rom.state_dimension
    F = expand_cah_operators(Ohat, r)
    s_x, m_x = quadratic_ensemble_screen_xla(
        F, q0, t, jnp.asarray(shift), jnp.asarray(limits), substeps=4, nd=nd
    )
    s_p, m_p = quadratic_ensemble_screen(
        F, q0, t, jnp.asarray(shift), jnp.asarray(limits),
        substeps=4, nd=nd, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_x), rtol=2e-5, atol=1e-5)
