"""SEIRD quadratic-operator mapping + kernel-path regularization search.

The SEIRD2 right-hand side is exactly quadratic in the state, so a
posterior draw of its 4 regression parameters defines "cAH" operator rows
over the compressed Kronecker features. These tests pin (a) the algebraic
identity between ``SEIRD2.cah_operators`` and ``SEIRD2.derivative``, and
(b) that routing the ODE pipeline's regularization search through the
quadratic ensemble-screening kernels (reference screening semantics:
``ODEs/step3_estimate.py`` 20-draw screen) selects the same regularizer
as the generic per-draw integration path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gp_bayesopinf_tpu.models import SEIRD, SEIRD2
from gp_bayesopinf_tpu.ops.quadratic import ckron
from gp_bayesopinf_tpu.bayes.regsearch import (
    KernelScreenSpec,
    auto_regularize,
)
from gp_bayesopinf_tpu.solve.lstsq import weighted_lstsq_fit
from gp_bayesopinf_tpu.utils import key_from_seed


def test_cah_operators_match_derivative(rng):
    model = SEIRD2()
    params = jnp.asarray([2.5e-4, 0.11, 0.095, 0.006])
    O = model.cah_operators(params)
    assert O.shape == (5, 1 + 5 + 15)
    for _ in range(5):
        q = jnp.asarray(rng.uniform(0.0, 1.0, size=5))
        feats = jnp.concatenate([jnp.ones(1), q, ckron(q)])
        np.testing.assert_allclose(
            np.asarray(O @ feats),
            np.asarray(model.derivative(0.0, q, params)),
            rtol=1e-12,
        )


def test_cah_operators_accept_row_draws():
    # lstsq.sample yields (1, 4) rows for the shared-parameter regression.
    model = SEIRD2()
    params = jnp.asarray([[2.5e-4, 0.11, 0.095, 0.006]])
    np.testing.assert_array_equal(
        np.asarray(model.cah_operators(params)),
        np.asarray(model.cah_operators(params[0])),
    )


def test_cah_operators_six_parameter_model(rng):
    model = SEIRD()
    params6 = jnp.asarray([1000.0, 0.27, 0.09, 0.12, 0.015, 0.04])
    O = model.cah_operators(params6)
    q = jnp.asarray(rng.uniform(0.0, 300.0, size=5))
    feats = jnp.concatenate([jnp.ones(1), q, ckron(q)])
    np.testing.assert_allclose(
        np.asarray(O @ feats),
        np.asarray(model.derivative(0.0, q, params6)),
        rtol=1e-12,
    )


@pytest.fixture
def seird_search_problem(rng):
    """A small SEIRD regression posterior + GP-estimate stand-ins."""
    # The pipeline's normalized-population parameterization (N = 1):
    # the frozen default (N = 1000 scale) makes the regression singular.
    model = SEIRD2(
        parameters=tuple(
            np.asarray(
                SEIRD2.convert_parameters((1.0, 0.25, 0.1, 0.1, 0.05, 0.05))
            )
        )
    )
    t_est = np.linspace(0.0, 60.0, 48)
    truth = model.solve(
        jnp.asarray([0.994, 0.005, 0.001, 0.0, 0.0]), jnp.asarray(t_est)
    )
    states = jnp.asarray(
        np.asarray(truth) + 0.002 * rng.standard_normal(truth.shape)
    )
    ddts = jnp.stack(
        [model.derivative(0.0, states[:, j]) for j in range(t_est.size)],
        axis=1,
    )
    D_blocks = model.data_matrix_blocks(states)
    m = t_est.size
    sqrtW = jnp.broadcast_to(jnp.eye(m), (5, m, m))[None]
    fac = weighted_lstsq_fit(D_blocks, sqrtW, ddts[None])
    t_pred = np.linspace(0.0, 90.0, 60)
    return model, fac, states, t_est, t_pred


def test_pallas_interpret_screens_seird_operators(rng):
    """The Pallas megakernel (interpret mode) screens operator-mapped
    SEIRD draws identically to the XLA twin — de-risks the TPU kernel
    path at the SEIRD shapes (r=5, d=21)."""
    from gp_bayesopinf_tpu.ops.ensemble_pallas import (
        quadratic_ensemble_screen,
        quadratic_ensemble_screen_xla,
    )

    model = SEIRD2(
        parameters=tuple(
            np.asarray(
                SEIRD2.convert_parameters((1.0, 0.25, 0.1, 0.1, 0.05, 0.05))
            )
        )
    )
    G, nd, k = 2, 4, 40
    base = np.asarray(model.parameters)
    draws = base[None] * (1.0 + 0.3 * rng.standard_normal((G * nd, 4)))
    draws[-1] *= 40.0  # a diverging draw
    ohats = jax.vmap(model.cah_operators)(jnp.asarray(draws))
    assert ohats.shape == (G * nd, 5, 21)
    q0 = jnp.asarray([0.994, 0.005, 0.001, 0.0, 0.0])
    t = jnp.asarray(np.linspace(0.0, 60.0, k))
    truth = model.solve(q0, t)
    shift = jnp.mean(truth, axis=1)
    limits = 5.0 * jnp.max(jnp.abs(truth - shift[:, None]), axis=1) + 0.05
    args = (ohats, q0, t, shift, limits, truth)
    st_p, err_p = quadratic_ensemble_screen(
        *args, nd=nd, substeps=model.substeps, interpret=True
    )
    st_x, err_x = quadratic_ensemble_screen_xla(
        *args, nd=nd, substeps=model.substeps
    )
    np.testing.assert_array_equal(np.asarray(st_p), np.asarray(st_x))
    assert np.asarray(st_p).sum() >= 1  # some draws survive
    assert not np.asarray(st_p)[-1]  # the diverging draw is rejected
    np.testing.assert_allclose(
        np.asarray(err_p), np.asarray(err_x), rtol=1e-5
    )


def test_kernel_spec_requires_operator_map(seird_search_problem):
    model, fac, states, t_est, t_pred = seird_search_problem
    with pytest.raises(ValueError, match="operator_map"):
        auto_regularize(
            fac,
            [lambda O, q, t: model.solve(q, t, parameters=O[0])],
            states[:, 0][None], t_pred, t_est, states[None],
            key_from_seed(7),
            rom=KernelScreenSpec(
                structure="cAH",
                state_dimension=model.num_variables,
                substeps=model.substeps,
            ),
            use_kernel=True,
            grid=np.logspace(-8, 0, 3), ndraws=4, verbose=False,
        )


@pytest.mark.slow
def test_kernel_search_matches_generic(seird_search_problem):
    model, fac, states, t_est, t_pred = seird_search_problem
    grid = np.logspace(-12, 2, 8)
    key = key_from_seed(7)
    predict_fn = lambda O, q, t: model.solve(q, t, parameters=O[0])
    common = dict(
        grid=grid, ndraws=10, verbose=False, screen_dtype=jnp.float32
    )
    res_generic = auto_regularize(
        fac, [predict_fn], states[:, 0][None], t_pred, t_est,
        states[None], key, **common,
    )
    res_kernel = auto_regularize(
        fac, [predict_fn], states[:, 0][None], t_pred, t_est,
        states[None], key,
        rom=KernelScreenSpec(
            structure="cAH",
            state_dimension=model.num_variables,
            substeps=model.substeps,
        ),
        operator_map=model.cah_operators,
        use_kernel=True,  # XLA twin on CPU backends
        **common,
    )
    # Identical draws (same key), identical integrator stepping: the
    # stability decisions must agree everywhere and the errors to f32
    # accuracy, hence the same selected regularizer.
    gen_stable = res_generic.grid_errors < 1e12
    ker_stable = res_kernel.grid_errors < 1e12
    np.testing.assert_array_equal(gen_stable, ker_stable)
    np.testing.assert_allclose(
        res_generic.grid_errors[gen_stable],
        res_kernel.grid_errors[ker_stable],
        rtol=2e-4,
    )
    assert res_kernel.grid_best == res_generic.grid_best
