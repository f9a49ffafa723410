"""Scaled GP-BayesOpInf configuration on a device mesh.

The north-star scaled workload (BASELINE.json): an Euler-like problem with
r = 30 POD modes, O(10k) snapshot columns, large spatial DOF — run with

* the POD Gram matrix reduced over a mesh-sharded spatial axis ("seq"),
* GP hyperparameter fits and estimation batched over modes and sharded
  over the "mode" axis (model-parallel),
* posterior draws / regularization candidates sharded over the "draw"
  axis (data-parallel).

``run_scaled`` is size-parameterized so the same code path runs as an
8-virtual-device CPU test (tiny sizes) and as the real v5e-8 workload.
"""

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gp.estimates import gp_estimates
from ..gp.fit import fit_gp_hyperparameters
from ..gp.nlml import BoxTransform
from ..parallel.mesh import make_mesh
from ..parallel.sharded import sharded_gram_pod
from ..rom.model import GalerkinROM
from ..solve.lstsq import weighted_lstsq_fit
from ..solve.ivp import stability_mask


@dataclasses.dataclass
class ScaledResult:
    num_modes: int
    regularizer: float
    ensemble_mean: np.ndarray  # (r, k_pred)
    stable_fraction: float
    svdvals: np.ndarray


def _synthetic_states(key, n: int, k: int, num_modes: int):
    """Low-rank snapshots from a stable latent linear system lifted to the
    full spatial dimension (data generation is not the scaling target; the
    latent dynamics are recoverable by the quadratic ROM so the full
    pipeline exercises meaningfully at any size)."""
    k1, k2, k3 = jax.random.split(key, 3)
    r_true = num_modes
    # Stable latent dynamics: damped rotations.
    freqs = 2.0 + 4.0 * jax.random.uniform(k1, (r_true // 2 + 1,))
    t = jnp.linspace(0.0, 1.0, k)
    comps = []
    for j in range(r_true):
        f = freqs[j // 2]
        damp = jnp.exp(-0.3 * (1 + j % 3) * t)
        comps.append(
            damp * (jnp.cos(f * t) if j % 2 == 0 else jnp.sin(f * t))
        )
    latent = jnp.stack(comps) / jnp.arange(1, r_true + 1)[:, None] ** 0.5
    # Near-orthogonal random lift (cheap at large n; exact orthogonality
    # is unnecessary — POD re-orthogonalizes).
    B = jax.random.normal(k2, (n, r_true)) / jnp.sqrt(n)
    states = B @ latent
    noise = 0.003 * jax.random.normal(k3, states.shape, dtype=states.dtype)
    return states + noise


def run_scaled(
    mesh: Optional[Mesh] = None,
    n_space: int = 6000,
    n_snapshots: int = 10000,
    num_modes: int = 30,
    num_gp_samples: int = 512,
    num_regression_points: int = 512,
    n_restarts: int = 8,
    ndraws: int = 256,
    grid_size: int = 16,
    seed: int = 0,
    checkpoint_dir: Optional[str] = None,
) -> ScaledResult:
    """Run the sharded scaled pipeline end to end.

    Defaults are the production scale; tests call with tiny sizes.
    With ``checkpoint_dir``, the expensive front half (data generation,
    sharded POD, GP fit) checkpoints its outputs and a rerun resumes from
    them (``io.checkpoint``, orbax-backed).
    """
    import os

    from ..io.checkpoint import (
        load_checkpoint,
        pipeline_stage_state,
        save_checkpoint,
    )

    if mesh is None:
        n_dev = len(jax.devices())
        mode_ax = 2 if n_dev % 2 == 0 else 1
        mesh = make_mesh({"draw": n_dev // mode_ax, "mode": mode_ax})
    if num_modes % mesh.shape["mode"]:
        raise ValueError("num_modes must divide the 'mode' mesh axis")

    key = jax.random.PRNGKey(seed)
    k_data, k_fit, k_draw = jax.random.split(key, 3)

    ckpt_path = (
        os.path.join(checkpoint_dir, "scaled_fit_stage")
        if checkpoint_dir
        else None
    )
    resumed = None
    if ckpt_path and os.path.isdir(ckpt_path):
        state, meta = load_checkpoint(ckpt_path)
        if meta.get("shape") == [n_space, n_snapshots, num_modes, seed]:
            resumed = state

    t_all = jnp.linspace(0.0, 1.0, n_snapshots)
    sample_idx = jnp.sort(
        jax.random.choice(k_fit, n_snapshots, (num_gp_samples,), replace=False)
    )
    ts = t_all[sample_idx]
    mode_sharding = NamedSharding(mesh, P("mode"))

    if resumed is not None:
        Y = jax.device_put(
            jnp.asarray(resumed["Y"]), NamedSharding(mesh, P("mode", None))
        )
        svdvals = jnp.asarray(resumed["svdvals"])
        sigma2, ell, chi = (
            jax.device_put(jnp.asarray(resumed[k]), mode_sharding)
            for k in ("sigma2", "ell", "chi")
        )
    else:
        # --- distributed POD: spatial axis sharded over the whole mesh -------
        # The (n_space x n_snapshots) snapshot matrix is sharded over BOTH
        # mesh axes combined — on a v5e-8 every chip holds n_space/8 rows,
        # and the Gram contraction psums over ICI (SURVEY.md section 2d).
        space_axes = tuple(mesh.axis_names)
        states = _synthetic_states(k_data, n_space, n_snapshots, num_modes)
        centered = states - jnp.mean(states, axis=1, keepdims=True)
        basis, svdvals = sharded_gram_pod(
            centered, num_modes, mesh=mesh, row_axis=space_axes
        )
        compressed = basis.T @ centered  # (r, k): psum over sharded n

        # --- GP fits: modes sharded (model-parallel) --------------------------
        Y = compressed[:, sample_idx]  # (r, m)
        Y = jax.lax.with_sharding_constraint(
            Y, NamedSharding(mesh, P("mode", None))
        )

        box = BoxTransform.from_bounds((1e-5, 1e5), (1e-3, 1e2), (1e-10, 1e2))
        fit = fit_gp_hyperparameters(
            ts, Y, box, jax.random.fold_in(k_fit, 1),
            n_restarts=n_restarts, adam_steps=60, polish_iters=10,
        )
        sigma2, ell, chi = fit.sigma2, fit.ell, fit.chi
        if ckpt_path:
            save_checkpoint(
                ckpt_path,
                pipeline_stage_state(
                    Y=Y, svdvals=svdvals, sigma2=sigma2, ell=ell, chi=chi
                ),
                metadata={"shape": [n_space, n_snapshots, num_modes, seed]},
            )

    t_est = jnp.linspace(0.0, 1.0, num_regression_points)
    ests = jax.jit(
        jax.vmap(
            lambda y, s2, l, c: gp_estimates(ts, y, t_est, s2, l, c, eta=1e-8)
        ),
        in_shardings=(
            NamedSharding(mesh, P("mode", None)),
            mode_sharding,
            mode_sharding,
            mode_sharding,
        ),
    )(Y, sigma2, ell, chi)

    # --- regression + draw-sharded screening ---------------------------------
    # The weighted factorization shards the m' rows over "draw" and the r
    # problems over "mode" — the m'-scaling (sequence-parallel) path.
    from functools import partial

    from ..parallel.sharded import tall_skinny_svd

    rom = GalerkinROM("cAH", state_dimension=num_modes, substeps=2)
    D = rom.data_matrix(ests.state_estimate)[None]
    fac = weighted_lstsq_fit(
        D, ests.sqrtW[:, None], ests.ddt_estimate[:, None],
        svd_fn=partial(
            tall_skinny_svd, mesh=mesh, spec=("mode", "draw", None)
        ),
    )

    states_est = ests.state_estimate
    shift = jnp.mean(states_est, axis=1)
    limits = 5.0 * jnp.max(jnp.abs(states_est - shift[:, None]), axis=1)
    q0 = states_est[:, 0]
    grid = jnp.asarray(np.logspace(-12, 6, grid_size))

    draw_sharding = NamedSharding(mesh, P("draw", None, None))

    @jax.jit
    def candidate_errors(keys):
        def one(lam, k):
            ohats = fac.sample(lam, k, 8)
            ohats = jax.lax.with_sharding_constraint(ohats, draw_sharding)
            sols = jax.vmap(lambda O: rom.predict(O, q0, t_est))(ohats)
            stable = jnp.all(stability_mask(sols, shift, limits))
            err = jnp.linalg.norm(jnp.mean(sols, axis=0) - states_est)
            err = err / jnp.linalg.norm(states_est)
            return jnp.where(stable & jnp.isfinite(err), err, 1e12)

        return jax.vmap(one)(grid, keys)

    errs = candidate_errors(jax.random.split(k_draw, grid_size))
    if bool(jnp.all(errs >= 1e12)):
        raise ValueError(
            "scaled grid search failed: every candidate unstable "
            "(extend the grid or increase num_regression_points)"
        )
    lam = grid[jnp.argmin(errs)]

    @jax.jit
    def final_ensemble(key):
        ohats = fac.sample(lam, key, ndraws)
        ohats = jax.lax.with_sharding_constraint(ohats, draw_sharding)
        sols = jax.vmap(lambda O: rom.predict(O, q0, t_est))(ohats)
        ok = stability_mask(sols, shift, limits)
        acc = jnp.sum(jnp.where(ok[:, None, None], sols, 0.0), axis=0)
        return acc / jnp.maximum(jnp.sum(ok), 1), jnp.mean(ok)

    with mesh:
        mean_traj, frac = final_ensemble(jax.random.fold_in(k_draw, 7))

    return ScaledResult(
        num_modes=num_modes,
        regularizer=float(lam),
        ensemble_mean=np.asarray(mean_traj),
        stable_fraction=float(frac),
        svdvals=np.asarray(svdvals),
    )
