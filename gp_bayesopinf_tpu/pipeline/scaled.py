"""Scaled GP-BayesOpInf configuration on a device mesh.

The north-star scaled workload (BASELINE.json): an Euler-like problem with
r = 30 POD modes, O(10k) snapshot columns, large spatial DOF — run with

* the POD basis from a randomized range finder whose tall matmuls shard
  the spatial axis over the mesh (``parallel.sharded.randomized_pod``),
* GP hyperparameter fits batched over modes and sharded over the "mode"
  axis (model-parallel),
* posterior draws / regularization candidates sharded over the "draw"
  axis (data-parallel),
* the regression factorization's long m' axis sharded over "draw"
  (sequence-parallel, ``parallel.sharded.tall_skinny_svd``).

Precision follows the hybrid policy (``utils.hostmath``): all large,
batched work runs in f32 on the accelerator mesh; every numerically
critical factorization (GP estimation Cholesky factors, weighted
triangular solves, small eigendecompositions) runs in true f64 on the
host CPU device. TPU-emulated f64 is never used — it is both slow
(minutes-long compiles) and loose (~1e-2 matmul error measured).

``run_scaled`` is size-parameterized so the same code path runs as an
8-virtual-device CPU test (tiny sizes) and as the real v5e workload.
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
from ..parallel.sharded import randomized_pod, tall_skinny_svd
from ..rom.model import GalerkinROM
from ..solve.lstsq import WeightedLSTSQ
from ..solve.ivp import stability_mask
from ..utils.hostmath import host_device, host_jit


@dataclasses.dataclass
class ScaledResult:
    num_modes: int
    regularizer: float
    ensemble_mean: np.ndarray  # (r, k_pred)
    stable_fraction: float
    svdvals: np.ndarray
    train_error: float = float("nan")  # rel. error of ensemble mean vs GP estimates
    grid: Optional[np.ndarray] = None  # candidate regularizers
    grid_errors: Optional[np.ndarray] = None  # 1e12 = rejected (unstable)
    regularizer_quad: Optional[float] = None  # blocked mode: lambda on H
    time_windows: int = 1
    window_regularizers: Optional[np.ndarray] = None  # (W,) per-window lambda
    window_error: float = float("nan")  # re-anchored per-window reconstruction


def _synthetic_states(key, n: int, k: int, num_modes: int, dtype=jnp.float32):
    """Low-rank snapshots from a stable latent LINEAR system lifted to the
    full spatial dimension.

    The latent dynamics are damped rotation pairs

        q_{2p}' = -gamma_p q_{2p} - omega_p q_{2p+1},
        q_{2p+1}' = omega_p q_{2p} - gamma_p q_{2p+1},

    with a DISTINCT harmonic frequency ladder omega_p = 2 pi (p+1) * 0.8 —
    every mode completes a different number of periods over t in [0, 1],
    so the latent trajectory has true numerical rank = num_modes (similar
    low frequencies over a fraction of a period would collapse the
    spectrum to rank ~4 and leave the trailing POD modes pure noise,
    which poisons the 5x-amplitude stability envelopes downstream). The
    dynamics are exactly representable by the quadratic "cAH" ROM
    (c = 0, H = 0, block-diagonal A), so the full pipeline exercises
    meaningfully at any size."""
    k2, k3 = jax.random.split(key, 2)
    r_true = num_modes
    t = jnp.linspace(0.0, 1.0, k, dtype=dtype)
    comps = []
    for p in range(r_true // 2 + 1):
        omega = 2.0 * jnp.pi * (p + 1) * 0.8
        gamma = 0.2 + 0.1 * (p % 5)
        amp = (p + 1.0) ** -0.5
        damp = amp * jnp.exp(-gamma * t)
        comps.append(damp * jnp.cos(omega * t))
        comps.append(damp * jnp.sin(omega * t))
    latent = jnp.stack(comps[:r_true]).astype(dtype)
    # Near-orthogonal random lift (cheap at large n; exact orthogonality
    # is unnecessary — POD re-orthogonalizes).
    B = jax.random.normal(k2, (n, r_true), dtype=dtype) / jnp.sqrt(
        jnp.asarray(n, dtype)
    )
    states = B @ latent
    noise = 0.003 * jax.random.normal(k3, states.shape, dtype=dtype)
    return states + noise


def _euler_states(
    key,
    n: int,
    k: int,
    noiselevel: float = 0.002,
    t_final: float = 0.06,
    dtype=jnp.float32,
):
    """Physical snapshots: the reference's Euler FOM scaled up.

    n = 3 * nx lifted DOF ([v, p, 1/rho] on an nx-cell periodic grid;
    n = 6000 -> nx = 2000, ten times the reference flagship's 200 cells,
    ``PDEs/config_euler.py:43-96``), k output snapshots over the
    reference's TRAINING span t in [0, ``t_final``] = [0, 0.06] by
    default (mapped onto the pipeline's unit time axis — a constant rate
    factor the learned operators absorb). The span matters physically:
    over [0, 0.06] the waves are smooth and the quadratic "cAH" closure
    is learnable (2.8% train error at r=8 mid-size); by t ~ 0.15 they
    steepen toward shocks and NO regularizer stabilizes an accurate
    quadratic ROM (round-3 study: every lambda < 4e3 rejected, 135%
    error at the shrinkage floor). The reference makes exactly this
    choice — it trains on [0, 0.06] and treats later times as
    extrapolation (``PDEs/config_euler.py``). The FOM
    integrates in f64 on the host CPU device (CFL-resolved upwind RK4,
    ``models/euler.py``); each lifted variable block is scaled to O(1)
    by its max magnitude — the reference's scaled-POD semantics
    (``PDEs/step2_fitgps.py`` MinMax scaling) — so POD treats v ~ 1e2,
    p ~ 1e5, and 1/rho ~ 5e-2 democratically. Multiplicative noise at
    ``noiselevel`` mirrors the reference's snapshot corruption.
    """
    from ..models.euler import Euler

    if n % 3:
        raise ValueError("euler data source needs n_space divisible by 3")
    nx = n // 3
    model = Euler(spatial_domain=np.linspace(0.0, 2.0, nx + 1)[:-1])
    ics = model.initial_conditions((22.0, 20.0, 24.0, 95.0, 105.0, 100.0))
    t_phys = np.linspace(0.0, t_final, k)
    with jax.default_device(jax.devices("cpu")[0]):
        sol = model.solve(jnp.asarray(np.asarray(ics), jnp.float64), t_phys)
        sol = np.asarray(sol)
    blocks = np.split(sol, 3, axis=0)
    scaled = np.concatenate(
        [b / np.max(np.abs(b)) for b in blocks], axis=0
    )
    noise = noiselevel * np.asarray(
        jax.random.normal(key, scaled.shape, jnp.float32)
    )
    return jnp.asarray(scaled * (1.0 + noise), dtype)


def run_scaled(
    mesh: Optional[Mesh] = None,
    n_space: int = 6000,
    n_snapshots: int = 10000,
    num_modes: int = 30,
    num_gp_samples: int = 512,
    num_regression_points: int = 2048,
    n_restarts: int = 32,
    ndraws: int = 256,
    grid_size: int = 16,
    seed: int = 0,
    modelform: str = "cA",
    verbose: bool = False,
    checkpoint_dir: Optional[str] = None,
    envelope_floor: float = 0.02,
    weight_method: str = "auto",
    data_source: str = "synthetic",
    regularization: str = "scalar",
    time_windows: int = 1,
) -> ScaledResult:
    """Run the sharded scaled pipeline end to end.

    Defaults are the production scale; tests call with tiny sizes.
    With ``checkpoint_dir``, the expensive front half (data generation,
    sharded POD, GP fit) checkpoints its outputs and a rerun resumes from
    them (``io.checkpoint``, orbax-backed).

    ``envelope_floor`` relaxes the reference's strict per-variable
    5x-amplitude stability rule by flooring each mode's envelope at this
    fraction of the largest mode's envelope (trailing POD modes smoothed
    to near-flat otherwise reject every draw); pass 0.0 for the strict
    reference semantics (``PDEs/step3_estimate.py:64-73``).

    ``weight_method`` selects the weight-root factorization (SURVEY §2e):
    "chol" = dense host Cholesky of C + eta I per mode (O(r m'^3));
    "lowrank" = rank-adaptive pivoted-Cholesky + Woodbury root
    (``gp.lowrank``, O(r m' p^2) — the m'-scaling path); "auto" picks
    lowrank at m' >= 1024. Lowrank falls back to the dense eigh root for
    any mode whose covariance is not numerically low rank.

    ``data_source``: "synthetic" = rank-r damped-rotation snapshots
    (``_synthetic_states``); "euler" = the reference's Euler FOM scaled
    to n_space = 3 * nx lifted DOF (``_euler_states``) — the physical
    quadratic-dynamics variant of the north-star run.

    ``regularization``: "scalar" = the reference's single-lambda ridge
    search (``PDEs/step3_estimate.py`` semantics); "blocked" = the
    two-parameter per-operator-block Tikhonov (lambda_1 on c/A/B columns,
    lambda_2 on the quadratic H block) searched over a 2-D grid with the
    same 20-draw screen — the classic OpInf stabilizer for draw-marginal
    quadratic ROMs, built on the reference's
    ``opinf.lstsq.TikhonovSolver`` diagonal surface
    (``codebase/wlstsq.py:179-181``; ``solve.lstsq.TikhonovLSTSQ``).
    Requires "H" in ``modelform``.

    ``time_windows``: W > 1 learns a SEPARATE quadratic ROM (own
    regression + own regularization search) on each of W contiguous
    sub-spans of the training window — the time-windowed OpInf lever for
    draw-marginal problems where no single global regularizer stabilizes
    an accurate model (BASELINE.md "Per-block Tikhonov search" analysis:
    the GP ddt posterior widens relative to mode curvature until every
    draw violates the 5x envelope somewhere in the FULL k-step screen;
    windowing divides the screen horizon by W and lets shrinkage adapt
    to each sub-span's dynamics). TPU-first shape: all W windows share
    one (window x candidate x draw)-batched screening program — W x
    fewer sequential integration steps and W x more parallelism — and a
    vectorized golden-section refinement polishes every window's lambda
    simultaneously (one program call evaluates all W objectives).
    ``train_error`` reports the CHAINED rollout (window w's posterior
    ensemble starts from window w-1's ensemble-mean end state — the
    apples-to-apples comparison with W=1); ``window_error`` the
    re-anchored per-window reconstruction; ``window_regularizers`` the
    per-window selections. Currently scalar regularization only.
    """
    import os

    from ..utils.timing import TimedBlock

    tb = lambda msg: TimedBlock(msg, silent=not verbose)

    from ..io.checkpoint import (
        load_checkpoint,
        pipeline_stage_state,
        save_checkpoint,
    )

    if regularization not in ("scalar", "blocked"):
        raise ValueError(f"unknown regularization '{regularization}'")
    blocked = regularization == "blocked"
    if blocked and "H" not in modelform:
        raise ValueError(
            "regularization='blocked' separates the quadratic block; "
            f"modelform '{modelform}' has no H operator"
        )
    if time_windows < 1:
        raise ValueError("time_windows must be >= 1")
    if time_windows > 1:
        if blocked:
            raise ValueError(
                "time_windows > 1 supports scalar regularization only"
            )
        if num_regression_points % time_windows:
            raise ValueError(
                "num_regression_points must divide into time_windows"
            )

    if mesh is None:
        n_dev = len(jax.devices())
        mode_ax = 2 if n_dev % 2 == 0 else 1
        mesh = make_mesh({"draw": n_dev // mode_ax, "mode": mode_ax})
    if num_modes % mesh.shape["mode"]:
        raise ValueError("num_modes must divide the 'mode' mesh axis")

    f32 = jnp.float32
    f64 = jnp.float64
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
        if meta.get("shape") == [n_space, n_snapshots, num_modes, seed,
                                 data_source]:
            resumed = state

    t_all = np.linspace(0.0, 1.0, n_snapshots)
    sample_idx = np.sort(
        np.asarray(
            jax.random.choice(
                k_fit, n_snapshots, (num_gp_samples,), replace=False
            )
        )
    )
    ts = t_all[sample_idx]  # (m,) f64 host
    mode_sharding = NamedSharding(mesh, P("mode"))

    if resumed is not None:
        Y = jax.device_put(
            jnp.asarray(resumed["Y"], f32), NamedSharding(mesh, P("mode", None))
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
        # and the randomized range finder's contractions psum over ICI
        # (SURVEY.md section 2d). f32 on device; (l x l) factorizations on
        # the host in f64 inside randomized_pod.
        space_axes = tuple(mesh.axis_names)
        with tb("scaled: data generation"):
            states = (
                _euler_states(k_data, n_space, n_snapshots)
                if data_source == "euler"
                else _synthetic_states(
                    k_data, n_space, n_snapshots, num_modes
                )
            )
            states.block_until_ready()
        centered = states - jnp.mean(states, axis=1, keepdims=True)
        basis, svdvals = randomized_pod(
            centered,
            num_modes,
            mesh=mesh,
            row_axis=space_axes,
            key=jax.random.fold_in(k_data, 1),
        )
        compressed = basis.T @ centered  # (r, k): psum over sharded n

        # --- GP fits: modes sharded (model-parallel) --------------------------
        Y = compressed[:, sample_idx]  # (r, m)
        Y = jax.lax.with_sharding_constraint(
            Y, NamedSharding(mesh, P("mode", None))
        )

        box = BoxTransform.from_bounds((1e-5, 1e5), (1e-3, 1e2), (1e-10, 1e2))
        with tb("scaled: GP fit"):
            # Restarts are one vmapped batch on the accelerator —
            # effectively free. 8 restarts left ~10% of modes in the
            # 'all-noise' NLML local optimum at production scale.
            fit = fit_gp_hyperparameters(
                jnp.asarray(ts), Y, box, jax.random.fold_in(k_fit, 1),
                n_restarts=n_restarts, adam_steps=150, polish_iters=30,
            )
        sigma2, ell, chi = fit.sigma2, fit.ell, fit.chi
        if ckpt_path:
            save_checkpoint(
                ckpt_path,
                pipeline_stage_state(
                    Y=Y, svdvals=svdvals, sigma2=sigma2, ell=ell, chi=chi
                ),
                metadata={
                    "shape": [
                        n_space, n_snapshots, num_modes, seed, data_source
                    ]
                },
            )

    if time_windows > 1:
        return _windowed_tail(
            mesh=mesh,
            tb=tb,
            ts=ts,
            Y=Y,
            sigma2=sigma2,
            ell=ell,
            chi=chi,
            svdvals=svdvals,
            num_modes=num_modes,
            num_regression_points=num_regression_points,
            modelform=modelform,
            time_windows=time_windows,
            ndraws=ndraws,
            grid_size=grid_size,
            k_draw=k_draw,
            envelope_floor=envelope_floor,
            weight_method=weight_method,
        )

    # --- GP estimation: true-f64 factorizations on the host ------------------
    # method="chol": the weight root is the Cholesky factor of C + eta*I,
    # applied below via triangular solves — same weighted regression as the
    # reference's sqrtW without any (m' x m') eigendecomposition
    # (gp/estimates.py docstring; reference codebase/gpkernels.py:445-504).
    t_est = np.linspace(0.0, 1.0, num_regression_points)
    ts64 = jnp.asarray(ts, f64)
    t_est64 = jnp.asarray(t_est, f64)
    if weight_method == "auto":
        weight_method = (
            "lowrank" if num_regression_points >= 1024 else "chol"
        )
    if weight_method == "lowrank":
        # Rank-adaptive factored roots (gp/lowrank.py): O(m' p^2) per
        # mode instead of O(m'^3); pure NumPy f64 on the host.
        from ..gp.lowrank import lowrank_gp_estimates

        with tb("scaled: GP estimation (lowrank host f64)"):
            Y_np = np.asarray(jax.device_get(Y), np.float64)
            hyp_np = [
                np.asarray(jax.device_get(x), np.float64)
                for x in (sigma2, ell, chi)
            ]
            ests_lr = [
                lowrank_gp_estimates(
                    ts, Y_np[i], t_est, hyp_np[0][i], hyp_np[1][i],
                    hyp_np[2][i], eta=1e-8,
                )
                for i in range(num_modes)
            ]
            state_est_np = np.stack([e.state_estimate for e in ests_lr])
            ddt_est_np = np.stack([e.ddt_estimate for e in ests_lr])
    else:
        with tb("scaled: GP estimation (host f64)"):
            ests = host_jit(
                jax.vmap(
                    lambda y, s2, l, c: gp_estimates(
                        ts64, y, t_est64, s2, l, c, eta=1e-8, method="chol"
                    )
                )
            )(
                jnp.asarray(Y, f64),
                jnp.asarray(sigma2, f64),
                jnp.asarray(ell, f64),
                jnp.asarray(chi, f64),
            )
            ests.state_estimate.block_until_ready()

    # --- regression: host-f64 weighting + mesh-sharded f32 factorization -----
    # The weighted factorization shards the m' rows over "draw" and the r
    # problems over "mode" — the m'-scaling (sequence-parallel) path
    # (SURVEY.md section 2e). Triangular solves stay on the host (f64);
    # the Gram contraction of the (r, m', d) weighted data matrices runs
    # sharded on the mesh with its small (d x d) eigh back on the host.
    # Default structure "cA": the synthetic truth is linear (H = 0), so
    # the quadratic block is unidentifiable from data and scalar-lambda
    # shrinkage would have to kill A along with it — the honest Bayesian
    # answer, but a vacuous demo. "cAH" runs the same code with d ~ r^2/2
    # unknowns (exercised in tests).
    rom = GalerkinROM(modelform, state_dimension=num_modes, substeps=2)
    # Feature assembly stays on the host CPU device: an uncommitted f64
    # array would dispatch the quadratic-feature ops to the accelerator
    # in emulated f64 (slow, inaccurate — utils.hostmath policy).
    with jax.default_device(host_device()):
        if weight_method == "lowrank":
            state_estimate = jnp.asarray(state_est_np)
        else:
            state_estimate = ests.state_estimate
        D = rom.data_matrix(state_estimate)  # (m', d) f64 host
    if num_regression_points < D.shape[1]:
        raise ValueError(
            f"underdetermined regression: num_regression_points="
            f"{num_regression_points} < d={D.shape[1]} unknowns; raise "
            "num_regression_points (the m'-sharded factorization scales it)"
        )

    if weight_method == "lowrank":
        # Factored symmetric roots applied per mode: two thin matmuls
        # each, O(r m' p d) — the dense (m' x m') root never exists.
        with tb("scaled: weighting (lowrank host f64)"):
            D_np = np.asarray(D, np.float64)
            Dw = jnp.asarray(
                np.stack([e.root.apply(D_np) for e in ests_lr])
            )
            zw = jnp.asarray(
                np.stack(
                    [
                        e.root.apply(ddt_est_np[i])
                        for i, e in enumerate(ests_lr)
                    ]
                )
            )
    else:

        def _weight(L, Dmat, z):
            Db = jnp.broadcast_to(Dmat[None], (L.shape[0],) + Dmat.shape)
            Dw = jax.scipy.linalg.solve_triangular(L, Db, lower=True)
            zw = jax.scipy.linalg.solve_triangular(
                L, z[..., None], lower=True
            )
            return Dw, zw[..., 0]

        with tb("scaled: weighting (host f64)"):
            Dw, zw = host_jit(_weight)(
                ests.weight_root, D, ests.ddt_estimate
            )  # (r, m', d), (r, m') f64 host
            Dw.block_until_ready()

    with tb("scaled: TSQR factorization (sharded)"):
        U, S, V = tall_skinny_svd(
            jnp.asarray(Dw, f32), mesh=mesh, spec=("mode", "draw", None)
        )
        U.block_until_ready()
    zw32 = jax.device_put(
        jnp.asarray(zw, f32), NamedSharding(mesh, P("mode", "draw"))
    )
    Utz = jnp.einsum("rmd,rm->rd", U, zw32)
    fac = WeightedLSTSQ(U, S, V, Utz, jnp.asarray(Dw, f32), zw32)

    # --- draw-sharded screening (all-f32 on the mesh) -------------------------
    states_est = jax.device_put(
        jnp.asarray(state_estimate, f32),
        NamedSharding(mesh, P("mode", None)),
    )
    t_est32 = jnp.asarray(t_est, f32)
    shift = jnp.mean(states_est, axis=1)
    limits = 5.0 * jnp.max(jnp.abs(states_est - shift[:, None]), axis=1)
    # Floor the per-mode envelope at envelope_floor x the global mode
    # scale: trailing POD modes whose GP estimate is (correctly) smoothed
    # to near-flat would otherwise have a ~zero envelope that rejects
    # EVERY posterior draw. The reference's per-variable 5x rule
    # (PDEs/step3_estimate.py) never meets this because its r <= 8 modes
    # all carry signal; envelope_floor=0 restores the strict semantics.
    if envelope_floor:
        limits = jnp.maximum(limits, envelope_floor * jnp.max(limits))
    q0 = states_est[:, 0]
    grid = np.logspace(-12, 6, grid_size)
    grid32 = jnp.asarray(grid, f32)

    draw_sharding = NamedSharding(mesh, P("draw", None, None))

    if blocked:
        from ..rom.operators import operator_splits

        quad_mask_np = np.zeros(D.shape[1], bool)
        for name, a, b in operator_splits(modelform, num_modes):
            if name == "H":
                quad_mask_np[a:b] = True
        quad_mask = jnp.asarray(quad_mask_np)
        # Amortized normal equations: the O(M d^2) Gram contraction runs
        # once on the mesh; each (lambda_1, lambda_2) candidate then costs
        # one batched (r, d, d) Cholesky inside the screen.
        tik = jax.jit(fac.tikhonov)()
        jax.block_until_ready(tik)

        def sample_draws(params, key, n):
            gamma = jnp.where(quad_mask, params[1], params[0])
            return tik.sample(gamma, key, n)

    else:

        def sample_draws(params, key, n):
            return fac.sample(params, key, n)

    def candidate_errors_single(params, key):
        # 20-draw screen: the reference's candidate acceptance count
        # (PDEs/step3_estimate.py; bayes/regsearch.py default). One
        # objective shared by the grid phase and the refinement so the
        # two can never drift apart.
        ohats = sample_draws(params, key, 20)
        ohats = jax.lax.with_sharding_constraint(ohats, draw_sharding)
        sols = jax.vmap(lambda O: rom.predict(O, q0, t_est32))(ohats)
        stable = jnp.all(stability_mask(sols, shift, limits))
        err = jnp.linalg.norm(jnp.mean(sols, axis=0) - states_est)
        err = err / jnp.linalg.norm(states_est)
        return jnp.where(stable & jnp.isfinite(err), err, 1e12)

    if blocked:
        # 2-D candidate grid (lambda_1 x lambda_2), one row of lambda_2
        # values vmapped per lax.map step — grid_size^2 screens at the
        # memory footprint of one grid row. ONE shared draw key for every
        # candidate (deliberate divergence from the scalar search's
        # per-candidate keys, which mirror the reference's sequential RNG
        # stream): with grid_size^2 candidates, independent 20-draw
        # screens hand the argmin to lucky-key corners of the (l1, l2)
        # plane; a common xi makes the screen a smooth deterministic
        # surface of the pair, so the argmin is a property of the
        # regularizer, not of the key schedule. The refinement below then
        # polishes under the SAME key, comparing like with like.
        pairs = jnp.stack(
            jnp.meshgrid(grid32, grid32, indexing="ij"), axis=-1
        )  # (g, g, 2)

        candidate_errors = jax.jit(
            lambda keys: jax.lax.map(
                lambda pk: jax.vmap(candidate_errors_single)(*pk),
                (pairs, keys),
            )
        )
        screen_keys = jnp.broadcast_to(
            jax.random.fold_in(k_draw, 101),
            (grid_size, grid_size) + k_draw.shape,
        )
    else:
        candidate_errors = jax.jit(
            lambda keys: jax.vmap(candidate_errors_single)(grid32, keys)
        )
        screen_keys = jax.random.split(k_draw, grid_size)

    with tb("scaled: regularization screening"):
        errs = candidate_errors(screen_keys)
        errs.block_until_ready()
    errs_np = np.asarray(errs)
    if bool(jnp.all(errs >= 1e12)):
        raise ValueError(
            "scaled grid search failed: every candidate unstable "
            "(extend the grid or increase num_regression_points)"
        )

    # Bounded log-space refinement of the same 20-draw objective under a
    # frozen key (bayes/regsearch.py semantics with one deliberate
    # divergence: an endpoint winner keeps the grid value instead of
    # widening the bounds — the scaled demo's grid spans 18 decades, so
    # an endpoint means the problem, not the grid, is mis-scaled). The
    # grid winner is RE-EVALUATED under the refine key so acceptance
    # compares like with like rather than across different draw keys.
    import scipy.optimize

    refine_key = jax.random.fold_in(k_draw, 101)
    single = jax.jit(
        lambda p: candidate_errors_single(jnp.asarray(p, f32), refine_key)
    )

    if blocked:
        # The 2-D surface is coarse (grid cells span multiple decades), so
        # a single local polish under-explores: the best diagonal
        # (lambda_1 = lambda_2, i.e. scalar-ridge) point routinely beats a
        # mediocre off-diagonal grid winner after its own 1-D refinement.
        # Strategy: (a) polish the DIAGONAL with the scalar search's
        # bounded 1-D minimization — the scalar-quality floor; (b) run
        # Nelder-Mead from the 2-D grid winner and from the polished
        # diagonal, each clipped to a +-1-cell box; (c) keep the best of
        # all endpoints under the one shared screen key.
        cell = np.log10(grid[1]) - np.log10(grid[0])

        def nm_polish(x0_log, lo, hi):
            def obj(logl):
                logl = np.clip(logl, lo, hi)
                return float(single(10.0 ** np.asarray(logl, np.float32)))

            opt = scipy.optimize.minimize(
                obj,
                x0=x0_log,
                method="Nelder-Mead",
                options={"maxfev": 40, "xatol": 1e-2, "fatol": 1e-4},
            )
            return np.clip(opt.x, lo, hi), float(opt.fun)

        with tb("scaled: regularization refinement"):
            i1, i2 = np.unravel_index(
                int(np.argmin(errs_np)), errs_np.shape
            )
            cands = [
                (
                    np.log10([grid[i1], grid[i2]]),
                    float(errs_np[i1, i2]),
                )
            ]
            # (a) diagonal 1-D polish between the best diagonal cell's
            # neighbors (the scalar-search semantics under the shared key).
            idiag = int(np.argmin(np.diagonal(errs_np)))
            dlo = np.log10(grid[max(idiag - 1, 0)])
            dhi = np.log10(grid[min(idiag + 1, grid_size - 1)])
            dopt = scipy.optimize.minimize_scalar(
                lambda l: float(
                    single(np.asarray([10.0**l, 10.0**l], np.float32))
                ),
                bounds=(dlo, dhi),
                method="bounded",
                options={"maxiter": 20, "xatol": 1e-2},
            )
            if np.isfinite(dopt.fun):
                cands.append(
                    (np.asarray([dopt.x, dopt.x]), float(dopt.fun))
                )
            # (b) 2-D Nelder-Mead from each distinct start.
            for x0_log, _ in list(cands):
                lo, hi = x0_log - cell, x0_log + cell
                xe, fe = nm_polish(np.asarray(x0_log, np.float64), lo, hi)
                if np.isfinite(fe):
                    cands.append((xe, fe))
            best_log, _ = min(cands, key=lambda c: c[1])
        params = jnp.asarray(10.0**best_log, f32)
    else:
        ibest = int(np.argmin(errs_np))
        params = grid32[ibest]
        if 0 < ibest < grid_size - 1:

            def obj(loglam):
                return float(single(10.0**loglam))

            with tb("scaled: regularization refinement"):
                best_refkey = float(single(params))
                opt = scipy.optimize.minimize_scalar(
                    obj,
                    bounds=(
                        np.log10(grid[ibest - 1]),
                        np.log10(grid[ibest + 1]),
                    ),
                    method="bounded",
                    options={"maxiter": 20, "xatol": 1e-2},
                )
            if np.isfinite(opt.fun) and opt.fun < best_refkey:
                params = jnp.asarray(10.0**opt.x, f32)

    @jax.jit
    def final_ensemble(key):
        ohats = sample_draws(params, key, ndraws)
        ohats = jax.lax.with_sharding_constraint(ohats, draw_sharding)
        sols = jax.vmap(lambda O: rom.predict(O, q0, t_est32))(ohats)
        ok = stability_mask(sols, shift, limits)
        acc = jnp.sum(jnp.where(ok[:, None, None], sols, 0.0), axis=0)
        return acc / jnp.maximum(jnp.sum(ok), 1), jnp.mean(
            ok.astype(f32)
        )

    with tb("scaled: posterior ensemble"), mesh:
        mean_traj, frac = final_ensemble(jax.random.fold_in(k_draw, 7))
        mean_traj.block_until_ready()

    mean_np = np.asarray(mean_traj)
    se_np = np.asarray(states_est)
    train_error = float(
        np.linalg.norm(mean_np - se_np) / np.linalg.norm(se_np)
    )
    params_np = np.atleast_1d(np.asarray(params, np.float64))
    return ScaledResult(
        num_modes=num_modes,
        regularizer=float(params_np[0]),
        ensemble_mean=mean_np,
        stable_fraction=float(frac),
        svdvals=np.asarray(svdvals),
        train_error=train_error,
        grid=grid,
        grid_errors=errs_np,
        regularizer_quad=float(params_np[1]) if blocked else None,
    )


def _windowed_tail(
    mesh,
    tb,
    ts,
    Y,
    sigma2,
    ell,
    chi,
    svdvals,
    num_modes,
    num_regression_points,
    modelform,
    time_windows,
    ndraws,
    grid_size,
    k_draw,
    envelope_floor,
    weight_method,
) -> ScaledResult:
    """Time-windowed back half of ``run_scaled`` (W separate ROMs).

    The GP is GLOBAL — hyperparameters were fit once on the full-span
    samples and every window's estimates condition on all of them — only
    the operator regression, regularization search, and posterior
    ensemble are per-window. All W windows ride one batched program at
    every stage: estimation vmaps (window x mode), the weighted
    factorization stacks W*r row problems through the same mesh-sharded
    TSQR as the global path, and the screen evaluates
    (candidate x draw x window) in a single fused graph whose sequential
    depth is m'/W integration steps instead of m'. Per-window lambda
    selection is exact because windows are INDEPENDENT row problems: the
    (grid x W) error table from the joint screen is argmin'd per column,
    then a vectorized golden-section polish descends all W bounded
    refinements in lockstep (each iteration = one program call under the
    scalar search's frozen-key semantics, ``bayes/regsearch.py``).
    """
    f32, f64 = jnp.float32, jnp.float64
    W = time_windows
    r = num_modes
    mw = num_regression_points // W
    rom = GalerkinROM(modelform, state_dimension=num_modes, substeps=2)

    t_est = np.linspace(0.0, 1.0, num_regression_points)
    tw = t_est.reshape(W, mw)  # (W, mw) window time grids
    ts64 = jnp.asarray(ts, f64)

    if weight_method == "auto":
        weight_method = "lowrank" if mw >= 1024 else "chol"

    # --- GP estimation per window (host f64), conditioning on ALL samples ----
    if weight_method == "lowrank":
        from ..gp.lowrank import lowrank_gp_estimates

        with tb("scaled[w]: GP estimation (lowrank host f64)"):
            Y_np = np.asarray(jax.device_get(Y), np.float64)
            hyp = [
                np.asarray(jax.device_get(x), np.float64)
                for x in (sigma2, ell, chi)
            ]
            roots = []
            state_np = np.empty((W, r, mw))
            ddt_np = np.empty((W, r, mw))
            for w in range(W):
                row = []
                for i in range(r):
                    e = lowrank_gp_estimates(
                        ts, Y_np[i], tw[w], hyp[0][i], hyp[1][i], hyp[2][i],
                        eta=1e-8,
                    )
                    state_np[w, i] = e.state_estimate
                    ddt_np[w, i] = e.ddt_estimate
                    row.append(e.root)
                roots.append(row)
        state_est64 = jnp.asarray(state_np)
        ddt_est64 = jnp.asarray(ddt_np)
        weight_root = None
    else:
        est_fn = host_jit(
            jax.vmap(  # windows
                jax.vmap(  # modes
                    lambda y, s2, l, c, te: gp_estimates(
                        ts64, y, te, s2, l, c, eta=1e-8, method="chol"
                    ),
                    in_axes=(0, 0, 0, 0, None),
                ),
                in_axes=(None, None, None, None, 0),
            )
        )
        with tb("scaled[w]: GP estimation (host f64)"):
            ests = est_fn(
                jnp.asarray(Y, f64),
                jnp.asarray(sigma2, f64),
                jnp.asarray(ell, f64),
                jnp.asarray(chi, f64),
                jnp.asarray(tw, f64),
            )
            ests.state_estimate.block_until_ready()
        state_est64 = ests.state_estimate  # (W, r, mw)
        ddt_est64 = ests.ddt_estimate
        weight_root = ests.weight_root  # (W, r, mw, mw) Cholesky factors

    # --- per-window data matrices + weighting (host f64) ---------------------
    with jax.default_device(host_device()):
        D = jnp.stack(
            [rom.data_matrix(state_est64[w]) for w in range(W)]
        )  # (W, mw, d)
    d = D.shape[-1]
    if mw < d:
        raise ValueError(
            f"underdetermined window regression: m'/W={mw} < d={d} "
            "unknowns; raise num_regression_points or lower time_windows"
        )

    if weight_method == "lowrank":
        with tb("scaled[w]: weighting (lowrank host f64)"):
            D_np = np.asarray(D, np.float64)
            Dt = np.stack(
                [
                    np.stack([roots[w][i].apply(D_np[w]) for i in range(r)])
                    for w in range(W)
                ]
            )  # (W, r, mw, d)
            zt = np.stack(
                [
                    np.stack(
                        [roots[w][i].apply(ddt_np[w, i]) for i in range(r)]
                    )
                    for w in range(W)
                ]
            )  # (W, r, mw)
            Dt, zt = jnp.asarray(Dt), jnp.asarray(zt)
    else:

        def _weight_w(L, Dmat, z):
            Db = jnp.broadcast_to(Dmat[None], (L.shape[0],) + Dmat.shape)
            Dw_ = jax.scipy.linalg.solve_triangular(L, Db, lower=True)
            zw_ = jax.scipy.linalg.solve_triangular(
                L, z[..., None], lower=True
            )
            return Dw_, zw_[..., 0]

        with tb("scaled[w]: weighting (host f64)"):
            Dt, zt = host_jit(jax.vmap(_weight_w))(
                weight_root, D, ddt_est64
            )  # (W, r, mw, d), (W, r, mw)
            Dt.block_until_ready()

    # --- one factorization for all W*r row problems (mesh-sharded TSQR) ------
    Dt_flat = jnp.asarray(Dt, f32).reshape(W * r, mw, d)
    zt_flat = jnp.asarray(zt, f32).reshape(W * r, mw)
    with tb("scaled[w]: TSQR factorization (sharded)"):
        U, S, V = tall_skinny_svd(
            Dt_flat, mesh=mesh, spec=("mode", "draw", None)
        )
        U.block_until_ready()
    zt_flat = jax.device_put(
        zt_flat, NamedSharding(mesh, P("mode", "draw"))
    )
    Utz = jnp.einsum("rmd,rm->rd", U, zt_flat)
    fac = WeightedLSTSQ(U, S, V, Utz, Dt_flat, zt_flat)

    # --- screening: (candidate x draw x window) in one fused program ---------
    states_w32 = jnp.asarray(state_est64, f32)  # (W, r, mw)
    states_full = jnp.swapaxes(states_w32, 0, 1).reshape(r, W * mw)
    tw32 = jnp.asarray(tw, f32)
    q0s = states_w32[:, :, 0]  # (W, r) per-window GP-estimate ICs
    shift = jnp.mean(states_full, axis=1)
    limits = 5.0 * jnp.max(
        jnp.abs(states_full - shift[:, None]), axis=1
    )
    if envelope_floor:
        limits = jnp.maximum(limits, envelope_floor * jnp.max(limits))
    grid = np.logspace(-12, 6, grid_size)
    grid32 = jnp.asarray(grid, f32)
    draw_sharding = NamedSharding(mesh, P("draw", None, None, None))
    wnorm = jnp.linalg.norm(states_w32, axis=(1, 2))  # (W,)

    def _integrate(ohat):
        """(n, W, r, d) operator draws -> (n, W, r, mw) window rollouts."""
        ohat = jax.lax.with_sharding_constraint(ohat, draw_sharding)
        per_window = jax.vmap(rom.predict, in_axes=(0, 0, 0))
        return jax.vmap(per_window, in_axes=(0, None, None))(
            ohat, q0s, tw32
        )

    def window_errors(lams, key):
        """(W,) screen errors for per-window scalar ridges ``lams``.

        Window independence: row problem (w, i) only sees lams[w], and
        window w's 20-draw rollout only uses its own rows — so entry w of
        the result is window w's objective regardless of the other
        entries, and one call evaluates W objectives at once.
        """
        lam_rows = jnp.repeat(lams, r)  # (W*r,)
        ohat = fac.sample(lam_rows, key, 20).reshape(20, W, r, d)
        sols = _integrate(ohat)
        ok = stability_mask(sols, shift, limits)  # (20, W)
        stable = jnp.all(ok, axis=0)
        err = jnp.linalg.norm(
            jnp.mean(sols, axis=0) - states_w32, axis=(1, 2)
        ) / wnorm
        return jnp.where(stable & jnp.isfinite(err), err, 1e12)

    candidate_errors = jax.jit(
        jax.vmap(lambda lam, key: window_errors(
            jnp.broadcast_to(lam, (W,)), key
        ))
    )
    screen_keys = jax.random.split(k_draw, grid_size)
    with tb("scaled[w]: regularization screening"):
        errs = candidate_errors(grid32, screen_keys)  # (grid, W)
        errs.block_until_ready()
    errs_np = np.asarray(errs)
    dead = np.all(errs_np >= 1e12, axis=0)
    if dead.any():
        raise ValueError(
            f"windowed grid search failed: every candidate unstable in "
            f"window(s) {np.flatnonzero(dead).tolist()} (extend the grid "
            "or increase num_regression_points)"
        )

    # --- vectorized bounded refinement (frozen key, all windows at once) -----
    refine_key = jax.random.fold_in(k_draw, 101)
    single = jax.jit(lambda lams: window_errors(lams, refine_key))

    ibest = np.argmin(errs_np, axis=0)  # (W,)
    lam_best = grid[ibest]
    with tb("scaled[w]: regularization refinement"):
        best_val = np.array(single(jnp.asarray(lam_best, f32)))
        best_lam = lam_best.copy()
        active = (ibest > 0) & (ibest < grid_size - 1)
        logbest = np.log10(lam_best)
        a = np.where(active, np.log10(grid[np.maximum(ibest - 1, 0)]),
                     logbest)
        b = np.where(
            active,
            np.log10(grid[np.minimum(ibest + 1, grid_size - 1)]),
            logbest,
        )
        invphi = (np.sqrt(5.0) - 1.0) / 2.0

        def _eval(logl):
            v = np.asarray(single(jnp.asarray(10.0**logl, f32)))
            take = v < best_val
            best_val[take] = v[take]
            best_lam[take] = (10.0**logl)[take]
            return v

        c = b - invphi * (b - a)
        dpt = a + invphi * (b - a)
        fc, fd = _eval(c), _eval(dpt)
        for _ in range(12):
            left = fc < fd
            a = np.where(left, a, c)
            b = np.where(left, dpt, b)
            new_c = b - invphi * (b - a)
            new_d = a + invphi * (b - a)
            x = np.where(left, new_c, new_d)
            fx = _eval(x)
            c, dpt, fc, fd = (
                np.where(left, new_c, dpt),
                np.where(left, c, new_d),
                np.where(left, fx, fd),
                np.where(left, fc, fx),
            )
    lams = jnp.asarray(best_lam, f32)
    lam_rows = jnp.repeat(lams, r)

    # --- final ensembles: re-anchored reconstruction + chained rollout -------
    @jax.jit
    def final_ensemble(key):
        ohat = fac.sample(lam_rows, key, ndraws).reshape(ndraws, W, r, d)
        sols = _integrate(ohat)  # (n, W, r, mw)
        ok = stability_mask(sols, shift, limits)  # (n, W)
        acc = jnp.sum(
            jnp.where(ok[:, :, None, None], sols, 0.0), axis=0
        )
        means = acc / jnp.maximum(
            jnp.sum(ok, axis=0)[:, None, None], 1
        )
        return means, jnp.mean(ok.astype(f32))

    with tb("scaled[w]: posterior ensemble"), mesh:
        means_w, frac = final_ensemble(jax.random.fold_in(k_draw, 7))
        means_w.block_until_ready()

    mean_full = jnp.swapaxes(means_w, 0, 1).reshape(r, W * mw)
    se_np = np.asarray(states_full)
    window_error = float(
        np.linalg.norm(np.asarray(mean_full) - se_np)
        / np.linalg.norm(se_np)
    )

    @jax.jit
    def chain_window(O_w, qc, t_w):
        sols = jax.vmap(lambda O: rom.predict(O, qc, t_w))(O_w)
        ok = stability_mask(sols, shift, limits)
        acc = jnp.sum(jnp.where(ok[:, None, None], sols, 0.0), axis=0)
        mean = acc / jnp.maximum(jnp.sum(ok), 1)
        return mean, mean[:, -1]

    with tb("scaled[w]: chained rollout"), mesh:
        ohat_chain = fac.sample(
            lam_rows, jax.random.fold_in(k_draw, 8), ndraws
        ).reshape(ndraws, W, r, d)
        # Replicate the chain state on the mesh: states_full is committed
        # to one device while the draws are mesh-sharded.
        qc = jax.device_put(states_full[:, 0], NamedSharding(mesh, P()))
        chain_means = []
        for w in range(W):
            mean_w, qc = chain_window(ohat_chain[:, w], qc, tw32[w])
            chain_means.append(mean_w)
        chain_full = jnp.concatenate(chain_means, axis=1)
        chain_full.block_until_ready()
    train_error = float(
        np.linalg.norm(np.asarray(chain_full) - se_np)
        / np.linalg.norm(se_np)
    )

    lams_np = np.asarray(lams, np.float64)
    return ScaledResult(
        num_modes=num_modes,
        # geometric mean of the per-window selections (the search is
        # log-space); the full vector is window_regularizers.
        regularizer=float(np.exp(np.mean(np.log(lams_np)))),
        ensemble_mean=np.asarray(chain_full),
        stable_fraction=float(frac),
        svdvals=np.asarray(svdvals),
        train_error=train_error,
        grid=grid,
        grid_errors=errs_np,
        time_windows=W,
        window_regularizers=lams_np,
        window_error=window_error,
    )
