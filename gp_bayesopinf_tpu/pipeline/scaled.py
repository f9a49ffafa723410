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

One assembly path serves every configuration: the global run is the
W = 1 case of the time-windowed machinery (GP estimation, weighting,
and the mesh-sharded TSQR are batched over a leading window axis; the
regularization screen evaluates (candidate x draw x window) in one
fused program). ``run_scaled`` is size-parameterized so the same code
path runs as an 8-virtual-device CPU test (tiny sizes) and as the real
v5e workload.
"""

import dataclasses
from typing import Optional, Union

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
from ..utils.hostmath import (
    device_put_global,
    fetch_replicated,
    host_device,
    host_jit,
)

_INVPHI = (np.sqrt(5.0) - 1.0) / 2.0


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
    window_regularizers: Optional[np.ndarray] = None  # (W,) / (W, 2)
    window_error: float = float("nan")  # re-anchored per-window reconstruction
    chaining: Optional[str] = None  # W > 1: selected boundary scheme
    chained_error_mean: float = float("nan")  # ensemble-mean handoff
    chained_error_draws: float = float("nan")  # draw-wise + boundary rescue
    window_basis: str = "global"  # W > 1: "global" or "local" POD bases


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


# ---------------------------------------------------------------------------
# Shared assembly helpers (global = W = 1; windowed = W > 1)
# ---------------------------------------------------------------------------


def _gp_estimate_windows(ts, Y, sigma2, ell, chi, tw, weight_method, tb):
    """(W, r, mw) GP state/ddt estimates on the host in true f64.

    The GP is GLOBAL — hyperparameters were fit once on the full-span
    samples and every window's estimates condition on all of them. Returns
    ``(state_est64, ddt_est64, weight_ctx)`` where ``weight_ctx`` is
    ``("chol", (W, r, mw, mw) Cholesky factors)`` for the dense path
    (reference exact-sqrtW semantics via triangular solves,
    ``codebase/gpkernels.py:445-504``) or ``("lowrank", W x r nested
    LowRankWeightRoot list)`` for the factored O(m' p^2) path
    (``gp.lowrank``, SURVEY section 2e).
    """
    f64 = jnp.float64
    W, _ = tw.shape
    r = Y.shape[0]
    ts64 = jnp.asarray(ts, f64)

    if weight_method == "lowrank":
        from ..gp.lowrank import lowrank_gp_estimates

        with tb("scaled: GP estimation (lowrank host f64)"):
            Y_np = np.asarray(fetch_replicated(Y), np.float64)
            hyp = [
                np.asarray(jax.device_get(x), np.float64)
                for x in (sigma2, ell, chi)
            ]
            mw = tw.shape[1]
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
        return jnp.asarray(state_np), jnp.asarray(ddt_np), ("lowrank", roots)

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
    with tb("scaled: GP estimation (host f64)"):
        ests = est_fn(
            jnp.asarray(Y, f64),
            jnp.asarray(sigma2, f64),
            jnp.asarray(ell, f64),
            jnp.asarray(chi, f64),
            jnp.asarray(tw, f64),
        )
        ests.state_estimate.block_until_ready()
    return ests.state_estimate, ests.ddt_estimate, ("chol", ests.weight_root)


def _gp_estimate_windows_local(
    ts_w, Yw, sigma2, ell, chi, tw, weight_method, tb
):
    """(W, r, mw) GP estimates for LOCAL window bases: window w's modes
    condition only on window w's own samples and hyperparameters
    (``window_basis="local"``; hyperparameters are (W, r)).

    Same contract as :func:`_gp_estimate_windows` — returns
    ``(state_est64, ddt_est64, weight_ctx)`` with the "chol" dense path
    (reference exact-sqrtW semantics, ``codebase/gpkernels.py:445-504``)
    or the "lowrank" factored path (``gp.lowrank``, SURVEY section 2e).
    """
    f64 = jnp.float64
    W, mw = tw.shape
    r = Yw.shape[1]

    if weight_method == "lowrank":
        from ..gp.lowrank import lowrank_gp_estimates

        with tb("scaled: GP estimation (lowrank host f64)"):
            Y_np = np.asarray(fetch_replicated(Yw), np.float64)
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
                        np.asarray(ts_w[w]), Y_np[w, i], tw[w],
                        hyp[0][w, i], hyp[1][w, i], hyp[2][w, i], eta=1e-8,
                    )
                    state_np[w, i] = e.state_estimate
                    ddt_np[w, i] = e.ddt_estimate
                    row.append(e.root)
                roots.append(row)
        return jnp.asarray(state_np), jnp.asarray(ddt_np), ("lowrank", roots)

    est_fn = host_jit(
        jax.vmap(  # windows: sample times, data, hyps AND est grid map
            jax.vmap(  # modes: share the window's sample/est grids
                lambda t, y, s2, l, c, te: gp_estimates(
                    t, y, te, s2, l, c, eta=1e-8, method="chol"
                ),
                in_axes=(None, 0, 0, 0, 0, None),
            ),
            in_axes=(0, 0, 0, 0, 0, 0),
        )
    )
    with tb("scaled: GP estimation (host f64)"):
        ests = est_fn(
            jnp.asarray(ts_w, f64),
            jnp.asarray(Yw, f64),
            jnp.asarray(sigma2, f64),
            jnp.asarray(ell, f64),
            jnp.asarray(chi, f64),
            jnp.asarray(tw, f64),
        )
        ests.state_estimate.block_until_ready()
    return ests.state_estimate, ests.ddt_estimate, ("chol", ests.weight_root)


def _weight_windows(rom, state_est64, ddt_est64, weight_ctx, tb):
    """Per-window data matrices + GP weighting on the host (f64).

    Returns ``(Dt, zt)`` with shapes (W, r, mw, d) / (W, r, mw): the
    weighted regression blocks ``sqrtW_i D_w`` of every (window, mode)
    row problem — the reference's weighting (``codebase/wlstsq.py``
    behavioral spec) without ever materializing a block-diagonal stack.
    """
    W = state_est64.shape[0]
    # Feature assembly stays on the host CPU device: an uncommitted f64
    # array would dispatch the quadratic-feature ops to the accelerator
    # in emulated f64 (slow, inaccurate — utils.hostmath policy).
    with jax.default_device(host_device()):
        D = jnp.stack(
            [rom.data_matrix(state_est64[w]) for w in range(W)]
        )  # (W, mw, d)
    d = D.shape[-1]
    mw = D.shape[1]
    if mw < d:
        raise ValueError(
            f"underdetermined regression: num_regression_points/W={mw} < "
            f"d={d} unknowns; raise num_regression_points (the m'-sharded "
            "factorization scales it) or lower time_windows"
        )

    kind, ctx = weight_ctx
    if kind == "lowrank":
        # Factored symmetric roots applied per row: two thin matmuls
        # each, O(r m' p d) — the dense (m' x m') root never exists.
        with tb("scaled: weighting (lowrank host f64)"):
            D_np = np.asarray(D, np.float64)
            ddt_np = np.asarray(ddt_est64, np.float64)
            r = len(ctx[0])
            Dt = np.stack(
                [
                    np.stack([ctx[w][i].apply(D_np[w]) for i in range(r)])
                    for w in range(W)
                ]
            )  # (W, r, mw, d)
            zt = np.stack(
                [
                    np.stack(
                        [ctx[w][i].apply(ddt_np[w, i]) for i in range(r)]
                    )
                    for w in range(W)
                ]
            )  # (W, r, mw)
            return jnp.asarray(Dt), jnp.asarray(zt)

    def _weight_w(L, Dmat, z):
        # method="chol": the weight root is the Cholesky factor of
        # C + eta*I, applied via triangular solves — the same weighted
        # regression as the reference's sqrtW without any (m' x m')
        # eigendecomposition (gp/estimates.py docstring).
        Db = jnp.broadcast_to(Dmat[None], (L.shape[0],) + Dmat.shape)
        Dw = jax.scipy.linalg.solve_triangular(L, Db, lower=True)
        zw = jax.scipy.linalg.solve_triangular(L, z[..., None], lower=True)
        return Dw, zw[..., 0]

    with tb("scaled: weighting (host f64)"):
        Dt, zt = host_jit(jax.vmap(_weight_w))(
            ctx, D, ddt_est64
        )  # (W, r, mw, d), (W, r, mw)
        Dt.block_until_ready()
    return Dt, zt


def _resolve_gamma(tikhonov_gamma, Dt_flat, r, d, W):
    """Normalize ``tikhonov_gamma`` into the per-row-problem regularizer.

    Returns ``("diag", (W*r, d))`` or ``("matrix", (W*r, d, d))``.
    Accepted inputs (the reference ``opinf.lstsq.TikhonovSolver`` /
    ``WeightedLSTSQSolverMulti`` surface, ``codebase/wlstsq.py:179-181,
    215-304``):

    * ``"colnorm"`` — per-row diagonal Gamma from the column norms of
      each weighted data matrix (classic scaled Tikhonov: shrinkage
      proportional to each feature's leverage),
    * (d,) shared diagonal, (r, d) per-row diagonal,
    * (d, d) shared matrix, (r, d, d) per-row matrices. An ambiguous
      square (r, r) 2-D input is treated as a (d, d) matrix.
    """
    if isinstance(tikhonov_gamma, str):
        if tikhonov_gamma != "colnorm":
            raise ValueError(
                f"unknown tikhonov_gamma preset '{tikhonov_gamma}'"
            )
        return "diag", jnp.linalg.norm(Dt_flat, axis=1)  # (W*r, d)
    G = jnp.asarray(tikhonov_gamma)
    if G.ndim == 1:
        if G.shape != (d,):
            raise ValueError(f"tikhonov_gamma shape {G.shape} != ({d},)")
        return "diag", jnp.broadcast_to(G[None], (W * r, d))
    if G.ndim == 2 and G.shape == (r, d) and r != d:
        return "diag", jnp.tile(G, (W, 1))
    if G.ndim == 2 and G.shape == (d, d):
        return "matrix", jnp.broadcast_to(G[None], (W * r, d, d))
    if G.ndim == 3 and G.shape == (r, d, d):
        return "matrix", jnp.tile(G, (W, 1, 1))
    raise ValueError(
        f"tikhonov_gamma shape {G.shape} is none of ({d},), ({r}, {d}), "
        f"({d}, {d}), ({r}, {d}, {d})"
    )


def _golden_vec(fn, x0_log, f0, lo, hi, iters=12):
    """Vectorized bounded golden-section descent in log10 space.

    ``fn``: (W,) log10 params -> (W,) frozen-key screen errors — ONE
    program call evaluates every window's objective simultaneously
    (window independence, see ``window_errors``). ``x0_log / f0`` seed
    the incumbents (kept wherever nothing better is found); where
    ``lo == hi`` the window is inactive and rides along for free.
    Returns the best (log10 param, error) per window over all evaluated
    points — the ``bayes/regsearch.py`` bounded-refinement semantics,
    vectorized.
    """
    best_x = np.asarray(x0_log, np.float64).copy()
    best_f = np.asarray(f0, np.float64).copy()
    a = np.asarray(lo, np.float64).copy()
    b = np.asarray(hi, np.float64).copy()

    def _eval(x):
        v = np.asarray(fn(x), np.float64)
        take = v < best_f
        best_f[take] = v[take]
        best_x[take] = x[take]
        return v

    c = b - _INVPHI * (b - a)
    dpt = a + _INVPHI * (b - a)
    fc, fd = _eval(c), _eval(dpt)
    for _ in range(iters):
        left = fc < fd
        a = np.where(left, a, c)
        b = np.where(left, dpt, b)
        new_c = b - _INVPHI * (b - a)
        new_d = a + _INVPHI * (b - a)
        x = np.where(left, new_c, new_d)
        fx = _eval(x)
        c, dpt, fc, fd = (
            np.where(left, new_c, dpt),
            np.where(left, c, new_d),
            np.where(left, fx, fd),
            np.where(left, fc, fx),
        )
    return best_x, best_f


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
    window_chaining: str = "draws",
    tikhonov_gamma: Union[None, str, np.ndarray] = None,
    window_basis: str = "global",
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
    lowrank at m'/W >= 1024. Lowrank falls back to the dense eigh root
    for any mode whose covariance is not numerically low rank.

    ``data_source``: "synthetic" = rank-r damped-rotation snapshots
    (``_synthetic_states``); "euler" = the reference's Euler FOM scaled
    to n_space = 3 * nx lifted DOF (``_euler_states``) — the physical
    quadratic-dynamics variant of the north-star run.

    ``regularization``:

    * "scalar" — the reference's single-lambda ridge search
      (``PDEs/step3_estimate.py`` semantics).
    * "blocked" — the two-parameter per-operator-block Tikhonov
      (lambda_1 on c/A/B columns, lambda_2 on the quadratic H block)
      searched over a 2-D grid with the same 20-draw screen — the classic
      OpInf stabilizer for draw-marginal quadratic ROMs, built on the
      reference's ``opinf.lstsq.TikhonovSolver`` diagonal surface
      (``codebase/wlstsq.py:179-181``; ``solve.lstsq.TikhonovLSTSQ``).
      Requires "H" in ``modelform``.
    * "gamma" — a user-shaped Tikhonov matrix searched through a scalar
      multiplier: candidates are ``lambda * Gamma`` with ``Gamma`` from
      ``tikhonov_gamma`` (per-row diagonal or full-matrix; the
      reference's general ``TikhonovSolver`` surface,
      ``codebase/wlstsq.py:179-181``, amortized via
      ``solve.lstsq.MatrixTikhonovLSTSQ``). ``tikhonov_gamma="colnorm"``
      builds the classic scaled-Tikhonov diagonal from each weighted
      data matrix's column norms.

    ``time_windows``: W > 1 learns a SEPARATE ROM (own regression + own
    regularization search, any ``regularization`` mode) on each of W
    contiguous sub-spans of the training window — the time-windowed
    OpInf lever for draw-marginal problems where no single global
    regularizer stabilizes an accurate model (BASELINE.md: the GP ddt
    posterior widens relative to mode curvature until every draw
    violates the 5x envelope somewhere in the FULL k-step screen;
    windowing divides the screen horizon by W and lets shrinkage adapt
    to each sub-span's dynamics). TPU-first shape: all W windows share
    one (window x candidate x draw)-batched screening program — W x
    fewer sequential integration steps and W x more parallelism — and a
    vectorized golden-section refinement polishes every window's
    parameters simultaneously (one program call evaluates all W
    objectives).

    ``window_chaining`` selects the boundary scheme for the full-span
    rollout that ``train_error``/``ensemble_mean`` report (W > 1):

    * "draws" (default) — draw-wise propagation with boundary rescue:
      each posterior draw continues from ITS OWN window-w end state
      (self-consistent trajectories instead of restarting from a mean
      that averages away phase); a draw that goes envelope-unstable
      inside a window restarts the next window from the stable draws'
      mean end state, and each window's ensemble mean is gated on its
      per-window stable mask.
    * "mean" — window w starts from window w-1's ensemble-mean end
      state (the round-4 scheme; IC error compounds multiplicatively).
    * "anchor" — window w restarts from the GP state estimate at its
      left boundary (already computed for the regression). Within the
      training span the boundary states are observable from data, so
      this is the right reconstruction semantics; it equals the
      re-anchored ``window_error``.

    All schemes' errors are recorded (``chained_error_mean``,
    ``chained_error_draws``, ``window_error``); ``train_error`` is the
    selected scheme's. ``window_regularizers`` holds the per-window
    selections ((W,) scalar/gamma, (W, 2) blocked).

    ``window_basis`` (W > 1): "global" projects every window onto ONE
    POD basis of the full training span (the round-4 scheme); "local"
    gives each window its OWN r-mode POD basis, GP fits, and envelope
    (the classic local-ROM construction). Local bases attack the
    diagnosed r-limited failure mode at production shapes: with a
    global basis the late, wave-steepened windows carry most of the
    projection error (window 8's search collapses to degenerate
    regularizers at r=12 regardless of scalar/blocked mode —
    BASELINE.md round-5 windowed table), while r local modes represent
    each sub-span's snapshots near-optimally. Chained rollouts hand
    states across windows through the exact full-space transfer
    ``q_{w+1} = B_{w+1}^T (mu_w + B_w q_w - mu_{w+1})`` (orthonormal
    bases; coefficient-space error norms therefore remain full-space
    reconstruction errors of the centered states).
    """
    import os

    from ..utils.timing import TimedBlock

    tb = lambda msg: TimedBlock(msg, silent=not verbose)

    from ..io.checkpoint import (
        load_checkpoint,
        pipeline_stage_state,
        save_checkpoint,
    )

    if regularization not in ("scalar", "blocked", "gamma"):
        raise ValueError(f"unknown regularization '{regularization}'")
    blocked = regularization == "blocked"
    if blocked and "H" not in modelform:
        raise ValueError(
            "regularization='blocked' separates the quadratic block; "
            f"modelform '{modelform}' has no H operator"
        )
    if regularization == "gamma" and tikhonov_gamma is None:
        raise ValueError("regularization='gamma' requires tikhonov_gamma")
    if time_windows < 1:
        raise ValueError("time_windows must be >= 1")
    if time_windows > 1 and num_regression_points % time_windows:
        raise ValueError(
            "num_regression_points must divide into time_windows"
        )
    if window_chaining not in ("draws", "mean", "anchor"):
        raise ValueError(f"unknown window_chaining '{window_chaining}'")
    if window_basis not in ("global", "local"):
        raise ValueError(f"unknown window_basis '{window_basis}'")
    local_basis = window_basis == "local"
    if local_basis:
        if time_windows < 2:
            raise ValueError("window_basis='local' requires time_windows > 1")
        if n_snapshots % time_windows:
            raise ValueError("n_snapshots must divide into time_windows")
        if num_gp_samples % time_windows:
            raise ValueError(
                "num_gp_samples must divide into time_windows"
            )

    if mesh is None:
        n_dev = len(jax.devices())
        mode_ax = 2 if n_dev % 2 == 0 else 1
        mesh = make_mesh({"draw": n_dev // mode_ax, "mode": mode_ax})
    if num_modes % mesh.shape["mode"]:
        raise ValueError("num_modes must divide the 'mode' mesh axis")

    f32 = jnp.float32
    key = jax.random.PRNGKey(seed)
    k_data, k_fit, k_draw = jax.random.split(key, 3)

    ckpt_path = (
        os.path.join(checkpoint_dir, "scaled_fit_stage")
        if checkpoint_dir
        else None
    )
    ckpt_shape = [
        n_space, n_snapshots, num_modes, seed, data_source,
        window_basis, time_windows if local_basis else 0,
    ]
    resumed = None
    if ckpt_path and os.path.isdir(ckpt_path):
        state, meta = load_checkpoint(ckpt_path)
        if meta.get("shape") == ckpt_shape:
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

    if local_basis:
        # --- per-window POD bases + per-window GP fits ------------------------
        # Each window gets its own r-mode basis of its own (centered)
        # snapshot block, its own GP sample draw and its own batched
        # hyperparameter fit — the local-ROM construction. The W PODs
        # reuse the sharded randomized range finder (identical program,
        # W executions on (n, k/W) blocks).
        Wl = time_windows
        kw_ = n_snapshots // Wl
        mws = num_gp_samples // Wl
        idx_w = np.stack(
            [
                np.sort(
                    np.asarray(
                        jax.random.choice(
                            jax.random.fold_in(k_fit, 200 + w),
                            kw_, (mws,), replace=False,
                        )
                    )
                )
                for w in range(Wl)
            ]
        )  # (W, mws) indices within each window's block
        ts_w = np.stack(
            [t_all[w * kw_ + idx_w[w]] for w in range(Wl)]
        )  # (W, mws)

        if resumed is not None:
            Yw = jnp.asarray(resumed["Y"], f32)  # (W, r, mws)
            svdvals = jnp.asarray(resumed["svdvals"])
            sigma2, ell, chi = (
                jnp.asarray(resumed[k]) for k in ("sigma2", "ell", "chi")
            )  # (W, r)
            bases32 = jnp.asarray(resumed["bases"], f32)  # (W, n, r)
            mus32 = jnp.asarray(resumed["mus"], f32)  # (W, n)
        else:
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
            blist, mlist, svlist, ylist = [], [], [], []
            with tb("scaled: per-window POD"):
                for w in range(Wl):
                    Sw = states[:, w * kw_ : (w + 1) * kw_]
                    mu = jnp.mean(Sw, axis=1, keepdims=True)
                    Cw = Sw - mu
                    Bw, sv = randomized_pod(
                        Cw, num_modes, mesh=mesh, row_axis=space_axes,
                        key=jax.random.fold_in(k_data, 11 + w),
                    )
                    blist.append(jnp.asarray(Bw, f32))
                    mlist.append(mu[:, 0].astype(f32))
                    svlist.append(sv)
                    ylist.append((Bw.T @ Cw)[:, idx_w[w]])  # (r, mws)
            bases32 = jnp.stack(blist)  # (W, n, r)
            mus32 = jnp.stack(mlist)  # (W, n)
            svdvals = jnp.stack(svlist)  # (W, l)
            Yw = jnp.stack(ylist).astype(f32)  # (W, r, mws)

            box = BoxTransform.from_bounds(
                (1e-5, 1e5), (1e-3, 1e2), (1e-10, 1e2)
            )
            with tb("scaled: GP fit (per-window)"):
                # One compiled fit program (same shapes each window), W
                # executions; restarts stay one vmapped device batch.
                hyps = [
                    fit_gp_hyperparameters(
                        jnp.asarray(ts_w[w]), Yw[w], box,
                        jax.random.fold_in(k_fit, 1 + w),
                        n_restarts=n_restarts, adam_steps=150,
                        polish_iters=30,
                    )
                    for w in range(Wl)
                ]
            sigma2 = jnp.stack([h.sigma2 for h in hyps])  # (W, r)
            ell = jnp.stack([h.ell for h in hyps])
            chi = jnp.stack([h.chi for h in hyps])
            if ckpt_path:
                save_checkpoint(
                    ckpt_path,
                    pipeline_stage_state(
                        Y=Yw, svdvals=svdvals, sigma2=sigma2, ell=ell,
                        chi=chi, bases=bases32, mus=mus32,
                    ),
                    metadata={"shape": ckpt_shape},
                )
    elif resumed is not None:
        Y = device_put_global(
            jnp.asarray(resumed["Y"], f32), NamedSharding(mesh, P("mode", None))
        )
        svdvals = jnp.asarray(resumed["svdvals"])
        sigma2, ell, chi = (
            device_put_global(jnp.asarray(resumed[k]), mode_sharding)
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
                metadata={"shape": ckpt_shape},
            )

    # ------------------------------------------------------------------
    # Unified back half: W >= 1 windows through one assembly path.
    # ------------------------------------------------------------------
    W = time_windows
    r = num_modes
    mw = num_regression_points // W
    rom = GalerkinROM(modelform, state_dimension=num_modes, substeps=2)
    t_est = np.linspace(0.0, 1.0, num_regression_points)
    tw = t_est.reshape(W, mw)  # (W, mw) window time grids

    if weight_method == "auto":
        weight_method = "lowrank" if mw >= 1024 else "chol"

    if local_basis:
        state_est64, ddt_est64, weight_ctx = _gp_estimate_windows_local(
            ts_w, Yw, sigma2, ell, chi, tw, weight_method, tb
        )  # (W, r, mw) each
    else:
        state_est64, ddt_est64, weight_ctx = _gp_estimate_windows(
            ts, Y, sigma2, ell, chi, tw, weight_method, tb
        )  # (W, r, mw) each
    Dt, zt = _weight_windows(rom, state_est64, ddt_est64, weight_ctx, tb)
    d = Dt.shape[-1]

    # --- one factorization for all W*r row problems (mesh-sharded TSQR) ------
    # The weighted factorization shards the m' rows over "draw" and the
    # W*r problems over "mode" — the m'-scaling (sequence-parallel) path
    # (SURVEY.md section 2e).
    Dt_flat = jnp.asarray(Dt, f32).reshape(W * r, mw, d)
    zt_flat = jnp.asarray(zt, f32).reshape(W * r, mw)
    with tb("scaled: TSQR factorization (sharded)"):
        U, S, V = tall_skinny_svd(
            Dt_flat, mesh=mesh, spec=("mode", "draw", None)
        )
        U.block_until_ready()
    zt_flat = device_put_global(
        zt_flat, NamedSharding(mesh, P("mode", "draw"))
    )
    Utz = jnp.einsum("rmd,rm->rd", U, zt_flat)
    fac = WeightedLSTSQ(U, S, V, Utz, Dt_flat, zt_flat)

    # --- screening setup: envelopes, grids, candidate samplers ----------------
    states_w32 = jnp.asarray(state_est64, f32)  # (W, r, mw)
    states_full = jnp.swapaxes(states_w32, 0, 1).reshape(r, W * mw)
    tw32 = jnp.asarray(tw, f32)
    q0s = states_w32[:, :, 0]  # (W, r) per-window GP-estimate ICs
    # Floor the per-mode envelope at envelope_floor x the largest mode
    # scale: trailing POD modes whose GP estimate is (correctly) smoothed
    # to near-flat would otherwise have a ~zero envelope that rejects
    # EVERY posterior draw. The reference's per-variable 5x rule
    # (PDEs/step3_estimate.py) never meets this because its r <= 8 modes
    # all carry signal; envelope_floor=0 restores the strict semantics.
    if local_basis:
        # Local coefficients only exist within their window, so the 5x
        # envelope is per (window, mode); stability_mask broadcasts the
        # (W, r) arrays against (draws, W, r, mw) rollouts.
        shift = jnp.mean(states_w32, axis=2)  # (W, r)
        limits = 5.0 * jnp.max(
            jnp.abs(states_w32 - shift[:, :, None]), axis=2
        )
        if envelope_floor:
            limits = jnp.maximum(
                limits,
                envelope_floor * jnp.max(limits, axis=1, keepdims=True),
            )
    else:
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

    if blocked:
        from ..rom.operators import operator_splits

        quad_mask_np = np.zeros(d, bool)
        for name, a, b in operator_splits(modelform, num_modes):
            if name == "H":
                quad_mask_np[a:b] = True
        quad_mask = jnp.asarray(quad_mask_np)
        # Amortized normal equations: the O(M d^2) Gram contraction runs
        # once on the mesh; each (lambda_1, lambda_2) candidate then costs
        # one batched (W*r, d, d) Cholesky inside the screen.
        tik = jax.jit(fac.tikhonov)()
        jax.block_until_ready(tik)

        def sample_draws(params, key, n):  # params (W, 2)
            g = jnp.where(quad_mask[None], params[:, 1:2], params[:, 0:1])
            return tik.sample(
                jnp.repeat(g, r, axis=0), key, n
            ).reshape(n, W, r, d)

    elif regularization == "gamma":
        gkind, G = _resolve_gamma(tikhonov_gamma, Dt_flat, r, d, W)
        if gkind == "diag":
            tik = jax.jit(fac.tikhonov)()
            jax.block_until_ready(tik)
            G = jnp.asarray(G, f32)

            def sample_draws(params, key, n):  # params (W,)
                g = jnp.repeat(params, r)[:, None] * G
                return tik.sample(g, key, n).reshape(n, W, r, d)

        else:
            mt = jax.jit(fac.matrix_tikhonov)(jnp.asarray(G, f32))
            jax.block_until_ready(mt)

            def sample_draws(params, key, n):  # params (W,)
                return mt.sample(
                    jnp.repeat(params, r), key, n
                ).reshape(n, W, r, d)

    else:

        def sample_draws(params, key, n):  # params (W,)
            return fac.sample(
                jnp.repeat(params, r), key, n
            ).reshape(n, W, r, d)

    def _integrate(ohat):
        """(n, W, r, d) operator draws -> (n, W, r, mw) window rollouts,
        every window re-anchored on its GP-estimate IC."""
        ohat = jax.lax.with_sharding_constraint(ohat, draw_sharding)
        per_window = jax.vmap(rom.predict, in_axes=(0, 0, 0))
        return jax.vmap(per_window, in_axes=(0, None, None))(
            ohat, q0s, tw32
        )

    def window_errors(params, key):
        """(W,) screen errors for per-window regularizers ``params``.

        20-draw screen: the reference's candidate acceptance count
        (PDEs/step3_estimate.py; bayes/regsearch.py default). One
        objective shared by the grid phase and the refinement so the two
        can never drift apart. Window independence: row problem (w, i)
        only sees params[w], and window w's rollout only uses its own
        rows — so entry w of the result is window w's objective
        regardless of the other entries, and one call evaluates W
        objectives at once (W = 1 reproduces the global scalar screen).
        """
        ohats = sample_draws(params, key, 20)
        sols = _integrate(ohats)
        ok = stability_mask(sols, shift, limits)  # (20, W)
        stable = jnp.all(ok, axis=0)
        err = jnp.linalg.norm(
            jnp.mean(sols, axis=0) - states_w32, axis=(1, 2)
        ) / wnorm
        return jnp.where(stable & jnp.isfinite(err), err, 1e12)

    # --- grid screening --------------------------------------------------------
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
                lambda pk: jax.vmap(
                    lambda pair, kk: window_errors(
                        jnp.broadcast_to(pair, (W, 2)), kk
                    )
                )(*pk),
                (pairs, keys),
            )
        )
        screen_keys = jnp.broadcast_to(
            jax.random.fold_in(k_draw, 101),
            (grid_size, grid_size) + k_draw.shape,
        )
    else:
        candidate_errors = jax.jit(
            lambda keys: jax.vmap(
                lambda lam, kk: window_errors(
                    jnp.broadcast_to(lam, (W,)), kk
                )
            )(grid32, keys)
        )
        screen_keys = jax.random.split(k_draw, grid_size)

    with tb("scaled: regularization screening"):
        errs = candidate_errors(screen_keys)  # (g, W) or (g, g, W)
        errs.block_until_ready()
    errs_np = np.asarray(fetch_replicated(errs))
    dead = np.all(errs_np.reshape(-1, W) >= 1e12, axis=0)
    if dead.any():
        raise ValueError(
            "scaled grid search failed: every candidate unstable"
            + (
                f" in window(s) {np.flatnonzero(dead).tolist()}"
                if W > 1
                else ""
            )
            + " (extend the grid or increase num_regression_points)"
        )

    # --- bounded refinement under a frozen key ---------------------------------
    # bayes/regsearch.py semantics with one deliberate divergence: an
    # endpoint winner keeps the grid value instead of widening the bounds
    # — the scaled demo's grid spans 18 decades, so an endpoint means the
    # problem, not the grid, is mis-scaled. Grid winners are RE-EVALUATED
    # under the refine key so acceptance compares like with like rather
    # than across different draw keys; the vectorized golden-section
    # descends all W windows' objectives in lockstep (one program call
    # per iteration).
    refine_key = jax.random.fold_in(k_draw, 101)
    single_dev = jax.jit(lambda p: window_errors(p, refine_key))
    single = lambda p: fetch_replicated(single_dev(p))
    logg = np.log10(grid)
    cell = logg[1] - logg[0]

    if blocked:
        flat = errs_np.reshape(grid_size * grid_size, W)
        iflat = np.argmin(flat, axis=0)
        i1, i2 = np.unravel_index(iflat, (grid_size, grid_size))
        x0 = np.stack([logg[i1], logg[i2]], axis=-1)  # (W, 2) log10

        def pair_fn(p_log):
            return np.asarray(
                single(jnp.asarray(10.0**p_log, f32)), np.float64
            )

        with tb("scaled: regularization refinement"):
            best_x = x0.copy()
            best_f = pair_fn(x0)
            # (a) diagonal polish (lambda_1 = lambda_2): the scalar-
            # search-quality floor, run between the best diagonal cell's
            # neighbors.
            idiag = np.argmin(
                np.diagonal(errs_np, axis1=0, axis2=1).T, axis=0
            )  # (W,)
            dlo = logg[np.maximum(idiag - 1, 0)]
            dhi = logg[np.minimum(idiag + 1, grid_size - 1)]
            diag_seed = np.asarray(
                pair_fn(np.stack([logg[idiag]] * 2, axis=-1)), np.float64
            )
            dx, df = _golden_vec(
                lambda xl: pair_fn(np.stack([xl, xl], axis=-1)),
                logg[idiag], diag_seed, dlo, dhi,
            )
            take = df < best_f
            best_x[take] = np.stack([dx, dx], axis=-1)[take]
            best_f[take] = df[take]
            # (b) coordinate descent on (log l1, log l2), +-1 grid cell
            # around the incumbent, two sweeps — each golden iteration is
            # one program call evaluating every window.
            for _ in range(2):
                for coord in (0, 1):

                    def coord_fn(xl, coord=coord):
                        p = best_x.copy()
                        p[:, coord] = xl
                        return pair_fn(p)

                    cx, cf = _golden_vec(
                        coord_fn,
                        best_x[:, coord],
                        best_f,
                        best_x[:, coord] - cell,
                        best_x[:, coord] + cell,
                    )
                    take = cf < best_f
                    best_x[take, coord] = cx[take]
                    best_f[take] = cf[take]
        params_np = 10.0**best_x  # (W, 2)
        params = jnp.asarray(params_np, f32)
    else:
        ibest = np.argmin(errs_np, axis=0)  # (W,)
        lam_best = grid[ibest]
        active = (ibest > 0) & (ibest < grid_size - 1)
        logbest = logg[ibest]
        lo = np.where(active, logg[np.maximum(ibest - 1, 0)], logbest)
        hi = np.where(
            active, logg[np.minimum(ibest + 1, grid_size - 1)], logbest
        )
        if active.any():
            with tb("scaled: regularization refinement"):
                f0 = np.asarray(
                    single(jnp.asarray(lam_best, f32)), np.float64
                )
                best_log, _ = _golden_vec(
                    lambda xl: np.asarray(
                        single(jnp.asarray(10.0**xl, f32)), np.float64
                    ),
                    logbest, f0, lo, hi,
                )
        else:
            best_log = logbest  # every winner at an endpoint: keep grid
        params_np = 10.0**best_log  # (W,)
        params = jnp.asarray(params_np, f32)

    # --- final ensembles: per-window (re-anchored) + chained rollouts ----------
    @jax.jit
    def final_ensemble(key):
        ohat = sample_draws(params, key, ndraws)
        sols = _integrate(ohat)  # (n, W, r, mw)
        ok = stability_mask(sols, shift, limits)  # (n, W)
        acc = jnp.sum(jnp.where(ok[:, :, None, None], sols, 0.0), axis=0)
        means = acc / jnp.maximum(jnp.sum(ok, axis=0)[:, None, None], 1)
        return means, jnp.mean(ok.astype(f32))

    with tb("scaled: posterior ensemble"), mesh:
        means_w, frac = final_ensemble(jax.random.fold_in(k_draw, 7))
        means_w.block_until_ready()

    means_np = np.asarray(fetch_replicated(means_w))  # (W, r, mw)
    frac = float(np.asarray(fetch_replicated(frac)))
    mean_anchor = np.swapaxes(means_np, 0, 1).reshape(r, W * mw)
    se_np = np.asarray(states_full)
    senorm = np.linalg.norm(se_np)
    window_error = float(np.linalg.norm(mean_anchor - se_np) / senorm)

    lams_np = np.atleast_1d(np.asarray(params_np, np.float64))
    if W == 1:
        g_errs = errs_np[..., 0]  # (g,) scalar/gamma, (g, g) blocked
        lam0 = lams_np.reshape(-1)
        return ScaledResult(
            num_modes=num_modes,
            regularizer=float(lam0[0]),
            ensemble_mean=mean_anchor,
            stable_fraction=frac,
            svdvals=np.asarray(svdvals),
            train_error=window_error,
            grid=grid,
            grid_errors=g_errs,
            regularizer_quad=float(lam0[1]) if blocked else None,
        )

    # --- chained full-span rollouts (W > 1) -------------------------------------
    q0_global = device_put_global(states_full[:, 0], NamedSharding(mesh, P()))

    # Per-window envelopes + boundary transfer maps for the scan steps.
    # Global basis: envelopes replicate and the transfer is the identity.
    # Local bases: window w's end state crosses into window w+1's frame
    # through the exact full-space map q' = B_{w+1}^T (mu_w + B_w q -
    # mu_{w+1}) (orthonormal bases); the last window carries an identity
    # so the scan inputs stay rectangular.
    shift_s = jnp.broadcast_to(shift, (W, r))
    limits_s = jnp.broadcast_to(limits, (W, r))
    if local_basis:
        Tmat = jnp.einsum("wnr,wns->wrs", bases32[1:], bases32[:-1])
        bvec = jnp.einsum(
            "wnr,wn->wr", bases32[1:], mus32[:-1] - mus32[1:]
        )
        Tmat = jnp.concatenate(
            [Tmat, jnp.eye(r, dtype=f32)[None]], axis=0
        )
        bvec = jnp.concatenate([bvec, jnp.zeros((1, r), f32)], axis=0)
    else:
        Tmat = jnp.broadcast_to(jnp.eye(r, dtype=f32), (W, r, r))
        bvec = jnp.zeros((W, r), f32)
    chain_xs = lambda ohat: (
        jnp.swapaxes(ohat, 0, 1), tw32, shift_s, limits_s, Tmat, bvec
    )

    @jax.jit
    def chain_mean(ohat):
        """Ensemble-mean handoff: window w starts from window w-1's
        ensemble-mean end state (the round-4 scheme)."""

        def step(qc, inp):
            O_w, t_w, sh_w, li_w, T_w, b_w = inp  # (n, r, d), (mw,), ...
            sols = jax.vmap(rom.predict, in_axes=(0, None, None))(
                O_w, qc, t_w
            )
            ok = stability_mask(sols, sh_w, li_w)  # (n,)
            acc = jnp.sum(jnp.where(ok[:, None, None], sols, 0.0), axis=0)
            mean = acc / jnp.maximum(jnp.sum(ok), 1)
            return T_w @ mean[:, -1] + b_w, mean

        _, means = jax.lax.scan(step, q0_global, chain_xs(ohat))
        return means  # (W, r, mw)

    @jax.jit
    def chain_draws(ohat):
        """Draw-wise propagation with boundary rescue: each draw chains
        through its OWN window-end state, and a draw that violates the
        stability envelope inside window w restarts window w+1 from the
        stable draws' mean end state. Without the rescue, requiring
        full-span stability keeps ZERO draws over 8 production windows
        (draw-specific operators compound IC drift until every draw
        trips the envelope somewhere — BASELINE.md windowed table); the
        per-window means are gated on the per-window stable mask, like
        the reference's per-window screen."""

        def step(qs, inp):  # qs: (n, r) per-draw carried states
            O_w, t_w, sh_w, li_w, T_w, b_w = inp  # (n, r, d), (mw,), ...
            sols = jax.vmap(rom.predict, in_axes=(0, 0, None))(
                O_w, qs, t_w
            )  # (n, r, mw)
            ok = stability_mask(sols, sh_w, li_w)  # (n,)
            nok = jnp.maximum(jnp.sum(ok), 1)
            mean = (
                jnp.sum(jnp.where(ok[:, None, None], sols, 0.0), axis=0)
                / nok
            )
            ends = jnp.where(ok[:, None], sols[:, :, -1], mean[None, :, -1])
            return ends @ T_w.T + b_w, (mean, jnp.mean(ok.astype(f32)))

        q0s_d = jnp.broadcast_to(q0_global, ohat.shape[:1] + q0_global.shape)
        _, (means, fracs) = jax.lax.scan(step, q0s_d, chain_xs(ohat))
        return means, jnp.mean(fracs)

    with tb("scaled: chained rollout"), mesh:
        ohat_chain = sample_draws(
            params, jax.random.fold_in(k_draw, 8), ndraws
        )
        # device_put, not with_sharding_constraint: this is EAGER code, and
        # the eager sample's placement is compiler-chosen (a cached
        # executable may pin it to one device) — device_put reshards from
        # any source layout, the constraint primitive requires the input
        # already on the mesh devices.
        ohat_chain = device_put_global(ohat_chain, draw_sharding)
        means_mean = chain_mean(ohat_chain)
        means_draws, _ = chain_draws(ohat_chain)
        means_draws.block_until_ready()

    def _full_err(means):
        full = np.swapaxes(
            np.asarray(fetch_replicated(means)), 0, 1
        ).reshape(r, W * mw)
        return full, float(np.linalg.norm(full - se_np) / senorm)

    mean_full, chained_mean_err = _full_err(means_mean)
    draws_full, chained_draws_err = _full_err(means_draws)
    selected = {
        "mean": (mean_full, chained_mean_err),
        "draws": (draws_full, chained_draws_err),
        "anchor": (mean_anchor, window_error),
    }[window_chaining]

    if blocked:
        reg = float(np.exp(np.mean(np.log(lams_np[:, 0]))))
        reg_quad = float(np.exp(np.mean(np.log(lams_np[:, 1]))))
    else:
        reg = float(np.exp(np.mean(np.log(lams_np))))
        reg_quad = None
    return ScaledResult(
        num_modes=num_modes,
        # geometric mean of the per-window selections (the search is
        # log-space); the full table is window_regularizers.
        regularizer=reg,
        ensemble_mean=np.asarray(selected[0]),
        stable_fraction=frac,
        svdvals=np.asarray(svdvals),
        train_error=selected[1],
        grid=grid,
        grid_errors=errs_np,
        regularizer_quad=reg_quad,
        time_windows=W,
        window_regularizers=lams_np,
        window_error=window_error,
        chaining=window_chaining,
        window_basis=window_basis,
        chained_error_mean=chained_mean_err,
        chained_error_draws=chained_draws_err,
    )
