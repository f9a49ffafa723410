"""Batched multi-restart GP hyperparameter fitting.

The reference fits one sklearn GP per POD mode, each with 1 + n_restarts
serial L-BFGS-B runs (``codebase/gpkernels.py:302-308``,
``PDEs/config_euler.py:103`` uses 100 restarts) — thousands of sequential
small Cholesky factorizations on CPU. The fork's second backend instead
runs Adam on the exact-GP NLML (``codebase/gpkernels.py:92-100``).

This fitter combines both, fully batched on device:

1. **Screening** — Adam on the box-transformed NLML, ``vmap``-ed over
   every (mode, restart) pair at once: a fixed-length ``lax.scan`` whose
   cost per step is one batched Cholesky over the whole population.
2. **Polish** — damped Newton on the 3-parameter NLML from each mode's
   best screening result only: quadratic convergence at ~6 NLML
   evaluations per iteration (an L-BFGS zoom line search costs ~20).

Restart-seeding mirrors sklearn: restart 0 starts from the kernel default
(sigma2 = ell = chi = 1 projected into bounds); the rest are sampled
log-uniform inside the bounds.
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .nlml import BoxTransform, nlml_in_box
from ..utils.aotcache import aot_jit, register_namedtuple
from ..utils.hostmath import host_jit

# BoxTransform crosses the aot_jit export boundary below.
register_namedtuple(BoxTransform, "gp_bayesopinf_tpu.BoxTransform")


class FitResult(NamedTuple):
    """Fitted hyperparameters for a batch of GPs."""

    sigma2: jnp.ndarray  # (...,) RBF variance per GP
    ell: jnp.ndarray  # (...,) length scale per GP
    chi: jnp.ndarray  # (...,) white-noise level per GP
    nlml: jnp.ndarray  # (...,) final negative log marginal likelihood


def _initial_z(box: BoxTransform, key, n_restarts: int) -> jnp.ndarray:
    """(n_restarts + 1, 3) starting points in unconstrained coordinates."""
    default = box.from_log_params(jnp.zeros(3))  # sigma2 = ell = chi = 1
    u = jax.random.uniform(key, (n_restarts, 3))
    # log-uniform over the box; keep strictly interior for finite logits.
    log_params = box.lo + (box.hi - box.lo) * (0.02 + 0.96 * u)
    zs = jax.vmap(box.from_log_params)(log_params)
    return jnp.concatenate([default[None, :], zs], axis=0)


def _adam_screen(z0, fun, steps: int, lr: float):
    """Fixed-length Adam descent; returns (z_final, nlml_final)."""
    opt = optax.adam(lr)

    def step(carry, _):
        z, state = carry
        val, grad = jax.value_and_grad(fun)(z)
        bad = ~(jnp.isfinite(val) & jnp.all(jnp.isfinite(grad)))
        grad = jnp.where(bad, jnp.zeros_like(grad), grad)
        updates, state = opt.update(grad, state, z)
        updates = jnp.where(bad, jnp.zeros_like(updates), updates)
        return (optax.apply_updates(z, updates), state), None

    (z_fin, _), _ = jax.lax.scan(step, (z0, opt.init(z0)), None, length=steps)
    val = fun(z_fin)
    val0 = fun(z0)
    better = val < val0
    return jnp.where(better, z_fin, z0), jnp.where(better, val, val0)


@aot_jit(static_argnames=("n_restarts", "adam_steps"))
def _screen_all(T, Y, box, keys, n_restarts, adam_steps, adam_lr):
    """Phase 1: Adam screening of all (mode, restart) starts.

    ``aot_jit``: the unrolled-Cholesky NLML makes this the single most
    expensive program to TRACE in the package (~22 s per process at
    SEIRD shapes on a 1-core host); the serialized export makes every
    process after the first skip straight to the compiled program.
    """

    def one_mode(t_i, y_i, key_i):
        fun = partial(nlml_in_box, box=box, t=t_i, y=y_i)
        z0s = _initial_z(box, key_i, n_restarts).astype(T.dtype)
        z, v = jax.vmap(lambda z: _adam_screen(z, fun, adam_steps, adam_lr))(z0s)
        return z, jnp.where(jnp.isfinite(v), v, jnp.inf)

    return jax.vmap(one_mode)(T, Y, keys)


@aot_jit(static_argnames=("method",))
def _rank_full(T, Y, box, Z, method="auto"):
    """Evaluate the FULL-data NLML for every screened candidate — one
    batched Cholesky per (mode, restart) instance, so re-ranking costs one
    screening step regardless of the subsample used during descent."""

    def one_mode(t_i, y_i, z_i):
        fun = partial(nlml_in_box, box=box, t=t_i, y=y_i, method=method)
        return jax.vmap(fun)(z_i)

    v = jax.vmap(one_mode)(T, Y, Z)
    return jnp.where(jnp.isfinite(v), v, jnp.inf)


# HBM budget for one _rank_full call's kernel matrices (the batched
# (mode x candidate) full-data re-rank materializes r*C (m, m) kernels plus
# their Cholesky factors — 16.6 GB at r=30, C=33, m=2048 in f32, the OOM
# that blocked the production-shape GP-density study at m=2048).
_RANK_BUDGET_BYTES = 4 << 30


def _rank_full_chunked(T, Y, box, Z, chunk=None, method="auto"):
    """``_rank_full`` over candidate-axis chunks of a fixed width.

    ``chunk=None`` sizes the width so one call's kernel matrices fit in
    ``_RANK_BUDGET_BYTES`` (a ~4x allowance over the raw (m, m) kernels
    covers XLA temporaries); small problems take the single-program fast
    path unchanged. The candidate axis is padded to a multiple of the
    chunk width so every chunk reuses ONE compiled program; padded slots
    evaluate a harmless candidate and are discarded.
    """
    r, C = Z.shape[0], Z.shape[1]
    if chunk is None:
        m = T.shape[-1]
        per_cand = 4 * r * m * m * jnp.dtype(T.dtype).itemsize
        chunk = max(1, _RANK_BUDGET_BYTES // max(per_cand, 1))
    if chunk >= C:
        return _rank_full(T, Y, box, Z, method=method)
    pad = (-C) % chunk
    Zp = jnp.concatenate(
        [Z, jnp.broadcast_to(Z[:, :1], (r, pad, 3))], axis=1
    ) if pad else Z
    vs = [
        _rank_full(T, Y, box, Zp[:, j : j + chunk], method=method)
        for j in range(0, C + pad, chunk)
    ]
    return jnp.concatenate(vs, axis=1)[:, :C]


def _newton_polish(z0, fun, maxiter: int):
    """Damped modified-Newton polish of the 3-parameter NLML.

    The unconstrained objective has only THREE parameters, so the full
    Hessian costs a handful of extra NLML evaluations via autodiff and
    Newton converges quadratically from the screening winner's basin —
    ~6 evaluations per iteration against ~20 for an L-BFGS zoom line
    search (which made the polish the single most expensive fit phase).
    Safeguards: modified-Newton eigenvalue clamp (|w| floor) for
    indefinite Hessians, three damped step candidates per iteration, and
    best-seen tracking so the result is monotone in NLML.
    """

    def eval_safe(z):
        v = fun(z)
        return jnp.where(jnp.isfinite(v), v, jnp.array(jnp.inf, v.dtype))

    def step(carry, _):
        z, best_z, best_v = carry
        g = jax.grad(fun)(z)
        H = jax.hessian(fun)(z)
        ok = jnp.all(jnp.isfinite(g)) & jnp.all(jnp.isfinite(H))
        g = jnp.where(ok, g, jnp.zeros_like(g))
        H = jnp.where(ok, H, jnp.eye(3, dtype=z.dtype))
        w, V = jnp.linalg.eigh(H)
        wa = jnp.abs(w)
        w_safe = jnp.maximum(wa, 1e-6 * jnp.max(wa) + 1e-12)
        dz = -V @ ((V.T @ g) / w_safe)
        # Three damped candidates; keep the best, never regress.
        cands = jnp.stack([z + dz, z + 0.5 * dz, z + 0.125 * dz])
        vals = jax.vmap(eval_safe)(cands)
        i = jnp.argmin(vals)
        z_new = jnp.where(vals[i] < best_v, cands[i], best_z)
        best_v_new = jnp.minimum(vals[i], best_v)
        return (z_new, z_new, best_v_new), None

    v0 = eval_safe(z0)
    (z_fin, _, v_fin), _ = jax.lax.scan(
        step, (z0, z0, v0), None, length=maxiter
    )
    return z_fin, v_fin


@aot_jit(static_argnames=("polish_iters", "method"))
def _polish_all(T, Y, box, z_best, polish_iters, method="auto"):
    """Phase 2: Newton polish from each mode's screening winner."""

    def one_mode(t_i, y_i, z0):
        fun = partial(nlml_in_box, box=box, t=t_i, y=y_i, method=method)
        return _newton_polish(z0, fun, polish_iters)

    return jax.vmap(one_mode)(T, Y, z_best)


@jax.jit
def _finalize(box, z_fin):
    """Unconstrained winners -> log hyperparameters, on device."""
    return jax.vmap(box.to_log_params)(z_fin)


@jax.jit
def _select_winner(v, z):
    """Gather each mode's best screened candidate on the device.

    A standalone XLA program on purpose: fusing the argmin+gather INTO the
    polish graph trips an XLA:TPU memory-space assignment bug (CLAUDE.md),
    but the bare argmin+gather is fine and avoids a host round trip.
    """
    best = jnp.argmin(v, axis=1)
    idx = jnp.arange(z.shape[0])
    return z[idx, best]


# Host-compiled variants are built ONCE at module scope: host_jit returns a
# fresh jax.jit wrapper (fresh trace cache), so building it per fit call
# would re-trace the polish/rank graphs every time (~2 s of fixed overhead
# per fit measured on this machine).
_polish_all_host = host_jit(
    _polish_all.__wrapped__, static_argnames=("polish_iters", "method")
)
_rank_full_host = host_jit(  # host f64 NLML (profiling/oracles)
    _rank_full.__wrapped__, static_argnames=("method",)
)


def default_fit_dtype():
    """float32 on TPU (no native f64; the NLML's per-iteration Cholesky in
    emulated f64 is ~15x slower to compile and run), float64 elsewhere.
    Hyperparameter selection tolerates f32 — the fitted values feed f64
    estimation downstream, and the reference itself accepts its two
    backends agreeing only to rtol=1e-1 (``ODEs/main.py:155``)."""
    import jax as _jax

    return jnp.float32 if _jax.default_backend() == "tpu" else jnp.float64


def fit_gp_hyperparameters(
    t: jnp.ndarray,
    Y: jnp.ndarray,
    box: BoxTransform,
    key: jax.Array,
    n_restarts: int = 50,
    adam_steps: int = 60,
    adam_lr: float = 0.1,
    polish_iters: int = 10,
    fit_dtype=None,
    screen_points: Optional[int] = 32,
    polish_points: Optional[int] = 128,
) -> FitResult:
    """Fit RBF+white GP hyperparameters for every row of Y at once.

    Four phases, all on the accelerator in ``fit_dtype`` — screening
    (vmapped Adam over all mode x restart starts), winner selection
    (argmin+gather), polish (damped Newton from each mode's best), and a
    full-data NLML re-rank of the winner/polished pair — kept as separate
    XLA programs (the fused argmin+gather+polish graph trips an XLA:TPU
    memory-space assignment bug). The function performs NO device->host
    synchronization: on a tunneled accelerator every readback costs
    ~30-40 ms of round-trip latency (measured round 3; the previous
    host-verified flow spent ~0.9 s on ~8 ms of actual compute), so the
    result arrays stay on device until the caller consumes them.

    Parameters
    ----------
    t : (m,) or (r, m) array
        Training times, shared across modes or per-mode (the ODE pipeline's
        unsynced sampling gives each state variable its own times,
        reference ``ODEs/step1_generate_data.py:124-136``).
    Y : (r, m) array
        Training observations, one row per state variable / POD mode.
    box : BoxTransform
        Log-space hyperparameter bounds.
    key : PRNG key for restart sampling.
    n_restarts : int
        Random restarts in addition to the default start.
    adam_steps, adam_lr : screening descent budget. The screen only has
        to land each mode's best restart in the right BASIN — the
        full-data re-rank plus Newton polish finish the job — so the
        budget is deliberately short (round-4 analysis: the fit stage is
        bound by the sequential critical path adam_steps x unrolled
        factorization depth, not FLOPs; 60 steps at lr 0.1 reproduces the
        100-step/0.08 selections on every pipeline workload).
    polish_iters : Newton iterations from each mode's screening winner
        (converges in <= 8 from a screened basin; the default has margin).
    fit_dtype : optimization dtype (see ``default_fit_dtype``).
    screen_points : optional int
        When the training set is larger than this, the Adam screening
        descends on an evenly-strided subset of this many points — the
        per-step Cholesky is O(m^3), so screening at 32 of 200 points is
        ~200x cheaper. Basin SELECTION stays exact: every candidate is
        then re-ranked by its full-data NLML (one batched Cholesky,
        ``_rank_full``) before the Newton polish. None disables
        subsampling. The default 32 (was 64, round 3) also halves the
        screening program's unrolled-Cholesky footprint — its compiled
        executable is the largest binary the warm-process path ships to
        the accelerator, and on a tunneled backend the per-process load
        is ~1 s/MB (measured round 4).
    polish_points : optional int
        Same strided-subsample cap for the Newton polish (its Hessian
        evaluations are also O(m^3) per iteration). None polishes on the
        full data. Either way the final winner-vs-polish selection is a
        full-data NLML comparison in ``fit_dtype`` (Phase 3; the
        sync-free redesign keeps it on the fitting device).

    Returns
    -------
    FitResult still resident on the fitting device (no sync has
    happened): (r,)-shaped hyperparameters in the default float width;
    the ``nlml`` field stays in ``fit_dtype``.
    """
    import numpy as np

    fit_dtype = fit_dtype or default_fit_dtype()
    r = Y.shape[0]
    T = jnp.broadcast_to(t, (r, t.shape[-1])) if t.ndim == 1 else t
    Ts = T.astype(fit_dtype)
    Ys = Y.astype(fit_dtype)
    box_s = BoxTransform(box.lo.astype(fit_dtype), box.hi.astype(fit_dtype))
    keys = jax.random.split(key, r)

    # Phase 1 — screening on the accelerator: one batched population, the
    # per-step cost amortizes across all (mode, restart) instances.
    m = Ts.shape[-1]
    subsampled = screen_points is not None and m > screen_points
    if subsampled:
        # Evenly strided through the (sorted) sample times, endpoints kept.
        idx = jnp.asarray(
            np.unique(np.linspace(0, m - 1, screen_points).round().astype(int))
        )
        T_scr, Y_scr = Ts[:, idx], Ys[:, idx]
    else:
        T_scr, Y_scr = Ts, Ys
    z_scr, v_scr = _screen_all(
        # lr as a committed fit_dtype scalar (not a weak Python float):
        # the AOT program cache only keys pytrees of array leaves.
        T_scr, Y_scr, box_s, keys, n_restarts, adam_steps,
        jnp.asarray(adam_lr, fit_dtype),
    )
    if subsampled:
        # Re-rank every candidate by the FULL-data NLML, chunking the
        # candidate axis when the batched kernels would overflow HBM
        # (m=2048 x 30 modes x 33 candidates = 16.6 GB unchunked).
        v_scr = _rank_full_chunked(Ts, Ys, box_s, z_scr)
    z_best = _select_winner(v_scr, z_scr)  # on-device argmin+gather

    # Phase 2 — damped-Newton polish (``_newton_polish``) on the
    # accelerator in fit_dtype: r instances, each iteration one 3x3
    # Hessian via autodiff plus three damped-candidate NLML evaluations.
    # The per-eval Cholesky is O(m^3), so the polish descends on a strided
    # subsample above ``polish_points``. If the device polish fails to
    # COMPILE (axon toolchain regressions have eaten richer graphs than
    # this), fall back to the host f64 polish program. A device RUNTIME
    # failure is not caught here: under async dispatch it surfaces at the
    # caller's first readback — the accepted trade-off for keeping the
    # fit sync-free (a readback inside this try would cost a tunnel
    # round trip on every fit).
    if polish_points is not None and m > polish_points:
        pidx = jnp.asarray(
            np.unique(
                np.linspace(0, m - 1, polish_points).round().astype(int)
            )
        )
        T_pol, Y_pol = Ts[:, pidx], Ys[:, pidx]
    else:
        T_pol, Y_pol = Ts, Ys
    # method="chol": the polish differentiates the NLML twice
    # (``jax.hessian``), and jacfwd(jacrev) through the UNROLLED Cholesky
    # builds an O(m * iters)-equation jaxpr — 115 s of pure Python tracing
    # at m=90 on a 1-core host (measured round 3), vs seconds through the
    # ``cholesky`` primitive's closed-form JVP. Runtime is a wash: the
    # unrolled path only pays at screening's (mode x restart) batch width,
    # not the polish's r instances.
    try:
        z_pol, _ = _polish_all(
            T_pol, Y_pol, box_s, z_best, polish_iters, method="chol"
        )
    except Exception:  # pragma: no cover - axon toolchain fallback
        f64 = jnp.float64
        box64 = BoxTransform(box.lo.astype(f64), box.hi.astype(f64))
        z_pol_h, _ = _polish_all_host(
            jnp.asarray(np.asarray(T_pol), f64),
            jnp.asarray(np.asarray(Y_pol), f64),
            box64,
            jnp.asarray(np.asarray(z_best, np.float64)),
            polish_iters,
            # Host execution: the LAPACK Cholesky custom call is both
            # faster and cheaper to compile on CPU than the unrolled
            # straight-line factorization "auto" would pick from the
            # session's TPU default backend.
            method="chol",
        )
        z_pol = jnp.asarray(np.asarray(z_pol_h), fit_dtype)

    # Phase 3 — full-data re-rank of the (screen winner, polished) pair:
    # one batched Cholesky per candidate, the exact same program as the
    # subsample re-rank. The selection stays FULL-DATA exact; it runs in
    # fit_dtype on the same device as everything else, so the fit stays
    # sync-free (the reference's own backends agree only to rtol=1e-1,
    # ``ODEs/main.py:155`` — an f32 tie between two near-identical optima
    # is far below that tolerance).
    pair = jnp.stack([z_best, z_pol], axis=1)  # (r, 2, 3)
    v_pair = _rank_full_chunked(Ts, Ys, box_s, pair)
    z_fin = _select_winner(v_pair, pair)
    v_fin = jnp.min(v_pair, axis=1)

    log_params = _finalize(box_s, z_fin)
    params = jnp.exp(log_params).astype(jnp.result_type(float))
    return FitResult(params[:, 0], params[:, 1], params[:, 2], v_fin)
