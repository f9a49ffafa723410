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
from ..utils.hostmath import host_jit


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


@partial(jax.jit, static_argnames=("n_restarts", "adam_steps"))
def _screen_all(T, Y, box, keys, n_restarts, adam_steps, adam_lr):
    """Phase 1: Adam screening of all (mode, restart) starts."""

    def one_mode(t_i, y_i, key_i):
        fun = partial(nlml_in_box, box=box, t=t_i, y=y_i)
        z0s = _initial_z(box, key_i, n_restarts).astype(T.dtype)
        z, v = jax.vmap(lambda z: _adam_screen(z, fun, adam_steps, adam_lr))(z0s)
        return z, jnp.where(jnp.isfinite(v), v, jnp.inf)

    return jax.vmap(one_mode)(T, Y, keys)


@jax.jit
def _rank_full(T, Y, box, Z):
    """Evaluate the FULL-data NLML for every screened candidate — one
    batched Cholesky per (mode, restart) instance, so re-ranking costs one
    screening step regardless of the subsample used during descent."""

    def one_mode(t_i, y_i, z_i):
        fun = partial(nlml_in_box, box=box, t=t_i, y=y_i)
        return jax.vmap(fun)(z_i)

    v = jax.vmap(one_mode)(T, Y, Z)
    return jnp.where(jnp.isfinite(v), v, jnp.inf)


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


@partial(jax.jit, static_argnames=("polish_iters",))
def _polish_all(T, Y, box, z_best, polish_iters):
    """Phase 2: Newton polish from each mode's screening winner."""

    def one_mode(t_i, y_i, z0):
        fun = partial(nlml_in_box, box=box, t=t_i, y=y_i)
        return _newton_polish(z0, fun, polish_iters)

    return jax.vmap(one_mode)(T, Y, z_best)


# Host-compiled variants are built ONCE at module scope: host_jit returns a
# fresh jax.jit wrapper (fresh trace cache), so building it per fit call
# would re-trace the polish/rank graphs every time (~2 s of fixed overhead
# per fit measured on this machine).
_polish_all_host = host_jit(_polish_all, static_argnames=("polish_iters",))
_rank_full_host = host_jit(_rank_full)


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
    adam_steps: int = 100,
    adam_lr: float = 0.08,
    polish_iters: int = 10,
    fit_dtype=None,
    screen_points: Optional[int] = 64,
) -> FitResult:
    """Fit RBF+white GP hyperparameters for every row of Y at once.

    Two jitted phases with a host-side winner selection in between —
    screening (vmapped Adam over all mode x restart starts) and polish
    (damped Newton from each mode's best) — kept as separate XLA programs
    (the fused argmin+gather+polish graph trips an XLA:TPU memory-space
    assignment bug).

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
    adam_steps, adam_lr : screening descent budget.
    polish_iters : Newton iterations from each mode's screening winner
        (converges in <= 8 from a screened basin; the default has margin).
    fit_dtype : optimization dtype (see ``default_fit_dtype``).
    screen_points : optional int
        When the training set is larger than this, the Adam screening
        descends on an evenly-strided subset of this many points — the
        per-step Cholesky is O(m^3), so screening at 64 of 200 points is
        ~30x cheaper. Basin SELECTION stays exact: every candidate is then
        re-ranked by its full-data NLML (one batched Cholesky,
        ``_rank_full``) before the full-data L-BFGS polish. None disables
        subsampling.

    Returns
    -------
    FitResult with (r,)-shaped float64 fields.
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
        T_scr, Y_scr, box_s, keys, n_restarts, adam_steps, adam_lr
    )
    if subsampled:
        # Re-rank every candidate by the FULL-data NLML.
        v_scr = _rank_full(Ts, Ys, box_s, z_scr)
    best = np.asarray(jnp.argmin(v_scr, axis=1))  # host-side winner select
    z_best = z_scr[jnp.arange(r), best]
    v_best = v_scr[jnp.arange(r), best]

    # Phase 2 — polish on the host in f64: only r L-BFGS instances, each
    # line-search evaluation one batched LAPACK Cholesky. (Running the
    # compiled L-BFGS program on the TPU instead crashes the axon worker
    # — same bug family as the fused argmin+gather+polish graph — and
    # f64 there is emulated besides.) The zoom line search makes ~20
    # evaluations per iteration, so at large m the O(m^3) per-eval cost
    # is capped by polishing on a strided subsample (same trick as the
    # screening phase; ~900 s -> ~30 s at r=30, m=512). The WINNER
    # SELECTION below stays exact either way: both candidates are
    # re-evaluated with the full-data f64 NLML.
    f64 = jnp.float64
    box64 = BoxTransform(box.lo.astype(f64), box.hi.astype(f64))
    polish_points = 128
    if m > polish_points:
        pidx = jnp.asarray(
            np.unique(
                np.linspace(0, m - 1, polish_points).round().astype(int)
            )
        )
        T_pol, Y_pol = T[:, pidx], Y[:, pidx]
    else:
        T_pol, Y_pol = T, Y
    z_pol, _ = _polish_all_host(
        T_pol.astype(f64), Y_pol.astype(f64), box64, z_best.astype(f64),
        polish_iters,
    )

    # Full-data f64 NLML for both candidates (2r evaluations, host LAPACK).
    pair = jnp.stack(
        [jnp.asarray(np.asarray(z_best, np.float64)),
         jnp.asarray(np.asarray(z_pol, np.float64))],
        axis=1,
    )  # (r, 2, 3)
    v_pair = np.asarray(
        _rank_full_host(T.astype(f64), Y.astype(f64), box64, pair)
    )
    # Selection math happens in NumPy on host copies: screening outputs may
    # be committed to an accelerator (or sharded over a mesh) while the
    # polish is host-committed, and the r x 3 arithmetic is trivial.
    z_pair_h = np.asarray(pair)
    pick = np.argmin(v_pair, axis=1)
    z_fin = jnp.asarray(z_pair_h[np.arange(r), pick])
    v_fin = jnp.asarray(v_pair[np.arange(r), pick])

    log_params = jax.vmap(box64.to_log_params)(z_fin)
    params = jnp.exp(log_params)
    return FitResult(params[:, 0], params[:, 1], params[:, 2], v_fin)
