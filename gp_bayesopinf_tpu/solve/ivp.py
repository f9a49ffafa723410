"""Fixed-step, scan-based initial-value-problem solvers.

The reference integrates every truth model, every posterior draw, and every
regularization candidate with serial ``scipy.integrate.solve_ivp`` calls
(``models/ode_models.py:78-126``, ``codebase/bayes.py:337-361``,
``*/step3_estimate.py``). On TPU the equivalent capability is a fixed-step
integrator expressed as ``lax.scan`` over the output grid with a constant
number of substeps per output interval: static shapes, jit-compilable, and
trivially ``vmap``-able over ensembles of operator draws.

Instability (scipy's early termination / blow-up) is handled by *masking*:
an unstable trajectory runs to completion producing inf/NaN and
``stability_mask`` marks it invalid, replicating the reference's rejection
semantics (``PDEs/main.py:135-141``) without data-dependent control flow.

Two schemes:

* ``rk4_solve`` — classical RK4, for non-stiff systems (reference uses
  RK45 for SEIRD / Euler / quadratic ROMs).
* ``dirk2_solve`` — 2-stage L-stable SDIRK (Alexander's method,
  gamma = 1 - sqrt(2)/2) with fixed Newton iterations, for stiff systems
  (reference uses BDF for the heat equation,
  ``PDEsMulti/config_heat.py:96``, ``models/pde_models.py:776-840``).
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp


# Any state with |q| >= DIVERGED is treated as a blown-up trajectory by the
# masks below; the integrators clamp at a larger sentinel so diverging
# members stay finite (cheap arithmetic, no NaN propagation) but are still
# unambiguously detectable.
DIVERGED = 1e16


def _clip_state(q: jnp.ndarray) -> jnp.ndarray:
    """Clamp diverging trajectories to a large sentinel (> DIVERGED)."""
    return jnp.clip(q, -1e18, 1e18)


# Newton systems with state dimension at or below this threshold are solved
# with the unrolled elimination below instead of ``jnp.linalg.solve``: the
# resulting graph is pure elementwise arithmetic (no LU custom calls), which
# both vmaps cheaply over posterior ensembles and avoids the XLA:TPU
# crash observed for nested scan+vmap+LU graphs (see CLAUDE.md).
SMALL_SOLVE_MAX = 8


def solve_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for small, static n by unrolled Gaussian elimination.

    No pivoting: the intended inputs are SDIRK Newton matrices
    I - h*gamma*J, which are near-identity for the step sizes the
    integrators take, so the diagonal never degenerates. The unrolled form
    is a straight-line XLA graph of fused multiply-adds — ideal under
    ``vmap`` over draws and free of linear-algebra custom calls.
    """
    n = b.shape[0]
    rows = [A[i] for i in range(n)]
    rhs = [b[i] for i in range(n)]
    for k in range(n):
        inv = 1.0 / rows[k][k]
        for i in range(k + 1, n):
            f = rows[i][k] * inv
            rows[i] = rows[i] - f * rows[k]
            rhs[i] = rhs[i] - f * rhs[k]
    x: list = [None] * n
    for i in reversed(range(n)):
        acc = rhs[i]
        for j in range(i + 1, n):
            acc = acc - rows[i][j] * x[j]
        x[i] = acc / rows[i][i]
    return jnp.stack(x)


def thomas_solve(
    dl: jnp.ndarray, d: jnp.ndarray, du: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Solve a tridiagonal system given the three diagonals.

    ``dl`` is the subdiagonal with dl[0] ignored, ``du`` the superdiagonal
    with du[-1] ignored (LAPACK gtsv layout). Dispatches to XLA's native
    tridiagonal solve — O(n) work and memory versus the O(n^3)/O(n^2) of a
    dense solve, which is what makes implicit stepping of the ~500-DOF heat
    FOM (reference ``models/pde_models.py:776-840``, scipy BDF with a
    sparse Jacobian) cheap in this framework too.
    """
    from jax.lax.linalg import tridiagonal_solve

    return tridiagonal_solve(dl, d, du, b[:, None])[:, 0]


def rk4_solve(
    rhs: Callable,
    q0: jnp.ndarray,
    t_eval: jnp.ndarray,
    substeps: int = 8,
    unroll: int = 1,
) -> jnp.ndarray:
    """Integrate dq/dt = rhs(t, q) with classical RK4.

    Parameters
    ----------
    rhs : callable (t, q) -> dq/dt. Closed over any operators/inputs.
    q0 : (n,) array — initial state at ``t_eval[0]``.
    t_eval : (k,) array — output times (may be non-uniform).
    substeps : int — RK4 steps per output interval (static; unrolled in
        the step body so the sequential dimension carries no loop
        machinery).
    unroll : int — ``lax.scan`` unroll factor over output intervals.
        Default 1 (round 4; was 4): at ensemble batch widths every scan
        iteration is already a wide device op, so unrolling bought ~no
        runtime while quadrupling the compiled executable — which a
        tunneled accelerator re-loads every process at ~1 s/MB. The
        screening megakernel path never touches this (its XLA twin
        carries its own unroll).

    Returns
    -------
    (n, k) array of states at ``t_eval`` (first column is ``q0``).
    """

    def rk4_step(t, q, h):
        k1 = rhs(t, q)
        k2 = rhs(t + 0.5 * h, q + 0.5 * h * k1)
        k3 = rhs(t + 0.5 * h, q + 0.5 * h * k2)
        k4 = rhs(t + h, q + h * k3)
        return _clip_state(q + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4))

    def step_interval(q, t_pair):
        t0, t1 = t_pair
        h = (t1 - t0) / substeps
        if substeps <= 8:
            # Unrolled: no loop machinery on the sequential path.
            for i in range(substeps):
                q = rk4_step(t0 + i * h, q, h)
        else:
            # Large substep counts (CFL-limited FOM solves): rolled loop
            # keeps the compiled graph small.
            q = jax.lax.fori_loop(
                0, substeps, lambda i, q: rk4_step(t0 + i * h, q, h), q
            )
        return q, q

    t_pairs = jnp.stack([t_eval[:-1], t_eval[1:]], axis=1)
    eff_unroll = unroll if substeps <= 8 else 1
    _, qs = jax.lax.scan(step_interval, q0, t_pairs, unroll=eff_unroll)
    return jnp.concatenate([q0[None, :], qs], axis=0).T


def rk4_solve_np(
    rhs: Callable,
    q0,
    t_eval,
    substeps: int = 8,
):
    """NumPy twin of :func:`rk4_solve` for host-side truth solves.

    The reference's L1 data-generation stage is scipy on the host
    (``models/ode_models.py:78-126``); the TPU framework keeps that stage
    on the host too, but a traced-and-compiled ``lax.scan`` is the wrong
    tool for it — each pipeline call builds a fresh closure, so the
    program retraces and (through the remote XLA compile helper) pays a
    multi-second round trip per *call* for a solve whose arithmetic takes
    milliseconds. This mirror runs the identical stepping (same operation
    order, f64) as straight NumPy: no tracing, no compiles, no device.

    Same contract as ``rk4_solve``: returns (n, k) states at ``t_eval``
    with diverging trajectories clamped to the sentinel.
    """
    import numpy as np

    q = np.asarray(q0, dtype=np.float64).copy()
    t = np.asarray(t_eval, dtype=np.float64)
    out = np.empty((t.size, q.size), dtype=np.float64)
    out[0] = q
    for i in range(t.size - 1):
        t0 = t[i]
        h = (t[i + 1] - t0) / substeps
        for s in range(substeps):
            ts = t0 + s * h
            k1 = rhs(ts, q)
            k2 = rhs(ts + 0.5 * h, q + 0.5 * h * k1)
            k3 = rhs(ts + 0.5 * h, q + 0.5 * h * k2)
            k4 = rhs(ts + h, q + h * k3)
            q = np.clip(
                q + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4), -1e18, 1e18
            )
        out[i + 1] = q
    return out.T


def dirk2_solve_np(
    rhs: Callable,
    q0,
    t_eval,
    jac_tridiag: Callable,
    substeps: int = 2,
    newton_iters: int = 6,
    newton_tol: float = 1e-9,
):
    """NumPy twin of :func:`dirk2_solve` for host-side truth solves
    (tridiagonal-Jacobian path only — the heat FOM family).

    Same rationale as :func:`rk4_solve_np`: the reference's L1
    data-generation stage is scipy-on-host (``models/pde_models.py:
    776-840``, sparse BDF), and a traced ``lax.scan`` pays per-process
    tracing plus a fresh XLA:CPU compile per closure (each trajectory's
    forcing parameters build a new FOM object) for milliseconds of
    arithmetic. This mirror runs the identical stepping — same Butcher
    tableau, same Newton iteration, same operation order — with LAPACK
    ``dgtsv`` for the O(n) tridiagonal Newton solves.

    ``newton_tol`` > 0 stops the Newton iteration once
    ``max|dk| <= newton_tol * max(1, max|k|)`` — quadratic convergence
    makes the remaining fixed iterations of the traced twin pure
    no-op refinement, so the host result agrees to ~machine precision
    (measured at the heat-multi pipeline shapes: 1e-9 vs 1e-13 states
    differ by 1.6e-16 relative, 2.3x faster); pass 0.0 for the traced
    path's exact fixed-count stepping.

    ``rhs(t, q)`` and ``jac_tridiag(t, q) -> (dl, diag, du)`` must be
    host-NumPy callables (``HeatBimodal.solve_host`` supplies them).
    Returns (n, k) states at ``t_eval``.
    """
    import numpy as np
    from scipy.linalg import lapack

    q = np.asarray(q0, np.float64).copy()
    t = np.asarray(t_eval, np.float64)
    out = np.empty((t.size, q.size))
    out[0] = q

    def newton_solve(t_s, x, h, F):
        dl, dg, du = jac_tridiag(t_s, x)
        hg = h * _GAMMA
        # The scaled bands are freshly allocated here, so dgtsv may
        # overwrite them (and F is dead after the solve) — skips four
        # internal LAPACK copies per Newton iteration.
        _, _, _, dk, info = lapack.dgtsv(
            -hg * dl[1:], 1.0 - hg * dg, -hg * du[:-1], F,
            overwrite_dl=1, overwrite_d=1, overwrite_du=1, overwrite_b=1,
        )
        if info != 0:  # pragma: no cover - singular Newton matrix
            raise np.linalg.LinAlgError(f"dgtsv failed (info={info})")
        return dk

    def solve_stage(t_s, q_base, h, k):
        for _ in range(newton_iters):
            x = q_base + h * _GAMMA * k
            F = k - rhs(t_s, x)
            dk = newton_solve(t_s, x, h, F)
            k = k - dk
            if newton_tol and np.max(np.abs(dk)) <= newton_tol * max(
                1.0, np.max(np.abs(k))
            ):
                break
        return k

    for i in range(t.size - 1):
        t0 = t[i]
        h = (t[i + 1] - t0) / substeps
        for s in range(substeps):
            ts = t0 + s * h
            k1 = solve_stage(ts + _GAMMA * h, q, h, rhs(ts, q))
            base2 = q + h * (1.0 - _GAMMA) * k1
            k2 = solve_stage(ts + h, base2, h, k1)
            q = np.clip(
                q + h * ((1.0 - _GAMMA) * k1 + _GAMMA * k2), -1e18, 1e18
            )
        out[i + 1] = q
    return out.T


_GAMMA = 1.0 - 0.5 * 2.0**0.5  # SDIRK2 (Alexander) stage coefficient.


def dirk2_solve(
    rhs: Callable,
    q0: jnp.ndarray,
    t_eval: jnp.ndarray,
    jac: Optional[Callable] = None,
    jac_tridiag: Optional[Callable] = None,
    substeps: int = 2,
    newton_iters: int = 6,
    unroll: int = 1,  # see rk4_solve: executable size >> unroll runtime win
) -> jnp.ndarray:
    """Integrate a stiff system with 2-stage L-stable SDIRK + Newton.

    Butcher tableau (gamma = 1 - sqrt(2)/2):

        gamma | gamma      0
          1   | 1-gamma  gamma
        ------+----------------
              | 1-gamma  gamma

    Each stage solves k = rhs(t_s, q + h a k) with ``newton_iters`` full
    Newton steps. The Newton linear solve picks the cheapest structure
    available:

    * ``jac_tridiag(t, q) -> (dl, diag, du)`` — the RHS Jacobian is
      tridiagonal (1-D finite-difference diffusion + diagonal reaction:
      the heat FOM, reference ``models/pde_models.py:618-627,1110-1119``);
      the Newton matrix I - h*gamma*J stays tridiagonal and is solved in
      O(n) by :func:`thomas_solve`.
    * small n (<= ``SMALL_SOLVE_MAX``) — unrolled elimination
      (:func:`solve_small`), the vmap-friendly path for ROM ensembles.
    * otherwise — dense ``jnp.linalg.solve`` on the Jacobian (analytic via
      ``jac`` or computed with ``jax.jacfwd``).

    Returns
    -------
    (n, k) array of states at ``t_eval``.
    """
    jac_fn = jac if jac is not None else (lambda t, q: jax.jacfwd(rhs, argnums=1)(t, q))
    n = q0.shape[0]
    eye = jnp.eye(n, dtype=q0.dtype)

    def newton_solve(t_s, x, h, F):
        if jac_tridiag is not None:
            dl, dg, du = jac_tridiag(t_s, x)
            hg = h * _GAMMA
            return thomas_solve(-hg * dl, 1.0 - hg * dg, -hg * du, F)
        J = eye - h * _GAMMA * jac_fn(t_s, x)
        if n <= SMALL_SOLVE_MAX:
            return solve_small(J, F)
        return jnp.linalg.solve(J, F)

    def solve_stage(t_s, q_base, h, k_init):
        """Newton-solve k = rhs(t_s, q_base + h*gamma*k)."""

        def newton(_, k):
            x = q_base + h * _GAMMA * k
            F = k - rhs(t_s, x)
            dk = newton_solve(t_s, x, h, F)
            return k - dk

        return jax.lax.fori_loop(0, newton_iters, newton, k_init)

    def step_interval(q, t_pair):
        t0, t1 = t_pair
        h = (t1 - t0) / substeps
        for i in range(substeps):
            t = t0 + i * h
            k1 = solve_stage(t + _GAMMA * h, q, h, rhs(t, q))
            base2 = q + h * (1.0 - _GAMMA) * k1
            k2 = solve_stage(t + h, base2, h, k1)
            q = _clip_state(q + h * ((1.0 - _GAMMA) * k1 + _GAMMA * k2))
        return q, q

    t_pairs = jnp.stack([t_eval[:-1], t_eval[1:]], axis=1)
    _, qs = jax.lax.scan(step_interval, q0, t_pairs, unroll=unroll)
    return jnp.concatenate([q0[None, :], qs], axis=0).T


def stability_mask(
    solution: jnp.ndarray,
    shift: jnp.ndarray,
    limits: jnp.ndarray,
) -> jnp.ndarray:
    """Reference instability criterion as a mask.

    A draw is unstable when it is non-finite anywhere (fixed-step analogue
    of scipy terminating early) or any state leaves the envelope
    |q_i(t) - shift_i| > limits_i, where shift is the training-snapshot mean
    and limits = 5 x max amplitude (``PDEs/step3_estimate.py:64-73``,
    ``PDEs/main.py:126-140``).

    Parameters
    ----------
    solution : (..., n, k) array.
    shift : (n,) or (n, 1) array; leading batch dims that broadcast
        against ``solution``'s are allowed (e.g. per-window (W, n)
        envelopes against (draws, W, n, k) rollouts — the local-basis
        windowed pipeline).
    limits : (n,) array (same batching rule).

    Returns
    -------
    (...,) bool array — True where the trajectory is STABLE.
    """
    shift = jnp.asarray(shift)
    if shift.ndim == 2 and shift.shape[-1] == 1:  # legacy (n, 1) form
        shift = shift[:, 0]
    finite = jnp.all(
        jnp.isfinite(solution) & (jnp.abs(solution) < DIVERGED), axis=(-2, -1)
    )
    dev = jnp.max(jnp.abs(solution - shift[..., None]), axis=-1)  # (..., n)
    inside = jnp.all(dev <= limits, axis=-1)
    return finite & inside


def finite_mask(solution: jnp.ndarray) -> jnp.ndarray:
    """True where the trajectory neither NaN'd nor hit the divergence clamp."""
    return jnp.all(
        jnp.isfinite(solution) & (jnp.abs(solution) < DIVERGED), axis=(-2, -1)
    )
