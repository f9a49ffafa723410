"""Pallas TPU megakernel for posterior-ensemble screening.

The regularization search integrates G candidates x ndraws posterior
draws of a quadratic "cAH" ROM over two time grids (reference
``PDEs/step3_estimate.py:97-129``: 81 x 20 x 2 serial scipy solves). The
XLA path vmaps those integrations, but every RK4 substage is a separate
tiny op on the sequential path — dispatch overhead dominates for r ~ 6
states. This kernel fuses the ENTIRE screening integration into one
Pallas program and emits only the decision quantities:

* per-draw stability flags (finite + inside the 5x-amplitude envelope),
* per-candidate accumulated squared error of the draw-mean trajectory
  against the GP state estimates.

TPU-native layout choices:

* draws live on the LANE axis — the state is an (r, N) tile, every RK4
  operation is a full-width VPU op, nothing is reshaped in-kernel;
* the ROM right-hand side is a static loop over the d = 1 + r + r(r+1)/2
  compressed polynomial features: one fused multiply-add of (r, N) per
  feature, with feature values built from statically-indexed state rows;
* per-candidate draw-means come from ONE MXU matmul against a constant
  (N, G) group-indicator matrix — no lane-axis segment reductions;
* float32 throughout (Mosaic has no f64) — exactly the precision contract
  of the screening path, while posteriors and final ensembles stay f64.
"""

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quadratic import ckron_indices

LANES = 128
DIVERGE_CAP = 1e6  # must dominate any stability envelope


def _pad_to_lanes(n: int) -> int:
    return ((n + LANES - 1) // LANES) * LANES


def _screen_kernel(
    t_ref,  # SMEM (k,)
    OT_ref,  # VMEM (d, r, Np) per-draw operator columns
    q0_ref,  # VMEM (r, Np)
    shift_ref,  # VMEM (r, 1)
    limits_ref,  # VMEM (r, 1)
    snaps_ref,  # VMEM (k, r) GP state estimates, TIME ON SUBLANES (zeros if unused)
    gmat_ref,  # VMEM (Np, G) group indicator / nd
    stable_ref,  # out VMEM (r, Np) int32
    err_ref,  # out VMEM (1, G) f32
    *,
    substeps: int,
    k: int,
    r: int,
    track_error: bool,
    pairs,
):
    OT = OT_ref[:]  # (d, r, Np)
    q = q0_ref[:]  # (r, Np)
    shift = shift_ref[:]  # (r, 1)
    limits = limits_ref[:]  # (r, 1)
    gmat = gmat_ref[:]  # (Np, G)

    def rhs(q):
        # Static unroll over compressed polynomial features:
        # dq = Ohat[:, 0] + sum_a Ohat[:, 1+a] q_a + sum_(a>=b) Ohat q_a q_b.
        acc = OT[0]  # constant column, (r, Np)
        for a in range(r):
            acc = acc + OT[1 + a] * q[a : a + 1, :]
        for z, (a, b) in enumerate(pairs):
            acc = acc + OT[1 + r + z] * (q[a : a + 1, :] * q[b : b + 1, :])
        return acc

    def clip(x):
        return jnp.clip(x, -DIVERGE_CAP, DIVERGE_CAP)

    maxdev0 = jnp.abs(q - shift)

    def step_error(i, q, err):
        if not track_error:
            return err
        mean = jnp.dot(q, gmat, preferred_element_type=jnp.float32)  # (r, G)
        # Dynamic LANE-axis reads (snaps[:, i]) crash the axon Mosaic
        # toolchain; the snapshots therefore arrive transposed (k, r) and
        # the per-step target is a dynamic SUBLANE row read (supported)
        # plus a tiny (1, r) -> (r, 1) relayout. The index must be a
        # TRACED scalar: pl.ds with a concrete value trips a PyTreeDef
        # bug in the Mosaic load lowering, hence the static slice for the
        # initial step below.
        row = (
            snaps_ref[0:1, :]
            if isinstance(i, int)
            else snaps_ref[pl.ds(i, 1), :]
        )  # (1, r)
        diff = mean - jnp.transpose(row)  # (r, G) - (r, 1)
        return err + jnp.sum(diff * diff, axis=0, keepdims=True)  # (1, G)

    err0 = jnp.zeros_like(err_ref)
    err0 = step_error(0, q, err0)

    one = jnp.int32(1)

    def interval(i, carry):
        q, maxdev, err = carry
        i = i.astype(jnp.int32)
        t0 = t_ref[i - one]
        t1 = t_ref[i]
        h = (t1 - t0) / substeps
        for _ in range(substeps):
            k1 = rhs(q)
            k2 = rhs(clip(q + 0.5 * h * k1))
            k3 = rhs(clip(q + 0.5 * h * k2))
            k4 = rhs(clip(q + h * k3))
            q = clip(q + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4))
        maxdev = jnp.maximum(maxdev, jnp.abs(q - shift))
        err = step_error(i, q, err)
        return q, maxdev, err

    q, maxdev, err = jax.lax.fori_loop(
        jnp.int32(1), jnp.int32(k), interval, (q, maxdev0, err0)
    )
    stable_ref[:] = ((maxdev <= limits) & jnp.isfinite(maxdev)).astype(jnp.int32)
    err_ref[:] = err


@functools.partial(
    jax.jit, static_argnames=("nd", "substeps", "track_error", "interpret")
)
def quadratic_ensemble_screen(
    Ohat: jnp.ndarray,  # (N, r, d) compressed operators per draw
    q0: jnp.ndarray,  # (r,)
    t_eval: jnp.ndarray,  # (k,)
    shift: jnp.ndarray,  # (r,)
    limits: jnp.ndarray,  # (r,)
    snapshots: Optional[jnp.ndarray] = None,  # (r, k) error target
    nd: int = 20,
    substeps: int = 4,
    track_error: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Screen all candidate/draw ROM integrations in one fused kernel.

    N = G * nd with each candidate's draws contiguous. Returns

    * stable : (N,) bool — per-draw stability,
    * err_sq : (G,) f32 — accumulated squared error of the per-candidate
      draw-mean trajectory vs ``snapshots`` over all output times
      (zeros when ``track_error=False``).
    """
    f32 = jnp.float32
    N, r, d = Ohat.shape
    G = N // nd
    k = t_eval.shape[0]
    Np = _pad_to_lanes(N)
    pairs = tuple((int(a), int(b)) for a, b in zip(*ckron_indices(r)))

    # (N, r, d) -> (d, r, Np); padding draws carry zero operators.
    OT = jnp.transpose(Ohat.astype(f32), (2, 1, 0))
    OT = jnp.pad(OT, ((0, 0), (0, 0), (0, Np - N)))
    q0b = jnp.broadcast_to(q0.astype(f32)[:, None], (r, Np))
    gmat = jnp.zeros((Np, G), dtype=f32)
    draw_ids = np.arange(N)
    gmat = gmat.at[draw_ids, draw_ids // nd].set(1.0 / nd)

    snaps = (
        jnp.transpose(snapshots.astype(f32))  # (k, r): time on sublanes
        if snapshots is not None
        else jnp.zeros((k, r), dtype=f32)
    )

    stable2d, err_sq = pl.pallas_call(
        functools.partial(
            _screen_kernel,
            substeps=substeps,
            k=k,
            r=r,
            track_error=track_error and snapshots is not None,
            pairs=pairs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, Np), jnp.int32),
            jax.ShapeDtypeStruct((1, G), f32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        t_eval.astype(f32),
        OT,
        q0b,
        shift.astype(f32)[:, None],
        limits.astype(f32)[:, None],
        snaps,
        gmat,
    )
    stable = jnp.all(stable2d[:, :N] == 1, axis=0)
    return stable, err_sq[0]


def quadratic_ensemble_screen_xla(
    Ohat,
    q0,
    t_eval,
    shift,
    limits,
    snapshots=None,
    nd: int = 20,
    substeps: int = 4,
    track_error: bool = True,
):
    """XLA twin of the screening kernel (identical semantics; used on CPU
    backends and as the parity reference in tests)."""
    f32 = jnp.float32
    N, r, d = Ohat.shape
    G = N // nd
    k = t_eval.shape[0]
    rows, cols = ckron_indices(r)

    O = Ohat.astype(f32)
    q0b = jnp.broadcast_to(q0.astype(f32), (N, r))
    t_eval = t_eval.astype(f32)
    shift = shift.astype(f32)
    limits = limits.astype(f32)
    snaps = (
        snapshots.astype(f32)
        if snapshots is not None
        else jnp.zeros((r, k), dtype=f32)
    )
    do_err = track_error and snapshots is not None

    def rhs(q):  # q: (N, r)
        feats = jnp.concatenate(
            [jnp.ones((N, 1), f32), q, q[:, rows] * q[:, cols]], axis=1
        )
        return jnp.einsum("nrd,nd->nr", O, feats)

    clip = lambda x: jnp.clip(x, -DIVERGE_CAP, DIVERGE_CAP)

    def err_term(i, q):
        mean = jnp.mean(q.reshape(G, nd, r), axis=1)  # (G, r)
        diff = mean - snaps[:, i].astype(f32)[None, :]
        return jnp.sum(diff * diff, axis=1)

    def interval(carry, inp):
        q, maxdev, err = carry
        i, t0, t1 = inp
        h = (t1 - t0) / substeps
        for _ in range(substeps):
            k1 = rhs(q)
            k2 = rhs(clip(q + 0.5 * h * k1))
            k3 = rhs(clip(q + 0.5 * h * k2))
            k4 = rhs(clip(q + h * k3))
            q = clip(q + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4))
        maxdev = jnp.maximum(maxdev, jnp.abs(q - shift[None, :]))
        if do_err:
            err = err + err_term(i.astype(jnp.int32), q)
        return (q, maxdev, err), None

    err0 = err_term(0, q0b) if do_err else jnp.zeros(G, f32)
    maxdev0 = jnp.abs(q0b - shift[None, :])
    idx = jnp.arange(1, k)
    (q, maxdev, err), _ = jax.lax.scan(
        interval,
        (q0b, maxdev0, err0),
        (idx, t_eval[:-1], t_eval[1:]),
        unroll=4,
    )
    stable = jnp.all(
        (maxdev <= limits[None, :]) & jnp.isfinite(maxdev), axis=1
    )
    return stable, err


# =============================================================================
# Implicit "cAHBN" screening megakernel (stiff multi-trajectory ROMs)
# =============================================================================
#
# The heat-multi pipeline screens a ContinuousModel("cAHBN") ROM with the
# L-stable SDIRK2 integrator (reference BDF, ``PDEsMulti/config_heat.py:
# 93-100``; this framework's ``solve/ivp.py::dirk2_solve``). The generic
# XLA path vmaps a Newton iteration whose every stage is a separate tiny
# op — the dominant cost of the ex3 experiment (346 s implicit reg search,
# round 2). This kernel fuses the whole candidate x draw screening
# integration, draws on lanes, with:
#
# * the SAME discretization as ``dirk2_solve``: 2-stage SDIRK
#   (gamma = 1 - sqrt(2)/2), ``newton_iters`` full Newton steps per stage,
#   the Newton matrix I - h*gamma*J rebuilt from the analytic Jacobian at
#   every iterate, and an unrolled no-pivot Gaussian elimination
#   (``solve/ivp.py::solve_small``);
# * per-lane (r x r) Newton systems held as r column tiles of (r, Np) —
#   the Jacobian assembles COLUMN-wise from the operator tiles in
#   O(r (3 + n_u)) vector ops;
# * time-dependent inputs u(t) pre-evaluated on the host/XLA side at every
#   point the integrator touches (substep starts for the Newton
#   initializer and both stage abscissae), streamed through SMEM and read
#   as scalars — no in-kernel transcendentals, and any input family
#   (closures, tables) works.


def _input_stage_times(t_eval, substeps: int):
    """All times the SDIRK2 integrator evaluates inputs at, flattened.

    Layout: for interval i (0-based over k-1 intervals) and substep s,
    rows [3*(i*substeps+s) + 0, +1, +2] hold (substep start t, stage-A
    abscissa t + gamma*h, stage-B abscissa t + h). Matches the flat index
    arithmetic inside the kernel and the XLA twin exactly.
    """
    t0 = t_eval[:-1]
    t1 = t_eval[1:]
    h = (t1 - t0)[:, None] / substeps
    starts = t0[:, None] + h * jnp.arange(substeps)  # (k-1, substeps)
    gamma = 1.0 - 0.5 * 2.0**0.5
    stacked = jnp.stack(
        [starts, starts + gamma * h, starts + h], axis=2
    )  # (k-1, substeps, 3)
    return stacked.reshape(-1)


def _cahbn_kernel(
    t_ref,  # SMEM (k,)
    *refs,  # nu SMEM input vectors ((k-1)*substeps*3,) — one per input
    #         channel: a 2-D SMEM table would be lane-padded to x128 its
    #         size and overflow the 1 MB SMEM budget — then the VMEM
    #         operands and outputs (see wrapper)
    substeps: int,
    newton_iters: int,
    k: int,
    r: int,
    nu: int,
    track_error: bool,
    pairs,
):
    u_refs = refs[:nu]
    (OT_ref, q0_ref, shift_ref, limits_ref, snaps_ref, gmat_ref,
     stable_ref, err_ref) = refs[nu:]
    OT = OT_ref[:]  # (d, r, Np)
    q = q0_ref[:]  # (r, Np)
    shift = shift_ref[:]
    limits = limits_ref[:]
    gmat = gmat_ref[:]
    gamma = 1.0 - 0.5 * 2.0**0.5
    nh = len(pairs)
    ofs_B = 1 + r + nh
    ofs_N = ofs_B + nu

    def u_at(flat):  # -> list of nu scalars
        return [u_refs[i][flat] for i in range(nu)]

    def rhs(q, u):
        acc = OT[0]
        for a in range(r):
            acc = acc + OT[1 + a] * q[a : a + 1, :]
        for z, (a, b) in enumerate(pairs):
            acc = acc + OT[1 + r + z] * (q[a : a + 1, :] * q[b : b + 1, :])
        for i in range(nu):
            acc = acc + OT[ofs_B + i] * u[i]
            for a in range(r):
                acc = acc + OT[ofs_N + i * r + a] * (u[i] * q[a : a + 1, :])
        return acc

    def jac_columns(q, u):
        """J columns as r tiles of (r, Np): J[:, j] for each j."""
        cols = []
        for j in range(r):
            c = OT[1 + j]  # A[:, j]
            for z, (a, b) in enumerate(pairs):
                if a == j:
                    c = c + OT[1 + r + z] * q[b : b + 1, :]
                if b == j:
                    c = c + OT[1 + r + z] * q[a : a + 1, :]
            for i in range(nu):
                c = c + OT[ofs_N + i * r + j] * u[i]
            cols.append(c)
        return cols

    def newton_linear_solve(x, u, hg, F):
        """Solve (I - hg*J(x)) dk = F per lane, unrolled elimination.

        Same algorithm (no pivoting, forward elimination + back
        substitution) as ``solve/ivp.py::solve_small``.
        """
        Jc = jac_columns(x, u)
        # rows[i][j] and rhs[i] as (1, Np) tiles.
        rows = [
            [
                (1.0 if i == j else 0.0) - hg * Jc[j][i : i + 1, :]
                for j in range(r)
            ]
            for i in range(r)
        ]
        fv = [F[i : i + 1, :] for i in range(r)]
        for kk in range(r):
            inv = 1.0 / rows[kk][kk]
            for i in range(kk + 1, r):
                f = rows[i][kk] * inv
                for j in range(kk + 1, r):
                    rows[i][j] = rows[i][j] - f * rows[kk][j]
                fv[i] = fv[i] - f * fv[kk]
        x_out = [None] * r
        for i in reversed(range(r)):
            acc = fv[i]
            for j in range(i + 1, r):
                acc = acc - rows[i][j] * x_out[j]
            x_out[i] = acc / rows[i][i]
        return jnp.concatenate(x_out, axis=0)  # (r, Np)

    def solve_stage(u, q_base, h, k_init):
        """Newton-solve kk = rhs(t_s, q_base + h*gamma*kk)."""
        kk = k_init
        for _ in range(newton_iters):
            x = q_base + h * gamma * kk
            F = kk - rhs(x, u)
            dk = newton_linear_solve(x, u, h * gamma, F)
            kk = kk - dk
        return kk

    def clip(x):
        return jnp.clip(x, -DIVERGE_CAP, DIVERGE_CAP)

    def step_error(i, q, err):
        if not track_error:
            return err
        mean = jnp.dot(q, gmat, preferred_element_type=jnp.float32)  # (r, G)
        row = (
            snaps_ref[0:1, :]
            if isinstance(i, int)
            else snaps_ref[pl.ds(i, 1), :]
        )  # (1, r)
        diff = mean - jnp.transpose(row)
        return err + jnp.sum(diff * diff, axis=0, keepdims=True)

    maxdev0 = jnp.abs(q - shift)
    err0 = step_error(0, q, jnp.zeros_like(err_ref))
    one = jnp.int32(1)
    three = jnp.int32(3)

    def interval(i, carry):
        q, maxdev, err = carry
        i = i.astype(jnp.int32)
        t0 = t_ref[i - one]
        t1 = t_ref[i]
        h = (t1 - t0) / substeps
        for s in range(substeps):
            base_flat = ((i - one) * substeps + s) * three
            u_start = u_at(base_flat)
            u_a = u_at(base_flat + 1)
            u_b = u_at(base_flat + 2)
            k1 = solve_stage(u_a, q, h, rhs(q, u_start))
            base2 = q + h * (1.0 - gamma) * k1
            k2 = solve_stage(u_b, base2, h, k1)
            q = clip(q + h * ((1.0 - gamma) * k1 + gamma * k2))
        maxdev = jnp.maximum(maxdev, jnp.abs(q - shift))
        err = step_error(i, q, err)
        return q, maxdev, err

    q, maxdev, err = jax.lax.fori_loop(
        jnp.int32(1), jnp.int32(k), interval, (q, maxdev0, err0)
    )
    stable_ref[:] = ((maxdev <= limits) & jnp.isfinite(maxdev)).astype(jnp.int32)
    err_ref[:] = err


@functools.partial(
    jax.jit,
    static_argnames=("nd", "substeps", "newton_iters", "track_error", "interpret"),
)
def cahbn_ensemble_screen(
    Ohat: jnp.ndarray,  # (N, r, d) compressed operators per draw
    q0: jnp.ndarray,  # (r,)
    t_eval: jnp.ndarray,  # (k,)
    shift: jnp.ndarray,  # (r,)
    limits: jnp.ndarray,  # (r,)
    u_stages: jnp.ndarray,  # ((k-1)*substeps*3, nu) from _input_stage_times
    snapshots: Optional[jnp.ndarray] = None,  # (r, k)
    nd: int = 20,
    substeps: int = 2,
    newton_iters: int = 6,
    track_error: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Implicit-SDIRK screening of all candidate/draw cAHBN integrations.

    Same contract as :func:`quadratic_ensemble_screen` plus the
    pre-evaluated input table ``u_stages`` (build it with
    ``_input_stage_times(t_eval, substeps)`` and the trajectory's input
    function). Operator columns follow the "cAHBN" packing of
    ``rom/operators.py``.
    """
    f32 = jnp.float32
    N, r, d = Ohat.shape
    G = N // nd
    k = t_eval.shape[0]
    nu = u_stages.shape[-1]
    Np = _pad_to_lanes(N)
    pairs = tuple((int(a), int(b)) for a, b in zip(*ckron_indices(r)))
    assert d == 1 + r + len(pairs) + nu + nu * r, "not a cAHBN operator"

    OT = jnp.transpose(Ohat.astype(f32), (2, 1, 0))
    OT = jnp.pad(OT, ((0, 0), (0, 0), (0, Np - N)))
    q0b = jnp.broadcast_to(q0.astype(f32)[:, None], (r, Np))
    gmat = jnp.zeros((Np, G), dtype=f32)
    draw_ids = np.arange(N)
    gmat = gmat.at[draw_ids, draw_ids // nd].set(1.0 / nd)
    snaps = (
        jnp.transpose(snapshots.astype(f32))
        if snapshots is not None
        else jnp.zeros((k, r), dtype=f32)
    )

    u_vecs = [u_stages[:, i].astype(f32) for i in range(nu)]
    stable2d, err_sq = pl.pallas_call(
        functools.partial(
            _cahbn_kernel,
            substeps=substeps,
            newton_iters=newton_iters,
            k=k,
            r=r,
            nu=nu,
            track_error=track_error and snapshots is not None,
            pairs=pairs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, Np), jnp.int32),
            jax.ShapeDtypeStruct((1, G), f32),
        ),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * (1 + nu)
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        t_eval.astype(f32),
        *u_vecs,
        OT,
        q0b,
        shift.astype(f32)[:, None],
        limits.astype(f32)[:, None],
        snaps,
        gmat,
    )
    stable = jnp.all(stable2d[:, :N] == 1, axis=0)
    return stable, err_sq[0]


def cahbn_ensemble_screen_xla(
    Ohat,
    q0,
    t_eval,
    shift,
    limits,
    u_stages,
    snapshots=None,
    nd: int = 20,
    substeps: int = 2,
    newton_iters: int = 6,
    track_error: bool = True,
):
    """XLA twin of the cAHBN kernel: identical SDIRK2/Newton discretization
    (full Newton, unrolled no-pivot elimination, same input table, same
    clip), draws batched on the trailing axis. Used on CPU backends and as
    the parity reference in tests."""
    f32 = jnp.float32
    N, r, d = Ohat.shape
    G = N // nd
    k = t_eval.shape[0]
    nu = u_stages.shape[-1]
    rows_q, cols_q = ckron_indices(r)
    pairs = tuple((int(a), int(b)) for a, b in zip(rows_q, cols_q))
    gamma = 1.0 - 0.5 * 2.0**0.5
    nh = len(pairs)
    ofs_B = 1 + r + nh
    ofs_N = ofs_B + nu

    OT = jnp.transpose(Ohat.astype(f32), (2, 1, 0))  # (d, r, N)
    q0b = jnp.broadcast_to(q0.astype(f32)[:, None], (r, N))
    t_eval = t_eval.astype(f32)
    u_stages = u_stages.astype(f32)
    shift = shift.astype(f32)[:, None]
    limits = limits.astype(f32)[:, None]
    snaps = (
        snapshots.astype(f32)
        if snapshots is not None
        else jnp.zeros((r, k), dtype=f32)
    )
    do_err = track_error and snapshots is not None

    def rhs(q, u):  # q: (r, N), u: (nu,)
        acc = OT[0]
        for a in range(r):
            acc = acc + OT[1 + a] * q[a : a + 1, :]
        for z, (a, b) in enumerate(pairs):
            acc = acc + OT[1 + r + z] * (q[a : a + 1, :] * q[b : b + 1, :])
        for i in range(nu):
            acc = acc + OT[ofs_B + i] * u[i]
            for a in range(r):
                acc = acc + OT[ofs_N + i * r + a] * (u[i] * q[a : a + 1, :])
        return acc

    def jac_columns(q, u):
        cols = []
        for j in range(r):
            c = OT[1 + j]
            for z, (a, b) in enumerate(pairs):
                if a == j:
                    c = c + OT[1 + r + z] * q[b : b + 1, :]
                if b == j:
                    c = c + OT[1 + r + z] * q[a : a + 1, :]
            for i in range(nu):
                c = c + OT[ofs_N + i * r + j] * u[i]
            cols.append(c)
        return cols

    def newton_linear_solve(x, u, hg, F):
        Jc = jac_columns(x, u)
        rows = [
            [
                (1.0 if i == j else 0.0) - hg * Jc[j][i : i + 1, :]
                for j in range(r)
            ]
            for i in range(r)
        ]
        fv = [F[i : i + 1, :] for i in range(r)]
        for kk in range(r):
            inv = 1.0 / rows[kk][kk]
            for i in range(kk + 1, r):
                f = rows[i][kk] * inv
                for j in range(kk + 1, r):
                    rows[i][j] = rows[i][j] - f * rows[kk][j]
                fv[i] = fv[i] - f * fv[kk]
        x_out = [None] * r
        for i in reversed(range(r)):
            acc = fv[i]
            for j in range(i + 1, r):
                acc = acc - rows[i][j] * x_out[j]
            x_out[i] = acc / rows[i][i]
        return jnp.concatenate(x_out, axis=0)

    def solve_stage(u, q_base, h, k_init):
        kk = k_init
        for _ in range(newton_iters):
            x = q_base + h * gamma * kk
            F = kk - rhs(x, u)
            dk = newton_linear_solve(x, u, h * gamma, F)
            kk = kk - dk
        return kk

    clip = lambda x: jnp.clip(x, -DIVERGE_CAP, DIVERGE_CAP)

    def err_term(i, q, err):
        if not do_err:
            return err
        mean = jnp.mean(q.reshape(r, G, nd), axis=2)  # (r, G)
        diff = mean - snaps[:, i][:, None]
        return err + jnp.sum(diff * diff, axis=0)

    def interval(carry, inp):
        q, maxdev, err = carry
        i, t0, t1 = inp
        h = (t1 - t0) / substeps
        for s in range(substeps):
            base_flat = ((i - 1) * substeps + s) * 3
            u_start = u_stages[base_flat]
            u_a = u_stages[base_flat + 1]
            u_b = u_stages[base_flat + 2]
            k1 = solve_stage(u_a, q, h, rhs(q, u_start))
            base2 = q + h * (1.0 - gamma) * k1
            k2 = solve_stage(u_b, base2, h, k1)
            q = clip(q + h * ((1.0 - gamma) * k1 + gamma * k2))
        maxdev = jnp.maximum(maxdev, jnp.abs(q - shift))
        err = err_term(i, q, err)
        return (q, maxdev, err), None

    err0 = err_term(0, q0b, jnp.zeros(G, f32))
    maxdev0 = jnp.abs(q0b - shift)
    idx = jnp.arange(1, k)
    (q, maxdev, err), _ = jax.lax.scan(
        interval, (q0b, maxdev0, err0), (idx, t_eval[:-1], t_eval[1:])
    )
    stable = jnp.all((maxdev <= limits) & jnp.isfinite(maxdev), axis=0)
    return stable, err
