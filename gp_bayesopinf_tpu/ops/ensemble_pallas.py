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
