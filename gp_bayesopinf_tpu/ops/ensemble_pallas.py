"""Pallas TPU megakernel for posterior-ensemble screening.

The regularization search integrates G candidates x ndraws posterior
draws of a quadratic ROM over two time grids (reference
``PDEs/step3_estimate.py:97-129``: 81 x 20 x 2 serial scipy solves). The
XLA path vmaps those integrations, but each RK4 substep is a separate
tiny fused op on the sequential path — dispatch overhead dominates for
r ~ 6 states.

This kernel fuses the ENTIRE screening integration into one Pallas
program: all draws' states live in VMEM, the time loop runs in-kernel,
and trajectories are never materialized to HBM — the kernel emits only

* per-draw stability flags (finite + inside the 5x-amplitude envelope),
* per-candidate sums of the trajectory over draws (for the error
  metric against the GP state estimates).

float32 only (Mosaic has no f64); that is exactly the precision contract
of the screening path — candidate gating/ranking — while posteriors and
final ensembles stay float64 in XLA.

The ROM right-hand side uses draw-specific operators in DENSE feature
form: dq/dt = sum_z F[n, i, z] * feats[n, z] with feats = [1, q, q (x) q]
(full Kronecker, Z = 1 + r + r^2); ``expand_cah_operators`` converts the
compressed (r, d) operator rows.
"""

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quadratic import ckron_indices


def expand_cah_operators(Ohat: jnp.ndarray, r: int) -> jnp.ndarray:
    """(N, r, d) compressed "cAH" operators -> (N, r, Z) dense-feature form.

    Z = 1 + r + r^2; the H block's off-diagonal entries are split evenly
    between (a, b) and (b, a) of the full Kronecker feature q_a q_b.
    """
    N = Ohat.shape[0]
    d = Ohat.shape[-1]
    assert d == 1 + r + r * (r + 1) // 2, (d, r)
    c = Ohat[..., :1]
    A = Ohat[..., 1 : 1 + r]
    H = Ohat[..., 1 + r :]

    rows, cols = ckron_indices(r)
    Hfull = jnp.zeros((N, r, r, r), dtype=Ohat.dtype)
    # Each compressed entry lands in (a, b) and (b, a) with weight 1/2; the
    # diagonal receives both halves at the same position, summing to 1.
    vals = 0.5 * H
    Hfull = Hfull.at[:, :, rows, cols].add(vals)
    Hfull = Hfull.at[:, :, cols, rows].add(vals)
    return jnp.concatenate([c, A, Hfull.reshape(N, r, r * r)], axis=-1)


def _screen_kernel(
    t_ref,  # SMEM (k,)
    Fc_ref,  # VMEM (N, r)
    FA_ref,  # VMEM (N, r, r)
    FH_ref,  # VMEM (N, r, r*r)
    q0_ref,  # VMEM (N, r)
    shift_ref,  # VMEM (1, r)
    limits_ref,  # VMEM (1, r)
    stable_ref,  # out VMEM (N, r) int32 (reduced to per-draw outside)
    sum_ref,  # out VMEM (k_out, G, r) f32 (time-major: dynamic stores
    #           index the leading axis, which Mosaic supports)
    *,
    substeps: int,
    nd: int,
    k: int,
    limit_cap: float,
):
    Fc = Fc_ref[:]  # (N, r)
    FA = FA_ref[:]  # (N, r, r)
    FH = FH_ref[:]  # (N, r, r*r)
    q = q0_ref[:]  # (N, r)
    N, r = q.shape
    G = N // nd
    shift = shift_ref[0, :]  # (r,)
    limits = limits_ref[0, :]  # (r,)

    def rhs(q):
        # dq[n,i] = c + sum_a A[n,i,a] q[n,a]
        #             + sum_a q[n,a] * sum_b H[n,i,a,b] q[n,b].
        # Only <=3D tensors and last-axis reductions (Mosaic-friendly);
        # the H contraction unrolls over the (small, static) state index.
        acc = Fc + jnp.sum(FA * q[:, None, :], axis=2)
        for a in range(r):
            Ha = FH[:, :, a * r : (a + 1) * r]  # (N, r, r) static slice
            acc = acc + q[:, a][:, None] * jnp.sum(Ha * q[:, None, :], axis=2)
        return acc

    def clip(q):
        return jnp.clip(q, -limit_cap, limit_cap)

    # Worst deviation from the envelope center, tracked across ALL steps.
    maxdev0 = jnp.abs(q - shift[None, :])
    sum_ref[0] = jnp.sum(q.reshape(G, nd, r), axis=1)

    one = jnp.int32(1)

    def interval(i, carry):
        q, maxdev = carry
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
        maxdev = jnp.maximum(maxdev, jnp.abs(q - shift[None, :]))
        sum_ref[i] = jnp.sum(q.reshape(G, nd, r), axis=1)
        return q, maxdev

    q, maxdev = jax.lax.fori_loop(jnp.int32(1), jnp.int32(k), interval, (q, maxdev0))
    ok = (maxdev <= limits[None, :]) & jnp.isfinite(maxdev)
    stable_ref[:] = ok.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("substeps", "nd", "interpret")
)
def quadratic_ensemble_screen(
    Fops: jnp.ndarray,  # (N, r, Z) dense-feature operators, f32
    q0: jnp.ndarray,  # (r,) shared initial condition
    t_eval: jnp.ndarray,  # (k,)
    shift: jnp.ndarray,  # (r,)
    limits: jnp.ndarray,  # (r,)
    substeps: int = 4,
    nd: int = 20,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate all draws, returning (stable (N,), mean_sol (G, r, k)).

    N must be G * nd with draws of candidate g stored contiguously.
    The stability envelope (shift, limits) is shared (single-trajectory
    pipelines; the multi-trajectory variant calls once per trajectory).
    """
    f32 = jnp.float32
    Fops = Fops.astype(f32)
    N, r, Z = Fops.shape
    k = t_eval.shape[0]
    G = N // nd
    q0b = jnp.broadcast_to(q0.astype(f32), (N, r))
    Fc = Fops[:, :, 0]
    FA = Fops[:, :, 1 : 1 + r]
    FH = Fops[:, :, 1 + r :]

    # The divergence clamp must dominate the envelope so clipped draws
    # still register as outside it.
    limit_cap = 1e6

    stable2d, sums = pl.pallas_call(
        functools.partial(
            _screen_kernel,
            substeps=substeps,
            nd=nd,
            k=k,
            limit_cap=limit_cap,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, r), jnp.int32),
            jax.ShapeDtypeStruct((k, G, r), f32),
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
        Fc,
        FA,
        FH,
        q0b,
        shift.astype(f32)[None, :],
        limits.astype(f32)[None, :],
    )
    stable = jnp.all(stable2d == 1, axis=1)
    mean_sol = jnp.transpose(sums, (1, 2, 0)) / nd  # (G, r, k)
    return stable, mean_sol


def quadratic_ensemble_screen_xla(
    Fops, q0, t_eval, shift, limits, substeps: int = 4, nd: int = 20
):
    """Reference XLA implementation with identical semantics (used on CPU
    and in tests)."""
    f32 = jnp.float32
    Fops = Fops.astype(f32)
    N, r, Z = Fops.shape
    G = N // nd
    q0b = jnp.broadcast_to(q0.astype(f32), (N, r))
    t_eval = t_eval.astype(f32)
    shift = shift.astype(f32)
    limits = limits.astype(f32)

    def rhs(F, q):
        ones = jnp.ones((N, 1), dtype=f32)
        qq = (q[:, :, None] * q[:, None, :]).reshape(N, r * r)
        feats = jnp.concatenate([ones, q, qq], axis=1)
        return jnp.sum(F * feats[:, None, :], axis=2)

    clip = lambda q: jnp.clip(q, -1e6, 1e6)

    def interval(carry, t_pair):
        q, maxdev = carry
        t0, t1 = t_pair
        h = (t1 - t0) / substeps
        for _ in range(substeps):
            k1 = rhs(Fops, q)
            k2 = rhs(Fops, clip(q + 0.5 * h * k1))
            k3 = rhs(Fops, clip(q + 0.5 * h * k2))
            k4 = rhs(Fops, clip(q + h * k3))
            q = clip(q + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4))
        maxdev = jnp.maximum(maxdev, jnp.abs(q - shift[None, :]))
        return (q, maxdev), jnp.sum(q.reshape(G, nd, r), axis=1)

    maxdev0 = jnp.abs(q0b - shift[None, :])
    t_pairs = jnp.stack([t_eval[:-1], t_eval[1:]], axis=1)
    (q, maxdev), sums = jax.lax.scan(interval, (q0b, maxdev0), t_pairs, unroll=4)
    sums = jnp.concatenate(
        [jnp.sum(q0b.reshape(G, nd, r), axis=1)[None], sums], axis=0
    )  # (k, G, r)
    stable = jnp.all((maxdev <= limits[None, :]) & jnp.isfinite(maxdev), axis=1)
    mean_sol = jnp.transpose(sums, (1, 2, 0)) / nd
    return stable, mean_sol
