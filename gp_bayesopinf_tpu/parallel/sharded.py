"""Sharded building blocks: distributed POD and leading-axis sharding.

These run identically on one device (trivial mesh) and on a multi-chip
mesh; collectives are inserted by XLA from sharding annotations.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import named_sharding
from ..utils.hostmath import device_put_global


def shard_leading_axis(x: jnp.ndarray, mesh: Mesh, axis):
    """Place an array with its leading dimension sharded over ``axis``
    (an axis name, or a tuple of names to shard over several mesh axes)."""
    spec = (axis,) + (None,) * (x.ndim - 1)
    return device_put_global(x, named_sharding(mesh, *spec))


def tall_skinny_svd(
    X: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    spec: Optional[tuple] = None,
    row_blocks: Optional[int] = None,
):
    """Thin SVD of tall (..., M, d) stacks via TSQR, with the long M axis
    sharded across the mesh.

    G = X^T X is a (d, d) psum-reduced contraction over the sharded M
    axis; its eigendecomposition runs replicated (d is small: the number
    of regression unknowns); U = X V / s is another sharded matmul. This
    is the m'-axis ("sequence") scaling path for the weighted-regression
    factorization at m' = 3200+ (SURVEY.md section 2e): the (M x d)
    weighted data matrix never needs to live on one device.

    A Gram (normal-equations) route squares the condition number: in f32
    the smallest recoverable singular value is ~sqrt(eps_32) ~ 2e-4 of the
    largest — enough to zero weakly-determined regression directions and
    inflate posterior widths 5-25x downstream. This implementation is a
    TSQR (tall-skinny QR): the sharded M axis is split into row blocks,
    each block QR-factorized in place (batched Householder on device — no
    Gram, no squaring), and the stacked (P*d x d) R factors are reduced by
    one final QR + SVD on the host in f64 (``utils.hostmath``). Singular
    values and V come out accurate to ~eps of the INPUT dtype (f32: ~1e-7
    relative to S_max); the U columns of near-null directions are computed
    by the usual X V / S backsolve and are only directionally meaningful —
    every downstream use goes through S/(S^2 + lambda^2), which suppresses
    them.

    Parameters
    ----------
    X : (..., M, d) array stack.
    mesh, spec : optional placement; ``spec`` is a PartitionSpec tuple for
        X's dimensions, e.g. ``("mode", "draw", None)`` to shard the
        problem batch over "mode" and the M rows over "draw".
    row_blocks : TSQR block count along M (default: the mesh extent of the
        sharded row axis, so each device QRs its local rows; capped so
        every block keeps at least d rows).

    Returns
    -------
    (U, S, V): X = U diag(S) V^T with U (..., M, d), S (..., d) descending,
    V (..., d, d) columns.
    """
    from ..utils.hostmath import accelerator_device, host_jit

    *batch, M, d = X.shape
    if mesh is not None:
        X = device_put_global(X, named_sharding(mesh, *spec))
        rep = lambda nd: named_sharding(mesh, *((None,) * nd))
        put = lambda A: device_put_global(A.astype(X.dtype), rep(A.ndim))
    else:
        dev = accelerator_device()
        put = lambda A: jax.device_put(A.astype(X.dtype), dev)

    if row_blocks is None:
        row_blocks = (
            mesh.shape[spec[-2]]
            if (mesh is not None and spec[-2] is not None)
            else 8
        )
    P = max(1, min(row_blocks, M // max(d, 1)))
    while M % P:
        P -= 1

    # Per-block R factors: batched on device, blocks ride the sharded axis.
    Xb = X.reshape(*batch, P, M // P, d)
    Rb = jnp.linalg.qr(Xb, mode="r")  # (..., P, d, d)
    Rstack = Rb.reshape(*batch, P * d, d)

    # Second-level reduction ON DEVICE: QR the stacked R factors down to
    # one (d, d) triangle per problem before anything crosses to the
    # host. QR is backward-stable, so the f32 device pass keeps the
    # TSQR's ~eps(input-dtype) accuracy contract (measured: S parity
    # 3e-8 vs the host-f64 reduce at the production r=20/m'=2048/d=231
    # shapes) — and the host call drops from a (P*d x d) f64 QR+SVD per
    # problem (~0.49 s at production shapes, the MFU table's worst
    # stage) to one batched (d x d) SVD (~0.21 s; BASELINE.md round-5
    # MFU table).
    R2 = jnp.linalg.qr(Rstack, mode="r")  # (..., d, d)

    def _reduce(R):
        Ur, S, Vt = jnp.linalg.svd(
            R.astype(jnp.float64), full_matrices=False
        )
        del Ur  # Q factors are never propagated in this TSQR
        return S, jnp.swapaxes(Vt, -1, -2)

    S, V = host_jit(_reduce)(R2)
    Sd, Vd = put(S), put(V)
    safe = jnp.where(Sd > 0, Sd, 1.0)
    U = jnp.einsum("...mi,...ij->...mj", X, Vd) / safe[..., None, :]
    return U, Sd, Vd


def randomized_pod(
    states: jnp.ndarray,
    num_vectors: int,
    mesh: Optional[Mesh] = None,
    row_axis: str = "seq",
    oversample: int = 32,
    power_iters: int = 2,
    key=None,
):
    """Randomized-range-finder POD of (n, k) snapshots — the large-k path.

    The Gram route (``sharded_gram_pod``) eigendecomposes a (k x k)
    matrix, which at the scaled configuration (k = 10^4+ snapshots,
    reference north star BASELINE.json) is minutes of host LAPACK — and
    hopeless on TPU, where f64 is emulated. This variant never forms the
    (k x k) Gram: it finds an l = num_vectors + oversample dimensional
    subspace with a sketched subspace iteration (Halko-Martinsson-Tropp),

        Y = orth(X Omega),  Y <- orth(X (X^T Y)) x power_iters,
        B = Y^T X,  eigh(B B^T) -> top singular pairs of X,

    so every large operation is a tall matmul with the spatial axis
    sharded over the mesh (MXU work, psum over ICI), and the only
    factorizations are (l x l) — done on the host in f64
    (``utils.hostmath``; orthonormalization via G^{-1/2}, which is
    Cholesky-QR in disguise but symmetric and rank-guarded).

    With power_iters=2 the retained singular pairs match the exact SVD to
    ~1e-6 relative for spectra that decay like POD spectra do (tested
    against ``jnp.linalg.svd`` in ``tests/test_pipeline.py``).

    Returns
    -------
    U : (n, num_vectors) left singular vectors (sharded like ``states``).
    svdvals : (l,) leading singular values, descending, f64.
    """
    from ..utils.hostmath import host_jit

    states = jnp.asarray(states)
    n, k = states.shape
    l = min(num_vectors + oversample, n, k)
    if l < num_vectors:
        raise ValueError("num_vectors exceeds matrix rank bound")
    if key is None:
        key = jax.random.PRNGKey(0)
    if mesh is not None:
        states = shard_leading_axis(states, mesh, row_axis)
    dt = states.dtype

    eigh64 = host_jit(lambda G: jnp.linalg.eigh(G.astype(jnp.float64)))
    if mesh is not None:
        rep2 = named_sharding(mesh, None, None)
        back = lambda A: device_put_global(A.astype(dt), rep2)
    else:
        from ..utils.hostmath import accelerator_device

        back = lambda A: jax.device_put(A.astype(dt), accelerator_device())

    def _half_orth(Y):
        G = Y.T @ Y  # (l, l): psum over the sharded n axis
        w, V = eigh64(G)
        w = jnp.maximum(w, jnp.maximum(w[-1], 0.0) * 1e-12 + 1e-300)
        return Y @ back((V / jnp.sqrt(w)) @ V.T)  # right-mult by G^{-1/2}

    def orthonormalize(Y):
        # Two passes (CholeskyQR2): after power iteration the sketch's
        # condition number squares past f32's Gram precision; one symmetric
        # G^{-1/2} pass leaves the small directions non-orthonormal, which
        # would INFLATE the recovered singular values. The second pass sees
        # a well-conditioned G and cleans them to machine precision.
        return _half_orth(_half_orth(Y))

    Y = orthonormalize(states @ jax.random.normal(key, (k, l), dtype=dt))
    for _ in range(power_iters):
        Y = orthonormalize(states @ (states.T @ Y))

    B = Y.T @ states  # (l, k): psum over the sharded n axis
    w, V = eigh64(B @ B.T)  # ascending
    w = w[::-1]
    V = V[:, ::-1]
    svdvals = jnp.sqrt(jnp.maximum(w, 0.0))
    U = Y @ back(V[:, :num_vectors])
    return U, svdvals


def sharded_gram_pod(
    states: jnp.ndarray,
    num_vectors: int,
    mesh: Optional[Mesh] = None,
    row_axis: str = "seq",
):
    """POD basis of (n, k) snapshots via the Gram (method-of-snapshots)
    route, with the large spatial axis n sharded across the mesh.

    G = X^T X is a k x k psum-reduced matmul (k = #snapshots is small);
    eigh(G) runs replicated; the basis U = X V / s is another sharded
    matmul. This is the multi-chip path for the scaled configurations
    (10k+ spatial DOF) where a replicated SVD would waste HBM; on a single
    device it degenerates to the same math.

    Returns
    -------
    U : (n, num_vectors) left singular vectors (sharded like ``states``).
    svdvals : (k,) singular values.
    """
    states = jnp.asarray(states)
    if mesh is not None:
        states = shard_leading_axis(states, mesh, row_axis)

    G = states.T @ states  # (k, k), psum over the sharded n axis
    w, V = jnp.linalg.eigh(G)  # ascending eigenvalues
    w = w[::-1]
    V = V[:, ::-1]
    svdvals = jnp.sqrt(jnp.maximum(w, 0.0))
    safe = jnp.where(svdvals > 0, svdvals, 1.0)
    U = (states @ V[:, :num_vectors]) / safe[:num_vectors]
    return U, svdvals
