"""Sharded building blocks: distributed POD and leading-axis sharding.

These run identically on one device (trivial mesh) and on a multi-chip
mesh; collectives are inserted by XLA from sharding annotations.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import named_sharding


def shard_leading_axis(x: jnp.ndarray, mesh: Mesh, axis):
    """Place an array with its leading dimension sharded over ``axis``
    (an axis name, or a tuple of names to shard over several mesh axes)."""
    spec = (axis,) + (None,) * (x.ndim - 1)
    return jax.device_put(x, named_sharding(mesh, *spec))


def tall_skinny_svd(
    X: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    spec: Optional[tuple] = None,
):
    """Thin SVD of tall (..., M, d) stacks via the Gram route, with the
    long M axis sharded across the mesh.

    G = X^T X is a (d, d) psum-reduced contraction over the sharded M
    axis; its eigendecomposition runs replicated (d is small: the number
    of regression unknowns); U = X V / s is another sharded matmul. This
    is the m'-axis ("sequence") scaling path for the weighted-regression
    factorization at m' = 3200+ (SURVEY.md section 2e): the (M x d)
    weighted data matrix never needs to live on one device.

    The Gram route squares the condition number, so the smallest singular
    values carry ~sqrt(eps) relative error — harmless downstream, where
    every use is through S^2 + lambda^2 with the regularizer dominating
    the small end of the spectrum.

    Parameters
    ----------
    X : (..., M, d) array stack.
    mesh, spec : optional placement; ``spec`` is a PartitionSpec tuple for
        X's dimensions, e.g. ``("mode", "draw", None)`` to shard the
        problem batch over "mode" and the M rows over "draw".

    Returns
    -------
    (U, S, V): X = U diag(S) V^T with U (..., M, d), S (..., d) descending,
    V (..., d, d) columns.
    """
    if mesh is not None:
        X = jax.device_put(X, named_sharding(mesh, *spec))
    G = jnp.einsum("...mi,...mj->...ij", X, X)
    w, V = jnp.linalg.eigh(G)  # ascending
    w = w[..., ::-1]
    V = V[..., ::-1]
    S = jnp.sqrt(jnp.maximum(w, 0.0))
    safe = jnp.where(S > 0, S, 1.0)
    U = jnp.einsum("...mi,...ij->...mj", X, V) / safe[..., None, :]
    return U, S, V


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
