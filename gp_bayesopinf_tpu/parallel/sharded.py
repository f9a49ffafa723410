"""Sharded building blocks: distributed POD and leading-axis sharding.

These run identically on one device (trivial mesh) and on a multi-chip
mesh; collectives are inserted by XLA from sharding annotations.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import named_sharding


def shard_leading_axis(x: jnp.ndarray, mesh: Mesh, axis: str):
    """Place an array with its leading dimension sharded over ``axis``."""
    spec = (axis,) + (None,) * (x.ndim - 1)
    return jax.device_put(x, named_sharding(mesh, *spec))


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
