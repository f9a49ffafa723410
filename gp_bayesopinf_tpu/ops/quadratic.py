"""Compressed quadratic and state-input feature maps.

A quadratic ROM term H[q ⊗ q] only needs the r(r+1)/2 unique products
q_i q_j (i >= j); the operator entries absorb the symmetry factors. These
feature maps define both the data-matrix columns assembled for the
operator-inference regression and the ROM right-hand-side evaluation, so
they are used consistently on both sides (the behavioral spec is the
``opinf.models.ContinuousModel("cAH"/"cAHBN")`` surface the reference relies
on; see reference ``PDEs/step3_estimate.py:210`` and
``codebase/bayes.py:355-361``).

Index ordering matches opinf's compressed Kronecker: for each i, the
products q_i * q_j for j = 0..i, concatenated over i.
"""

import numpy as np
import jax.numpy as jnp


def ckron_indices(r: int):
    """Static (i, j) index arrays for the compressed Kronecker product.

    Returns
    -------
    rows, cols : (r(r+1)/2,) int ndarrays with rows >= cols, ordered as
        (0,0), (1,0), (1,1), (2,0), (2,1), (2,2), ...
    """
    rows, cols = [], []
    for i in range(r):
        for j in range(i + 1):
            rows.append(i)
            cols.append(j)
    return np.asarray(rows), np.asarray(cols)


def ckron(Q: jnp.ndarray) -> jnp.ndarray:
    """Compressed Kronecker (unique quadratic monomials) of the state.

    Parameters
    ----------
    Q : (r,) or (r, k) array
        State vector or matrix of state snapshots (columns are states).

    Returns
    -------
    (r(r+1)/2,) or (r(r+1)/2, k) array
    """
    r = Q.shape[0]
    rows, cols = ckron_indices(r)
    return Q[rows] * Q[cols]


def state_input_kron(U: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
    """Bilinear state-input features u ⊗ q (input-major ordering).

    Parameters
    ----------
    U : (m,) or (m, k) array
        Input vector / input snapshots.
    Q : (r,) or (r, k) array
        State vector / state snapshots.

    Returns
    -------
    (m r,) or (m r, k) array, entry (a*r + b) = u_a * q_b.
    """
    m = U.shape[0]
    r = Q.shape[0]
    if Q.ndim == 1:
        return (U[:, None] * Q[None, :]).reshape(m * r)
    return (U[:, None, :] * Q[None, :, :]).reshape(m * r, Q.shape[1])
