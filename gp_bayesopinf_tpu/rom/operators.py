"""Polynomial operator structures for continuous reduced-order models.

Implements the operator-structure surface the reference gets from
``opinf.models.ContinuousModel`` with structure strings ``"cAH"`` and
``"cAHBN"`` (``PDEs/config_euler.py:87-96``, ``PDEsMulti/config_heat.py:
93-100``): constant c, linear A, compressed-quadratic H, input B, and
bilinear state-input N terms of

    dq/dt = c + A q + H ckron(q) + B u + N (u ⊗ q).

The packed operator matrix Ohat is (r, d) with column blocks in structure
order; ``assemble_data_matrix`` builds the regression features (k, d) in
the SAME order so that the regression unknowns are exactly Ohat's rows
(reference ``rom._assemble_data_matrix`` call sites,
``PDEs/step3_estimate.py:210``).
"""

from typing import Dict, Optional

import jax.numpy as jnp

from ..ops.quadratic import ckron, ckron_indices, state_input_kron

_VALID = set("cAHBN")


def operator_dims(structure: str, r: int, m: int = 0) -> Dict[str, int]:
    """Column-block widths per operator, in structure order."""
    if not set(structure) <= _VALID:
        raise ValueError(f"unknown operators in structure '{structure}'")
    widths = {
        "c": 1,
        "A": r,
        "H": r * (r + 1) // 2,
        "B": m,
        "N": r * m,
    }
    return {ch: widths[ch] for ch in structure}


def total_dim(structure: str, r: int, m: int = 0) -> int:
    return sum(operator_dims(structure, r, m).values())


def operator_splits(structure: str, r: int, m: int = 0):
    """(name, start, stop) column spans for each operator block."""
    spans, pos = [], 0
    for ch, w in operator_dims(structure, r, m).items():
        spans.append((ch, pos, pos + w))
        pos += w
    return spans


def blocked_gamma_diag(
    structure: str, r: int, m: int = 0, lams: Optional[Dict] = None,
    default: float = 0.0,
):
    """(d,) diagonal Tikhonov regularizer with one value per operator block.

    ``lams`` maps operator letters to regularizer values, e.g.
    ``{"c": l1, "A": l1, "H": l2}`` — the classic OpInf two-parameter
    scheme that shrinks the r(r+1)/2-column quadratic block independently
    of the linear dynamics. Letters absent from ``lams`` get ``default``.
    Values may be Python floats or (traced) scalars, so the result can be
    built inside a jitted candidate-search objective; returns a jnp array
    when any value is traced, else a float32 jnp array.

    This is the diagonal form consumed by ``solve.lstsq.TikhonovLSTSQ``
    (the reference's ``opinf.lstsq.TikhonovSolver`` diagonal surface,
    ``codebase/wlstsq.py:179-181``).
    """
    lams = lams or {}
    if not set(lams) <= _VALID:
        raise ValueError(f"unknown operators in lams {sorted(lams)}")
    parts = []
    for ch, a, b in operator_splits(structure, r, m):
        val = lams.get(ch, default)
        parts.append(
            jnp.broadcast_to(jnp.asarray(val, jnp.float32), (b - a,))
        )
    return jnp.concatenate(parts)


def extract_operators(
    Ohat: jnp.ndarray, structure: str, r: int, m: int = 0
) -> Dict[str, jnp.ndarray]:
    """Unpack the (r, d) operator matrix into named blocks.

    Equivalent to the reference's ``model._extract_operators``
    (``codebase/bayes.py:355``).
    """
    ops = {}
    for ch, a, b in operator_splits(structure, r, m):
        block = Ohat[:, a:b]
        ops[ch] = block[:, 0] if ch == "c" else block
    return ops


def assemble_data_matrix(
    states: jnp.ndarray,
    inputs: Optional[jnp.ndarray],
    structure: str,
) -> jnp.ndarray:
    """Build the (k, d) regression data matrix from state/input snapshots.

    Parameters
    ----------
    states : (r, k) array of state snapshots (columns are states).
    inputs : (m, k) array of input snapshots, or None.
    structure : operator-structure string.
    """
    r, k = states.shape
    cols = []
    for ch in structure:
        if ch == "c":
            cols.append(jnp.ones((1, k), dtype=states.dtype))
        elif ch == "A":
            cols.append(states)
        elif ch == "H":
            cols.append(ckron(states))
        elif ch == "B":
            cols.append(inputs)
        elif ch == "N":
            cols.append(state_input_kron(inputs, states))
    return jnp.concatenate(cols, axis=0).T


def rom_rhs_jacobian(
    Ohat: jnp.ndarray,
    q: jnp.ndarray,
    u,
    structure: str,
    r: int,
    m: int = 0,
) -> jnp.ndarray:
    """Analytic state Jacobian of ``rom_rhs`` (closed form — cheaper and
    far simpler to compile than autodiff through the feature map; used by
    the implicit integrator's Newton iterations).

    d(rhs)_i/dq_j = A[i,j] + sum over quadratic features H[i,(a,b)]
    (q_b if j==a) + (q_a if j==b), plus the bilinear input term
    N[i,(a,j)] u_a.
    """
    ops = extract_operators(Ohat, structure, r, m)
    J = jnp.zeros((r, r), dtype=Ohat.dtype)
    if "A" in ops:
        J = J + ops["A"]
    if "H" in ops:
        rows, cols = ckron_indices(r)
        H = ops["H"]  # (r, r(r+1)/2)
        J = J.at[:, rows].add(H * q[cols][None, :])
        J = J.at[:, cols].add(H * q[rows][None, :])
    if "N" in ops:
        N = ops["N"].reshape(r, m, r)  # (i, a, b)
        J = J + jnp.einsum("iab,a->ib", N, jnp.atleast_1d(u))
    return J


def rom_rhs(
    Ohat: jnp.ndarray,
    q: jnp.ndarray,
    u: Optional[jnp.ndarray],
    structure: str,
    r: int,
    m: int = 0,
) -> jnp.ndarray:
    """Evaluate dq/dt = Ohat @ features(q, u) for a single state vector."""
    feats = []
    for ch in structure:
        if ch == "c":
            feats.append(jnp.ones((1,), dtype=q.dtype))
        elif ch == "A":
            feats.append(q)
        elif ch == "H":
            feats.append(ckron(q))
        elif ch == "B":
            feats.append(u)
        elif ch == "N":
            feats.append(state_input_kron(u, q))
    return Ohat @ jnp.concatenate(feats)
