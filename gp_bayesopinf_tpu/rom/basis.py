"""POD bases with shift / scaling / lifting transforms.

Native replacement for the ``opinf.basis.PODBasis`` + ``opinf.pre.shift``
surface the reference depends on (``PDEs/config_euler.py:50-84``,
``PDEsMulti/config_heat.py:69-90``; SURVEY.md P-7). The SVD runs on device
(jnp.linalg.svd); for snapshot matrices too large for one chip the
``parallel`` package shards the Gram-based POD over the device mesh.

Three concrete bases mirror the reference configurations:

* ``PODBasis`` — plain shift + SVD.
* ``EulerScaledBasis`` — nondimensionalizes (v, p, 1/rho) by
  (v_ref, rho_ref * v_ref^2, 1/rho_ref) before POD
  (``PDEs/config_euler.py:50-84``).
* ``QuadraticLiftedBasis`` — lifts states to (q, q^2) before POD and keeps
  the first half after decompression (``PDEsMulti/config_heat.py:69-90``).
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def shift(states: jnp.ndarray, shift_by: Optional[jnp.ndarray] = None):
    """Subtract the mean snapshot (or a given shift vector).

    Equivalent to ``opinf.pre.shift``: with no ``shift_by``, returns
    (shifted_states, mean_vector); with ``shift_by`` given, returns only the
    shifted states (pass a negative shift to undo).
    """
    if shift_by is None:
        mean = jnp.mean(states, axis=1)
        return states - mean[:, None], mean
    return states - shift_by[:, None]


@dataclasses.dataclass(frozen=True)
class PODBasis:
    """Rank-r POD basis with mean-snapshot centering.

    Attributes
    ----------
    entries : (n, r) array — leading left singular vectors.
    shift_vec : (n,) array — mean snapshot subtracted before the SVD.
    svdvals : (min(n, k),) array — full singular-value spectrum.
    """

    entries: jnp.ndarray
    shift_vec: jnp.ndarray
    svdvals: jnp.ndarray

    # -- transform hooks (identity here; subclasses override) -----------------
    def _pre(self, states: jnp.ndarray) -> jnp.ndarray:
        return states

    def _post(self, states: jnp.ndarray) -> jnp.ndarray:
        return states

    @property
    def num_vectors(self) -> int:
        return self.entries.shape[1]

    @property
    def full_dimension(self) -> int:
        return self.entries.shape[0]

    # -- construction -----------------------------------------------------------
    @classmethod
    def fit(cls, states: jnp.ndarray, num_vectors: int, **kwargs):
        """Fit the basis to (n, k) snapshots."""
        self0 = cls(entries=None, shift_vec=None, svdvals=None, **kwargs)
        lifted = self0._pre(jnp.asarray(states))
        shifted, mean = shift(lifted)
        U, S, _ = jnp.linalg.svd(shifted, full_matrices=False)
        return dataclasses.replace(
            self0,
            entries=U[:, :num_vectors],
            shift_vec=mean,
            svdvals=S,
        )

    # -- compression ------------------------------------------------------------
    def compress(self, states: jnp.ndarray) -> jnp.ndarray:
        """(n, k) high-dimensional states -> (r, k) POD coordinates."""
        lifted = self._pre(jnp.asarray(states))
        return self.entries.T @ shift(lifted, shift_by=self.shift_vec)

    def decompress(self, compressed: jnp.ndarray) -> jnp.ndarray:
        """(r, k) POD coordinates -> (n, k) states."""
        lifted = shift(self.entries @ compressed, shift_by=-self.shift_vec)
        return self._post(lifted)

    def project(self, states: jnp.ndarray) -> jnp.ndarray:
        """Round-trip projection onto the basis span."""
        return self.decompress(self.compress(states))

    def residual_energy(self) -> jnp.ndarray:
        """1 - cumulative energy fraction of the retained modes."""
        s2 = self.svdvals**2
        return 1.0 - jnp.cumsum(s2) / jnp.sum(s2)


@dataclasses.dataclass(frozen=True)
class EulerScaledBasis(PODBasis):
    """POD over the jointly nondimensionalized Euler variables (v, p, 1/rho).

    scalers = (v_ref, rho_ref * v_ref^2, 1/rho_ref) with v_ref = 100,
    rho_ref = 10, matching the reference configuration
    (``PDEs/config_euler.py:55-72``). Note the reference shifts FIRST,
    then nondimensionalizes inside ``fit`` but nondimensionalizes the
    *shift-then-scale* order consistently in compress/decompress — here the
    pre-transform is scaling and the shift applies to scaled variables,
    which is the same composition since both are linear and diagonal.
    """

    v_ref: float = 100.0
    rho_ref: float = 10.0

    @property
    def scalers(self):
        return jnp.array(
            [self.v_ref, self.rho_ref * self.v_ref**2, 1.0 / self.rho_ref]
        )

    def _scale_vec(self, n3: int) -> jnp.ndarray:
        n = n3 // 3
        return jnp.repeat(self.scalers, n)

    def _pre(self, states: jnp.ndarray) -> jnp.ndarray:
        return states / self._scale_vec(states.shape[0])[:, None]

    def _post(self, states: jnp.ndarray) -> jnp.ndarray:
        return states * self._scale_vec(states.shape[0])[:, None]


@dataclasses.dataclass(frozen=True)
class QuadraticLiftedBasis(PODBasis):
    """POD over the quadratically lifted state (q, q^2).

    The inverse transform keeps the q half (``config_heat.py:86-90``).
    """

    def _pre(self, states: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([states, states**2], axis=0)

    def _post(self, states: jnp.ndarray) -> jnp.ndarray:
        return jnp.split(states, 2, axis=0)[0]
