"""Explicit PRNG key threading.

The reference uses numpy's global seed per pipeline
(``PDEs/config.py:88-89`` etc.); in JAX, randomness is explicit. Each
pipeline derives all of its keys from one seed so runs are deterministic
end to end (same-seed reproducibility is the determinism model,
SURVEY.md section 5)."""

from typing import Dict, Sequence

import jax


def key_from_seed(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def split_tree(key: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    """Named key split: one independent key per pipeline stage."""
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


def host_rng(key: jax.Array) -> "np.random.Generator":
    """Deterministic NumPy ``Generator`` derived from a threaded jax key.

    Host-side stages (truth solves, training-data draws — the
    reference's scipy/numpy L1 layer) seed their RNG from the same
    explicitly threaded key tree as the device stages, so determinism
    flows from the single pipeline seed without paying jax
    tracing/compilation for tiny draw programs in every fresh process.
    """
    import numpy as np

    data = np.asarray(jax.random.key_data(key)).ravel()
    return np.random.default_rng(data.astype(np.uint32))
