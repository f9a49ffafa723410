"""Orbax-based checkpointing of pipeline state.

The reference persists stage artifacts (joblib'd GPs, HDF5 posteriors —
``codebase/gpkernels.py:423-430``, ``codebase/bayes.py:217-241``) but has
no mid-run checkpointing. Here long runs (large fits, wide regularization
sweeps, big ensembles) can checkpoint device state between stages and
resume, using orbax's async-capable checkpointer under the hood.

State is any pytree of arrays plus a small metadata dict.
"""

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any, metadata: Optional[Dict] = None):
    """Save a pytree checkpoint at ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {"state": state, "metadata": metadata or {}}
    _checkpointer().save(path, payload, force=True)


def load_checkpoint(path: str) -> Tuple[Any, Dict]:
    """Load (state, metadata) from ``path``."""
    payload = _checkpointer().restore(os.path.abspath(path))
    return payload["state"], dict(payload.get("metadata", {}))


def pipeline_stage_state(**arrays) -> Dict[str, np.ndarray]:
    """Convenience: pack named stage outputs into a checkpointable dict."""
    return {k: np.asarray(v) for k, v in arrays.items() if v is not None}
