"""Device-mesh construction and sharding helpers.

Axis-name conventions used throughout the framework:

* ``"draw"``  — posterior-ensemble draws / regularization candidates
  (data-parallel analogue; embarrassingly parallel).
* ``"mode"``  — POD modes / state variables (model-parallel analogue:
  independent GP fits and regression rows).
* ``"seq"``   — the regression-point axis m' (sequence-parallel analogue:
  blocked Gram assembly and blocked linear algebra; SURVEY.md section 2e).
"""

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    axis_sizes: Dict[str, int], devices: Optional[Sequence] = None
) -> Mesh:
    """Build a named mesh over the available devices.

    ``axis_sizes`` maps axis name -> size; one axis may be -1 to absorb the
    remaining devices (like a reshape).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    n = len(devices)
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis size may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {sizes} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))


def mesh_shape_for(n_devices: int) -> Dict[str, int]:
    """Default 2-D (draw, mode) factorization for n devices."""
    mode = 1
    for cand in (4, 2, 1):
        if n_devices % cand == 0 and n_devices >= cand:
            mode = cand
            break
    return {"draw": n_devices // mode, "mode": mode}


def named_sharding(mesh: Mesh, *axes) -> NamedSharding:
    """NamedSharding with the given per-dimension axis names (None =
    replicated dimension)."""
    return NamedSharding(mesh, PartitionSpec(*axes))
