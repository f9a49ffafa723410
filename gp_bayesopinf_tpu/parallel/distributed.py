"""Multi-host initialization and global meshes.

The framework's "communication backend" is JAX itself: within a slice,
collectives ride ICI; across slices/hosts, DCN — all inserted by XLA from
sharding annotations. This module wraps process bring-up so multi-host
runs need only one call per host (no NCCL/MPI analogue; SURVEY.md
section 2d).
"""

from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX (no-op for single-process runs).

    With no arguments, relies on environment-based auto-detection (TPU
    pods set the coordinator through the runtime)."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_sizes: Dict[str, int]) -> Mesh:
    """Build a mesh over ALL devices across hosts.

    Axis ordering should put the fastest-communication axis last so its
    collectives ride ICI within a host/slice and only the leading axis
    crosses DCN."""
    devices = np.asarray(jax.devices())
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    return Mesh(devices.reshape(sizes), axis_names=tuple(names))
