"""parallel: device meshes, shardings, and multi-chip execution.

The reference is a single-process CPU code (SURVEY.md section 2d); the
latent parallel axes (POD modes, optimizer restarts, posterior draws,
regularization candidates, trajectories, regression points) become mesh
axes here. Collectives are XLA's (psum / all-gather over ICI); there is no
NCCL/MPI analogue to port.
"""

from .mesh import make_mesh, mesh_shape_for, named_sharding
from .sharded import (
    sharded_gram_pod,
    shard_leading_axis,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "named_sharding",
    "sharded_gram_pod",
    "shard_leading_axis",
]
