"""utils: PRNG key threading, stage timing, and logging."""

from .keys import host_rng, key_from_seed, split_tree
from .timing import TimedBlock, StageTimer

__all__ = [
    "host_rng", "key_from_seed", "split_tree", "TimedBlock", "StageTimer",
]
