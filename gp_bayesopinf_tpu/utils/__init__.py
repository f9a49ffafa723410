"""utils: PRNG key threading, stage timing, and logging."""

from .keys import key_from_seed, split_tree
from .timing import TimedBlock, StageTimer

__all__ = ["key_from_seed", "split_tree", "TimedBlock", "StageTimer"]
