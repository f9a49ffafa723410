"""Stage timing with the reference's TimedBlock UX.

The reference wraps every pipeline stage in ``opinf.utils.TimedBlock``
(``PDEs/main.py:86-189``), including a watchdog time limit on the weight
matrix stage. This keeps that surface and adds an accumulating
``StageTimer`` whose report feeds the benchmark harness; deeper profiling
hooks into ``jax.profiler`` traces.
"""

import contextlib
import logging
import time
from typing import Dict, Optional


class TimedBlock:
    """Context manager printing elapsed wall-clock for a stage.

    Parameters
    ----------
    message : stage label.
    timelimit : optional seconds; exceeded limits raise TimeoutError AFTER
        the block completes (single-process soft watchdog, matching the
        observable behavior of the reference's usage).
    """

    def __init__(
        self,
        message: str,
        timelimit: Optional[float] = None,
        silent: bool = False,
    ):
        self.message = message
        self.timelimit = timelimit
        self.silent = silent
        self.elapsed = None

    def __enter__(self):
        if not self.silent:
            print(self.message, end="" if self.message.endswith("\n") else "...")
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb):
        self.elapsed = time.perf_counter() - self._t0
        if exc_type is None:
            if not self.silent:
                print(f"done in {self.elapsed:.2f} s.")
            logging.info(f"{self.message.strip()}: {self.elapsed:.6f} s")
            if self.timelimit is not None and self.elapsed > self.timelimit:
                raise TimeoutError(
                    f"'{self.message.strip()}' exceeded {self.timelimit} s "
                    f"({self.elapsed:.2f} s)"
                )
        return False


class StageTimer:
    """Accumulate named stage wall-clocks (for benchmark reports)."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    def block(self, name: str, timelimit: Optional[float] = None):
        timer = self

        class _Block(TimedBlock):
            def __exit__(self, exc_type, exc, tb):
                out = TimedBlock.__exit__(self, exc_type, exc, tb)
                timer.times[name] = timer.times.get(name, 0.0) + self.elapsed
                return out

        return _Block(name, timelimit)

    def report(self) -> str:
        lines = [f"{k}: {v:.4f} s" for k, v in self.times.items()]
        lines.append(f"TOTAL: {sum(self.times.values()):.4f} s")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a ``jax.profiler`` device trace for the enclosed block
    (view with TensorBoard / xprof). The deep-profiling complement to the
    TimedBlock wall-clocks (SURVEY.md section 5, tracing)."""
    import jax

    with jax.profiler.trace(logdir):
        yield
    logging.info(f"jax profiler trace written to {logdir}")
