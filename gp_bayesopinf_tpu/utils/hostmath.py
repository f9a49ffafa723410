"""Host-precision execution policy.

TPUs have no float64 hardware; XLA emulates it, and on this stack the
emulation is both slow (minutes-long compiles, ~1000x runtime for
sequential scans) and LOOSE — measured on a v5e: "f64" matmul error
~1e-2 relative, Cholesky/triangular solves ~3e-7 relative, SVD ~1e-5
with NaNs on some inputs. True double precision only exists on the host.

The framework therefore splits work by numerical criticality:

* host CPU device (XLA:CPU, LAPACK-grade f64): POD SVD, GP estimation
  factorizations (K_yy Cholesky, derivative covariance, weight roots),
  the regression SVD, posterior moments — all tiny (O(10^2..10^3) dims),
  microsecond-to-millisecond work;
* TPU (f32, highest matmul precision): the 95% that is batched and
  f32-safe — NLML multi-restart fitting, candidate-screening
  integrations, posterior ensembles, compress/decompress matmuls.

``host_jit`` compiles a function for the host CPU device regardless of
the default backend; arrays it returns are CPU-committed — ``device_put``
them before feeding accelerator-side jits.
"""

import functools
from typing import Callable

import jax


def host_device():
    """The first CPU device (always present, any backend)."""
    return jax.devices("cpu")[0]


def accelerator_device():
    """The default-backend device (TPU when present, else CPU)."""
    return jax.devices()[0]


def on_host(fn: Callable) -> Callable:
    """Run ``fn`` with the host CPU as the default device."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_device(host_device()):
            return fn(*args, **kwargs)

    return wrapper


def host_jit(fn: Callable, **jit_kwargs) -> Callable:
    """jit ``fn`` onto the host CPU device (array inputs are moved there
    first so accelerator-committed arguments don't fault the placement)."""
    jitted = jax.jit(fn, **jit_kwargs)
    is_array = lambda x: isinstance(x, jax.Array)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        dev = host_device()
        move = lambda x: jax.device_put(x, dev) if is_array(x) else x
        args = jax.tree_util.tree_map(move, args)
        kwargs = jax.tree_util.tree_map(move, kwargs)
        with jax.default_device(dev):
            return jitted(*args, **kwargs)

    return wrapper


def to_accelerator(tree):
    """Move a pytree of (possibly CPU-committed) arrays to the default
    accelerator device."""
    dev = accelerator_device()
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), tree)
