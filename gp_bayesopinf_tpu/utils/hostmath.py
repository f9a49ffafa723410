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
    """The first LOCAL CPU device (always present, any backend).

    Local, not global: in a multi-process run ``jax.devices("cpu")[0]``
    is process 0's device, which other processes cannot place data on —
    host math must run on each process's own CPU device (identical
    inputs give identical results, so per-process replication is safe).
    """
    return jax.local_devices(backend="cpu")[0]


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


def fetch_replicated(x):
    """Materialize a jax.Array's GLOBAL value on this process's host.

    Single-process (or fully-addressable input): a plain device_get.
    Multi-process: arrays sharded across processes span non-addressable
    devices, so the shards are all-gathered first
    (``multihost_utils.process_allgather`` — one collective, after which
    every process holds the full value). Non-arrays pass through.
    """
    if not isinstance(x, jax.Array):
        return x
    if x.is_fully_addressable:
        return jax.device_get(x)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x, tiled=True)


def device_put_global(x, sharding):
    """``jax.device_put`` that survives shardings spanning processes.

    Eagerly resharding a COMMITTED ``jax.Array`` onto a sharding with
    non-addressable devices raises on backends without cross-host
    transfers (CPU; ``dispatch._is_supported_cross_host_transfer``). A
    HOST value is always accepted — each process places its local
    shards — so when the target is not fully addressable the input is
    detached to host first (allgathered if the source itself spans
    processes). Fully-addressable targets take the plain zero-copy path.
    """
    if isinstance(x, jax.Array) and not getattr(
        sharding, "is_fully_addressable", True
    ):
        x = fetch_replicated(x)
    return jax.device_put(x, sharding)


def host_jit(fn: Callable, **jit_kwargs) -> Callable:
    """jit ``fn`` onto the host CPU device (array inputs are moved there
    first so accelerator-committed arguments don't fault the placement;
    cross-process arrays are all-gathered — host math runs replicated
    per process)."""
    jitted = jax.jit(fn, **jit_kwargs)
    is_array = lambda x: isinstance(x, jax.Array)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        dev = host_device()
        move = lambda x: (
            jax.device_put(fetch_replicated(x), dev) if is_array(x) else x
        )
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
