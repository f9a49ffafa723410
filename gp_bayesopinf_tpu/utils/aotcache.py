"""Cross-process AOT *program* cache built on ``jax.export``.

The persistent XLA compilation cache (enabled in ``__init__``) removes
only the backend-compile cost; every new process still pays Python
tracing + STABLEHLO lowering for each jitted program.  For the batched
GP-fit programs that cost is structural, not incidental: the screening
NLML deliberately unrolls its per-iteration Cholesky at small m (the
unrolled straight-line factorization is what makes the (mode x restart)
mega-batch fast on TPU — see ``ops.rbf``), so its jaxpr has O(m * steps)
equations and takes tens of seconds to build on a small host (22 s for
the SEIRD ex1a screening on a 1-core container, measured round 3).  The
reference has no analogous cost — but also no analogous program: it
re-runs thousands of serial L-BFGS-B fits per process instead
(``codebase/gpkernels.py:302-308``).

``jax.export`` serializes the *lowered* program; deserializing restores
a callable with NO retracing.  This module keys serialized programs by

    (package source digest, jax version, default backend,
     function identity, static arguments, input avals)

so any source edit, version bump, backend switch, or shape change safely
invalidates.  Entries are a few tens of kilobytes; no eviction is
performed (delete the directory to reset).

Granularity is the jit boundary: ``aot_jit`` is a drop-in replacement
for ``jax.jit(fn, static_argnames=...)`` for functions whose arguments
are pytrees of committed arrays (any Python-scalar leaf bypasses the
cache rather than risk a weak-type promotion change).  Resolution order
per (statics, avals) signature:

1. in-process memo (the deserialized program, jitted once),
2. on-disk serialized export (skips tracing + lowering),
3. plain ``jax.jit`` trace, exported + written back for the next process.

Any failure in (2)/(3) — e.g. an export restriction or a toolchain that
rejects the deserialized calling convention — falls back to the plain
jitted function for that signature, permanently for the process.
Opt out globally with ``GPBOI_AOT=0``.

The cache serves **TPU backends only**: executing a CPU-platform
exported program proved unreliable on some hosts (nondeterministic
SIGSEGV or silently corrupt outputs for the large unrolled-Cholesky
programs after a container migration, round 4), so CPU sessions always
take the plain-jit path. ``GPBOI_AOT_CPU=1`` re-enables CPU serving on a
host known to be good.
"""

import functools
import hashlib
import inspect
import logging
import os
import tempfile
from pathlib import Path
from typing import Callable, Sequence

import jax
import numpy as np

logger = logging.getLogger("gp_bayesopinf_tpu.aotcache")

_FORMAT_VERSION = 1  # bump to invalidate every existing cache entry


def cache_dir() -> Path:
    """Directory holding serialized programs (created on demand)."""
    root = os.environ.get(
        "GPBOI_AOT_CACHE_DIR",
        os.path.expanduser("~/.cache/gp_bayesopinf_tpu/aot_cache"),
    )
    return Path(root)


def enabled() -> bool:
    return os.environ.get("GPBOI_AOT", "1") != "0"


def _cpu_aot_opt_in() -> bool:
    """Explicit opt-in for serving exported programs on non-TPU backends
    (see the backend guard in ``_AotFunction.__call__``)."""
    return os.environ.get("GPBOI_AOT_CPU", "0") == "1"


@functools.lru_cache(maxsize=1)
def _package_digest() -> str:
    """sha256 over every .py file in the installed package (sorted),
    so ANY source edit invalidates the program cache — the same safety
    contract as jaxpr-keyed compilation caching, paid once per process
    (~10 ms for ~60 files)."""
    pkg_root = Path(__file__).resolve().parents[1]
    h = hashlib.sha256()
    for path in sorted(pkg_root.rglob("*.py")):
        h.update(str(path.relative_to(pkg_root)).encode())
        h.update(path.read_bytes())
    return h.hexdigest()


def register_namedtuple(cls, name: str) -> None:
    """Idempotently register a NamedTuple for export serialization."""
    from jax import export

    try:
        export.register_namedtuple_serialization(cls, serialized_name=name)
    except ValueError:
        pass  # already registered (module re-import)


def _leaf_sig(x):
    # .dtype (not result_type): covers extended dtypes like typed PRNG keys.
    return (np.shape(x), str(x.dtype))


class _AOTJit:
    """Callable implementing the resolution order in the module doc."""

    def __init__(self, fn: Callable, static_argnames: Sequence[str],
                 host: bool = False):
        functools.update_wrapper(self, fn)
        self._fn = fn
        self._static = tuple(static_argnames)
        self._host = host
        self._sig = inspect.signature(fn)
        self._jitted = jax.jit(fn, static_argnames=static_argnames or None)
        self._memo = {}  # digest -> callable on dynamic leaves
        self.__wrapped__ = fn

    def _device_ctx(self):
        """Placement context: host CPU device for host programs (the
        hybrid-precision policy of ``utils.hostmath``), default otherwise."""
        if self._host:
            from .hostmath import host_device

            return jax.default_device(host_device())
        import contextlib

        return contextlib.nullcontext()

    def _place(self, tree):
        if not self._host:
            return tree
        from .hostmath import host_device

        dev = host_device()
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dev) if isinstance(x, jax.Array) else x,
            tree,
        )

    # -- keying ---------------------------------------------------------

    def _split(self, args, kwargs):
        ba = self._sig.bind(*args, **kwargs)
        ba.apply_defaults()
        items = list(ba.arguments.items())
        statics = tuple((k, v) for k, v in items if k in self._static)
        dyn = [(k, v) for k, v in items if k not in self._static]
        return statics, [k for k, _ in dyn], tuple(v for _, v in dyn)

    def _digest(self, statics, dyn_vals):
        leaves, treedef = jax.tree_util.tree_flatten(dyn_vals)
        if not all(isinstance(x, (jax.Array, np.ndarray)) for x in leaves):
            return None, None, None  # scalar leaf: weak-type hazard, bypass
        h = hashlib.sha256()
        for part in (
            str(_FORMAT_VERSION),
            jax.__version__,
            "cpu" if self._host else jax.default_backend(),
            _package_digest(),
            f"{self._fn.__module__}.{self._fn.__qualname__}",
            repr(statics),
            str(treedef),
            repr([_leaf_sig(x) for x in leaves]),
        ):
            h.update(part.encode())
        return h.hexdigest(), leaves, treedef

    # -- resolution -----------------------------------------------------

    def _resolve(self, digest, statics, dyn_names, dyn_vals):
        from jax import export

        platform = "cpu" if self._host else jax.default_backend()
        path = cache_dir() / f"{digest}.jaxexp"
        if path.exists():
            exp = export.deserialize(path.read_bytes())
            if platform in exp.platforms:
                return jax.jit(exp.call)
            # Stale/foreign-platform entry: fall through and re-export.

        static_kw = dict(statics)

        def f_dyn(*dyn):
            kw = dict(zip(dyn_names, dyn))
            kw.update(static_kw)
            return self._fn(**kw)

        avals = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), dyn_vals
        )
        # platforms= pins the lowering target: a host (CPU) program must
        # lower for CPU even when the session's default backend is TPU.
        with self._device_ctx():
            exp = export.export(jax.jit(f_dyn), platforms=[platform])(*avals)
        data = exp.serialize()
        path.parent.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            os.replace(tmp, path)  # atomic vs concurrent writers
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        # Call through the export we just built: its module is byte-equal
        # to what the NEXT process deserializes, so the XLA compilation
        # cache key matches across processes from the first run.
        return jax.jit(exp.call)

    def _call_plain(self, args, kwargs):
        args, kwargs = self._place(args), self._place(kwargs)
        with self._device_ctx():
            return self._jitted(*args, **kwargs)

    def __call__(self, *args, **kwargs):
        if not enabled() or any(
            isinstance(x, jax.core.Tracer)
            for x in jax.tree_util.tree_leaves((args, kwargs))
        ):
            return self._call_plain(args, kwargs)
        if jax.default_backend() != "tpu" and not _cpu_aot_opt_in():
            # EXECUTING a CPU-platform exported program is unreliable on
            # some hosts: after a container migration (round 4) the
            # compiled exp.call of the big unrolled-Cholesky NLML
            # programs nondeterministically SEGFAULTED *or returned
            # corrupt values* on the new host's CPU, while the plain
            # jitted originals and small exported programs (cholesky,
            # solve) stayed correct — evidence points at XLA:CPU codegen
            # of the deserialized module, and silent corruption is
            # disqualifying. The AOT program cache therefore serves TPU
            # backends only (where every warm-process win was measured);
            # CPU sessions pay tracing once per process via plain jit.
            # GPBOI_AOT_CPU=1 re-enables for debugging on a known-good
            # host.
            return self._call_plain(args, kwargs)
        if self._host and jax.default_backend() != "cpu":
            # Calling a CPU-platform exported program from the tunneled
            # TPU (axon) session SEGFAULTS in the cross-platform call
            # path (measured round 3) — uncatchable, so don't try/except
            # our way around it. Host programs get the AOT cache only on
            # CPU-backend sessions; here the module-level plain jit
            # already bounds the cost to one trace per process.
            return self._call_plain(args, kwargs)
        statics, dyn_names, dyn_vals = self._split(args, kwargs)
        digest, _, _ = self._digest(statics, dyn_vals)
        if digest is None:
            return self._call_plain(args, kwargs)
        if digest not in self._memo:
            # First resolution for this signature: the trial call runs
            # inside the try so a toolchain that rejects the exported
            # calling convention degrades to plain jit, not an error.
            try:
                call = self._resolve(digest, statics, dyn_names, dyn_vals)
                dyn_p = self._place(dyn_vals)
                with self._device_ctx():
                    out = call(*dyn_p)
                self._memo[digest] = call
                return out
            except Exception as exc:  # pragma: no cover - toolchain-specific
                logger.info("AOT cache bypass for %s: %s", self.__name__, exc)
                self._memo[digest] = None
        call = self._memo[digest]
        if call is None:
            return self._call_plain(args, kwargs)
        dyn_vals = self._place(dyn_vals)
        with self._device_ctx():
            try:
                return call(*dyn_vals)
            except ValueError:
                # The digest keys on avals, not committed devices: a
                # memoized platform-pinned export raises if this call's
                # arrays are committed elsewhere (e.g. host-committed
                # args reaching a TPU program). Serve it via plain jit.
                return self._call_plain(args, kwargs)


def aot_jit(fn: Callable = None, *, static_argnames: Sequence[str] = (),
            host: bool = False):
    """``jax.jit`` drop-in whose traced+lowered program persists on disk.

    See the module docstring for semantics.  Usable as ``@aot_jit`` or
    ``@aot_jit(static_argnames=(...,))``; the raw function stays
    reachable via ``.__wrapped__`` (e.g. for ``host_jit`` re-wrapping).

    ``host=True`` compiles and runs the program on the host CPU device
    (the ``utils.hostmath`` hybrid-precision policy) regardless of the
    default backend — array inputs are moved there first.  The cached
    entry is keyed for "cpu", so host programs exported under a TPU
    session serve CPU sessions too and vice versa.

    The function must be module-level and closure-free: entries are
    keyed by function *identity* plus the package source digest, so a
    closure whose captured values vary between calls would alias.
    """
    if fn is None:
        return lambda f: _AOTJit(f, static_argnames, host)
    return _AOTJit(fn, static_argnames, host)
