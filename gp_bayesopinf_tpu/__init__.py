"""gp_bayesopinf_tpu: a TPU-native (JAX/XLA/Pallas) framework for
GP-BayesOpInf — Bayesian learning of low-dimensional representations of
time-dependent nonlinear systems with Gaussian processes.

Capabilities mirror the reference research code ``Anthony50102/GP-BayesOpInf``
(companion code to arXiv:2408.03455) but the design is TPU-first:

* per-mode GP hyperparameter fits are one batched, jitted multi-restart
  optimization (``gp.fit``) instead of serial sklearn L-BFGS-B loops
  (reference ``codebase/gpkernels.py:330-348`` + ``PDEs/step2_fitgps.py``),
* GP state/derivative estimation and the weight matrix ``sqrtW`` are batched
  Cholesky/eigh solves over all modes at once (``gp.estimates``; reference
  ``codebase/gpkernels.py:445-504``),
* the weighted, regularized Bayesian least-squares regression is a
  batched-SVD spectral solve reusable across every regularization candidate
  (``solve.lstsq``; reference ``codebase/wlstsq.py``),
* posterior ensembles are vmapped fixed-step Runge-Kutta integrations with
  instability *masks* instead of serial ``scipy.solve_ivp`` loops with
  Python ``continue`` (``bayes.posterior``; reference ``codebase/bayes.py``),
* the regularization auto-search evaluates the whole log-grid as one batched
  computation (``bayes.regsearch``; reference ``*/step3_estimate.py``),
* multi-device scaling uses ``jax.sharding`` meshes + ``shard_map`` with XLA
  collectives (``parallel``), not process-level parallelism.

Precision policy: the GP linear algebra requires float64 for SPD robustness
(see reference ``codebase/gpkernels.py:496-504``); this package enables
JAX x64 on import unless ``GPBOI_NO_X64=1`` is set. Hot ensemble paths may
downcast explicitly where safe.
"""

import os as _os

import jax as _jax

if _os.environ.get("GPBOI_NO_X64", "0") != "1":
    _jax.config.update("jax_enable_x64", True)

# TPUs have no f64 hardware and XLA's f64 emulation is loose (measured
# f32-grade accuracy for matmul/cholesky/SVD on v5e) — so numerically
# critical factorizations run on the host CPU device (see
# utils.hostmath.host_device) while batched hot paths run on the
# accelerator in f32. "highest" keeps f32 matmuls at full f32 accuracy
# (multi-pass bf16) instead of the default bf16 demotion.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: TPU f64 linalg (eigh/svd) kernels compile in
# O(minutes) but run in O(ms); caching compiled executables across processes
# makes every run after the first fast. Opt out with GPBOI_NO_COMPILE_CACHE=1.
#
# The default directory is keyed on a HOST FINGERPRINT (hash of the CPU
# model identity AND feature flags): the cache stores host-native XLA:CPU
# executables, and
# loading one compiled on a different machine is not an error but a
# SIGILL/SEGV at execution (observed after a container migration —
# cpu_aot_loader warns "+prefer-no-scatter is not supported on the host
# machine", then the process dies uncatchably). A migrated container now
# lands in a fresh directory and recompiles instead of crashing. An
# explicit GPBOI_COMPILE_CACHE_DIR is honored verbatim.
def _host_fingerprint(cpuinfo_path="/proc/cpuinfo"):
    """Tag identifying the host CPU for native-executable cache keying.

    Hashes the model identity lines in addition to the feature flags:
    LLVM keys subtarget *tuning* features (prefer-no-scatter/-gather, ...)
    on the CPU model, so two hosts with identical ISA flags but different
    models still produce incompatible executables (observed: a migrated
    container warned "+prefer-no-scatter is not supported" while a
    flags-only fingerprint matched).
    """
    import hashlib
    import platform

    keys = ("vendor_id", "cpu family", "model", "model name",
            "stepping", "flags")
    try:
        with open(cpuinfo_path) as f:
            seen = {}
            for line in f:
                k = line.split(":", 1)[0].strip()
                if k in keys and k not in seen:
                    seen[k] = line.strip()
        fp = "\n".join(seen[k] for k in keys if k in seen)
        if not fp:
            raise OSError("no cpuinfo keys matched")
    except OSError:  # pragma: no cover - non-Linux
        fp = platform.processor() or platform.machine()
    return hashlib.sha256(fp.encode()).hexdigest()[:12]


if _os.environ.get("GPBOI_NO_COMPILE_CACHE", "0") != "1":
    _cache_dir = _os.environ.get("GPBOI_COMPILE_CACHE_DIR")
    if _cache_dir is None:
        _cache_dir = _os.path.expanduser(
            f"~/.cache/gp_bayesopinf_tpu/jax_cache-{_host_fingerprint()}"
        )
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # 0.05 s (not the 1.0 s default): pipelines dispatch dozens of SMALL
    # eager programs per process (sampling random ops, host weighting) —
    # individually ~0.1 s of XLA:CPU compile, collectively seconds of
    # warm-process wall that disk-served executables reduce to ~ms.
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)

__version__ = "0.1.0"

from . import ops  # noqa: E402
from . import gp  # noqa: E402
from . import rom  # noqa: E402
from . import solve  # noqa: E402
from . import bayes  # noqa: E402
from . import models  # noqa: E402
from . import parallel  # noqa: E402
from . import utils  # noqa: E402

__all__ = [
    "ops",
    "gp",
    "rom",
    "solve",
    "bayes",
    "models",
    "parallel",
    "utils",
    "__version__",
]
