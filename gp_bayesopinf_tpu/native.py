"""ctypes bindings for the native C++ numerical core (``native/``).

The shared library is an independent implementation of the GP estimation
math and the hot integrators — no BLAS/LAPACK, no JAX — used as a parity
oracle (a third backend besides JAX and NumPy/SciPy, generalizing the
reference fork's dual-backend checks, ``ODEs/main.py:131-182``) and as a
host-side fallback.

Build with ``make -C native`` (produces
``gp_bayesopinf_tpu/libgpboi_native.so``). ``available()`` reports whether
the library is importable; callers must degrade gracefully.
"""

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_c_double_p = ctypes.POINTER(ctypes.c_double)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libgpboi_native.so")
    if not os.path.isfile(path):
        return None
    lib = ctypes.CDLL(path)

    lib.gpboi_version.restype = ctypes.c_int
    lib.gpboi_kernel_matrices.argtypes = [
        _c_double_p, ctypes.c_int64, _c_double_p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        _c_double_p, _c_double_p, _c_double_p, _c_double_p,
    ]
    lib.gpboi_gp_estimates.restype = ctypes.c_int
    lib.gpboi_gp_estimates.argtypes = [
        _c_double_p, ctypes.c_int64, _c_double_p, _c_double_p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        _c_double_p, _c_double_p, _c_double_p, _c_double_p,
    ]
    lib.gpboi_seird2_solve.argtypes = [
        _c_double_p, _c_double_p, _c_double_p, ctypes.c_int64,
        ctypes.c_int64, _c_double_p,
    ]
    lib.gpboi_rom_cah_solve.argtypes = [
        _c_double_p, ctypes.c_int64, _c_double_p, _c_double_p,
        ctypes.c_int64, ctypes.c_int64, _c_double_p,
    ]
    lib.gpboi_nlml_grad.restype = ctypes.c_double
    lib.gpboi_nlml_grad.argtypes = [
        _c_double_p, ctypes.c_int64, _c_double_p, _c_double_p, _c_double_p,
    ]
    lib.gpboi_fit_gp.restype = ctypes.c_double
    lib.gpboi_fit_gp.argtypes = [
        _c_double_p, ctypes.c_int64, _c_double_p, _c_double_p, _c_double_p,
        ctypes.c_int64, ctypes.c_uint64, _c_double_p,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_c_double_p)


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float64))


def kernel_matrices(t, t_est, sigma2, ell, chi):
    """Fused K_yy / kappa_zy / K_zy / K_zz assembly (native)."""
    lib = _load()
    t, te = _c64(t), _c64(t_est)
    m, mp = t.size, te.size
    Kyy = np.empty((m, m))
    kzy = np.empty((mp, m))
    Kzy = np.empty((mp, m))
    Kzz = np.empty((mp, mp))
    lib.gpboi_kernel_matrices(
        _ptr(t), m, _ptr(te), mp,
        float(sigma2), float(ell), float(chi),
        _ptr(Kyy), _ptr(kzy), _ptr(Kzy), _ptr(Kzz),
    )
    return Kyy, kzy, Kzy, Kzz


def gp_estimates(t, y, t_est, sigma2, ell, chi, eta=1e-8):
    """Full native GP estimation: (state, ddt, C, sqrtW)."""
    lib = _load()
    t, y, te = _c64(t), _c64(y), _c64(t_est)
    m, mp = t.size, te.size
    state = np.empty(mp)
    ddt = np.empty(mp)
    C = np.empty((mp, mp))
    sqrtW = np.empty((mp, mp))
    code = lib.gpboi_gp_estimates(
        _ptr(t), m, _ptr(y), _ptr(te), mp,
        float(sigma2), float(ell), float(chi), float(eta),
        _ptr(state), _ptr(ddt), _ptr(C), _ptr(sqrtW),
    )
    if code == 1:
        raise np.linalg.LinAlgError("K_yy Cholesky failed")
    if code == 2:
        raise ValueError(
            "inverse covariance not positive definite, increase eta"
        )
    return state, ddt, C, sqrtW


def seird2_solve(params, q0, t_eval, substeps: int = 8) -> np.ndarray:
    lib = _load()
    p, q0, t = _c64(params), _c64(q0), _c64(t_eval)
    out = np.empty((5, t.size))
    lib.gpboi_seird2_solve(_ptr(p), _ptr(q0), _ptr(t), t.size, substeps, _ptr(out))
    return out


def nlml_grad(t, y, sigma2, ell, chi):
    """Exact NLML and analytic gradient in log-hyperparameter space."""
    lib = _load()
    t, y = _c64(t), _c64(y)
    z = np.log(np.array([sigma2, ell, chi], dtype=np.float64))
    grad = np.empty(3)
    val = lib.gpboi_nlml_grad(_ptr(t), t.size, _ptr(y), _ptr(z), _ptr(grad))
    return float(val), grad


def fit_gp(t, y, constant_bounds, length_scale_bounds, noise_level_bounds,
           n_restarts: int = 50, seed: int = 0):
    """Independent multi-restart GP hyperparameter fit (native projected
    L-BFGS on the exact NLML) — the framework's second fitting backend,
    filling the role of the reference fork's gpytorch/Adam fitter
    (``codebase/gpkernels.py:56-178``, compared in ``ODEs/main.py:89-182``).

    Returns
    -------
    ((sigma2, ell, chi), nlml)
    """
    lib = _load()
    t, y = _c64(t), _c64(y)
    lo = _c64([constant_bounds[0], length_scale_bounds[0], noise_level_bounds[0]])
    hi = _c64([constant_bounds[1], length_scale_bounds[1], noise_level_bounds[1]])
    params = np.empty(3)
    val = lib.gpboi_fit_gp(
        _ptr(t), t.size, _ptr(y), _ptr(lo), _ptr(hi),
        int(n_restarts), int(seed) & 0xFFFFFFFFFFFFFFFF, _ptr(params),
    )
    return (float(params[0]), float(params[1]), float(params[2])), float(val)


def rom_cah_solve(Ohat, q0, t_eval, substeps: int = 8) -> np.ndarray:
    lib = _load()
    Ohat, q0, t = _c64(Ohat), _c64(q0), _c64(t_eval)
    r = q0.size
    d = 1 + r + r * (r + 1) // 2
    if Ohat.shape != (r, d):
        raise ValueError(f"Ohat shape {Ohat.shape} != {(r, d)}")
    out = np.empty((r, t.size))
    lib.gpboi_rom_cah_solve(_ptr(Ohat), r, _ptr(q0), _ptr(t), t.size, substeps, _ptr(out))
    return out
