"""Cross-process AOT program cache (utils.aotcache).

Covers the resolution order documented in the module: disk hit (no
retracing), miss (export + write-back), scalar-leaf bypass, env opt-out,
and nesting under an outer trace.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_bayesopinf_tpu.gp.fit import fit_gp_hyperparameters
from gp_bayesopinf_tpu.gp.nlml import BoxTransform
from gp_bayesopinf_tpu.utils import aotcache
from gp_bayesopinf_tpu.utils.aotcache import aot_jit


@pytest.fixture()
def tmp_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("GPBOI_AOT_CACHE_DIR", str(tmp_path / "aot"))
    monkeypatch.delenv("GPBOI_AOT", raising=False)
    # The cache serves TPU backends only by default (executing CPU
    # exported programs proved unreliable on some hosts for the LARGE
    # unrolled-Cholesky programs, round 4); opt in here so the forced-CPU
    # suite exercises the machinery on small, known-stable programs.
    monkeypatch.setenv("GPBOI_AOT_CPU", "1")
    return tmp_path / "aot"


def _fn(x, w, scale=2):
    return scale * (x @ w), jnp.sum(x)


def test_parity_and_writeback(tmp_cache):
    f = aot_jit(_fn, static_argnames=("scale",))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)))
    w = jnp.asarray(np.random.default_rng(1).normal(size=(3, 2)))
    got = f(x, w, scale=3)
    want = _fn(x, w, scale=3)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    files = list(tmp_cache.glob("*.jaxexp"))
    assert len(files) == 1, "export written back to disk"
    # Different statics -> different program.
    f(x, w, scale=4)
    assert len(list(tmp_cache.glob("*.jaxexp"))) == 2


def test_disk_hit_skips_retracing(tmp_cache):
    f1 = aot_jit(_fn, static_argnames=("scale",))
    x = jnp.ones((2, 3))
    w = jnp.ones((3, 2))
    f1(x, w)

    # A fresh wrapper (empty memo) must resolve from disk: forbid export.
    f2 = aot_jit(_fn, static_argnames=("scale",))
    calls = {"export": 0}
    real_export = jax.export.export

    def forbidden(*a, **k):
        calls["export"] += 1
        return real_export(*a, **k)

    try:
        jax.export.export = forbidden
        out = f2(x, w)
    finally:
        jax.export.export = real_export
    assert calls["export"] == 0
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(_fn(x, w)[0]))


def test_scalar_leaf_bypasses(tmp_cache):
    g = aot_jit(lambda x, a: a * x)
    out = g(jnp.ones((2, 3)), 2.0)  # Python float leaf -> plain jit
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.ones((2, 3)))
    assert list(tmp_cache.glob("*.jaxexp")) == []


def test_env_opt_out(tmp_cache, monkeypatch):
    monkeypatch.setenv("GPBOI_AOT", "0")
    f = aot_jit(_fn, static_argnames=("scale",))
    f(jnp.ones((2, 3)), jnp.ones((3, 2)))
    assert list(tmp_cache.glob("*.jaxexp")) == []


def test_nested_under_outer_trace(tmp_cache):
    f = aot_jit(_fn, static_argnames=("scale",))

    @jax.jit
    def outer(x, w):
        y, s = f(x, w)
        return y + s

    x = jnp.ones((2, 3))
    w = jnp.ones((3, 2))
    np.testing.assert_allclose(
        np.asarray(outer(x, w)), np.asarray(_fn(x, w)[0] + _fn(x, w)[1])
    )


def test_fit_parity_cached_vs_bypassed(tmp_cache, monkeypatch):
    """End-to-end: the fit with the AOT layer active agrees with plain jit.

    On this forced-CPU suite the backend guard keeps the fit's LARGE
    unrolled-Cholesky programs on plain jit even when the cache is
    otherwise opted in (GPBOI_AOT_CPU exercises only the small-program
    tests above — executing big CPU exported programs is the exact
    failure mode the round-4 guard exists for), so this asserts the
    AOT-wrapped entry points are transparent: same results with the
    layer enabled and disabled."""
    monkeypatch.delenv("GPBOI_AOT_CPU", raising=False)
    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0, 1, 40))
    Y = jnp.asarray(np.sin(6 * t)[None] + 0.05 * rng.normal(size=(2, 40)))
    box = BoxTransform.from_bounds((1e-3, 1e3), (1e-2, 1e1), (1e-8, 1e0))
    key = jax.random.PRNGKey(0)

    res_cached = fit_gp_hyperparameters(
        jnp.asarray(t), Y, box, key, n_restarts=5, adam_steps=20
    )
    monkeypatch.setenv("GPBOI_AOT", "0")
    res_plain = fit_gp_hyperparameters(
        jnp.asarray(t), Y, box, key, n_restarts=5, adam_steps=20
    )
    for a, b in zip(res_cached, res_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_host_program_platform_and_placement(tmp_cache):
    """host=True exports for CPU and commits outputs to the host device."""
    g = aot_jit(lambda x: jnp.linalg.cholesky(x), host=True)
    A = jnp.eye(4) * 2.0
    L = g(A)
    np.testing.assert_allclose(np.asarray(L), np.sqrt(2.0) * np.eye(4))
    files = list(tmp_cache.glob("*.jaxexp"))
    assert len(files) == 1
    exp = jax.export.deserialize(files[0].read_bytes())
    assert exp.platforms == ("cpu",)
    assert L.devices() == {jax.devices("cpu")[0]}


def test_batched_gp_estimates_matches_per_mode(tmp_cache):
    """The AOT-cached batched estimation equals per-mode gp_estimates."""
    from gp_bayesopinf_tpu.gp.estimates import (
        batched_gp_estimates,
        gp_estimates,
    )

    rng = np.random.default_rng(7)
    m, mp, r = 25, 40, 3
    T = jnp.asarray(np.sort(rng.uniform(0, 1, (r, m)), axis=1))
    Y = jnp.asarray(rng.normal(size=(r, m)))
    t_est = jnp.asarray(np.linspace(0, 1, mp))
    s2 = jnp.full((r,), 1.3)
    ell = jnp.full((r,), 0.4)
    chi = jnp.full((r,), 1e-3)
    got = batched_gp_estimates(
        T, Y, t_est, s2, ell, chi, jnp.asarray(1e-8), method="eigh"
    )
    for i in range(r):
        want = gp_estimates(
            T[i], Y[i], t_est, s2[i], ell[i], chi[i], eta=1e-8, method="eigh"
        )
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a[i]), np.asarray(b), rtol=1e-9, atol=1e-11
            )


def test_package_digest_keys_source(tmp_cache):
    d1 = aotcache._package_digest()
    assert isinstance(d1, str) and len(d1) == 64
    assert aotcache._package_digest() is d1 or aotcache._package_digest() == d1
