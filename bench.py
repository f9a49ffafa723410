"""Benchmark: flagship Euler GP-BayesOpInf pipeline on TPU vs CPU baseline.

Measures the reference's hot loops (SURVEY.md section 3.1) at the flagship
ex1a scale (r = 6 modes, m = 200 samples, m' = 400 regression points),
INCLUDING the reference's single most expensive stage:

  B. GP hyperparameter fitting: 1 + 100 L-BFGS-B restarts per mode on the
     exact-GP NLML (the sklearn schedule, ``codebase/gpkernels.py:302-308``,
     ``PDEs/config_euler.py:103``)
  C. GP estimation per mode: Cholesky solves + (m' x m') eigh for sqrtW
  D. regularization grid search: 81 candidates x 20 posterior draws x 2
     time domains of ROM integrations
  E. posterior ensemble: 1000 draws integrated over 401 output times

TPU path (hybrid precision policy, utils.hostmath): GP fitting = one
batched Adam screen over all (mode x restart) starts + on-device Newton
polish + full-data re-rank, all sync-free on the TPU; estimation
factorizations + regression SVD on the host CPU device (true f64,
milliseconds); the 81x20x2 screening grid and the 1000-draw ensemble
batched on the TPU in f32. All stages timed together.
CPU baseline: the same math via NumPy/SciPy (LAPACK + scipy.solve_ivp +
serial L-BFGS-B restarts with the analytic NLML gradient), serial per
mode / restart / draw / candidate, as the reference executes it.

Prints ONE JSON line:
  {"metric": ..., "value": <tpu seconds>, "unit": "s",
   "vs_baseline": <cpu_baseline_seconds / tpu_seconds>}
"""

import json
import sys
import time

import numpy as np

R, M, MP, K = 6, 200, 400, 401
NDRAWS_GRID, NGRID, NDRAWS_ENS = 20, 81, 1000
N_RESTARTS = 100  # reference: n_restarts_optimizer=100 (config_euler.py:103)
# Reference Euler GP bounds (PDEs/config_euler.py:100-102).
GP_BOUNDS = ((1e-5, 1e5), (1e-5, 1e2), (1e-16, 1e2))
ETA = 1e-8
SEED = 27092023


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_problem():
    """Synthetic flagship-scale problem with realistic hyperparameters."""
    rng = np.random.default_rng(SEED)
    ts = np.sort(rng.uniform(0, 0.06, M))
    t_est = np.linspace(0, 0.06, MP)
    t_pred = np.linspace(0, 0.15, K)
    # Smooth multi-frequency signals standing in for POD coordinates.
    freqs = rng.uniform(40, 120, (R, 3))
    amps = rng.uniform(0.2, 1.0, (R, 3))

    def signal(t):
        return np.stack(
            [
                sum(a * np.sin(f * t + i) for a, f, i in zip(amps[j], freqs[j], range(3)))
                for j in range(R)
            ]
        )

    Y = signal(ts) + 0.01 * rng.standard_normal((R, M))
    return ts, Y, t_est, t_pred


# ---------------- CPU GP fitting (serial L-BFGS-B restarts) ---------------------
def _nlml_and_grad_np(z, t, y):
    """Exact NLML and its analytic gradient in log-hyperparameter space
    (the quantities sklearn's L-BFGS-B consumes)."""
    sigma2, ell, chi = np.exp(z)
    m = t.size
    dd = t[:, None] - t[None, :]
    d2 = dd * dd
    Krbf = sigma2 * np.exp(-d2 / (2.0 * ell * ell))
    K = Krbf + chi * np.eye(m)
    try:
        L = np.linalg.cholesky(K)
    except np.linalg.LinAlgError:
        return 1e30, np.zeros(3)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    Kinv = np.linalg.solve(L.T, np.linalg.solve(L, np.eye(m)))
    logdet = 2.0 * np.sum(np.log(np.diag(L)))
    val = 0.5 * (y @ alpha) + 0.5 * logdet + 0.5 * m * np.log(2 * np.pi)
    P = Kinv - np.outer(alpha, alpha)
    g_sigma = 0.5 * np.sum(P * Krbf)
    g_ell = 0.5 * np.sum(P * (Krbf * (d2 / (ell * ell))))
    g_chi = 0.5 * chi * np.trace(P)
    return val, np.array([g_sigma, g_ell, g_chi])


def fit_cpu(ts, Y):
    """Serial multi-restart L-BFGS-B fit, the reference's sklearn schedule:
    restart 0 from the kernel default (1, 1, 1) projected into bounds, then
    N_RESTARTS log-uniform starts (``gpkernels.py:302-308``)."""
    import scipy.optimize

    rng = np.random.default_rng(SEED + 2)
    lo = np.log([b[0] for b in GP_BOUNDS])
    hi = np.log([b[1] for b in GP_BOUNDS])
    hyper = []
    for i in range(R):
        best = (np.inf, np.zeros(3))
        starts = [np.clip(np.zeros(3), lo, hi)]
        starts += list(rng.uniform(lo, hi, (N_RESTARTS, 3)))
        for z0 in starts:
            res = scipy.optimize.minimize(
                _nlml_and_grad_np, z0, args=(ts, Y[i]), jac=True,
                method="L-BFGS-B", bounds=list(zip(lo, hi)),
            )
            if res.fun < best[0]:
                best = (res.fun, res.x)
        hyper.append(np.exp(best[1]))
    return np.stack(hyper)


# ---------------- CPU baseline (NumPy / SciPy, serial) -------------------------
def run_cpu(ts, Y, t_est, t_pred, hyper):
    import scipy.linalg as la
    import scipy.integrate

    rng = np.random.default_rng(SEED + 1)
    d = 1 + R + R * (R + 1) // 2

    def kernel_products(t, y, s2, ell, chi):
        ell2 = ell * ell

        def kap(a, b):
            dd = a[:, None] - b[None, :]
            return s2 * np.exp(-(dd * dd) / (2 * ell2))

        Kyy = kap(t, t) + chi * np.eye(t.size)
        kzy = kap(t_est, t)
        Kzy = -(t_est[:, None] - t[None, :]) * kzy / ell2
        dzz = t_est[:, None] - t_est[None, :]
        Kzz = (1 - dzz * dzz / ell2) * kap(t_est, t_est) / ell2
        cho = la.cho_factor(Kyy)
        alpha = la.cho_solve(cho, y)
        state = kzy @ alpha
        ddt = Kzy @ alpha
        cross = Kzy @ la.cho_solve(cho, Kzy.T)
        C = Kzz - 0.5 * (cross + cross.T)
        w, V = la.eigh(C + ETA * np.eye(MP))
        sqrtW = (V / np.sqrt(w)) @ V.T
        return state, ddt, sqrtW

    # Stage C — per-mode estimation (serial).
    states, ddts, sqrtWs = [], [], []
    for i in range(R):
        s, dd, sw = kernel_products(ts, Y[i], *hyper[i])
        states.append(s)
        ddts.append(dd)
        sqrtWs.append(sw)
    states = np.stack(states)

    # Regression (weighted, per row).
    def ckron_np(Q):
        rows, cols = np.tril_indices(R)
        return Q[rows] * Q[cols]

    D = np.vstack([np.ones(MP), states, ckron_np(states)]).T
    Dts, zts = [], []
    for i in range(R):
        Dts.append(sqrtWs[i] @ D)
        zts.append(sqrtWs[i] @ ddts[i])
    svds = [np.linalg.svd(Dt, full_matrices=False) for Dt in Dts]

    def rhs_np(t, q, Ohat):
        feats = np.concatenate([[1.0], q, ckron_np(q[:, None])[:, 0]])
        return Ohat @ feats

    def integrate(Ohat, t_eval):
        sol = scipy.integrate.solve_ivp(
            rhs_np, (t_eval[0], t_eval[-1]), states[:, 0], t_eval=t_eval,
            args=(Ohat,), rtol=1e-5, atol=1e-8, method="RK45",
        )
        return sol.y, sol.y.shape[1] == t_eval.size

    def solve_and_sample(lam, ndraws):
        ohats = []
        for i in range(R):
            U, S, Vt = svds[i]
            mean = Vt.T @ (S / (S * S + lam * lam) * (U.T @ zts[i]))
            fac = Vt.T / np.sqrt(S * S + lam * lam)
            ohats.append(
                mean[None] + rng.standard_normal((ndraws, d)) @ fac.T
            )
        return np.stack(ohats, axis=1)  # (ndraws, R, d)

    # Stage D — grid search (serial candidates x draws x 2 domains).
    shift = states.mean(axis=1, keepdims=True)
    limits = 5 * np.abs(states - shift).max(axis=1)
    grid = np.logspace(-16, 4, NGRID)
    best = (np.inf, grid[0])
    for lam in grid:
        ohats = solve_and_sample(lam, NDRAWS_GRID)
        draws, ok_all = [], True
        for O in ohats:
            for tdom in (t_pred, t_est):
                sol, ok = integrate(O, tdom)
                if not ok or np.any(np.abs(sol - shift).max(axis=1) > limits):
                    ok_all = False
                    break
            if not ok_all:
                break
            draws.append(sol)
        if not ok_all:
            continue
        err = np.linalg.norm(np.mean(draws, axis=0) - states) / np.linalg.norm(states)
        if err < best[0]:
            best = (err, lam)
    lam = best[1]

    # Stage E — 1000-draw ensemble (serial).
    ohats = solve_and_sample(lam, NDRAWS_ENS)
    count = 0
    acc = np.zeros((R, K))
    for O in ohats:
        sol, ok = integrate(O, t_pred)
        if ok:
            acc += sol
            count += 1
    return acc / max(count, 1)


# ---------------- TPU path (host f64 stage + accelerator f32 stage) -------------
def make_tpu_fit():
    """Batched GP fit: vmapped Adam screen over all (mode x restart) starts
    + Newton polish + full-data re-rank, sync-free on device (gp/fit.py)."""
    import jax.numpy as jnp
    from gp_bayesopinf_tpu.gp.fit import fit_gp_hyperparameters
    from gp_bayesopinf_tpu.gp.nlml import BoxTransform

    box = BoxTransform.from_bounds(*GP_BOUNDS)

    def fit(ts, Y, key):
        res = fit_gp_hyperparameters(ts, Y, box, key, n_restarts=N_RESTARTS)
        return jnp.stack([res.sigma2, res.ell, res.chi], axis=1)

    return fit


def make_tpu_fn():
    import os

    import jax
    import jax.numpy as jnp
    from gp_bayesopinf_tpu.gp.estimates import gp_estimates
    from gp_bayesopinf_tpu.ops.ensemble_pallas import (
        quadratic_ensemble_screen,
        quadratic_ensemble_screen_xla,
    )
    from gp_bayesopinf_tpu.solve.lstsq import weighted_lstsq_fit
    from gp_bayesopinf_tpu.solve.ivp import stability_mask
    from gp_bayesopinf_tpu.rom.model import GalerkinROM
    from gp_bayesopinf_tpu.utils.hostmath import host_jit, to_accelerator

    rom = GalerkinROM("cAH", state_dimension=R, substeps=4)
    grid = jnp.asarray(np.logspace(-16, 4, NGRID))
    use_pallas = (
        jax.default_backend() == "tpu"
        and os.environ.get("GPBOI_PALLAS", "1") != "0"
    )

    # Stage A (host, true f64): estimation factorizations + regression SVD.
    def host_stage(ts, Y, t_est, hyper):
        ests = jax.vmap(
            lambda y, h: gp_estimates(
                ts, y, t_est, h[0], h[1], h[2], eta=ETA, method="chol"
            )
        )(Y, hyper)
        states = ests.state_estimate
        D = rom.data_matrix(states)[None]
        fac = weighted_lstsq_fit(
            D,
            ests.weight_root[:, None],
            ests.ddt_estimate[:, None],
            weights_are_cholesky=True,
        )
        return states, fac

    host_stage_jit = host_jit(host_stage)

    # Stage B (accelerator, f32): screening grid + final ensemble.
    def accel_stage(states, fac, t_est, t_pred, key):
        shift = jnp.mean(states, axis=1)
        limits = 5.0 * jnp.max(jnp.abs(states - shift[:, None]), axis=1)
        q0 = states[:, 0]

        keys = jax.random.split(key, NGRID + 1)
        ohats = jax.vmap(
            lambda lam, k: fac.sample(lam, k, NDRAWS_GRID)
        )(grid, keys[:-1]).reshape(NGRID * NDRAWS_GRID, R, -1)

        screen = (
            quadratic_ensemble_screen if use_pallas
            else quadratic_ensemble_screen_xla
        )
        st_p, _ = screen(ohats, q0, t_pred, shift, limits,
                         nd=NDRAWS_GRID, substeps=4, track_error=False)
        st_e, err_sq = screen(ohats, q0, t_est, shift, limits, states,
                              nd=NDRAWS_GRID, substeps=4)
        stable = jnp.all(
            (st_p & st_e).reshape(NGRID, NDRAWS_GRID), axis=1
        )
        errs = jnp.sqrt(err_sq) / jnp.linalg.norm(states).astype(jnp.float32)
        errs = jnp.where(stable & jnp.isfinite(errs), errs, 1e12)
        lam = grid[jnp.argmin(errs)]

        f32 = jnp.float32
        ohats = fac.sample(lam, keys[-1], NDRAWS_ENS).astype(f32)
        q32, t32 = q0.astype(f32), t_pred.astype(f32)
        sols = jax.vmap(lambda O: rom.predict(O, q32, t32))(ohats)
        ok = stability_mask(sols, shift.astype(f32), limits.astype(f32))
        acc = jnp.sum(jnp.where(ok[:, None, None], sols, 0.0), axis=0)
        return acc / jnp.maximum(jnp.sum(ok), 1), lam

    accel_stage_jit = jax.jit(accel_stage)

    def core(ts_h, Y_h, t_est_h, t_pred, hyper, key):
        # ts/Y/t_est arrive HOST-committed: the host f64 stage must not
        # pull them back through the accelerator tunnel (~33 ms per
        # device->host readback, measured round 3). Only ``hyper``
        # crosses from the fit device — a single small transfer.
        states, fac = host_stage_jit(ts_h, Y_h, t_est_h, hyper)
        states, fac, t_est_a, t_pred_a = to_accelerator(
            (states, fac, t_est_h, t_pred)
        )
        return accel_stage_jit(states, fac, t_est_a, t_pred_a, key)

    return core


def main():
    ts, Y, t_est, t_pred = make_problem()

    # --- CPU baseline (fit + estimate + search + ensemble, serial) ---------------
    _log("running CPU (NumPy/SciPy serial) baseline ...")
    t0 = time.perf_counter()
    hyper_cpu = fit_cpu(ts, Y)
    cpu_fit_s = time.perf_counter() - t0
    _log(f"CPU fit stage (1+{N_RESTARTS} L-BFGS-B restarts x {R} modes): "
         f"{cpu_fit_s:.2f} s")
    t0 = time.perf_counter()
    run_cpu(ts, Y, t_est, t_pred, hyper_cpu)
    cpu_core_s = time.perf_counter() - t0
    cpu_s = cpu_fit_s + cpu_core_s
    _log(f"CPU estimate+search+ensemble: {cpu_core_s:.2f} s")
    _log(f"CPU baseline total: {cpu_s:.2f} s")

    # --- TPU path ----------------------------------------------------------------
    import jax
    import jax.numpy as jnp

    # The axon tunnel flaps occasionally (observed round 3), and an
    # in-process ``jax.devices()`` can BLOCK for tens of minutes rather
    # than raise while it is down. A benchmark run must always emit its
    # JSON line: probe the accelerator in a time-bounded subprocess,
    # retry a few times, then fall back to the CPU backend and say so in
    # the metric name.
    def _accel_alive(timeout=90):
        import subprocess

        # No captured pipes: the axon backend spawns helper processes
        # that inherit them, and after a TimeoutExpired kill of the
        # direct child, run() would block on pipe EOF forever. DEVNULL
        # (plus a fresh session so the kill cannot hit this process
        # group) keeps the probe itself time-bounded.
        try:
            return (
                subprocess.run(
                    [sys.executable, "-c",
                     "import jax; jax.devices()"],
                    timeout=timeout,
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                    start_new_session=True,
                ).returncode == 0
            )
        except subprocess.TimeoutExpired:
            return False

    backend_tag = ""
    if jax.config.jax_platforms not in ("cpu", ""):
        for attempt in range(6):
            if _accel_alive():
                break
            _log(f"accelerator probe failed (attempt {attempt + 1}/6)")
            time.sleep(30)
        else:
            _log("accelerator unavailable; falling back to the CPU backend")
            jax.config.update("jax_platforms", "cpu")
            backend_tag = "-cpufallback"

    _log(f"jax backend: {jax.default_backend()}, devices: {jax.devices()}")
    from gp_bayesopinf_tpu.utils.hostmath import host_device

    fit = make_tpu_fit()
    fn = make_tpu_fn()
    ts_j, Y_j = jnp.asarray(ts), jnp.asarray(Y)
    # Host-committed twins for the host-f64 stage (no tunnel readbacks).
    cpu0 = host_device()
    ts_h = jax.device_put(ts, cpu0)
    Y_h = jax.device_put(Y, cpu0)
    t_est_h = jax.device_put(t_est, cpu0)
    t_pred_j = jnp.asarray(t_pred)
    fit_key = jax.random.PRNGKey(1)
    core_key = jax.random.PRNGKey(0)

    def pipeline():
        hyper = fit(ts_j, Y_j, fit_key)
        out = fn(ts_h, Y_h, t_est_h, t_pred_j, hyper, core_key)
        # Force a REAL readback: under the axon tunnel
        # ``block_until_ready`` returns at enqueue time — only a
        # device->host copy truly waits for execution (measured round 3).
        np.asarray(out[0]), np.asarray(out[1])
        return hyper, out

    t0 = time.perf_counter()
    hyper_tpu, _ = pipeline()
    _log(f"TPU compile+first run: {time.perf_counter() - t0:.2f} s")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        pipeline()
    tpu_s = (time.perf_counter() - t0) / reps
    _log(f"TPU steady-state (fit+estimate+search+ensemble): {tpu_s:.4f} s")

    # Stage split (one extra rep, stderr only; np.asarray forces).
    t0 = time.perf_counter()
    hyper = fit(ts_j, Y_j, fit_key)
    np.asarray(hyper)
    _log(f"  stage split: fit {time.perf_counter() - t0:.3f} s")
    t0 = time.perf_counter()
    out = fn(ts_h, Y_h, t_est_h, t_pred_j, hyper, core_key)
    np.asarray(out[0])
    _log(f"  stage split: estimate+search+ensemble {time.perf_counter() - t0:.3f} s")

    # Capability check: both fitters must land on optima of comparable
    # quality (the reference's own dual-backend tolerance is loose,
    # ``ODEs/main.py:131-182``).
    hyper_tpu = np.asarray(hyper_tpu, dtype=np.float64)
    for i in range(R):
        n_cpu = _nlml_and_grad_np(np.log(hyper_cpu[i]), ts, Y[i])[0]
        n_tpu = _nlml_and_grad_np(np.log(hyper_tpu[i]), ts, Y[i])[0]
        _log(f"mode {i}: NLML cpu {n_cpu:.3f} tpu {n_tpu:.3f}")

    print(
        json.dumps(
            {
                "metric": "euler_pipeline_fit100x6_r6_m200_mp400_grid81x20_"
                          "ens1000_wallclock" + backend_tag,
                "value": round(tpu_s, 4),
                "unit": "s",
                "vs_baseline": round(cpu_s / tpu_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
