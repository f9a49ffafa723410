"""Serial CPU baselines for the SEIRD (ODEs ex1a) and heat-multi (ex3)
workloads — the reference's execution schedule in NumPy/SciPy.

The flagship Euler benchmark (bench.py) already measures its CPU
baseline; this script closes the gap for the other two pipelines
(round-2 verdict weak #6). Everything here is SERIAL per mode / restart /
draw / candidate / trajectory, mirroring how the reference executes:

* SEIRD  (``/root/reference/ODEs/experiments.sh:11``: 090 090 .10 360,
  600 draws): scipy data gen -> 5 x (1+100) L-BFGS-B NLML restarts ->
  per-variable estimation eigh -> blockwise weighted regression ->
  22-candidate x 20-draw search with RK45 integrations -> 600-draw
  ensemble + new-IC study (``ODEs/main.py``).
* heat-multi (``/root/reference/PDEsMulti/experiments.sh:6``:
  1 20 .05 80 5, 600 draws): scipy BDF FOM solves for 5 trajectories ->
  joint lifted POD -> 25 x (1+100) L-BFGS-B restarts -> stacked
  blockwise regression -> 81-candidate x 20-draw x 5-trajectory x
  2-domain search with BDF ROM integrations -> 600 x 5 ensemble
  (``PDEsMulti/main.py``).

Usage: python scripts/cpu_baselines.py [seird|heat|both]
Prints per-stage wall times and a total per workload.
"""

import os
import sys
import time

import numpy as np
import scipy.integrate
import scipy.linalg as la
import scipy.optimize

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import reference_impl as ri  # NumPy oracle (tests/reference_impl.py)

GP_RESTARTS = 100


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


class Timer:
    def __init__(self):
        self.stages = []

    def stage(self, name):
        return _Stage(self, name)

    @property
    def total(self):
        return sum(s for _, s in self.stages)


class _Stage:
    def __init__(self, tm, name):
        self.tm, self.name = tm, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        self.tm.stages.append((self.name, dt))
        _log(f"  [{self.name}] {dt:.2f} s")


# ---------------- shared: serial sklearn-schedule GP fitting -----------------
def nlml_and_grad(z, t, y):
    """Exact NLML + analytic gradient in log space (what sklearn's
    L-BFGS-B consumes; reference ``codebase/gpkernels.py:302-308``)."""
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


def fit_gp_serial(t, y, bounds, rng):
    lo = np.log([b[0] for b in bounds])
    hi = np.log([b[1] for b in bounds])
    best = (np.inf, np.zeros(3))
    starts = [np.clip(np.zeros(3), lo, hi)]
    starts += list(rng.uniform(lo, hi, (GP_RESTARTS, 3)))
    for z0 in starts:
        res = scipy.optimize.minimize(
            nlml_and_grad, z0, args=(t, y), jac=True,
            method="L-BFGS-B", bounds=list(zip(lo, hi)),
        )
        if res.fun < best[0]:
            best = (res.fun, res.x)
    return np.exp(best[1])


# ---------------- SEIRD serial baseline --------------------------------------
def seird_baseline():
    _log("== SEIRD ex1a serial CPU baseline (090 090 .10 360, 600 draws) ==")
    tm = Timer()
    rng = np.random.default_rng(21092023)
    span, m, noise, mp, ndraws = 90.0, 90, 0.10, 360, 600
    # convert_parameters (models/seird.py:58-61):
    # (N, beta, delta, gamma, alpha, rho) -> 4 regression unknowns.
    N_, beta, delta, gamma, alpha, rho = 1.0, 0.25, 0.1, 0.1, 0.05, 0.05
    pconv = np.array(
        [beta / N_, delta, (1 - alpha) * gamma, alpha * rho]
    )
    q0 = np.array([0.994, 0.005, 0.001, 0.0, 0.0])
    t_pred = np.linspace(0, 200, 500)
    t_est = np.linspace(0, span, mp)

    with tm.stage("data generation (scipy RK45)"):
        # Integer-day unsynced sampling per variable (ODEs/main.py).
        samples = []
        times = []
        for i in range(5):
            ti = np.sort(
                rng.choice(np.arange(0, int(span) + 1), m, replace=False)
            ).astype(float)
            sol = ri.solve_seird2(pconv, q0, ti)
            noisy = sol[i] * (1 + noise * rng.standard_normal(m))
            times.append(ti)
            samples.append(np.maximum(noisy, 0.0))

    with tm.stage(f"GP fits (5 x {1 + GP_RESTARTS} L-BFGS-B restarts)"):
        bounds = ((1e-8, 1e5), (0.1, 100.0), (1e-16, 0.5))
        hypers = [
            fit_gp_serial(times[i], samples[i], bounds, rng)
            for i in range(5)
        ]

    with tm.stage("estimation (5 x (360x360) eigh)"):
        states, ddts, sqrtWs = [], [], []
        for i in range(5):
            s, dd, _, sw = ri.estimates_and_weights(
                times[i], samples[i], t_est, *hypers[i]
            )
            states.append(s)
            ddts.append(dd)
            sqrtWs.append(sw)
        states = np.stack(states)

    with tm.stage("blockwise weighted regression factorization"):
        # SEIRD2 4-parameter block regression
        # (models/seird.py::data_matrix_blocks; reference ODEs/main.py).
        S, E, I = states[0], states[1], states[2]
        SI = S * I
        Z = np.zeros(mp)
        blocks = [
            np.stack([-SI, Z, Z, Z], 1),
            np.stack([SI, -E, Z, Z], 1),
            np.stack([Z, E, -I, -I], 1),
            np.stack([Z, Z, I, Z], 1),
            np.stack([Z, Z, Z, I], 1),
        ]
        Dts = [sqrtWs[i] @ blocks[i] for i in range(5)]
        zts = [sqrtWs[i] @ ddts[i] for i in range(5)]
        Dstack = np.vstack(Dts)
        zstack = np.concatenate(zts)
        U, Sv, Vt = np.linalg.svd(Dstack, full_matrices=False)
        Utz = U.T @ zstack

    def sample_params(lam, n):
        mean = Vt.T @ (Sv / (Sv * Sv + lam * lam) * Utz)
        fac = Vt.T / np.sqrt(Sv * Sv + lam * lam)
        return mean[None] + rng.standard_normal((n, Sv.size)) @ fac.T

    def integrate(p, t_eval, ic=None):
        try:
            sol = ri.solve_seird2(
                np.maximum(p, 0.0), q0 if ic is None else ic, t_eval
            )
            return sol, np.all(np.isfinite(sol))
        except Exception:
            return None, False

    shift = states.mean(axis=1, keepdims=True)
    limits = 5 * np.abs(states - shift).max(axis=1)

    with tm.stage("reg search (22 candidates x 20 draws x 2 domains)"):
        best = (np.inf, None)
        for lam in np.logspace(-16, 5, 22):
            draws_ok = []
            ok_all = True
            for p in sample_params(lam, 20):
                for tdom in (t_pred, t_est):
                    sol, ok = integrate(p, tdom)
                    if not ok or np.any(
                        np.abs(sol - shift).max(axis=1) > limits
                    ):
                        ok_all = False
                        break
                if not ok_all:
                    break
                draws_ok.append(sol)
            if not ok_all:
                continue
            err = np.linalg.norm(
                np.mean(draws_ok, axis=0) - states
            ) / np.linalg.norm(states)
            if err < best[0]:
                best = (err, lam)
        lam = best[1] if best[1] is not None else 1e-3
        _log(f"  selected lambda = {lam:.3e}")

    with tm.stage(f"ensemble ({ndraws} draws) + new-IC study"):
        q0_new = np.array([0.722, 0.208, 0.070, 0.0, 0.0])
        for p in sample_params(lam, ndraws):
            integrate(p, t_pred)
        for p in sample_params(lam, ndraws):
            integrate(p, t_pred, ic=q0_new)  # new-IC generalization study

    _log(f"SEIRD serial CPU total: {tm.total:.1f} s")
    return tm


# ---------------- heat-multi serial baseline ---------------------------------
def heat_baseline():
    _log("== heat-multi ex3 serial CPU baseline (1 20 .05 80 5, 600 draws) ==")
    tm = Timer()
    rng = np.random.default_rng(29012024)
    L_traj = 5
    params = [(-2, 0), (-1, -2), (0, 1), (1, -1), (2, 2)]
    n_x, k_t = 500, 500
    m, mp, r, ndraws = 20, 80, 5, 600
    x = np.linspace(0, 1, n_x)
    t_pred = np.linspace(0, 2, k_t)
    t_est = np.linspace(0, 1, mp)
    kappa = 1e-2
    A, c0, B, = ri.heat_operators(x, 0.0, 1.0, kappa)[:3]

    def u_of_t(t, ab):
        a, b = ab
        return np.stack(
            [a * np.sin(2 * np.pi * t), b * np.sin(4 * np.pi * t)]
        )

    with tm.stage("FOM data generation (5 x scipy BDF)"):
        snaps = []
        for ab in params:
            q0 = x * (1 - x) + x  # smooth IC compatible with BCs
            sol = ri.solve_cubic_heat(
                q0[1:-1], t_pred, A, c0, B, *ab
            )
            snaps.append(sol * (1 + 0.05 * rng.standard_normal(sol.shape)))

    with tm.stage("joint lifted POD (host SVD)"):
        lifted = np.vstack(
            [np.hstack(snaps), np.hstack([s * s for s in snaps])]
        )
        Upod, _, _ = np.linalg.svd(lifted, full_matrices=False)
        basis = Upod[:, :r]
        comp = [
            basis.T @ np.vstack([s, s * s]) for s in snaps
        ]  # (r, k) per trajectory

    with tm.stage(f"GP fits ({L_traj * r} x {1 + GP_RESTARTS} restarts)"):
        bounds = ((1e-5, 1e5), (1e-5, 1e2), (1e-16, 1e2))
        tsamp = np.sort(rng.uniform(0, 1, m))
        tsamp[0], tsamp[-1] = 0, 1
        idx = np.searchsorted(t_pred, tsamp)
        hypers = [
            [
                fit_gp_serial(t_pred[idx], comp[ell][i, idx], bounds, rng)
                for i in range(r)
            ]
            for ell in range(L_traj)
        ]

    with tm.stage(f"estimation ({L_traj * r} x (80x80) eigh)"):
        states_l, ddts_l, sqrtW_l = [], [], []
        for ell in range(L_traj):
            ss, dds, sws = [], [], []
            for i in range(r):
                s, dd, _, sw = ri.estimates_and_weights(
                    t_pred[idx], comp[ell][i, idx], t_est, *hypers[ell][i]
                )
                ss.append(s)
                dds.append(dd)
                sws.append(sw)
            states_l.append(np.stack(ss))
            ddts_l.append(np.stack(dds))
            sqrtW_l.append(sws)

    # cAHBN feature map (rom/operators.py packing: c, A, H, B, N).
    rows_q, cols_q = np.tril_indices(r)

    def features(q, u):
        return np.concatenate(
            [[1.0], q, q[rows_q] * q[cols_q], u, np.kron(u, q)]
        )

    d = 1 + r + r * (r + 1) // 2 + 2 + 2 * r

    with tm.stage("stacked blockwise regression (per-mode SVDs)"):
        svds, Utzs = [], []
        for i in range(r):
            Dt_blocks, zt_blocks = [], []
            for ell in range(L_traj):
                U_tab = u_of_t(t_est, params[ell])  # (2, mp)
                Dmat = np.stack(
                    [
                        features(states_l[ell][:, j], U_tab[:, j])
                        for j in range(mp)
                    ]
                )
                Dt_blocks.append(sqrtW_l[ell][i] @ Dmat)
                zt_blocks.append(sqrtW_l[ell][i] @ ddts_l[ell][i])
            Dstack = np.vstack(Dt_blocks)
            zstack = np.concatenate(zt_blocks)
            U_, S_, Vt_ = np.linalg.svd(Dstack, full_matrices=False)
            svds.append((U_, S_, Vt_))
            Utzs.append(U_.T @ zstack)

    def sample_ops(lam, n):
        out = np.empty((n, r, d))
        for i in range(r):
            U_, S_, Vt_ = svds[i]
            mean = Vt_.T @ (S_ / (S_ * S_ + lam * lam) * Utzs[i])
            fac = Vt_.T / np.sqrt(S_ * S_ + lam * lam)
            out[:, i, :] = mean[None] + rng.standard_normal((n, d)) @ fac.T
        return out

    def integrate_rom(Ohat, t_eval, ab):
        def rhs(t, q):
            return Ohat @ features(q, u_of_t(np.array([t]), ab)[:, 0])

        sol = scipy.integrate.solve_ivp(
            rhs, (t_eval[0], t_eval[-1]), q0s[ab], t_eval=t_eval,
            method="BDF", rtol=1e-5, atol=1e-8,
        )
        ok = sol.y.shape[1] == t_eval.size and np.all(np.isfinite(sol.y))
        return sol.y, ok

    q0s = {ab: states_l[ell][:, 0] for ell, ab in enumerate(params)}
    shifts = [s.mean(axis=1, keepdims=True) for s in states_l]
    limits = [
        5 * np.abs(states_l[ell] - shifts[ell]).max(axis=1)
        for ell in range(L_traj)
    ]

    with tm.stage("reg search (81 x 20 draws x 5 traj x 2 domains, BDF)"):
        best = (np.inf, None)
        for lam in np.logspace(-16, 4, 81):
            ohats = sample_ops(lam, 20)
            ok_all = True
            errs = []
            for ell, ab in enumerate(params):
                sols = []
                for O in ohats:
                    for tdom in (t_pred, t_est):
                        sol, ok = integrate_rom(O, tdom, ab)
                        if not ok or np.any(
                            np.abs(sol - shifts[ell]).max(axis=1)
                            > limits[ell]
                        ):
                            ok_all = False
                            break
                    if not ok_all:
                        break
                    sols.append(sol)
                if not ok_all:
                    break
                errs.append(
                    np.linalg.norm(np.mean(sols, axis=0) - states_l[ell])
                    / np.linalg.norm(states_l[ell])
                )
            if not ok_all:
                continue
            err = float(np.mean(errs))
            if err < best[0]:
                best = (err, lam)
        lam = best[1] if best[1] is not None else 1e-2
        _log(f"  selected lambda = {lam:.3e}")

    with tm.stage(f"ensemble ({ndraws} draws x {L_traj} trajectories)"):
        ohats = sample_ops(lam, ndraws)
        for ell, ab in enumerate(params):
            for O in ohats:
                integrate_rom(O, t_pred, ab)

    _log(f"heat-multi serial CPU total: {tm.total:.1f} s")
    return tm


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = {}
    if which in ("seird", "both"):
        out["seird"] = seird_baseline().total
    if which in ("heat", "both"):
        out["heat"] = heat_baseline().total
    print({k: round(v, 1) for k, v in out.items()})
