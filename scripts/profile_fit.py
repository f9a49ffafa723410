"""Profile the GP hyperparameter fit stage on the accelerator (round 3).

The round-2 benchmark showed GP fitting at 1.687 s of the 1.752 s
steady-state flagship core (96%). This script breaks the stage into its
XLA programs, times each warm (median of repeats), and reports an
achieved-FLOP/s estimate for the batched-Cholesky screening phase so the
fit's distance from hardware limits is measurable (VERDICT round 2,
item 3).

Flagship shape: r=6 modes, m=200 samples, 101 starts, 100 Adam steps on a
64-point strided screen, full-data re-rank, Newton polish.
"""

import time

import numpy as np


def timeit(fn, *args, n=5):
    fn(*args)  # warm (compile)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    import jax
    import jax.numpy as jnp

    from gp_bayesopinf_tpu.gp.fit import (
        _polish_all,
        _rank_full,
        _rank_full_host,
        _screen_all,
        _select_winner,
        fit_gp_hyperparameters,
    )
    from gp_bayesopinf_tpu.gp.nlml import BoxTransform

    print(f"backend: {jax.default_backend()}", flush=True)

    r, m = 6, 200
    n_restarts, adam_steps = 100, 100
    screen_points, polish_points, polish_iters = 64, 128, 10

    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 0.06, m))
    Y = np.stack(
        [np.sin(40 * t + i) + 0.05 * rng.standard_normal(m) for i in range(r)]
    )
    box = BoxTransform.from_bounds((1e-8, 1e5), (1e-4, 1e2), (1e-16, 0.5))

    f32 = jnp.float32
    T32 = jnp.broadcast_to(jnp.asarray(t, f32), (r, m))
    Y32 = jnp.asarray(Y, f32)
    box32 = BoxTransform(box.lo.astype(f32), box.hi.astype(f32))
    keys = jax.random.split(jax.random.PRNGKey(0), r)

    idx = jnp.asarray(
        np.unique(np.linspace(0, m - 1, screen_points).round().astype(int))
    )
    Ts, Ys = T32[:, idx], Y32[:, idx]
    ms = int(Ts.shape[-1])

    # --- phase timings (warm) --------------------------------------------
    def run_screen():
        z, v = _screen_all(Ts, Ys, box32, keys, n_restarts, adam_steps, 0.08)
        return jax.block_until_ready((z, v))

    dt_screen, (z_scr, v_scr) = timeit(run_screen)

    def run_rank():
        return jax.block_until_ready(_rank_full(T32, Y32, box32, z_scr))

    dt_rank, v_full = timeit(run_rank)

    def run_select():
        return jax.block_until_ready(_select_winner(v_full, z_scr))

    dt_sel, z_best = timeit(run_select)

    pidx = jnp.asarray(
        np.unique(np.linspace(0, m - 1, polish_points).round().astype(int))
    )

    def run_polish():
        return jax.block_until_ready(
            _polish_all(T32[:, pidx], Y32[:, pidx], box32, z_best, polish_iters)
        )

    dt_pol, (z_pol, v_pol) = timeit(run_polish)

    f64 = jnp.float64
    box64 = BoxTransform(box.lo.astype(f64), box.hi.astype(f64))
    pair = jnp.stack(
        [jnp.asarray(np.asarray(z_best, np.float64)),
         jnp.asarray(np.asarray(z_pol, np.float64))],
        axis=1,
    )
    T64 = jnp.asarray(np.broadcast_to(t, (r, m)), f64)
    Y64 = jnp.asarray(Y, f64)

    def run_verify():
        return jax.block_until_ready(_rank_full_host(T64, Y64, box64, pair, method="chol"))

    dt_ver, _ = timeit(run_verify)

    # --- end-to-end stage (the real entry point) -------------------------
    tj, Yj = jnp.asarray(t), jnp.asarray(Y)

    def run_full():
        res = fit_gp_hyperparameters(
            tj, Yj, box, jax.random.PRNGKey(0),
            n_restarts=n_restarts, adam_steps=adam_steps,
            polish_iters=polish_iters,
        )
        return jax.block_until_ready(res.nlml)

    dt_full, _ = timeit(run_full)

    # --- screening FLOP model -------------------------------------------
    # Per Adam step and (mode, restart) instance: NLML fwd+bwd. Dominant
    # terms: Cholesky m^3/3 (fwd) and its backward ~2x, plus the m^2
    # solves. Count ~ 3 * (m^3 / 3) + O(m^2) ~= m^3 flops per step.
    pop = r * (n_restarts + 1)
    flops = pop * adam_steps * (ms**3 + 6.0 * ms**2)
    gflops = flops / dt_screen / 1e9

    print(f"\nphase timings (warm, median of 5):")
    print(f"  screen  ({pop} x {adam_steps} steps @ m={ms}): {dt_screen*1e3:8.1f} ms")
    print(f"  rank    ({pop} full-m NLML evals @ m={m}):     {dt_rank*1e3:8.1f} ms")
    print(f"  select  (argmin+gather):                      {dt_sel*1e3:8.1f} ms")
    print(f"  polish  ({r} x {polish_iters} Newton @ m={polish_points}):    {dt_pol*1e3:8.1f} ms")
    print(f"  verify  (2x{r} full-m f64 NLML, host):         {dt_ver*1e3:8.1f} ms")
    print(f"  sum of phases:                                {(dt_screen+dt_rank+dt_sel+dt_pol+dt_ver)*1e3:8.1f} ms")
    print(f"  fit_gp_hyperparameters end-to-end:            {dt_full*1e3:8.1f} ms")
    print(f"\nscreening achieved ~{gflops:.1f} GFLOP/s "
          f"(Cholesky-dominated FLOP model, {flops/1e9:.1f} GFLOP)")


if __name__ == "__main__":
    main()
