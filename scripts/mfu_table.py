"""Achieved-FLOP/s (MFU) table for ``run_scaled``'s production-shape
stages on one TPU chip (VERDICT r4 weak #3 / next #6).

The round-3 fit-stage analysis (BASELINE.md "Fit-stage utilization")
covered the flagship's tiny latency-bound shapes; this script measures
the stages where the MXU actually matters at the physical-north-star
shapes (nx=2000 -> n=6000 spatial DOF, k=10000 snapshots, m'=2048):

* randomized POD        — sketched subspace iteration, (n x k) matmuls
* TSQR regression SVD   — per-mode (m' x d) Gram + basis matmuls
* screening megakernel  — fused Pallas ROM integration (G*nd draws)
* posterior ensemble    — same kernel at ndraws scale, no error track

Each stage runs on synthetic data at the exact production shapes
(arithmetic intensity does not depend on values), one warm-up call then
``--reps`` timed calls with forced readbacks; the table reports the
median wall, analytic FLOPs/bytes, achieved GFLOP/s, percent of the
chip's bf16 matmul peak (f32 jnp matmuls lower to one bf16 MXU pass at
default precision), and achieved HBM bandwidth for the streaming-bound
stages.

Peaks are CLI-settable; defaults are TPU v5e: 197 TFLOP/s bf16,
819 GB/s HBM.

Usage: python scripts/mfu_table.py [--r 20] [--reps 5] [--cpu]
"""

import argparse
import json
import statistics
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nx", type=int, default=2000)
    ap.add_argument("--k", type=int, default=10000)
    ap.add_argument("--r", type=int, default=20)
    ap.add_argument("--mprime", type=int, default=2048)
    ap.add_argument("--ndraws", type=int, default=256)
    ap.add_argument("--grid", type=int, default=8)
    ap.add_argument("--nd", type=int, default=20, help="screen draws/candidate")
    ap.add_argument("--substeps", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbs", type=float, default=819.0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from gp_bayesopinf_tpu.parallel.sharded import (
        randomized_pod,
        tall_skinny_svd,
    )

    n = 3 * args.nx
    k, r, mp = args.k, args.r, args.mprime
    d = 1 + r + r * (r + 1) // 2  # cAH feature count
    rng = np.random.default_rng(0)
    rows = []

    def bench(label, fn, flops, bytes_moved, note=""):
        fn()  # warm-up (compile)
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        wall = statistics.median(walls)
        gflops = flops / wall / 1e9
        row = {
            "stage": label,
            "wall_ms": round(wall * 1e3, 2),
            "gflops": round(flops / 1e9, 2),
            "achieved_gflops_s": round(gflops, 1),
            "pct_bf16_peak": round(100 * gflops / (args.peak_tflops * 1e3), 3),
            "achieved_gb_s": round(bytes_moved / wall / 1e9, 1),
            "pct_hbm_bw": round(
                100 * (bytes_moved / wall / 1e9) / args.hbm_gbs, 1
            ),
        }
        if note:
            row["note"] = note
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- randomized POD on (n, k) ------------------------------------------------
    X = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    X.block_until_ready()
    l = r + 32
    pod_flops = 12 * n * k * l + 24 * n * l * l  # sketch+2 power iters+B, CholQR2
    pod_bytes = 6 * n * k * 4  # X streamed ~6x (sketch, 2x2 power, B)

    def run_pod():
        U, s = randomized_pod(X, r, key=jax.random.PRNGKey(1))
        jax.block_until_ready((U, s))

    bench("randomized_pod (n=%d, k=%d, l=%d)" % (n, k, l), run_pod,
          pod_flops, pod_bytes,
          note="includes 6 host-f64 (l x l) eigh round trips")

    # --- TSQR regression factorization on (r, m', d) ------------------------------
    D = jnp.asarray(rng.standard_normal((r, mp, d)).astype(np.float32))
    D.block_until_ready()
    tsqr_flops = r * 4 * mp * d * d  # per mode: Gram 2md^2 + U=XV/s 2md^2
    tsqr_bytes = r * 2 * mp * d * 4

    def run_tsqr():
        jax.block_until_ready(tall_skinny_svd(D))

    bench("tall_skinny_svd (r=%d, m'=%d, d=%d)" % (r, mp, d), run_tsqr,
          tsqr_flops, tsqr_bytes,
          note="includes host-f64 (d x d) eigh round trips")

    # --- screening megakernel (G candidates x nd draws, m' steps) ------------------
    from gp_bayesopinf_tpu.ops.ensemble_pallas import (
        quadratic_ensemble_screen,
    )

    interpret = jax.devices()[0].platform != "tpu"
    G, nd = args.grid, args.nd
    N = G * nd
    t_eval = jnp.asarray(np.linspace(0.0, 1.0, mp).astype(np.float32))
    Ohat = jnp.asarray(
        (rng.standard_normal((N, r, d)) * 1e-3).astype(np.float32)
    )
    q0 = jnp.asarray(rng.standard_normal(r).astype(np.float32))
    shift = jnp.zeros(r, jnp.float32)
    limits = jnp.full((r,), 1e6, jnp.float32)
    snaps = jnp.asarray(rng.standard_normal((r, mp)).astype(np.float32))
    # per rhs eval: feature build (r(r+1)/2 + r adds) + matvec 2 r d;
    # RK4 = 4 rhs per substep; steps = (k-1) * substeps per draw.
    rhs_flops = 2 * r * d + r * (r + 1) // 2 + 3 * r
    steps = (mp - 1) * args.substeps
    screen_flops = N * steps * 4 * rhs_flops
    screen_bytes = N * r * d * 4  # operators; state stays in VMEM

    def run_screen():
        jax.block_until_ready(
            quadratic_ensemble_screen(
                Ohat, q0, t_eval, shift, limits, snapshots=snaps,
                nd=nd, substeps=args.substeps, interpret=interpret,
            )
        )

    bench(
        "screen megakernel (N=%d, steps=%d)" % (N, steps), run_screen,
        screen_flops, screen_bytes,
        note="sequential integration: latency-bound by design at small r",
    )

    # --- posterior ensemble (ndraws, m' steps, no error tracking) -----------------
    Ne = args.ndraws
    Oe = jnp.asarray(
        (rng.standard_normal((Ne, r, d)) * 1e-3).astype(np.float32)
    )
    ens_flops = Ne * steps * 4 * rhs_flops
    ens_bytes = Ne * r * d * 4

    def run_ens():
        jax.block_until_ready(
            quadratic_ensemble_screen(
                Oe, q0, t_eval, shift, limits, snapshots=None,
                nd=Ne, substeps=args.substeps, track_error=False,
                interpret=interpret,
            )
        )

    bench("ensemble megakernel (N=%d, steps=%d)" % (Ne, steps), run_ens,
          ens_flops, ens_bytes,
          note="sequential integration: latency-bound by design at small r")

    print("\n== summary ==")
    for row in rows:
        print(json.dumps(row))


if __name__ == "__main__":
    sys.exit(main())
