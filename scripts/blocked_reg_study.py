"""Scalar vs per-block Tikhonov on the physical Euler north star.

Round-3 finding (BASELINE.md "Quadratic + physical north-star runs"): with
the reference's scalar-lambda search, the physical `data_source="euler"`
scaled run is draw-marginal — across seeds the train error jitters over
24% / 184% / 1.7% / 64% at nx=104 because the accept-only-if-all-20-draws
-stable rule (``PDEs/step3_estimate.py`` semantics) admits lucky draws at
small lambda. The identified lever is the classic OpInf two-parameter
regularizer: shrink the r(r+1)/2-column quadratic block H with its own
lambda_2 while leaving the linear dynamics lightly regularized
(``run_scaled(regularization="blocked")``, built on
``solve.lstsq.TikhonovLSTSQ``).

This script measures that claim: same seeds, same data, scalar vs blocked
search. Run on TPU (default env) or CPU
(``JAX_PLATFORMS=cpu`` via --cpu, 8 virtual devices).

Usage: python scripts/blocked_reg_study.py [--cpu] [--seeds 0 1 2 3]
       [--nx 104] [--k 1500] [--r 8] [--mprime 512]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3])
    ap.add_argument("--nx", type=int, default=104)
    ap.add_argument("--k", type=int, default=1500)
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--mprime", type=int, default=512)
    ap.add_argument("--gp-samples", type=int, default=256)
    ap.add_argument("--restarts", type=int, default=8)
    ap.add_argument("--ndraws", type=int, default=128)
    ap.add_argument("--grid-size", type=int, default=8)
    ap.add_argument("--modes", default="scalar,blocked",
                    help="comma-separated: scalar,blocked")
    ap.add_argument("--windows", type=int, default=1,
                    help="time_windows (W>1: per-sub-span ROMs; composes "
                    "with any regularization mode)")
    ap.add_argument("--chaining", default="draws",
                    choices=("draws", "mean", "anchor"),
                    help="W>1 boundary scheme for the headline train_error")
    ap.add_argument("--window-basis", default="global",
                    choices=("global", "local"),
                    help="W>1: one global POD basis vs per-window bases")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gp_bayesopinf_tpu.pipeline.scaled import run_scaled

    rows = []
    for reg in args.modes.split(","):
        for seed in args.seeds:
            t0 = time.time()
            try:
                res = run_scaled(
                    n_space=3 * args.nx,
                    n_snapshots=args.k,
                    num_modes=args.r,
                    num_gp_samples=args.gp_samples,
                    num_regression_points=args.mprime,
                    n_restarts=args.restarts,
                    ndraws=args.ndraws,
                    grid_size=args.grid_size,
                    seed=seed,
                    modelform="cAH",
                    data_source="euler",
                    regularization=reg,
                    time_windows=args.windows,
                    window_chaining=args.chaining,
                    window_basis=args.window_basis,
                    # "gamma" searches lambda * Gamma with the classic
                    # column-norm-scaled Tikhonov diagonal.
                    tikhonov_gamma="colnorm" if reg == "gamma" else None,
                    verbose=True,
                )
                row = {
                    "reg": reg,
                    "seed": seed,
                    "lambda": res.regularizer,
                    "lambda_quad": res.regularizer_quad,
                    "stable": res.stable_fraction,
                    "train_error": res.train_error,
                    "wall_s": round(time.time() - t0, 1),
                }
                if args.windows > 1:
                    row["windows"] = args.windows
                    row["chaining"] = res.chaining
                    row["window_basis"] = res.window_basis
                    row["window_error"] = res.window_error
                    row["chained_error_mean"] = res.chained_error_mean
                    row["chained_error_draws"] = res.chained_error_draws
                    import numpy as _np

                    row["window_lambdas"] = _np.asarray(
                        res.window_regularizers
                    ).tolist()
            except ValueError as exc:  # all-unstable grid
                row = {
                    "reg": reg,
                    "seed": seed,
                    "error": str(exc),
                    "wall_s": round(time.time() - t0, 1),
                }
            rows.append(row)
            print(json.dumps(row), flush=True)

    print("\n== summary ==")
    for row in rows:
        print(json.dumps(row))


if __name__ == "__main__":
    sys.exit(main())
