"""Pivoted-Cholesky tolerance sweep: the low-rank weight root's fidelity
bound at ex1c scale (m'=3200), vs the dense exact-sqrtW semantics.

Round-4 finding (BASELINE.md): the lowrank default (auto at m'>=1024)
selects the grid point ADJACENT to the dense path's (1.78e-2 vs 1.0e-2)
and keeps 559/600 draws vs dense 590/600 at ex1c — an approximation of
the reference's exact-sqrtW semantics (codebase/gpkernels.py:496-504)
with no recorded bound tying the drift to the tolerance. This sweep maps
``gp.lowrank`` tol_factor -> (selected lambda, stable count, train
error, applied-weight error vs dense, retained ranks, wall), so the
default can be pinned where the stable count lands within ~1% of dense.

The dense control runs FIRST and alone (CLAUDE.md serialize-jobs rule) —
it doubles as the clean re-measure of the round-4 contaminated control.

Usage: python scripts/lowrank_fidelity_sweep.py [--cpu]
       [--tols 1e-6 1e-8 1e-10] [--mprime 3200] [--ndraws 600]
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tols", type=float, nargs="+",
                    default=[1e-4, 1e-6, 1e-8, 1e-10])
    ap.add_argument("--mprime", type=int, default=3200)
    ap.add_argument("--ndraws", type=int, default=600)
    ap.add_argument("--skip-dense", action="store_true",
                    help="reuse a previously recorded dense control")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gp_bayesopinf_tpu.gp import lowrank
    from gp_bayesopinf_tpu.pipeline.pdes import run_euler

    # ex1c: gpboi euler 0.06 200 0.03 3200 6 (scripts/experiments.sh:16)
    kw = dict(
        training_span=(0.0, 0.06),
        num_samples=200,
        noiselevel=0.03,
        num_regression_points=args.mprime,
        num_pod_modes=6,
        ndraws=args.ndraws,
        decompress_draws=False,
        verbose=False,
    )

    rows = []

    def record(label, res, wall, extra=None):
        row = {
            "run": label,
            "lambda": float(res.regularizer),
            "stable": int(np.asarray(res.valid).sum()),
            "ndraws": args.ndraws,
            "wall_s": round(wall, 1),
        }
        row.update(extra or {})
        rows.append(row)
        print(json.dumps(row), flush=True)
        return res

    dense_gps = None
    if not args.skip_dense:
        t0 = time.time()
        res_d = run_euler(weight_method="chol", **kw)
        record("dense-chol", res_d, time.time() - t0)
        dense_gps = res_d.gps

    # Fidelity metric: the two roots differ by an orthogonal transform
    # (chol factor vs symmetric Woodbury root), so compare the invariant
    # that enters the regression — the weighted Gram
    # G = X^T (C + eta I)^{-1} X on a probe X:
    # || G_lowrank - G_dense || / || G_dense || per mode.
    import scipy.linalg

    probe = None
    dense_gram = None
    if dense_gps is not None:
        rng = np.random.default_rng(0)
        mp = args.mprime
        probe = rng.standard_normal((mp, 8))
        dense_gram = []
        for g in dense_gps:
            L = np.asarray(g.sqrtW, np.float64)  # chol factor of C+eta I
            half = scipy.linalg.solve_triangular(L, probe, lower=True)
            dense_gram.append(half.T @ half)

    for tol in args.tols:
        lowrank.DEFAULT_TOL_FACTOR = tol
        t0 = time.time()
        res = run_euler(weight_method="lowrank", **kw)
        wall = time.time() - t0
        extra = {"tol_factor": tol}
        ranks = [
            int(g.lowrank_root.rank)
            for g in res.gps
            if g.lowrank_root is not None
        ]
        extra["ranks"] = ranks
        if dense_gram is not None:
            errs = []
            for g, Gd in zip(res.gps, dense_gram):
                if g.lowrank_root is None:
                    errs.append(0.0)
                    continue
                half = g.lowrank_root.apply(probe)
                G = half.T @ half
                errs.append(
                    float(np.linalg.norm(G - Gd) / np.linalg.norm(Gd))
                )
            extra["weight_gram_relerr"] = errs
        record(f"lowrank@{tol:g}", res, wall, extra)

    print("\n== summary ==")
    for row in rows:
        print(json.dumps(row))


if __name__ == "__main__":
    sys.exit(main())
