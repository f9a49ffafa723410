"""Compressible-Euler GP-BayesOpInf demo (reference ``PDEs/`` pipeline +
``models/euler.ipynb`` visuals).

Runs a reduced-size version of the flagship ex1a workload and writes
reduced- and full-space posterior figures. Usage::

    python examples/euler_demo.py [--full]
"""

import argparse
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")

from gp_bayesopinf_tpu.pipeline.pdes import run_euler
from gp_bayesopinf_tpu.viz import ReducedPlotter, StatePlotter


def main(full: bool = False):
    if full:  # flagship ex1a (reference PDEs/experiments.sh:13)
        res = run_euler((0.0, 0.06), 200, 0.03, 400, 6, ndraws=600)
    else:
        res = run_euler((0.0, 0.06), 80, 0.01, 120, 4, ndraws=60)

    outdir = os.path.join(os.path.dirname(__file__), "figures")
    os.makedirs(outdir, exist_ok=True)

    gp_preds = [gp.predict(res.t_estimation) for gp in res.gps]
    true_c = np.asarray(res.basis.compress(res.true_states))
    red = ReducedPlotter(
        res.time_domain_sampled,
        res.t_estimation,
        res.time_domain,
        res.snapshots_compressed,
        true_c,
        np.stack([np.asarray(m) for m, _ in gp_preds]),
        np.stack([np.asarray(s) for _, s in gp_preds]),
        res.draws_compressed[res.valid],
    )
    red.plot_gp_training_fit(width=3).savefig(
        os.path.join(outdir, "euler_train.pdf"), bbox_inches="tight"
    )
    red.plot_posterior().savefig(
        os.path.join(outdir, "euler_posterior_reduced.pdf"), bbox_inches="tight"
    )

    if res.draws is not None and len(res.draws):
        proj = np.asarray(res.basis.project(res.true_states))
        state = StatePlotter(
            res.time_domain_sampled,
            res.t_estimation,
            res.time_domain,
            np.asarray(res.model.spatial_domain),
            res.model.num_variables,
            res.snapshots_sampled,
            res.true_states,
            proj,
            res.draws,
            numspatialpoints=4,
        )
        for v, fig in enumerate(state.plot_posterior()):
            fig.savefig(
                os.path.join(outdir, f"euler_posterior_full_var{v}.pdf"),
                bbox_inches="tight",
            )

    tr_mask = res.time_domain <= res.t_estimation[-1]
    mean_c = res.draws_compressed[res.valid].mean(axis=0)
    err = np.linalg.norm(
        (mean_c - true_c)[:, tr_mask]
    ) / np.linalg.norm(true_c[:, tr_mask])
    print(f"reduced-space training-domain error of ensemble mean: {err:.3%}")
    print(f"figures written to {outdir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="paper-size workload")
    main(ap.parse_args().full)
