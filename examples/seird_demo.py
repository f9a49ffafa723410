"""SEIRD parameter-estimation demo (reference ``models/seird.ipynb`` +
``ODEs/`` pipeline walk-through).

Runs a reduced-size version of the paper's ex1a workload end to end and
writes figures next to this script. Usage::

    python examples/seird_demo.py [--full]
"""

import argparse
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")

from gp_bayesopinf_tpu.pipeline.odes import run_seird
from gp_bayesopinf_tpu.pipeline.report import summarize_posterior
from gp_bayesopinf_tpu.viz import ODEPlotter


def main(full: bool = False):
    if full:  # the paper workload (reference ODEs/experiments.sh ex1a)
        res = run_seird((0.0, 90.0), 90, 0.10, 360, ndraws=600, crosscheck=True)
    else:
        res = run_seird((0.0, 90.0), 40, 0.10, 120, ndraws=100, crosscheck=True)

    outdir = os.path.join(os.path.dirname(__file__), "figures")
    os.makedirs(outdir, exist_ok=True)

    gp_preds = [gp.predict(res.t_estimation) for gp in res.gps]
    plotter = ODEPlotter(
        np.stack(res.sample_times),
        res.t_estimation,
        res.time_domain,
        res.snapshots,
        res.true_states,
        np.stack([np.asarray(m) for m, _ in gp_preds]),
        np.stack([np.asarray(s) for _, s in gp_preds]),
        res.draws[res.valid],
    )
    plotter.plot_gp_training_fit().savefig(
        os.path.join(outdir, "seird_train.pdf"), bbox_inches="tight"
    )
    plotter.plot_posterior().savefig(
        os.path.join(outdir, "seird_posterior.pdf"), bbox_inches="tight"
    )
    plotter.plot_posterior(newic_draws=res.newic_draws[res.newic_valid]).savefig(
        os.path.join(outdir, "seird_newics.pdf"), bbox_inches="tight"
    )
    summarize_posterior(
        np.asarray(res.model.parameters), res.bayesian_model, folder=outdir
    )
    err = np.linalg.norm(
        res.draws[res.valid].mean(axis=0) - res.true_states
    ) / np.linalg.norm(res.true_states)
    print(f"ensemble-mean relative error vs truth: {err:.3%}")
    print(f"figures written to {outdir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="paper-size workload")
    main(ap.parse_args().full)
