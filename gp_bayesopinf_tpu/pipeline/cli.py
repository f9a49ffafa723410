"""Command-line interface for the experiment pipelines.

Mirrors the reference argparse surface (``PDEs/main.py:258-339``,
``ODEs/main.py``) with one subcommand per pipeline:

    gpboi seird T_MAX NUM_SAMPLES NOISE NUM_PTS [--ndraws N] [--exportto P]
    gpboi euler T_MAX NUM_SAMPLES NOISE NUM_PTS NUM_MODES [--gpreg ETA]
                [--ndraws N] [--exportto P] [--ddtdata]
    gpboi heat  T_MAX NUM_SAMPLES NOISE NUM_PTS NUM_MODES [--ndraws N]
                [--exportto P]
"""

import argparse


def _common(sub, modes: bool):
    sub.add_argument("t_max", type=float, help="training time-span upper bound")
    sub.add_argument("num_samples", type=int, help="training snapshots to sample")
    sub.add_argument("noiselevel", type=float, help="noise percentage")
    sub.add_argument(
        "num_regression_points", type=int, help="GP estimation points m'"
    )
    if modes:
        sub.add_argument("numPODmodes", type=int, help="POD modes r")
    sub.add_argument("--gpreg", type=float, default=1e-8, help="GP eta")
    sub.add_argument("--ndraws", type=int, default=100, help="posterior draws")
    sub.add_argument("--exportto", help="HDF5 export prefix")
    sub.add_argument(
        "--noopen", action="store_true", help="do not open figures"
    )
    sub.add_argument(
        "--profile", metavar="LOGDIR",
        help="capture a jax profiler trace of the run into LOGDIR",
    )
    sub.add_argument(
        "--nolog", action="store_true",
        help="skip log.log / figures-folder / report.txt bookkeeping",
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="gpboi",
        description="TPU-native GP-BayesOpInf experiment pipelines",
    )
    subs = parser.add_subparsers(dest="pipeline", required=True)

    seird = subs.add_parser("seird", help="SEIRD parameter estimation (ODEs/)")
    _common(seird, modes=False)
    seird.add_argument(
        "--crosscheck", action="store_true",
        help="compare GP products against the LAPACK backend",
    )

    euler = subs.add_parser("euler", help="Euler GP-BayesOpInf (PDEs/)")
    _common(euler, modes=True)
    euler.add_argument(
        "--ddtdata", action="store_true",
        help="export derivative-estimate comparison data",
    )
    euler.add_argument(
        "--weights", choices=("auto", "eigh", "chol", "lowrank"),
        default="auto",
        help="GP weight-root factorization (auto: lowrank at m' >= 1024)",
    )

    heat = subs.add_parser("heat", help="multi-trajectory cubic heat (PDEsMulti/)")
    _common(heat, modes=True)

    warm = subs.add_parser(
        "warmup",
        help="seed the persistent compile + AOT program caches by running "
        "the flagship workloads once (deployment cold-start answer: the "
        "first process after a code/version change pays minutes of "
        "XLA:TPU compiles; every later process loads cached executables)",
    )
    warm.add_argument(
        "pipelines", nargs="*", default=["seird", "euler", "heat"],
        choices=["seird", "euler", "heat"],
        help="which pipelines to warm (default: all three)",
    )
    warm.add_argument(
        "--ndraws", type=int, default=600,
        help="ensemble size to compile for (program shapes key on it; "
        "the paper grids use 600)",
    )
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.pipeline == "warmup":
        return _warmup(args.pipelines, args.ndraws)

    # Observability tier (reference behavior: every run logs to log.log,
    # creates a dated figures folder, and writes report.txt —
    # ``PDEs/config.py:68-85``, ``PDEs/main.py:83-86``, ``*/utils.py``).
    import contextlib
    import logging

    folder = None
    if not args.nolog:
        from ..utils.logging import setup_logging
        from .report import figures_path, summarize_experiment

        setup_logging()
        folder = figures_path()
        summarize_experiment(
            training_span=(0.0, args.t_max),
            num_samples=args.num_samples,
            noiselevel=args.noiselevel,
            num_regression_points=args.num_regression_points,
            numPODmodes=getattr(args, "numPODmodes", None),
            gp_regularizer=args.gpreg,
            ndraws=args.ndraws,
            folder=folder,
        )
        logging.info(
            f"gpboi {args.pipeline} t_max={args.t_max} "
            f"m={args.num_samples} noise={args.noiselevel} "
            f"m'={args.num_regression_points} ndraws={args.ndraws}"
        )

    if args.profile:
        from ..utils.timing import profile_trace

        profile_ctx = profile_trace(args.profile)
    else:
        profile_ctx = contextlib.nullcontext()

    with profile_ctx:
        result = _run(args)

    if not args.nolog:
        logging.info(f"chosen regularizer: {result.regularizer:.6e}")
        if args.pipeline == "seird":
            from .report import summarize_posterior

            summarize_posterior(
                result.model.parameters, result.bayesian_model, folder
            )

    if args.exportto:
        from ..io.hdf5 import export_result

        export_result(result, args.exportto)
        print(f"exported artifacts with prefix {args.exportto}")
        if not args.nolog:
            logging.info(f"artifacts exported with prefix {args.exportto}")
    # The console entry point calls ``sys.exit(main())`` — returning the
    # result object would set a nonzero exit code (and dump its repr).
    return 0


def _warmup(pipelines, ndraws):
    """Run the flagship workloads once to populate every persistent cache.

    Seeds (a) the XLA compilation cache (compiled executables keyed on
    jaxpr + backend), (b) the AOT program cache (serialized lowered
    programs keyed on the package-source digest, ``utils.aotcache``), and
    (c) the small-program entries the eager host ops dispatch. After this
    command, a fresh process runs each pipeline at warm-process cost
    (BASELINE.md "warm" rows) instead of paying minutes of first-compile.
    """
    import time

    from .experiments import run_workload

    flagship = {"seird": "ex1a", "euler": "ex1a", "heat": "ex3"}
    for name in pipelines:
        t0 = time.time()
        print(f"[warmup] {name} {flagship[name]} (ndraws={ndraws}) ...",
              flush=True)
        run_workload(name, flagship[name], ndraws=ndraws, verbose=False)
        print(f"[warmup] {name} done in {time.time() - t0:.1f} s", flush=True)
    import os

    print(
        "[warmup] caches ready under "
        + os.path.expanduser("~/.cache/gp_bayesopinf_tpu/")
    )


def _run(args):
    if args.pipeline == "seird":
        from .odes import run_seird

        result = run_seird(
            training_span=(0.0, args.t_max),
            num_samples=args.num_samples,
            noiselevel=args.noiselevel,
            num_regression_points=args.num_regression_points,
            gp_regularizer=args.gpreg,
            ndraws=args.ndraws,
            crosscheck=args.crosscheck,
        )
    elif args.pipeline == "euler":
        from .pdes import run_euler

        result = run_euler(
            training_span=(0.0, args.t_max),
            num_samples=args.num_samples,
            noiselevel=args.noiselevel,
            num_regression_points=args.num_regression_points,
            num_pod_modes=args.numPODmodes,
            gp_regularizer=args.gpreg,
            ndraws=args.ndraws,
            ddtdata=args.ddtdata,
            weight_method=args.weights,
        )
    else:
        from .pdes_multi import run_heat_multi

        result = run_heat_multi(
            training_span=(0.0, args.t_max),
            num_samples=args.num_samples,
            noiselevel=args.noiselevel,
            num_regression_points=args.num_regression_points,
            num_pod_modes=args.numPODmodes,
            gp_regularizer=args.gpreg,
            ndraws=args.ndraws,
        )
    return result


if __name__ == "__main__":
    main()
