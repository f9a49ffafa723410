"""Command-line interface for the experiment pipelines.

Mirrors the reference argparse surface (``PDEs/main.py:258-339``,
``ODEs/main.py``) with one subcommand per pipeline:

    gpboi seird T_MAX NUM_SAMPLES NOISE NUM_PTS [--ndraws N] [--exportto P]
    gpboi euler T_MAX NUM_SAMPLES NOISE NUM_PTS NUM_MODES [--gpreg ETA]
                [--ndraws N] [--exportto P] [--ddtdata]
    gpboi heat  T_MAX NUM_SAMPLES NOISE NUM_PTS NUM_MODES [--ndraws N]
                [--exportto P]

plus two TPU-deployment subcommands with no reference counterpart:

    gpboi scaled [--source euler] [--windows W] [--regularization blocked]
                 [--weights lowrank] [--devices N] ...   (production-scale
                 sharded pipeline; prints a JSON summary line)
    gpboi warmup [seird euler heat]   (seed the persistent caches)
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

    scaled = subs.add_parser(
        "scaled",
        help="production-scale sharded pipeline (pipeline.scaled.run_scaled): "
        "sharded POD + batched GP fits + regularization search + ensemble "
        "at deployment shapes, with optional device mesh, low-rank weight "
        "roots, blocked Tikhonov, and time-windowed ROMs",
    )
    scaled.add_argument("--n-space", type=int, default=6000,
                        help="full spatial DOF n (euler source: 3*nx lifted)")
    scaled.add_argument("--k", type=int, default=10000, dest="n_snapshots",
                        help="training snapshots")
    scaled.add_argument("--modes", type=int, default=30, dest="num_modes",
                        help="POD modes r")
    scaled.add_argument("--gp-samples", type=int, default=512,
                        help="GP sample points m")
    scaled.add_argument("--mprime", type=int, default=2048,
                        help="regression points m'")
    scaled.add_argument("--restarts", type=int, default=32,
                        help="GP fit optimizer restarts")
    scaled.add_argument("--ndraws", type=int, default=256,
                        help="posterior ensemble draws")
    scaled.add_argument("--grid-size", type=int, default=16,
                        help="regularization grid size")
    scaled.add_argument("--seed", type=int, default=0)
    scaled.add_argument("--modelform", default="cA",
                        help="ROM structure: cA | cAH")
    scaled.add_argument("--source", choices=("synthetic", "euler"),
                        default="synthetic", dest="data_source",
                        help="snapshot source (euler = physical FOM)")
    scaled.add_argument("--regularization",
                        choices=("scalar", "blocked", "gamma"),
                        default="scalar",
                        help="single-lambda ridge, per-block Tikhonov, or "
                        "scaled user-shaped Gamma (see --gamma)")
    scaled.add_argument("--gamma", default="colnorm", dest="tikhonov_gamma",
                        help="Tikhonov shape for --regularization gamma: "
                        "'colnorm' (per-row diagonal from weighted "
                        "data-matrix column norms) or a .npy file holding "
                        "(d,), (r,d), (d,d) or (r,d,d)")
    scaled.add_argument("--windows", type=int, default=1, dest="time_windows",
                        help="W>1: independent per-sub-span ROMs (the "
                        "time-windowed lever for draw-marginal problems); "
                        "composes with any --regularization mode")
    scaled.add_argument("--chaining", choices=("draws", "mean", "anchor"),
                        default="draws", dest="window_chaining",
                        help="W>1 boundary scheme for the full-span rollout: "
                        "draw-wise propagation, ensemble-mean handoff, or "
                        "GP re-anchoring at window boundaries")
    scaled.add_argument("--window-basis", choices=("global", "local"),
                        default="global", dest="window_basis",
                        help="W>1: one POD basis of the full span vs a "
                        "local r-mode basis (+GP fits+envelope) per window "
                        "with exact cross-basis boundary transfer")
    scaled.add_argument("--weights", choices=("auto", "eigh", "chol",
                                              "lowrank"), default="auto",
                        dest="weight_method",
                        help="GP weight-root factorization")
    scaled.add_argument("--checkpoint-dir",
                        help="orbax checkpoint/resume directory")
    scaled.add_argument("--devices", type=int, default=0,
                        help="shard over a mesh of this many devices "
                        "(0 = single device)")
    scaled.add_argument("--quiet", action="store_true")

    serve = subs.add_parser(
        "serve",
        help="persistent-process server: read one pipeline command per "
        "stdin line (plain argv text or a JSON {\"argv\": [...]} object), "
        "run it in-process so every jit/AOT program stays resident, and "
        "print one JSON ack line per command; 'quit' or EOF ends the "
        "session (deployment answer to the per-process program-load "
        "latency measured in BASELINE.md)",
    )
    serve.set_defaults()

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

    if args.pipeline == "serve":
        return _serve()
    if args.pipeline == "warmup":
        return _warmup(args.pipelines, args.ndraws)
    if args.pipeline == "scaled":
        return _scaled(args)

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


def _scaled(args):
    """Run the production-scale pipeline and print a JSON summary line."""
    import json

    import numpy as np

    from .scaled import run_scaled

    mesh = None
    if args.devices:
        import jax

        from ..parallel.mesh import make_mesh

        devs = jax.devices()[: args.devices]
        mode_ax = 2 if len(devs) % 2 == 0 else 1
        mesh = make_mesh(
            {"draw": len(devs) // mode_ax, "mode": mode_ax}, devices=devs
        )
    gamma = None
    if args.regularization == "gamma":
        gamma = args.tikhonov_gamma
        if isinstance(gamma, str) and gamma.endswith(".npy"):
            gamma = np.load(gamma)
    res = run_scaled(
        mesh=mesh,
        n_space=args.n_space,
        n_snapshots=args.n_snapshots,
        num_modes=args.num_modes,
        num_gp_samples=args.gp_samples,
        num_regression_points=args.mprime,
        n_restarts=args.restarts,
        ndraws=args.ndraws,
        grid_size=args.grid_size,
        seed=args.seed,
        modelform=args.modelform,
        data_source=args.data_source,
        regularization=args.regularization,
        time_windows=args.time_windows,
        window_chaining=args.window_chaining,
        window_basis=args.window_basis,
        tikhonov_gamma=gamma,
        weight_method=args.weight_method,
        checkpoint_dir=args.checkpoint_dir,
        verbose=not args.quiet,
    )
    summary = {
        "regularizer": float(res.regularizer),
        "stable_fraction": float(res.stable_fraction),
        "train_error": float(res.train_error),
    }
    if res.regularizer_quad is not None:
        summary["regularizer_quad"] = float(res.regularizer_quad)
    if res.time_windows > 1:
        summary["time_windows"] = res.time_windows
        summary["chaining"] = res.chaining
        summary["window_basis"] = res.window_basis
        summary["window_error"] = float(res.window_error)
        summary["chained_error_mean"] = float(res.chained_error_mean)
        summary["chained_error_draws"] = float(res.chained_error_draws)
        summary["window_regularizers"] = np.asarray(
            res.window_regularizers
        ).tolist()
    print(json.dumps(summary))
    return 0


def _serve():
    """Persistent-process command server over stdin/stdout.

    Why: the BASELINE.md round-5 stage instrumentation shows the warm
    per-process cost of a pipeline run is dominated by program
    materialization (AOT program load + dispatch assembly on small
    hosts, ~6 s for the SEIRD search stage alone), not compute
    (~30 ms/chunk). A deployment issuing many runs should pay that
    once: ``gpboi serve`` keeps one process alive, so every jitted /
    AOT-loaded executable, host LAPACK import, and Pallas kernel stays
    resident across commands.

    Protocol: one command per stdin line — either plain argv text
    (``seird 90 90 0.10 360 --ndraws 600 --nolog``) or a JSON object
    ``{"argv": ["seird", ...]}``. Blank lines and ``#`` comments are
    ignored; ``quit`` / ``exit`` / EOF ends the session. After each
    command's normal output, ONE JSON ack line
    ``{"serve": {"rc": ..., "wall_s": ..., "argv": [...]}}`` is
    printed and flushed (``"error"`` carries the repr on failure; a
    failed command never kills the server).

    No reference counterpart: the reference restarts Python per
    experiment (``*/experiments.sh``), re-paying import + sklearn fit
    setup each time — this is the TPU deployment answer.
    """
    import json
    import shlex
    import sys
    import time

    for line in sys.stdin:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line in ("quit", "exit"):
            break
        try:
            req = json.loads(line)
        except json.JSONDecodeError:
            argv = shlex.split(line)
        else:
            argv = req["argv"] if isinstance(req, dict) else req
            argv = [str(a) for a in argv]
        t0 = time.time()
        if argv[:1] == ["serve"]:
            ack = {"rc": 2, "error": "cannot nest serve", "argv": argv}
        else:
            try:
                rc = main(argv)
                ack = {"rc": int(rc or 0)}
            except SystemExit as exc:  # argparse rejected the argv
                code = exc.code if isinstance(exc.code, int) else 2
                ack = {"rc": code, "error": "argparse rejected argv"}
            except Exception as exc:  # run failed; keep serving
                ack = {"rc": 1, "error": repr(exc)}
            ack["wall_s"] = round(time.time() - t0, 2)
            ack["argv"] = argv
        print(json.dumps({"serve": ack}), flush=True)
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
