"""End-to-end pipeline tests (tiny workloads) and multi-device dry runs."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_seird_pipeline_end_to_end():
    from gp_bayesopinf_tpu.pipeline.odes import run_seird

    res = run_seird(
        training_span=(0.0, 90.0),
        num_samples=40,
        noiselevel=0.10,
        num_regression_points=120,
        ndraws=40,
        verbose=False,
        crosscheck=True,
    )
    valid = res.valid
    assert valid.sum() >= 30
    mean_traj = res.draws[valid].mean(axis=0)
    err = np.linalg.norm(mean_traj - res.true_states) / np.linalg.norm(
        res.true_states
    )
    # Threshold reflects realization variance at this reduced size (40
    # samples, 10% noise): observed 3-13% across noise-draw implementations.
    assert err < 0.20, f"ensemble error {err:.2%}"
    # Independent-backend crosscheck (the reference fork's dual-backend
    # comparison): JAX and LAPACK agree tightly at equal hyperparameters.
    assert res.crosscheck["state_estimate"] < 1e-6
    assert res.crosscheck["ddt_estimate"] < 1e-5
    assert res.crosscheck["sqrtW"] < 1e-5  # relative to matrix scale
    # Dual-backend POSTERIOR comparison: GPs independently re-fitted with
    # the native C++ backend, posterior rebuilt in NumPy/SciPy; means and
    # stds must agree to the reference's own tolerance
    # (np.allclose(rtol=1e-1), ``ODEs/main.py:131-182``). Fails if
    # gp/fit.py converges to wrong optima.
    assert res.crosscheck["posterior_mean_allclose"]
    assert res.crosscheck["posterior_std_allclose"]
    # New-IC generalization ensemble exists and is mostly finite.
    assert res.newic_draws.shape[0] == 40


def test_cli_parser_surface():
    from gp_bayesopinf_tpu.pipeline.cli import build_parser

    p = build_parser()
    args = p.parse_args(["euler", "0.06", "200", "0.03", "400", "6",
                         "--ndraws", "600", "--gpreg", "1e-8"])
    assert args.pipeline == "euler"
    assert args.numPODmodes == 6
    assert args.ndraws == 600
    assert args.weights == "auto"
    args = p.parse_args(["euler", "0.06", "200", "0.03", "3200", "6",
                         "--weights", "chol"])
    assert args.weights == "chol"
    args = p.parse_args(["seird", "90", "90", "0.1", "360", "--crosscheck"])
    assert args.crosscheck
    with pytest.raises(SystemExit):
        p.parse_args(["euler", "0.06"])  # missing required args
    args = p.parse_args(["scaled", "--source", "euler", "--windows", "8",
                         "--regularization", "scalar", "--modes", "20"])
    assert args.pipeline == "scaled"
    assert args.data_source == "euler"
    assert args.time_windows == 8
    assert args.num_modes == 20
    assert args.weight_method == "auto"  # production defaults
    assert args.mprime == 2048 and args.n_snapshots == 10000


def test_cli_scaled_end_to_end(capsys):
    """`gpboi scaled` runs the production pipeline at tiny shapes and
    prints a machine-readable JSON summary line."""
    import json

    from gp_bayesopinf_tpu.pipeline import cli

    rc = cli.main([
        "scaled", "--n-space", "96", "--k", "240", "--modes", "4",
        "--gp-samples", "64", "--mprime", "96", "--restarts", "2",
        "--ndraws", "16", "--grid-size", "6", "--modelform", "cAH",
        "--devices", "2", "--quiet",
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(line)
    assert summary["stable_fraction"] > 0.5
    assert np.isfinite(summary["train_error"])
    assert summary["regularizer"] > 0


def test_cli_serve(capsys, monkeypatch):
    """`gpboi serve` runs commands from stdin in one warm process —
    plain-argv and JSON forms, one JSON ack line each, a failing
    command does not kill the server, nested serve is rejected, and
    'quit' ends the session with rc 0."""
    import io
    import json

    from gp_bayesopinf_tpu.pipeline import cli

    tiny = ("scaled --n-space 96 --k 240 --modes 4 --gp-samples 64 "
            "--mprime 96 --restarts 2 --ndraws 16 --grid-size 6 "
            "--modelform cAH --quiet")
    monkeypatch.setattr("sys.stdin", io.StringIO(
        "# comment, then a blank line\n"
        "\n"
        + tiny + "\n"
        + json.dumps({"argv": tiny.split()}) + "\n"
        + "euler 0.06\n"          # argparse error: must not kill serve
        + "serve\n"               # nested serve: rejected
        + "quit\n"
        + tiny + "\n"             # after quit: must NOT run
    ))
    rc = cli.main(["serve"])
    assert rc == 0
    acks = [json.loads(l)["serve"]
            for l in capsys.readouterr().out.splitlines()
            if l.startswith('{"serve"')]
    assert len(acks) == 4
    assert acks[0]["rc"] == 0 and acks[1]["rc"] == 0
    assert acks[0]["argv"][0] == "scaled"
    assert acks[2]["rc"] == 2 and "argparse" in acks[2]["error"]
    assert acks[3]["rc"] == 2 and "nest" in acks[3]["error"]
    # The second (warm) run reuses the first run's programs.
    assert acks[1]["wall_s"] <= acks[0]["wall_s"]


def test_cli_observability_wiring(tmp_path, monkeypatch):
    """A gpboi run produces log.log + a dated figures folder with
    report.txt (+ posterior summary for seird) — the reference's
    per-run bookkeeping (``PDEs/config.py:68-85``, ``PDEs/main.py:83-86``,
    ``ODEs/utils.py:53-66``)."""
    import glob
    import os

    from gp_bayesopinf_tpu.pipeline import cli

    class FakeBM:
        mean = np.zeros(4)
        cov = np.eye(4)

    class FakeModel:
        parameters = (1.0, 2.0, 3.0, 4.0)

    class FakeRes:
        regularizer = 1e-3
        model = FakeModel()
        bayesian_model = FakeBM()

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(cli, "_run", lambda args: FakeRes())
    cli.main(["seird", "90", "90", "0.1", "360"])

    assert os.path.isfile(tmp_path / "log.log")
    logtext = (tmp_path / "log.log").read_text()
    assert "NEW SESSION" in logtext
    assert "chosen regularizer" in logtext
    reports = glob.glob(str(tmp_path / "figures" / "*" / "*" / "report.txt"))
    assert len(reports) == 1
    text = open(reports[0]).read()
    assert "EXPERIMENTAL SCENARIO" in text
    assert "POSTERIOR DISTRIBUTION" in text

    # --nolog skips the bookkeeping entirely.
    (tmp_path / "log.log").unlink()
    cli.main(["seird", "90", "90", "0.1", "360", "--nolog"])
    assert not os.path.isfile(tmp_path / "log.log")


def test_workload_grids_match_reference():
    from gp_bayesopinf_tpu.pipeline.experiments import (
        EULER_WORKLOADS,
        SEIRD_WORKLOADS,
        HEAT_WORKLOADS,
        NDRAWS_PAPER,
    )

    assert EULER_WORKLOADS["ex1a"] == (0.06, 200, 0.03, 400, 6)
    assert EULER_WORKLOADS["ex1c"][3] == 3200
    assert SEIRD_WORKLOADS["ex1a"] == (90, 90, 0.10, 360)
    assert HEAT_WORKLOADS["ex3"] == (1.0, 20, 0.05, 80, 5)
    assert NDRAWS_PAPER == 600


def test_graft_entry_single():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    means, mean_traj = out
    assert np.all(np.isfinite(np.asarray(means)))
    assert np.all(np.isfinite(np.asarray(mean_traj)))


def test_graft_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    ge.dryrun_multichip(8)


def test_sharded_gram_pod_matches_svd(rng):
    from gp_bayesopinf_tpu.parallel import make_mesh, sharded_gram_pod

    X = rng.standard_normal((64, 12))
    mesh = make_mesh({"seq": -1})
    U, svdvals = sharded_gram_pod(jnp.asarray(X), 5, mesh=mesh, row_axis="seq")
    U_ref, S_ref, _ = np.linalg.svd(X, full_matrices=False)
    np.testing.assert_allclose(np.asarray(svdvals), S_ref, atol=1e-8)
    # Left singular vectors up to sign.
    for j in range(5):
        a, b = np.asarray(U[:, j]), U_ref[:, j]
        assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 1e-6


def test_randomized_pod_matches_svd(rng):
    """Sketched subspace-iteration POD (the large-k scaled path) recovers
    the leading singular pairs of a decaying-spectrum matrix."""
    from gp_bayesopinf_tpu.parallel import make_mesh
    from gp_bayesopinf_tpu.parallel.sharded import randomized_pod

    # Decaying spectrum, as POD snapshot matrices have.
    n, k, r = 96, 200, 5
    A = rng.standard_normal((n, 30)) * (2.0 ** -np.arange(30))
    X = A @ rng.standard_normal((30, k))
    mesh = make_mesh({"seq": -1})
    U, svdvals = randomized_pod(
        jnp.asarray(X), r, mesh=mesh, row_axis="seq", oversample=16
    )
    U_ref, S_ref, _ = np.linalg.svd(X, full_matrices=False)
    np.testing.assert_allclose(
        np.asarray(svdvals)[:r], S_ref[:r], rtol=1e-8
    )
    for j in range(r):
        a, b = np.asarray(U[:, j]), U_ref[:, j]
        assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 1e-6


def test_tall_skinny_svd_sharded(rng):
    """Sharded Gram-route SVD matches the dense SVD (m'-scaling path)."""
    from gp_bayesopinf_tpu.parallel import make_mesh
    from gp_bayesopinf_tpu.parallel.sharded import tall_skinny_svd

    mesh = make_mesh({"mode": 2, "draw": 4})
    X = rng.standard_normal((2, 64, 5))
    U, S, V = tall_skinny_svd(
        jnp.asarray(X), mesh=mesh, spec=("mode", "draw", None)
    )
    for r in range(2):
        Ur, Sr, Vtr = np.linalg.svd(X[r], full_matrices=False)
        np.testing.assert_allclose(np.asarray(S[r]), Sr, rtol=1e-7)
        # Reconstruction (signs of singular vectors are arbitrary).
        np.testing.assert_allclose(
            np.asarray(U[r] * S[r][None, :] @ V[r].T), X[r], atol=1e-8
        )


def test_scaled_pipeline_on_mesh():
    """North-star scaled config mechanics on the 8-device CPU mesh."""
    from gp_bayesopinf_tpu.pipeline.scaled import run_scaled
    from gp_bayesopinf_tpu.parallel import make_mesh

    mesh = make_mesh({"draw": 4, "mode": 2})
    res = run_scaled(
        mesh=mesh,
        n_space=128,
        n_snapshots=300,
        num_modes=4,
        num_gp_samples=80,
        num_regression_points=96,
        n_restarts=2,
        ndraws=16,
        grid_size=8,
        modelform="cAH",  # exercise the quadratic d ~ r^2/2 regression
    )
    assert res.stable_fraction > 0.5
    assert np.all(np.isfinite(res.ensemble_mean))
    # randomized_pod retains num_modes + oversample leading singular values
    assert res.svdvals.shape[0] >= 4


def test_scaled_pipeline_blocked_regularization():
    """Two-parameter per-operator-block Tikhonov search
    (regularization="blocked"): the quadratic H block gets its own
    shrinkage lambda_2, searched on a 2-D grid with the same 20-draw
    screen. Mechanics + result-surface check on the 8-device CPU mesh."""
    import pytest

    from gp_bayesopinf_tpu.pipeline.scaled import run_scaled
    from gp_bayesopinf_tpu.parallel import make_mesh

    mesh = make_mesh({"draw": 4, "mode": 2})
    kwargs = dict(
        mesh=mesh,
        n_space=128,
        n_snapshots=300,
        num_modes=4,
        num_gp_samples=80,
        num_regression_points=96,
        n_restarts=2,
        ndraws=16,
        grid_size=5,
        modelform="cAH",
    )
    res = run_scaled(regularization="blocked", **kwargs)
    assert res.stable_fraction > 0.5
    assert np.all(np.isfinite(res.ensemble_mean))
    assert res.regularizer_quad is not None and res.regularizer_quad > 0
    assert res.grid_errors.shape == (5, 5)

    # The scalar path reports no quadratic regularizer.
    res_scalar = run_scaled(regularization="scalar", **kwargs)
    assert res_scalar.regularizer_quad is None

    # Blocked mode requires a quadratic block to separate.
    with pytest.raises(ValueError, match="no H operator"):
        run_scaled(regularization="blocked", modelform="cA", **{
            k: v for k, v in kwargs.items() if k != "modelform"
        })


def test_scaled_pipeline_time_windows():
    """time_windows=W learns W independent sub-span ROMs: per-window
    regularizers, a re-anchored window reconstruction, and a chained
    rollout as the headline train error. Synthetic linear truth at tiny
    sizes on the 8-device CPU mesh."""
    import pytest

    from gp_bayesopinf_tpu.pipeline.scaled import run_scaled
    from gp_bayesopinf_tpu.parallel import make_mesh

    mesh = make_mesh({"draw": 4, "mode": 2})
    kwargs = dict(
        mesh=mesh,
        n_space=128,
        n_snapshots=300,
        num_modes=4,
        num_gp_samples=80,
        num_regression_points=96,
        n_restarts=2,
        ndraws=16,
        grid_size=8,
        modelform="cAH",
    )
    res = run_scaled(time_windows=2, **kwargs)
    assert res.time_windows == 2
    assert res.window_regularizers.shape == (2,)
    assert np.all(res.window_regularizers > 0)
    assert res.grid_errors.shape == (8, 2)
    assert np.isfinite(res.train_error)  # chained rollout
    assert np.isfinite(res.window_error)  # re-anchored reconstruction
    assert res.ensemble_mean.shape == (4, 96)
    assert res.stable_fraction > 0.5
    # The synthetic truth is an exactly-representable linear system: the
    # re-anchored windows must reconstruct it well, and the chained
    # rollout should stay in the same regime as the global W=1 run.
    assert res.window_error < 0.3
    assert res.train_error < 0.6
    # All three boundary-scheme errors are recorded; train_error is the
    # selected scheme's (default "draws").
    assert res.chaining == "draws"
    assert res.train_error == res.chained_error_draws
    assert np.isfinite(res.chained_error_mean)

    # "anchor" chaining restarts every window from the GP state estimate
    # at its boundary: the chained error IS the window reconstruction.
    res_a = run_scaled(time_windows=2, window_chaining="anchor", **kwargs)
    assert res_a.train_error == res_a.window_error

    # Guardrails.
    with pytest.raises(ValueError, match="divide"):
        run_scaled(time_windows=5, **kwargs)
    with pytest.raises(ValueError, match="window_chaining"):
        run_scaled(time_windows=2, window_chaining="blend", **kwargs)


def test_scaled_pipeline_local_window_basis():
    """window_basis='local' gives each window its own POD basis, GP
    fits, envelope, and exact cross-basis boundary transfer. At this
    Euler-FOM config the GLOBAL r=6 basis cannot represent window 0
    (its search selects a degenerate ceiling regularizer, window error
    ~100%) while LOCAL bases reconstruct every window to a few percent
    — the tiny-shape reproduction of the production r=12 failure mode
    (BASELINE.md round-5 windowed table)."""
    import pytest

    from gp_bayesopinf_tpu.pipeline.scaled import run_scaled

    kwargs = dict(
        n_space=3 * 40,
        n_snapshots=1600,
        num_modes=6,
        num_gp_samples=128,
        num_regression_points=256,
        n_restarts=4,
        ndraws=24,
        grid_size=6,
        seed=0,
        modelform="cAH",
        data_source="euler",
        time_windows=4,
        window_chaining="anchor",
    )
    res = run_scaled(window_basis="local", **kwargs)
    assert res.window_basis == "local"
    assert res.window_regularizers.shape == (4,)
    assert res.stable_fraction > 0.9
    # Local bases must reconstruct every window accurately AND chain
    # through the cross-basis transfer without blowing up (measured at
    # this config: window 2.6%, chained 8%; global basis: 100%/150%).
    assert res.window_error < 0.10
    assert res.chained_error_mean < 0.30
    assert res.chained_error_draws < 0.30

    # Guardrails.
    with pytest.raises(ValueError, match="window_basis"):
        run_scaled(window_basis="per-mode", **kwargs)
    with pytest.raises(ValueError, match="time_windows > 1"):
        run_scaled(
            **{**kwargs, "time_windows": 1, "window_basis": "local"}
        )


def test_scaled_pipeline_windowed_blocked():
    """time_windows x blocked compose (the round-4 guard is lifted): each
    window gets its own (lambda_1, lambda_2) per-operator-block search,
    screened in one (candidate x draw x window) program."""
    from gp_bayesopinf_tpu.pipeline.scaled import run_scaled
    from gp_bayesopinf_tpu.parallel import make_mesh

    mesh = make_mesh({"draw": 4, "mode": 2})
    res = run_scaled(
        mesh=mesh,
        n_space=128,
        n_snapshots=300,
        num_modes=4,
        num_gp_samples=80,
        num_regression_points=96,
        n_restarts=2,
        ndraws=16,
        grid_size=5,
        modelform="cAH",
        regularization="blocked",
        time_windows=2,
    )
    assert res.time_windows == 2
    assert res.window_regularizers.shape == (2, 2)
    assert np.all(res.window_regularizers > 0)
    assert res.grid_errors.shape == (5, 5, 2)
    assert res.regularizer_quad is not None and res.regularizer_quad > 0
    assert np.isfinite(res.window_error) and res.window_error < 0.5
    assert res.stable_fraction > 0.5


def test_scaled_pipeline_gamma_regularization():
    """regularization="gamma" searches a scalar multiplier on a
    user-shaped Tikhonov matrix (per-row diagonal / full matrix / the
    "colnorm" scaled-Tikhonov preset) — the reference's general
    ``opinf.lstsq.TikhonovSolver`` surface reachable from the pipeline."""
    import pytest

    from gp_bayesopinf_tpu.pipeline.scaled import run_scaled
    from gp_bayesopinf_tpu.parallel import make_mesh

    mesh = make_mesh({"draw": 4, "mode": 2})
    kwargs = dict(
        mesh=mesh,
        n_space=128,
        n_snapshots=300,
        num_modes=4,
        num_gp_samples=80,
        num_regression_points=96,
        n_restarts=2,
        ndraws=16,
        grid_size=6,
        modelform="cAH",
    )
    res = run_scaled(
        regularization="gamma", tikhonov_gamma="colnorm", **kwargs
    )
    assert res.stable_fraction > 0.5
    assert np.all(np.isfinite(res.ensemble_mean))
    assert res.regularizer > 0

    # Full-matrix Gamma: identity matrices recover the scalar-ridge
    # posterior family (mechanics check at d = 1 + 4 + 10 unknowns).
    d = 1 + 4 + 4 * 5 // 2
    res_m = run_scaled(
        regularization="gamma", tikhonov_gamma=np.eye(d), **kwargs
    )
    assert res_m.stable_fraction > 0.5

    with pytest.raises(ValueError, match="requires tikhonov_gamma"):
        run_scaled(regularization="gamma", **kwargs)
    with pytest.raises(ValueError, match="preset"):
        run_scaled(
            regularization="gamma", tikhonov_gamma="rownorm", **kwargs
        )


def test_scaled_pipeline_checkpoint_resume(tmp_path):
    """The scaled pipeline checkpoints its fit stage (orbax) and a rerun
    resumes from it with identical results."""
    import os

    from gp_bayesopinf_tpu.pipeline.scaled import run_scaled
    from gp_bayesopinf_tpu.parallel import make_mesh

    mesh = make_mesh({"draw": 4, "mode": 2})
    kwargs = dict(
        mesh=mesh, n_space=96, n_snapshots=200, num_modes=4,
        num_gp_samples=60, num_regression_points=64,
        n_restarts=2, ndraws=8, grid_size=6,
        checkpoint_dir=str(tmp_path),
    )
    res1 = run_scaled(**kwargs)
    assert os.path.isdir(tmp_path / "scaled_fit_stage")
    res2 = run_scaled(**kwargs)  # resumes from the checkpoint
    assert res2.regularizer == res1.regularizer
    np.testing.assert_allclose(res2.ensemble_mean, res1.ensemble_mean)


def test_mesh_screen_hlo_zero_collectives():
    """The mesh-sharded grid screen's compiled HLO contains NO
    cross-device collectives — candidates are embarrassingly parallel,
    so sharding the candidate axis must not insert an all-reduce /
    all-gather / collective-permute (BASELINE.md "Multi-device scaling"
    relies on this; a silent regression would reintroduce ICI traffic).
    A positive control proves the harness detects collectives when they
    ARE expected (the draw-sharded ensemble mean's reduction)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gp_bayesopinf_tpu.bayes.regsearch import (
        _make_kernel_objective,
        _mesh_sharded_grid,
    )
    from gp_bayesopinf_tpu.parallel import make_mesh
    from gp_bayesopinf_tpu.rom.model import GalerkinROM
    from gp_bayesopinf_tpu.solve import weighted_lstsq_fit

    COLLECTIVES = (
        "all-reduce",
        "all-gather",
        "collective-permute",
        "all-to-all",
        "reduce-scatter",
    )

    # Small but production-shaped "cAH" screening problem.
    rng = np.random.default_rng(3)
    r, m = 3, 40
    t = jnp.linspace(0.0, 1.0, m)
    Q = jnp.asarray(np.exp(-t[None] * (1 + np.arange(r))[:, None]))
    rom = GalerkinROM("cAH", state_dimension=r, substeps=2)
    D = rom.data_matrix(Q)[None]
    sqrtW = jnp.asarray(
        np.broadcast_to(10.0 * np.eye(m), (r, 1, m, m)).copy()
    )
    rhs = jnp.asarray(rng.standard_normal((r, 1, m)) * 0.1)
    fac = weighted_lstsq_fit(D, sqrtW, rhs)

    mesh = make_mesh({"draw": -1})
    ndev = int(mesh.shape["draw"])
    batched = _make_kernel_objective(
        fac, rom, Q[None, :, 0], t, t, Q[None], ndraws=4, use_pallas=False
    )
    # _mesh_sharded_grid pads in Python; compile the shard-mapped core
    # exactly as the padded call sees it.
    sharded = _mesh_sharded_grid(batched, mesh, "draw")
    lams = jnp.asarray(np.logspace(-8, 0, ndev))
    keys = jax.random.split(jax.random.PRNGKey(0), ndev)
    lams_s = jax.device_put(lams, NamedSharding(mesh, P("draw")))
    keys_s = jax.device_put(keys, NamedSharding(mesh, P("draw")))
    hlo = (
        jax.jit(lambda l, k: sharded(l, k))
        .lower(lams_s, keys_s)
        .compile()
        .as_text()
    )
    found = [c for c in COLLECTIVES if c in hlo]
    assert not found, f"sharded screen HLO contains collectives: {found}"
    # The screen actually runs and returns per-candidate errors.
    vals = np.asarray(sharded(lams_s, keys_s))
    assert vals.shape == (ndev,) and np.all(np.isfinite(vals))

    # Positive control: a draw-sharded ensemble mean MUST reduce across
    # devices — proves the textual check sees collectives at all.
    def ens_mean(x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("draw", None))
        )
        return jnp.mean(x, axis=0)

    hlo_mean = (
        jax.jit(ens_mean)
        .lower(jax.ShapeDtypeStruct((8 * ndev, 16), jnp.float32))
        .compile()
        .as_text()
    )
    assert any(c in hlo_mean for c in COLLECTIVES), (
        "positive control failed: no collective in the sharded mean"
    )
