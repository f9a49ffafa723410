"""Multi-chip scaling curve on the virtual CPU mesh (VERDICT r3 item 6).

Measures the two mesh-sharded hot paths at flagship shapes on 1/2/4/8
virtual devices (``--xla_force_host_platform_device_count``):

* the 81-candidate regularization-grid screen, candidates sharded over the
  mesh's "draw" axis exactly as ``auto_regularize(mesh=...)`` runs it
  (``bayes.regsearch._mesh_sharded_grid``) — embarrassingly parallel,
  ZERO collectives in the compiled program;
* a 256-draw posterior ensemble with the draw axis sharded
  (the ``pipeline.scaled`` ensemble layout) — one ``psum`` for the mean.

IMPORTANT CAVEAT (recorded in BASELINE.md): this container exposes ONE
physical CPU core, so virtual devices time-share it and wall-clock cannot
improve with device count — the study verifies the sharded programs
compile, run, and divide the work (per-device shard shapes), and measures
the overhead of the sharded dispatch. On real multi-chip hardware the
screen's scaling is structurally linear: every device runs the identical
per-shard program with no inter-device communication.

Run:  python scripts/mesh_scaling_study.py            # all device counts
      python scripts/mesh_scaling_study.py --ndev 4   # one child (internal)
"""

import argparse
import json
import os
import subprocess
import sys
import time


def child(ndev: int) -> None:
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gp_bayesopinf_tpu.bayes.regsearch import (
        _make_objective,
        _mesh_sharded_grid,
    )
    from gp_bayesopinf_tpu.rom.model import GalerkinROM
    from gp_bayesopinf_tpu.solve.lstsq import weighted_lstsq_fit

    assert len(jax.devices()) >= ndev, (len(jax.devices()), ndev)
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("draw",))

    # Flagship-shape synthetic problem (bench.py's generator, r=6, m'=400).
    R, MP, K, NGRID, NDRAWS = 6, 400, 401, 81, 20
    rng = np.random.default_rng(27092023)
    t_est = np.linspace(0, 0.06, MP)
    t_pred = np.linspace(0, 0.15, K)
    states = np.stack(
        [np.sin((40 + 10 * j) * t_est) * np.exp(-2 * t_est) for j in range(R)]
    )
    rom = GalerkinROM("cAH", state_dimension=R, substeps=4)
    D = np.asarray(rom.data_matrix(jnp.asarray(states)))[None]
    d = D.shape[-1]
    W = np.broadcast_to(np.eye(MP), (R, 1, MP, MP))
    rhs = np.gradient(states, t_est, axis=1)[:, None, :]
    fac = weighted_lstsq_fit(
        jnp.asarray(D), jnp.asarray(W), jnp.asarray(rhs)
    )

    objective = _make_objective(
        fac,
        [lambda O, q, t: rom.predict(O, q, t)],
        jnp.asarray(states[:, :1].T),
        jnp.asarray(t_pred),
        jnp.asarray(t_est),
        jnp.asarray(states)[None],
        NDRAWS,
        screen_dtype=jnp.float32,
    )
    batched = jax.jit(jax.vmap(objective))
    grid_eval = _mesh_sharded_grid(batched, mesh, "draw")
    grid = jnp.asarray(np.logspace(-16, 4, NGRID))
    keys = jax.random.split(jax.random.PRNGKey(0), NGRID)

    def run_grid():
        return np.asarray(grid_eval(grid, keys))

    run_grid()  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run_grid()
    grid_s = (time.perf_counter() - t0) / reps

    # Draw-sharded ensemble (scaled-pipeline layout).
    from jax.sharding import NamedSharding, PartitionSpec as P

    NDE = 256
    ohats = jnp.asarray(
        0.01 * rng.standard_normal((NDE, R, d)), jnp.float32
    )
    ohats = jax.device_put(ohats, NamedSharding(mesh, P("draw")))
    q0 = jnp.asarray(states[:, 0], jnp.float32)
    t32 = jnp.asarray(t_pred, jnp.float32)

    @jax.jit
    def ensemble_mean(ohats):
        sols = jax.vmap(lambda O: rom.predict(O, q0, t32))(ohats)
        return jnp.mean(sols, axis=0)

    np.asarray(ensemble_mean(ohats))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(ensemble_mean(ohats))
    ens_s = (time.perf_counter() - t0) / reps

    print(json.dumps({
        "ndev": ndev,
        "grid81_s": round(grid_s, 4),
        "ensemble256_s": round(ens_s, 4),
        "grid_finite": int(np.sum(out < 1e12)),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndev", type=int, default=None)
    args = ap.parse_args()
    if args.ndev is not None:
        child(args.ndev)
        return

    results = []
    for ndev in (1, 2, 4, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={ndev}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--ndev", str(ndev)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"ndev={ndev} FAILED:\n{proc.stdout}\n{proc.stderr}")
            continue
        rec = json.loads(line[-1])
        results.append(rec)
        print(rec)

    if results:
        base = results[0]
        print("\n| devices | grid81 screen | speedup | 256-draw ensemble |"
              " speedup |")
        print("|---|---|---|---|---|")
        for r in results:
            print(
                f"| {r['ndev']} | {r['grid81_s']:.3f} s | "
                f"{base['grid81_s'] / r['grid81_s']:.2f}x | "
                f"{r['ensemble256_s']:.3f} s | "
                f"{base['ensemble256_s'] / r['ensemble256_s']:.2f}x |"
            )


if __name__ == "__main__":
    main()
