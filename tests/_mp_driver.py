"""Multi-process driver for tests/test_distributed_multiprocess.py.

Run as: python tests/_mp_driver.py <process_id> <num_processes> <port>

Each process brings up JAX's distributed runtime through
``parallel.distributed.initialize`` (a localhost coordinator), builds a
GLOBAL mesh whose leading axis spans the process boundary, proves a
collective crosses processes (shard_map psum with per-process-distinct
contributions), and then drives the full ``run_scaled`` pipeline at tiny
shapes over that mesh — process bring-up, DCN-style mesh construction,
and cross-process collectives, the multi-process half of SURVEY.md §2d's
communication-backend row.
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 "
        + os.environ.get("XLA_FLAGS", "")
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gp_bayesopinf_tpu.parallel.distributed import (
        global_mesh,
        initialize,
    )

    initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # Mesh whose LEADING axis spans the process boundary: devices are
    # ordered [p0:0-3, p1:4-7], so reshape (nproc, 4) puts each draw-row
    # on one process and any "draw" collective crosses processes.
    mesh = global_mesh({"draw": nproc, "mode": 4})

    # --- collective crossing the process boundary -------------------------
    # Each draw-row carries a DIFFERENT value (row i = i + 1); psum over
    # "draw" must see the other process's contribution — a local-only
    # reduction would return 2 * own_row instead of sum(1..nproc).
    rows = np.arange(1.0, nproc + 1.0)[:, None] * np.ones((nproc, 4))
    xg = jax.device_put(rows, NamedSharding(mesh, P("draw", "mode")))
    psummed = jax.jit(
        jax.shard_map(
            lambda a: jax.lax.psum(a, "draw"),
            mesh=mesh,
            in_specs=P("draw", "mode"),
            out_specs=P(None, "mode"),
        )
    )(xg)
    expect = nproc * (nproc + 1) / 2
    got = np.asarray(jax.device_get(psummed[:, :1]))
    assert np.allclose(got, expect), (got, expect)
    print(f"[proc {pid}] cross-process psum ok: {got.ravel()[0]}")

    # --- full pipeline over the cross-process mesh ------------------------
    from gp_bayesopinf_tpu.pipeline.scaled import run_scaled

    res = run_scaled(
        mesh=mesh,
        n_space=96,
        n_snapshots=200,
        num_modes=4,
        num_gp_samples=64,
        num_regression_points=64,
        n_restarts=2,
        ndraws=8,
        grid_size=4,
        modelform="cA",
    )
    assert np.isfinite(res.train_error), res.train_error
    assert res.stable_fraction > 0.0
    print(
        f"[proc {pid}] run_scaled ok: train_error={res.train_error:.4f} "
        f"stable={res.stable_fraction:.2f} lambda={res.regularizer:.3e}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
