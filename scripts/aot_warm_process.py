"""Measure the warm-PROCESS cost of the SEIRD fit stage.

Each invocation is one fresh process: with the XLA compilation cache
populated, the remaining cost is Python tracing + lowering — exactly
what the AOT program cache (utils.aotcache) removes. Run twice:

    python scripts/aot_warm_process.py        # populates the AOT cache
    python scripts/aot_warm_process.py        # measures the cached path

Compare with GPBOI_AOT=0 to see the uncached tracing cost.
"""

import time

t_import = time.time()
import jax
import jax.numpy as jnp
import numpy as np

from gp_bayesopinf_tpu.gp import fit_gaussian_processes
from gp_bayesopinf_tpu.models import SEIRD2
from gp_bayesopinf_tpu.utils import key_from_seed, split_tree

print(f"import: {time.time() - t_import:.1f}s  backend={jax.default_backend()}")

keys = split_tree(key_from_seed(21092023), ["sample", "fit"])
model = SEIRD2()
q0 = np.array([0.994, 0.005, 0.001, 0, 0])
t_s = np.sort(np.random.default_rng(1).uniform(0, 90, 90))
t_s[0], t_s[-1] = 0, 90
snaps = model.noise(keys["sample"], model.solve(q0, t_s), 0.10)
t_est = np.linspace(0, 90, 360)

t0 = time.time()
gps = fit_gaussian_processes(
    t_est, t_s, snaps, n_restarts_optimizer=100, key=keys["fit"]
)
jax.block_until_ready([g.state_estimate for g in gps])
t_fit = time.time() - t0
print(f"fit stage (fresh process): {t_fit:.1f}s")
print("ell:", [f"{float(g.length_scale):.4g}" for g in gps])
