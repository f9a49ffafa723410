"""Test configuration: run on a simulated 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; an 8-way CPU host-device split
stands in for a v5e-8 mesh (SURVEY.md section 4). Environment must be set
before jax imports.
"""

import os

# Force CPU even when the session environment pins a TPU platform: unit
# tests must run without TPU hardware (and TPU compiles are minutes-slow).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["GPBOI_NO_COMPILE_CACHE"] = "1"
existing = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in existing:
    os.environ["XLA_FLAGS"] = (
        existing + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Some environments register a TPU PJRT plugin from sitecustomize and pin
# jax_platforms programmatically; override it after import, before any
# device is touched.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(27092023)
