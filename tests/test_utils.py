"""Timing utilities, key threading, and config formatters."""

import time

import numpy as np
import pytest

from gp_bayesopinf_tpu.utils import TimedBlock, StageTimer, key_from_seed, split_tree
from gp_bayesopinf_tpu.pipeline.configs import TRNFMT, SPRSFMT, NOISEFMT, DIMFMT


def test_timed_block_measures(capsys):
    with TimedBlock("stage x") as tb:
        time.sleep(0.05)
    assert tb.elapsed >= 0.05
    out = capsys.readouterr().out
    assert "stage x" in out and "done in" in out


def test_timed_block_watchdog():
    """Exceeded time limits raise after the block (reference
    ``opinf.utils.TimedBlock(timelimit=...)`` semantics as used at
    ``PDEs/step2_fitgps.py:61``)."""
    with pytest.raises(TimeoutError):
        with TimedBlock("slow stage", timelimit=0.01):
            time.sleep(0.05)


def test_stage_timer_accumulates():
    timer = StageTimer()
    with timer.block("a"):
        time.sleep(0.02)
    with timer.block("a"):
        time.sleep(0.02)
    with timer.block("b"):
        pass
    assert timer.times["a"] >= 0.04
    assert "TOTAL" in timer.report()


def test_key_split_deterministic():
    k1 = split_tree(key_from_seed(7), ["x", "y"])
    k2 = split_tree(key_from_seed(7), ["x", "y"])
    assert np.array_equal(np.asarray(k1["x"]), np.asarray(k2["x"]))
    assert not np.array_equal(np.asarray(k1["x"]), np.asarray(k1["y"]))


def test_filename_formatters():
    """Reference formats (``ODEs/config.py:36-53``)."""
    assert TRNFMT(7) == "trainsize007"
    assert SPRSFMT(0.25) == "sparsity025"
    assert NOISEFMT(0) == "noise000"
    assert NOISEFMT(0.03) == "noise003"
    assert DIMFMT(3) == "mode03"


def test_reports(tmp_path):
    from gp_bayesopinf_tpu.pipeline.report import (
        summarize_experiment,
        summarize_posterior,
    )
    from gp_bayesopinf_tpu.bayes import BayesianODE, OperatorPosterior
    from gp_bayesopinf_tpu.models import SEIRD2
    import os

    folder = str(tmp_path)
    text = summarize_experiment(
        (0, 0.06), 200, 0.03, 400, numPODmodes=6,
        gp_regularizer=1e-8, ndraws=600, folder=folder,
    )
    assert "200 uniformly sampled snapshots" in text
    assert "6 POD modes" in text
    assert os.path.isfile(os.path.join(folder, "report.txt"))

    bm = BayesianODE(
        SEIRD2(), OperatorPosterior.from_moments(np.ones((1, 4)), np.eye(4)[None])
    )
    text = summarize_posterior([0.1, 0.2, 0.3, 0.4], bm, folder=folder)
    assert "POSTERIOR DISTRIBUTION" in text


def test_setup_logging(tmp_path):
    import logging
    from gp_bayesopinf_tpu.utils.logging import setup_logging

    log = str(tmp_path / "log.log")
    setup_logging(log)
    setup_logging(log)  # idempotent
    logging.info("hello from test")
    for h in logging.getLogger().handlers:
        h.flush()
    content = open(log).read()
    assert "NEW SESSION" in content
    assert "hello from test" in content
    handlers = [
        h for h in logging.getLogger().handlers
        if isinstance(h, logging.FileHandler) and h.baseFilename == log
    ]
    assert len(handlers) == 1


def test_distributed_mesh_helpers():
    from gp_bayesopinf_tpu.parallel.distributed import global_mesh, initialize

    initialize(num_processes=1)  # no-op path
    mesh = global_mesh({"dp": -1})
    assert mesh.devices.size == 8


def test_hostmath_placement():
    import jax.numpy as jnp
    from gp_bayesopinf_tpu.utils.hostmath import (
        host_device, host_jit, to_accelerator,
    )

    dev = host_device()
    assert dev.platform == "cpu"
    f = host_jit(lambda x: jnp.linalg.cholesky(x @ x.T + 10 * jnp.eye(4)))
    out = f(jnp.eye(4))
    assert out.devices() == {dev}
    back = to_accelerator(out)
    assert np.allclose(np.asarray(back), np.asarray(out))


def test_host_fingerprint_keys_on_model_identity(tmp_path):
    """The compile-cache host tag must change when the CPU model changes,
    even if the ISA feature flags are identical (LLVM keys tuning features
    like prefer-no-scatter on the model, not the flags)."""
    from gp_bayesopinf_tpu import _host_fingerprint

    a = tmp_path / "a"
    b = tmp_path / "b"
    flags = "flags\t\t: fpu vme sse sse2 avx avx2 avx512f\n"
    a.write_text("model name\t: Intel(R) Xeon(R) CPU @ 2.20GHz\n" + flags)
    b.write_text("model name\t: AMD EPYC 9B14\n" + flags)
    tag_a = _host_fingerprint(str(a))
    tag_b = _host_fingerprint(str(b))
    assert tag_a != tag_b
    assert tag_a == _host_fingerprint(str(a))  # deterministic
    assert len(tag_a) == 12 and all(c in "0123456789abcdef" for c in tag_a)
    # Missing / keyless cpuinfo falls back to a platform tag, never raises.
    assert len(_host_fingerprint(str(tmp_path / "missing"))) == 12
    empty = tmp_path / "empty"
    empty.write_text("bogus\t: nothing relevant\n")
    assert len(_host_fingerprint(str(empty))) == 12
