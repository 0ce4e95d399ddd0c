"""Utils tests: metrics logger, step timer, debug-nans toggle."""

import json
import os

import jax
import numpy as np

from pspde.utils import MetricsLogger, StepTimer, debug_nans


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    ml = MetricsLogger(jsonl_path=path)
    for i in range(3):
        ml.log(i, loss=float(i), err=float(2 * i))
    ml.close()
    assert ml["loss"] == [0.0, 1.0, 2.0]
    with open(path) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 3 and recs[2]["err"] == 4.0


def test_step_timer():
    t = StepTimer(K=100, N=10)
    import time
    for _ in range(3):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["iterations"] == 3
    assert s["path_steps_per_sec_per_chip"] > 0


def test_debug_nans_toggle():
    import jax.numpy as jnp
    import pytest
    with debug_nans(True):
        with pytest.raises(FloatingPointError):
            jax.jit(jnp.log)(-1.0).block_until_ready()
    # restored afterwards: no raise
    jax.jit(jnp.log)(-1.0).block_until_ready()
