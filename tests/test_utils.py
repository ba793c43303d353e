"""Observability utilities: JSONL metric logging, step timer, profiler hook."""

import json

from cp360_tpu.utils.logging import MetricLogger
from cp360_tpu.utils.profiling import StepTimer, maybe_profile


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lines = []
    with MetricLogger(path, echo=lines.append) as logger:
        logger.log("train", epoch=0, loss=1.5, note="hi")
        logger.log("eval", auc=0.9)
    recs = [json.loads(ln) for ln in open(path)]
    assert len(recs) == 2
    assert recs[0]["event"] == "train" and recs[0]["loss"] == 1.5
    assert recs[1]["auc"] == 0.9 and "t" in recs[1]
    assert "loss=1.5000" in lines[0]


def test_metric_logger_no_file():
    lines = []
    logger = MetricLogger(None, echo=lines.append)
    logger.log("x", v=1)
    logger.close()
    assert lines == ["[x] v=1"]


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    assert t.n == 3 and t.mean >= 0 and t.last >= 0


def test_maybe_profile_noop():
    with maybe_profile(None):
        pass  # no profiler started


def test_maybe_profile_writes_trace(tmp_path):
    import os

    import jax.numpy as jnp

    d = str(tmp_path / "prof")
    with maybe_profile(d):
        (jnp.ones((8, 8)) * 2).block_until_ready()
    assert os.path.isdir(d) and len(os.listdir(d)) > 0
