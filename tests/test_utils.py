"""Observability utilities: JSONL metric logging, step timer, profiler hook."""

import os
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


def test_guard_compile_cache_disables_and_respects_optin(monkeypatch):
    """The persistent compile cache wedges this TPU plugin on warm starts
    (CLAUDE.md); every CLI disables a configured cache unless explicitly
    allowed."""
    import jax

    from cp360_tpu.utils.platform import guard_compile_cache

    monkeypatch.delenv("CP360_ALLOW_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    assert guard_compile_cache() is False  # nothing configured -> no-op

    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/jc")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jc")
    try:
        assert guard_compile_cache() is True
        assert jax.config.jax_compilation_cache_dir is None
        assert "JAX_COMPILATION_CACHE_DIR" not in os.environ

        monkeypatch.setenv("CP360_ALLOW_COMPILE_CACHE", "1")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/jc")
        jax.config.update("jax_compilation_cache_dir", "/tmp/jc")
        assert guard_compile_cache() is False  # explicit opt-in keeps it
        assert jax.config.jax_compilation_cache_dir == "/tmp/jc"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_atomic_save_helpers(tmp_path):
    """atomic_save/atomic_savez land complete files under the final name
    and leave no temp droppings (resume-by-existence pipelines depend on
    never seeing a truncated artifact)."""
    import numpy as np

    from cp360_tpu.utils.atomic import atomic_save, atomic_savez

    p = str(tmp_path / "a.npy")
    atomic_save(p, np.arange(5))
    np.testing.assert_array_equal(np.load(p), np.arange(5))
    z = str(tmp_path / "m.npz")
    atomic_savez(z, x=np.ones(3), flag=True)
    with np.load(z) as d:
        assert bool(d["flag"]) and d["x"].shape == (3,)
    assert sorted(os.listdir(tmp_path)) == ["a.npy", "m.npz"]


def test_warm_link_returns_elapsed(capsys):
    """warm_link absorbs one matmul+fetch round trip and reports its
    seconds; quiet (<5 s) on a healthy backend, prints a note when it
    absorbed a degraded-tunnel cold fetch (CLAUDE.md / RUNBOOK.md)."""
    from cp360_tpu.utils.transfer import warm_link

    dt = warm_link()
    assert dt >= 0.0
    # on the forced-CPU test mesh the fetch is local: never the wedge path
    assert "cold first-fetch" not in capsys.readouterr().out
