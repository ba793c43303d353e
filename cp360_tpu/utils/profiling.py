"""Profiling hooks (jax.profiler) + step timers.

The reference's only observability is wall-clock prints
(static_model/dataset_feat_extractor.py:195-196, temporal_model/
train_temporal.py:171-180).  Here: optional XLA trace capture around any
pipeline span (viewable in TensorBoard/Perfetto) and a cheap step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]):
    """Capture a jax.profiler trace of the enclosed span if a dir is given.

    Wired to config key ``profile_dir`` / the CLIs' ``--profile-dir``.
    """
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Running mean/last step timer for train/infer loops."""

    def __init__(self):
        self.n = 0
        self.total = 0.0
        self.last = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.last = time.time() - self._t0
        self.total += self.last
        self.n += 1

    @property
    def mean(self) -> float:
        return self.total / self.n if self.n else 0.0
