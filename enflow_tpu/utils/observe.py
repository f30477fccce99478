"""Observability: metrics logging, profiler hooks, NaN guards.

The reference has none of this (SURVEY §5): its only instrumentation is a
rank-0 wall-clock epoch column (reference ``enflow/main.py:209-210,256-259``)
and stdout/stderr prints. Prescribed rebuild: structured metrics + an
``jax.profiler`` trace hook + NaN checks behind a config flag.

- ``MetricsLogger`` appends structured rows to a CSV (schema fixed at first
  write) while the driver keeps the reference's stdout table for parity.
- ``profile_trace`` wraps ``jax.profiler.trace`` (TensorBoard/Perfetto dump)
  when a directory is configured, else is a no-op.
- ``nan_guard`` enables ``jax_debug_nans`` scoped to a block; cheap
  ``assert_all_finite`` helper for explicit checks at sync points.
"""

from __future__ import annotations

import contextlib
import csv
import os
import time

import jax
import numpy as np


class MetricsLogger:
    """Append-only CSV metrics writer (one row per call)."""

    def __init__(self, path=None):
        self.path = path
        self._writer = None
        self._fh = None
        self._fields = None

    def log(self, **metrics):
        if not self.path:
            return
        metrics = {"time": time.time(), **metrics}
        if self._writer is None:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            self._fh = open(self.path, "a", newline="")
            self._fields = list(metrics)
            self._writer = csv.DictWriter(self._fh, fieldnames=self._fields)
            if self._fh.tell() == 0:
                self._writer.writeheader()
        self._writer.writerow({k: metrics.get(k, "") for k in self._fields})
        self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = self._writer = None


@contextlib.contextmanager
def profile_trace(log_dir=None):
    """Capture a profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def nan_guard(enabled: bool = True):
    """Scoped ``jax_debug_nans``: any NaN produced inside raises immediately
    with the offending primitive (debug-mode replacement for the reference's
    silent ``clamp``, egcl.py:73)."""
    if not enabled:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_all_finite(tree, name="tree"):
    """Host-side finite check over a pytree (forces a sync; use at checkpoint
    or logging boundaries)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if not np.isfinite(arr).all():
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name}{key}: "
                f"{np.count_nonzero(~np.isfinite(arr))} bad entries")
