import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.utils.observe import (
    MetricsLogger,
    assert_all_finite,
    nan_guard,
    profile_trace,
)


def test_metrics_logger_schema_and_append(tmp_path):
    path = str(tmp_path / "m.csv")
    log = MetricsLogger(path)
    log.log(epoch=0, loss=1.5)
    log.log(epoch=1, loss=1.25)
    log.close()
    with open(path) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "time,epoch,loss"
    assert len(lines) == 3
    # append across instances
    log2 = MetricsLogger(path)
    log2.log(epoch=2, loss=1.0)
    log2.close()
    with open(path) as f:
        assert len(f.read().strip().split("\n")) == 4


def test_metrics_logger_disabled():
    log = MetricsLogger(None)
    log.log(epoch=0, loss=1.0)  # no-op, no error
    log.close()


def test_nan_guard_raises():
    with pytest.raises(FloatingPointError):
        with nan_guard(True):
            jnp.log(jnp.asarray(-1.0)) * 2.0
    # disabled: no raise
    with nan_guard(False):
        _ = jnp.log(jnp.asarray(-1.0)) * 2.0
    # flag restored
    assert not jax.config.jax_debug_nans


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="bad"):
        assert_all_finite({"bad": jnp.asarray([1.0, np.nan])}, "tree")


def test_profile_trace_writes(tmp_path):
    d = str(tmp_path / "prof")
    with profile_trace(d):
        jnp.ones(8).sum().block_until_ready()
    assert os.path.isdir(d)
    assert any(os.scandir(d))
    with profile_trace(None):  # no-op path
        pass
