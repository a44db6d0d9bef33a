"""utils.profiling: the device-synced Timer and the trace wrapper."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from wlsqm_tpu.utils.profiling import Timer, device_trace


def test_timer_measures_and_prints(capsys):
    with Timer("work") as t:
        x = jnp.arange(1000.0).sum()
        float(x)
    assert t.seconds is not None and t.seconds >= 0.0
    assert "[work]" in capsys.readouterr().out


def test_timer_quiet_and_nosync(capsys):
    with Timer(sync=False, quiet=True) as t:
        sum(range(100))
    assert t.seconds >= 0.0
    assert capsys.readouterr().out == ""


@pytest.mark.full
def test_device_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    with device_trace(logdir):
        float(jnp.ones((64, 64)).sum())
    # the profiler lays out plugins/profile/<run>/ with trace artifacts
    found = []
    for root, _dirs, files in os.walk(logdir):
        found.extend(files)
    assert found, "profiler trace produced no files"


def test_timer_brackets_real_fit(rng):
    import wlsqm_tpu as wt

    xk = rng.uniform(-1, 1, (8, 20, 2))
    fk = np.sin(xk[..., 0])
    with Timer(quiet=True) as t:
        res = wt.fit_many(xk, fk, order=2)
        np.asarray(res.fi)
    assert t.seconds > 0.0
