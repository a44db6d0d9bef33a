"""wlsqm_tpu.warmup: pre-compilation reports and route warming."""

import numpy as np
import pytest

import wlsqm_tpu as wt
from wlsqm_tpu.warmup import DEFAULT_CONFIGS
from wlsqm_tpu.fitter import defs


def test_warmup_planned_config_runs_and_reports():
    """A plain config plans the production route and reports timings."""
    reports = wt.warmup([dict(dimension=2, order=2, K=12,
                              weighting=defs.WEIGHT_UNIFORM)])
    (rep,) = reports
    assert rep["path"] in ("kernel", "xla")   # cpu hosts plan to xla
    assert rep["compile_s"] > 0 and rep["run_s"] > 0
    assert "route" in rep and "config" in rep
    assert rep["config"]["K"] == 12


@pytest.mark.full
def test_warmup_explicit_kernel_config():
    """An explicit precision/assembly warms the kernel directly (interpret
    mode on CPU hosts) and echoes the kernel route."""
    reports = wt.warmup([dict(dimension=2, order=2, K=12,
                              weighting=defs.WEIGHT_UNIFORM,
                              precision="ds", assembly="rows",
                              refine_steps=1)])
    (rep,) = reports
    assert rep["path"] == "kernel"
    assert "rows" in rep["route"]


def test_warmup_with_representative_geometry(rng):
    """Geometry-carrying configs plan from the user's own cloud."""
    xi = rng.uniform(-1, 1, (64, 2))
    xk = xi[:, None, :] + rng.uniform(-0.4, 0.4, (64, 10, 2))
    reports = wt.warmup([dict(dimension=2, order=2, xk=xk, xi=xi,
                              weighting=defs.WEIGHT_UNIFORM)])
    assert reports[0]["compile_s"] > 0


def test_default_configs_shape():
    assert all("dimension" in c and "K" in c for c in DEFAULT_CONFIGS)
