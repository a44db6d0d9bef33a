"""Property-based fuzz of the compat fit path against the NumPy oracle.

Hypothesis drives random (dimension, order, K, raggedness, weighting,
knowns, geometry-scale) combinations through ``wt.fit_many`` and checks
every case against the same independent per-case NumPy/LAPACK pipeline
the deterministic fuzz uses (tests/test_fuzz_oracle.py) — shrinkage gives
minimal failing configurations for free.  Example counts are bounded so
the suite stays CI-sized; the deterministic configs remain the coverage
backbone.
"""

import os

import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

import wlsqm_tpu as wt  # noqa: E402
from wlsqm_tpu.fitter import defs  # noqa: E402

from test_fuzz_oracle import _oracle_case  # noqa: E402


@st.composite
def fit_configs(draw):
    dimension = draw(st.integers(1, 3))
    # order capped so K (and CPU time) stays small; order 4 has its own
    # deterministic configs
    order = draw(st.integers(0, 3))
    no = defs.number_of_dofs(dimension, order)
    K = draw(st.integers(no + 2, no + 8))
    ragged = draw(st.booleans())
    weighting = draw(st.sampled_from([defs.WEIGHT_UNIFORM,
                                      defs.WEIGHT_CENTER]))
    # a random (possibly empty) knowns bitmask over the active DOFs;
    # max_size=no-1 leaves at least one unknown by construction
    kn_bits = draw(st.lists(st.integers(0, no - 1), max_size=max(no - 1, 0),
                            unique=True))
    knowns = 0
    for b in kn_bits:
        knowns |= 1 << b
    scale = draw(st.sampled_from([1.0, 0.5, 0.1]))
    seed = draw(st.integers(0, 2**31 - 1))
    return dimension, order, K, ragged, weighting, knowns, scale, seed


# CI default stays small; set WLSQM_TPU_FUZZ_EXAMPLES for soak runs
@settings(max_examples=int(os.environ.get("WLSQM_TPU_FUZZ_EXAMPLES", "25")),
          deadline=None,
          suppress_health_check=[hyp.HealthCheck.too_slow])
@pytest.mark.full
@given(cfg=fit_configs())
def test_fit_many_matches_oracle(cfg):
    dimension, order, K, ragged, weighting, knowns, scale, seed = cfg
    rng = np.random.default_rng(seed)
    B = 5
    no = defs.number_of_dofs(dimension, order)

    xi = rng.uniform(-1, 1, (B, dimension))
    xk = xi[:, None, :] + rng.uniform(-scale, scale, (B, K, dimension))
    fk = np.cos(xk.sum(-1)) + 0.3 * xk[..., 0] ** 2
    nk = (rng.integers(no + 1, K + 1, B).astype(np.int32)
          if ragged else np.full(B, K, np.int32))
    fi_init = np.zeros((B, no))
    for j in range(no):
        if (knowns >> j) & 1:
            fi_init[:, j] = rng.uniform(-1, 1, B)

    res = wt.fit_many(xk, fk, xi, nk=nk, order=order, knowns=knowns,
                      weighting=weighting, fi_init=fi_init)
    got = np.asarray(res.fi)
    assert np.isfinite(got).all()

    # two correct f64 algorithms disagree by ~u64 * cond * amp on randomly
    # conditioned geometry (docs/theory.md section 7), so the bar scales
    # with the probed conditioning of each case instead of being fixed
    from wlsqm_tpu.fitter import condprobe

    cond, amp = condprobe._cond_amp(
        xk, nk, xi, order, weighting, dimension=dimension,
        knowns=knowns, sample=B)
    for b in range(B):
        want = _oracle_case(xk[b], fk[b], xi[b], int(nk[b]), order, knowns,
                            weighting, dimension, fi_init[b])
        # coefficient calibrated by fuzzing: hypothesis found a ragged
        # 1D order-3 case where the engine and the LAPACK oracle differ
        # by 1.3e-14 * cond * amp (~57 ulp/unit) — both correct f64
        # pipelines, different elimination orders; 2e-14 covers the
        # observed scatter with margin while still scaling with the
        # probed conditioning
        tol = max(2e-14 * float(cond[b] * amp[b]), 1e-10)
        np.testing.assert_allclose(
            got[b, :no], want, rtol=tol, atol=tol,
            err_msg=f"case {b} of cfg={cfg} (cond*amp="
                    f"{float(cond[b] * amp[b]):.2e})")
