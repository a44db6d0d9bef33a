"""Evaluation roundoff vs a compensated oracle (round-2 VERDICT missing #1).

The reference evaluates its surrogates with hand-ordered FMA symmetric
Horner forms, summing contributions in ~increasing magnitude to minimize
roundoff (reference: wlsqm/fitter/polyeval.pyx:146-206).  This rebuild
evaluates by a baked-basis dot product instead (polyeval.py docstring).
SURVEY §2 asked to keep the reference's summation structure "for
numerical parity" — these tests QUANTIFY the delta: the dot-product
evaluation is compared against a compensated oracle (per-term products
in 80-bit long double, exactly-rounded ``math.fsum``) at order 4 across
four decades of offset magnitude, in 1D/2D/3D.  The measured delta is
~1e-15 relative to the value scale (n·eps accumulation over <= 35
terms), two orders under the 1e-12 action threshold the VERDICT set —
so the reference's ordering is NOT reimplemented, and this test pins
that the gap stays closed.
"""

import math

import numpy as np
import pytest

from wlsqm_tpu.fitter import defs, polyeval, tables
from wlsqm_tpu.fitter.interp import eval_fit


def _oracle_taylor(dimension, order, fi, delta):
    """Compensated evaluation: long-double terms + exactly-rounded fsum."""
    no = defs.number_of_dofs(dimension, order)
    exp = tables.EXPONENTS[dimension][:no]
    invf = tables.INV_FACT[dimension][:no].astype(np.longdouble)
    d = delta.astype(np.longdouble)
    out = np.empty(len(d), np.float64)
    for i in range(len(d)):
        terms = [float(np.prod(d[i] ** exp[j]) * invf[j]
                       * np.longdouble(fi[j])) for j in range(no)]
        out[i] = math.fsum(terms)
    return out


@pytest.mark.parametrize("dimension", [1, 2, 3])
@pytest.mark.parametrize("scale", [0.01, 0.1, 1.0, 10.0])
def test_order4_eval_matches_compensated_oracle(rng, dimension, scale):
    no = defs.number_of_dofs(dimension, 4)
    fi = rng.standard_normal(no)
    n = 100
    delta = rng.uniform(-scale, scale, (n, dimension))
    xi = np.zeros(dimension)
    x = xi + delta
    got = np.asarray(polyeval.taylor(
        dimension, 4, fi, xi, x if dimension > 1 else x[:, 0]))
    ref = _oracle_taylor(dimension, 4, fi, delta)
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 1e-12, \
        "dot-product evaluation drifted from the compensated oracle; " \
        "consider the reference's ordered-Horner summation"


def test_adversarial_cancellation_bounded(rng):
    """Coefficients tuned so the value nearly cancels: the error stays
    bounded by the TERM scale (the relevant backward-error measure; no
    fixed-precision ordering can bound relative-to-result error across a
    zero crossing)."""
    no = defs.number_of_dofs(2, 4)
    delta = np.array([[2.0, -2.0]])
    # make the value at delta cancel to ~0 against O(1) terms
    fi = rng.standard_normal(no)
    c = np.asarray(polyeval.taylor(2, 4, fi, np.zeros(2), delta))[0]
    exp = tables.EXPONENTS[2][:no]
    invf = tables.INV_FACT[2][:no]
    b0 = float(np.prod(delta[0] ** exp[0]) * invf[0])
    fi[0] -= c / b0                    # cancel via the constant term
    got = np.asarray(polyeval.taylor(2, 4, fi, np.zeros(2), delta))[0]
    ref = _oracle_taylor(2, 4, fi, delta)[0]
    term_scale = np.abs(
        [np.prod(delta[0] ** exp[j]) * invf[j] * fi[j] for j in range(no)]
    ).max()
    assert abs(got - ref) < 1e-13 * term_scale


def test_eval_fit_derivative_matches_oracle(rng):
    """Derivative evaluation (interp path) at order 4 vs the oracle of the
    differentiated coefficient vector."""
    no = defs.number_of_dofs(2, 4)
    fi = rng.standard_normal(no)
    xi = np.zeros((1, 2))
    x = rng.uniform(-1.5, 1.5, (40, 2))
    got = np.asarray(eval_fit(fi[None, :], xi, x[None, :, :],
                              dimension=2, order=4, diff=defs.i2_X))[0]
    P = tables.diff_projection(2, defs.i2_X)[:no, :no]
    fi_d = P @ fi
    ref = _oracle_taylor(2, 4, fi_d, x - xi[0])
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 1e-12
