"""Exact-polynomial recovery through the simple (compat) API.

Oracle class 1 of the reference test strategy: a polynomial exactly
representable in the basis must be recovered — every DOF equals the analytic
derivative at the origin to far better than 1e-10.
"""

import numpy as np

import wlsqm_tpu as wt

from conftest import cubic_2d, quadratic_1d, quadratic_2d, quadratic_3d

ATOL = 1e-10


def test_fit_1d_order2(rng):
    f, expected = quadratic_1d()
    xk = rng.uniform(-1, 1, 15)
    fi = np.zeros(wt.number_of_dofs(1, 2))
    it = wt.fit_1D(xk=xk, fk=f(xk), xi=0.0, fi=fi, sens=None, do_sens=False,
                   order=2, knowns=0, weighting_method=wt.WEIGHT_UNIFORM,
                   debug=False)
    assert it == 0
    np.testing.assert_allclose(fi, expected, atol=ATOL)


def test_fit_2d_order2(rng):
    f, expected = quadratic_2d()
    xk = rng.uniform(-1, 1, (30, 2))
    fi = np.zeros(wt.number_of_dofs(2, 2))
    wt.fit_2D(xk=xk, fk=f(xk), xi=np.zeros(2), fi=fi, sens=None, do_sens=False,
              order=2, knowns=0, weighting_method=wt.WEIGHT_UNIFORM, debug=False)
    np.testing.assert_allclose(fi, expected, atol=ATOL)


def test_fit_3d_order2(rng):
    f, expected = quadratic_3d()
    xk = rng.uniform(-1, 1, (40, 3))
    fi = np.zeros(wt.number_of_dofs(3, 2))
    wt.fit_3D(xk=xk, fk=f(xk), xi=np.zeros(3), fi=fi, sens=None, do_sens=False,
              order=2, knowns=0, weighting_method=wt.WEIGHT_UNIFORM, debug=False)
    np.testing.assert_allclose(fi, expected, atol=ATOL)


def test_fit_2d_order3(rng):
    f, expected = cubic_2d()
    xk = rng.uniform(-1, 1, (50, 2))
    fi = np.zeros(wt.number_of_dofs(2, 3))
    wt.fit_2D(xk=xk, fk=f(xk), xi=np.zeros(2), fi=fi, sens=None, do_sens=False,
              order=3, knowns=0, weighting_method=wt.WEIGHT_UNIFORM, debug=False)
    np.testing.assert_allclose(fi, expected, atol=ATOL)


def test_weight_center_recovers_exact_polynomial(rng):
    """Weighting cannot change the answer when the fit is exact."""
    f, expected = quadratic_2d()
    xk = rng.uniform(-1, 1, (30, 2))
    fi = np.zeros(6)
    wt.fit_2D(xk=xk, fk=f(xk), xi=np.zeros(2), fi=fi, sens=None, do_sens=False,
              order=2, knowns=0, weighting_method=wt.WEIGHT_CENTER, debug=False)
    np.testing.assert_allclose(fi, expected, atol=ATOL)


def test_iterative_matches_basic_on_exact_polynomial(rng):
    f, expected = quadratic_2d()
    xk = rng.uniform(-1, 1, (30, 2))
    fi_b = np.zeros(6)
    fi_i = np.zeros(6)
    wt.fit_2D(xk=xk, fk=f(xk), xi=np.zeros(2), fi=fi_b, sens=None,
              do_sens=False, order=2, knowns=0,
              weighting_method=wt.WEIGHT_UNIFORM, debug=False)
    it = wt.fit_2D_iterative(xk=xk, fk=f(xk), xi=np.zeros(2), fi=fi_i,
                             sens=None, do_sens=False, order=2, knowns=0,
                             weighting_method=wt.WEIGHT_UNIFORM, max_iter=10,
                             debug=False)
    assert it >= 1
    np.testing.assert_allclose(fi_i, fi_b, atol=1e-12)
    np.testing.assert_allclose(fi_i, expected, atol=ATOL)


def test_fit_2d_many_matches_single_loop(rng):
    """Batched == loop of singles, and both == the analytic derivatives."""
    f, expected = quadratic_2d()
    ncases, npts = 8, 25
    xk = rng.uniform(-1, 1, (ncases, npts, 2))
    fk = f(xk)

    fi_loop = np.zeros((ncases, 6))
    for j in range(ncases):
        wt.fit_2D(xk=xk[j], fk=fk[j], xi=np.zeros(2), fi=fi_loop[j],
                  sens=None, do_sens=False, order=2, knowns=0,
                  weighting_method=wt.WEIGHT_UNIFORM, debug=False)

    fi_many = np.zeros((ncases, 6))
    wt.fit_2D_many(
        xk=xk, fk=fk, nk=np.full(ncases, npts, np.int32),
        xi=np.zeros((ncases, 2)), fi=fi_many, sens=None, do_sens=False,
        order=np.full(ncases, 2, np.int32),
        knowns=np.zeros(ncases, np.int64),
        weighting_method=np.full(ncases, wt.WEIGHT_UNIFORM, np.int32),
        debug=False)

    np.testing.assert_allclose(fi_many, fi_loop, atol=1e-13)
    for j in range(ncases):
        np.testing.assert_allclose(fi_many[j], expected, atol=ATOL)


def test_ragged_nk_ignores_padding(rng):
    """Cases with nk[j] < max_nk must ignore the padded tail entirely —
    even non-finite garbage there must not affect the result."""
    f, expected = quadratic_2d()
    ncases, npts = 4, 30
    xk = rng.uniform(-1, 1, (ncases, npts, 2))
    fk = f(xk)
    nk = np.array([30, 22, 18, 25], np.int32)
    for j in range(ncases):
        xk[j, nk[j]:] = np.nan   # poison the unused tail
        fk[j, nk[j]:] = np.inf

    fi = np.zeros((ncases, 6))
    wt.fit_2D_many(
        xk=xk, fk=fk, nk=nk, xi=np.zeros((ncases, 2)), fi=fi,
        sens=None, do_sens=False,
        order=np.full(ncases, 2, np.int32),
        knowns=np.zeros(ncases, np.int64),
        weighting_method=np.full(ncases, wt.WEIGHT_UNIFORM, np.int32),
        debug=False)
    for j in range(ncases):
        np.testing.assert_allclose(fi[j], expected, atol=ATOL)


def test_mixed_orders_in_one_batch(rng):
    """Per-case polynomial order in a single batch (masked execution)."""
    f, expected = quadratic_2d()
    ncases, npts = 6, 30
    xk = rng.uniform(-1, 1, (ncases, npts, 2))
    fk = f(xk)
    order = np.array([2, 3, 4, 2, 3, 4], np.int32)
    NO = wt.number_of_dofs(2, 4)

    fi = np.zeros((ncases, NO))
    wt.fit_2D_many(
        xk=xk, fk=fk, nk=np.full(ncases, npts, np.int32),
        xi=np.zeros((ncases, 2)), fi=fi, sens=None, do_sens=False,
        order=order, knowns=np.zeros(ncases, np.int64),
        weighting_method=np.full(ncases, wt.WEIGHT_UNIFORM, np.int32),
        debug=False)

    for j in range(ncases):
        no_j = wt.number_of_dofs(2, int(order[j]))
        # the quadratic's higher-order derivatives (order > 2) are all zero
        full = np.zeros(no_j)
        full[:6] = expected
        np.testing.assert_allclose(fi[j, :no_j], full, atol=1e-8)
        # DOFs beyond each case's own order stay untouched (zeros here)
        np.testing.assert_array_equal(fi[j, no_j:], 0.0)


def test_sensitivity_matches_finite_difference(rng):
    """sens[k,j] = d fi[j] / d fk[k]: check against a directional FD."""
    f, _ = quadratic_2d()
    xk = rng.uniform(-1, 1, (20, 2))
    fk = f(xk)
    fi = np.zeros(6)
    sens = np.zeros((20, 6))
    wt.fit_2D(xk=xk, fk=fk, xi=np.zeros(2), fi=fi, sens=sens, do_sens=True,
              order=2, knowns=0, weighting_method=wt.WEIGHT_UNIFORM,
              debug=False)

    eps = 1e-6
    k_probe = 7
    fk2 = fk.copy()
    fk2[k_probe] += eps
    fi2 = np.zeros(6)
    wt.fit_2D(xk=xk, fk=fk2, xi=np.zeros(2), fi=fi2, sens=None, do_sens=False,
              order=2, knowns=0, weighting_method=wt.WEIGHT_UNIFORM,
              debug=False)
    fd = (fi2 - fi) / eps
    np.testing.assert_allclose(sens[k_probe], fd, atol=1e-6)


def test_sensitivity_nan_for_knowns(rng):
    f, _ = quadratic_2d()
    xk = rng.uniform(-1, 1, (20, 2))
    fi = np.zeros(6)
    fi[wt.i2_F] = 1.0  # known value
    sens = np.zeros((20, 6))
    wt.fit_2D(xk=xk, fk=f(xk), xi=np.zeros(2), fi=fi, sens=sens, do_sens=True,
              order=2, knowns=wt.b2_F, weighting_method=wt.WEIGHT_UNIFORM,
              debug=False)
    assert np.isnan(sens[:, wt.i2_F]).all()
    assert np.isfinite(sens[:, wt.i2_X:]).all()
