"""Model interpolation: values and derivatives at arbitrary query points."""

import numpy as np

import wlsqm_tpu as wt

from conftest import quadratic_1d, quadratic_2d, quadratic_3d


def _fit_2d(rng, f, order=2, npts=30):
    xk = rng.uniform(-1, 1, (npts, 2))
    fi = np.zeros(wt.number_of_dofs(2, order))
    wt.fit_2D(xk=xk, fk=f(xk), xi=np.zeros(2), fi=fi, sens=None, do_sens=False,
              order=order, knowns=0, weighting_method=wt.WEIGHT_UNIFORM,
              debug=False)
    return fi


def test_2d_function_value(rng):
    f, _ = quadratic_2d()
    fi = _fit_2d(rng, f)
    q = rng.uniform(-0.8, 0.8, (20, 2))
    vals = wt.interpolate_fit(np.zeros(2), fi, dimension=2, order=2, x=q,
                              diff=wt.i2_F)
    np.testing.assert_allclose(vals, f(q), atol=1e-10)


def test_2d_all_partial_derivatives(rng):
    f, _ = quadratic_2d()
    fi = _fit_2d(rng, f)
    q = rng.uniform(-0.8, 0.8, (15, 2))
    qx, qy = q[:, 0], q[:, 1]

    cases = {
        wt.i2_X: 2.0 + 4.0 * qy + 10.0 * qx,
        wt.i2_Y: 3.0 + 4.0 * qx + 12.0 * qy,
        wt.i2_X2: np.full_like(qx, 10.0),
        wt.i2_XY: np.full_like(qx, 4.0),
        wt.i2_Y2: np.full_like(qx, 12.0),
    }
    for diff, expected in cases.items():
        got = wt.interpolate_fit(np.zeros(2), fi, 2, 2, q, diff=diff)
        np.testing.assert_allclose(got, expected, atol=1e-10)


def test_derivative_above_model_order_is_zero(rng):
    f, _ = quadratic_2d()
    fi = _fit_2d(rng, f, order=1, npts=20)
    q = rng.uniform(-0.8, 0.8, (5, 2))
    got = wt.interpolate_fit(np.zeros(2), fi, 2, 1, q, diff=wt.i2_X2)
    np.testing.assert_array_equal(got, 0.0)


def test_3d_function_value(rng):
    f, _ = quadratic_3d()
    xk = rng.uniform(-1, 1, (40, 3))
    fi = np.zeros(10)
    wt.fit_3D(xk=xk, fk=f(xk), xi=np.zeros(3), fi=fi, sens=None,
              do_sens=False, order=2, knowns=0,
              weighting_method=wt.WEIGHT_UNIFORM, debug=False)
    q = rng.uniform(-0.8, 0.8, (20, 3))
    vals = wt.interpolate_fit(np.zeros(3), fi, 3, 2, q, diff=wt.i3_F)
    np.testing.assert_allclose(vals, f(q), atol=1e-10)


def test_1d(rng):
    f, _ = quadratic_1d()
    xk = rng.uniform(-1, 1, 15)
    fi = np.zeros(3)
    wt.fit_1D(xk=xk, fk=f(xk), xi=0.0, fi=fi, sens=None, do_sens=False,
              order=2, knowns=0, weighting_method=wt.WEIGHT_UNIFORM,
              debug=False)
    q = rng.uniform(-0.8, 0.8, 10)
    vals = wt.interpolate_fit(0.0, fi, 1, 2, q, diff=wt.i1_F)
    np.testing.assert_allclose(vals, f(q), atol=1e-12)
    d1 = wt.interpolate_fit(0.0, fi, 1, 2, q, diff=wt.i1_X)
    np.testing.assert_allclose(d1, 2.0 + 6.0 * q, atol=1e-11)


def test_lambdify_2d(rng):
    f, _ = quadratic_2d()
    fi = _fit_2d(rng, f)
    model = wt.lambdify_fit(np.zeros(2), fi, 2, 2)
    x = rng.uniform(-0.5, 0.5, (4, 7))
    y = rng.uniform(-0.5, 0.5, (4, 7))
    got = model(x, y)
    assert got.shape == (4, 7)
    np.testing.assert_allclose(got, f(np.stack([x, y], -1)), atol=1e-10)
    # scalar broadcast
    got_s = model(0.25, 0.1)
    np.testing.assert_allclose(got_s, f(np.array([0.25, 0.1])), atol=1e-10)


def test_interpolation_during_refinement_consistency(rng):
    """interpolate_fit evaluates the exact model the refinement loop uses:
    fitting a polynomial then interpolating at the data points reproduces
    the data to near machine precision."""
    f, _ = quadratic_2d()
    xk = rng.uniform(-1, 1, (30, 2))
    fk = f(xk)
    fi = np.zeros(6)
    wt.fit_2D_iterative(xk=xk, fk=fk, xi=np.zeros(2), fi=fi, sens=None,
                        do_sens=False, order=2, knowns=0,
                        weighting_method=wt.WEIGHT_UNIFORM, max_iter=10,
                        debug=False)
    vals = wt.interpolate_fit(np.zeros(2), fi, 2, 2, xk, diff=wt.i2_F)
    np.testing.assert_allclose(vals, fk, atol=1e-11)


def test_interpolate_continuous_matches_expert_host_path(rng):
    """Device-side continuous blending == ExpertSolver's host-tree version."""
    from wlsqm_tpu.fitter.interp import interpolate_continuous
    from wlsqm_tpu.fitter.expert import ExpertSolver

    f, _ = quadratic_2d()
    B, K = 64, 16
    xi = rng.uniform(-1, 1, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-0.3, 0.3, (B, K, 2))
    fk = f(xk.reshape(-1, 2)).reshape(B, K)

    solver = ExpertSolver(
        dimension=2, nk=np.full(B, K, np.int32),
        order=np.full(B, 2, np.int32), knowns=np.zeros(B, np.int64),
        weighting_method=np.full(B, wt.WEIGHT_UNIFORM, np.int32))
    solver.prepare(xi=xi, xk=xk)
    fi = np.zeros((B, 6))
    solver.solve(fk=fk, fi=fi)
    solver.prep_interpolate()

    q = rng.uniform(-0.9, 0.9, (37, 2))
    r = 0.55
    ref, _ = solver.interpolate(q, mode="continuous", r=r, diff=wt.i2_F)

    num, den = interpolate_continuous(fi, xi, q, r, dimension=2, order=2,
                                      diff=wt.i2_F, block_q=16, block_b=32)
    got = np.asarray(num) / np.asarray(den)
    mask = np.isfinite(ref)
    assert mask.any()
    np.testing.assert_allclose(got[mask], ref[mask], rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.isfinite(got), mask)

    # derivative blending too
    ref_x, _ = solver.interpolate(q, mode="continuous", r=r, diff=wt.i2_X)
    num, den = interpolate_continuous(fi, xi, q, r, dimension=2, order=2,
                                      diff=wt.i2_X)
    got_x = np.asarray(num) / np.asarray(den)
    np.testing.assert_allclose(got_x[mask], ref_x[mask], rtol=1e-12,
                               atol=1e-12)


def test_3d_order4_all_35_derivatives(rng):
    """Fit a generic 3D quartic and check interpolate_fit for ALL 35
    derivative DOFs at fresh query points against a SymPy oracle
    (mirrors the reference's full 3D readout,
    reference: examples/wlsqm_example.py:278)."""
    import pytest

    sp = pytest.importorskip("sympy")

    from wlsqm_tpu.fitter import tables

    NO = wt.number_of_dofs(3, 4)          # 35
    assert NO == 35
    exp = tables.EXPONENTS[3][:NO]

    # a generic quartic: every monomial present with a distinct coefficient
    coeffs = rng.uniform(-1.5, 1.5, NO)
    x, y, z = sp.symbols("x y z")
    poly = sum(float(a) * x**int(e[0]) * y**int(e[1]) * z**int(e[2])
               for a, e in zip(coeffs, exp))
    f = sp.lambdify((x, y, z), poly, "numpy")

    xk = rng.uniform(-1, 1, (64, 3))
    fk = f(xk[:, 0], xk[:, 1], xk[:, 2])
    fi = np.zeros(NO)
    wt.fit_3D(xk=xk, fk=fk, xi=np.zeros(3), fi=fi, sens=None, do_sens=False,
              order=4, knowns=0, weighting_method=wt.WEIGHT_UNIFORM,
              debug=False)

    q = rng.uniform(-0.7, 0.7, (9, 3))
    for diff in range(NO):
        dpoly = sp.diff(poly, x, int(exp[diff, 0]), y, int(exp[diff, 1]),
                        z, int(exp[diff, 2]))
        want = sp.lambdify((x, y, z), dpoly, "numpy")(q[:, 0], q[:, 1], q[:, 2])
        want = np.broadcast_to(np.asarray(want, np.float64), (len(q),))
        got = wt.interpolate_fit(np.zeros(3), fi, dimension=3, order=4, x=q,
                                 diff=diff)
        np.testing.assert_allclose(
            got, want, rtol=1e-7, atol=1e-7,
            err_msg=f"derivative DOF {diff} (exponents {exp[diff]})")
