"""Classical finite-difference stencil equivalence.

Oracle class 2: on a determined stencil, the WLSQM fit is a square linear
system whose solution IS the classical central-difference formula, so the fit
must reproduce hand-coded stencils to roundoff for arbitrary smooth (non-
polynomial) data.  This also pins the knowns-elimination semantics, because
the 2D/3D plus stencils carry no mixed-derivative information and the mixed
DOFs must be pinned via the knowns bitmask.
"""

import numpy as np
import pytest

import wlsqm_tpu as wt

H = 1e-2  # stencil half width; see tolerance discussion in the reference suite


@pytest.mark.parametrize("func,x0", [
    (np.sin, 0.3),
    (np.exp, -0.2),
    (lambda x: np.sin(x) * np.exp(x), 0.5),
])
def test_1d_three_point_stencil(func, x0):
    xk = np.array([x0 - H, x0, x0 + H])
    fk = func(xk)
    f_m, f_c, f_p = fk

    fi = np.zeros(3)
    wt.fit_1D(xk=xk, fk=fk, xi=x0, fi=fi, sens=None, do_sens=False,
              order=2, knowns=0, weighting_method=wt.WEIGHT_UNIFORM,
              debug=False)

    assert abs(fi[wt.i1_F] - f_c) < 1e-12
    assert abs(fi[wt.i1_X] - (f_p - f_m) / (2 * H)) < 1e-11
    assert abs(fi[wt.i1_X2] - (f_p - 2 * f_c + f_m) / H**2) < 1e-10


@pytest.mark.parametrize("func,x0,y0", [
    (lambda x, y: np.sin(x) + np.cos(y), 0.3, 0.4),
    (lambda x, y: np.exp(-0.5 * (x * x + y * y)), 0.1, -0.2),
    (lambda x, y: np.sin(x * y), 0.3, 0.2),
])
def test_2d_plus_stencil(func, x0, y0):
    pts = np.array([
        [x0, y0],
        [x0 + H, y0], [x0 - H, y0],
        [x0, y0 + H], [x0, y0 - H],
    ])
    fk = np.array([func(px, py) for px, py in pts])
    f_c, f_xp, f_xm, f_yp, f_ym = fk

    # 6 DOFs at order 2; pin XY (no mixed info in a plus stencil) -> 5 unknowns
    fi = np.zeros(6)
    wt.fit_2D(xk=pts, fk=fk, xi=np.array([x0, y0]), fi=fi, sens=None,
              do_sens=False, order=2, knowns=wt.b2_XY,
              weighting_method=wt.WEIGHT_UNIFORM, debug=False)

    assert abs(fi[wt.i2_F] - f_c) < 1e-10
    assert abs(fi[wt.i2_X] - (f_xp - f_xm) / (2 * H)) < 1e-10
    assert abs(fi[wt.i2_Y] - (f_yp - f_ym) / (2 * H)) < 1e-10
    assert abs(fi[wt.i2_X2] - (f_xp - 2 * f_c + f_xm) / H**2) < 1e-8
    assert abs(fi[wt.i2_Y2] - (f_yp - 2 * f_c + f_ym) / H**2) < 1e-8
    assert fi[wt.i2_XY] == 0.0  # known, untouched


@pytest.mark.parametrize("func,x0,y0,z0", [
    (lambda x, y, z: np.sin(x) * np.cos(y) * np.exp(z), 0.2, 0.3, -0.1),
    (lambda x, y, z: np.exp(-0.5 * (x * x + y * y + z * z)), 0.1, -0.2, 0.3),
])
def test_3d_plus_stencil(func, x0, y0, z0):
    pts = np.array([
        [x0, y0, z0],
        [x0 + H, y0, z0], [x0 - H, y0, z0],
        [x0, y0 + H, z0], [x0, y0 - H, z0],
        [x0, y0, z0 + H], [x0, y0, z0 - H],
    ])
    fk = np.array([func(*p) for p in pts])
    f_c = fk[0]

    fi = np.zeros(10)
    wt.fit_3D(xk=pts, fk=fk, xi=np.array([x0, y0, z0]), fi=fi, sens=None,
              do_sens=False, order=2,
              knowns=wt.b3_XY | wt.b3_YZ | wt.b3_XZ,
              weighting_method=wt.WEIGHT_UNIFORM, debug=False)

    assert abs(fi[wt.i3_F] - f_c) < 1e-10
    assert abs(fi[wt.i3_X] - (fk[1] - fk[2]) / (2 * H)) < 1e-10
    assert abs(fi[wt.i3_Y] - (fk[3] - fk[4]) / (2 * H)) < 1e-10
    assert abs(fi[wt.i3_Z] - (fk[5] - fk[6]) / (2 * H)) < 1e-10
    assert abs(fi[wt.i3_X2] - (fk[1] - 2 * f_c + fk[2]) / H**2) < 1e-6
    assert abs(fi[wt.i3_Y2] - (fk[3] - 2 * f_c + fk[4]) / H**2) < 1e-6
    assert abs(fi[wt.i3_Z2] - (fk[5] - 2 * f_c + fk[6]) / H**2) < 1e-6
