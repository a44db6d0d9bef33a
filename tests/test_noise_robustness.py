"""Statistical robustness: first derivatives survive moderate Gaussian noise.

The least-squares averaging denoises first derivatives well below the noise
magnitude; second derivatives are deliberately NOT checked (noise enters them
at ~1/h², and no reasonable tolerance makes that a stable regression test).
"""

import numpy as np

import wlsqm_tpu as wt


def test_linear_first_derivatives_under_noise(rng):
    def truth(xy):
        return 2.0 * xy[..., 0] + 3.0 * xy[..., 1]

    npts, sigma = 200, 0.01
    xk = rng.uniform(-1, 1, (npts, 2))
    fk = truth(xk) + rng.normal(0.0, sigma, npts)

    fi = np.zeros(wt.number_of_dofs(2, 1))
    wt.fit_2D(xk=xk, fk=fk, xi=np.zeros(2), fi=fi, sens=None, do_sens=False,
              order=1, knowns=0, weighting_method=wt.WEIGHT_UNIFORM,
              debug=False)

    # expected slope error ~ sigma / sqrt(npts * var(x)) ~ 0.0012; 0.02 is
    # ~2x the worst plausible seed while catching an order-of-magnitude break
    assert abs(fi[wt.i2_X] - 2.0) < 0.02
    assert abs(fi[wt.i2_Y] - 3.0) < 0.02
    assert abs(fi[wt.i2_F]) < 0.02


def test_quadratic_gradient_under_noise(rng):
    def truth(xy):
        x, y = xy[..., 0], xy[..., 1]
        return 1.0 + 2.0 * x + 3.0 * y + 0.5 * x**2 - y**2

    npts, sigma = 200, 0.01
    xk = rng.uniform(-1, 1, (npts, 2))
    fk = truth(xk) + rng.normal(0.0, sigma, npts)

    fi = np.zeros(wt.number_of_dofs(2, 2))
    wt.fit_2D(xk=xk, fk=fk, xi=np.zeros(2), fi=fi, sens=None, do_sens=False,
              order=2, knowns=0, weighting_method=wt.WEIGHT_UNIFORM,
              debug=False)

    assert abs(fi[wt.i2_X] - 2.0) < 0.05
    assert abs(fi[wt.i2_Y] - 3.0) < 0.05
