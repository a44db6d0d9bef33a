"""Response-surface modeling: WLSQM as a noise-robust surrogate builder.

The reference names response-surface modeling as a primary use case
(reference: README.md:29-34): fit a low-order polynomial surrogate to
noisy evaluations of an expensive black-box (simulation, experiment) over
a parameter domain, then work with the surrogate — query it anywhere,
read off gradients for free (the DOFs ARE the derivatives), optimize on
it.  This example:

  1. samples a noisy 2D objective on a space-filling design
     (the sudoku-LHS sampler, as the reference's examples do);
  2. fits one global order-4 surrogate centered mid-domain (a single
     WLSQM "neighborhood" containing every sample — weighted least
     squares IS response-surface regression);
  3. Newton-descends to the surrogate's minimum using the interpolated
     gradient/Hessian (all from `interpolate_fit`, no finite differences);
  4. cross-checks against the noiseless true minimizer.

Run: python examples/response_surface.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import wlsqm_tpu as wt
from sudoku_lhs import sample as sudoku_sample


def objective(xy):
    """A smooth bowl with mild asymmetry; minimum at (0.35, -0.2)."""
    x, y = xy[..., 0], xy[..., 1]
    return ((x - 0.35) ** 2 + 1.5 * (y + 0.2) ** 2
            + 0.3 * (x - 0.35) * (y + 0.2) + 0.1 * np.sin(x + y))


def main():
    rng = np.random.default_rng(123)

    # -- 1: space-filling design + noisy evaluations -----------------------
    design, _bins = sudoku_sample(dim=2, m=4, n_per_block=15, rng=rng)
    n = len(design)                              # 240 points in [0,1)^2
    pts = 2.0 * design - 1.0                     # parameter domain [-1,1]^2
    noise = 0.01
    fvals = objective(pts) + noise * rng.standard_normal(n)

    # -- 2: one global order-4 surrogate ----------------------------------
    xi = np.zeros(2)
    NO = wt.number_of_dofs(2, 4)
    fi = np.zeros(NO)
    wt.fit_2D(xk=pts, fk=fvals, xi=xi, fi=fi, sens=None, do_sens=False,
              order=4, knowns=0, weighting_method=wt.WEIGHT_UNIFORM,
              debug=False)

    # surrogate quality on a fresh grid
    g = np.stack(np.meshgrid(np.linspace(-0.9, 0.9, 25),
                             np.linspace(-0.9, 0.9, 25)), -1).reshape(-1, 2)
    pred = wt.interpolate_fit(xi, fi, dimension=2, order=4, x=g, diff=wt.i2_F)
    err = np.abs(pred - objective(g))
    print(f"surrogate max |err| on a fresh grid: {err.max():.3e} "
          f"(noise level {noise})")

    # -- 3: Newton descent on the surrogate (derivatives are free) --------
    p = np.array([-0.5, 0.6])
    for it in range(20):
        q = p[None, :]
        gx = wt.interpolate_fit(xi, fi, dimension=2, order=4, x=q, diff=wt.i2_X)[0]
        gy = wt.interpolate_fit(xi, fi, dimension=2, order=4, x=q, diff=wt.i2_Y)[0]
        hxx = wt.interpolate_fit(xi, fi, dimension=2, order=4, x=q, diff=wt.i2_X2)[0]
        hyy = wt.interpolate_fit(xi, fi, dimension=2, order=4, x=q, diff=wt.i2_Y2)[0]
        hxy = wt.interpolate_fit(xi, fi, dimension=2, order=4, x=q, diff=wt.i2_XY)[0]
        H = np.array([[hxx, hxy], [hxy, hyy]])
        grad = np.array([gx, gy])
        step = np.linalg.solve(H, grad)
        p = p - step
        if np.linalg.norm(step) < 1e-12:
            break

    true_min = np.array([0.35, -0.2])
    # the sin term shifts the true minimizer slightly; refine it numerically
    from scipy.optimize import minimize
    true_min = minimize(lambda z: objective(z[None, :])[0], true_min).x

    dist = np.linalg.norm(p - true_min)
    print(f"surrogate minimizer after {it + 1} Newton steps: "
          f"({p[0]:+.4f}, {p[1]:+.4f})")
    print(f"true minimizer:                              "
          f"({true_min[0]:+.4f}, {true_min[1]:+.4f})")
    print(f"distance: {dist:.2e}")
    assert dist < 0.05, "surrogate minimum drifted from the true minimum"
    print("OK")


if __name__ == "__main__":
    main()
