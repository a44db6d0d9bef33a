"""Drop-in ``wlsqm`` namespace: reference user code must run unchanged."""

import numpy as np


def test_reference_style_imports():
    import wlsqm
    from wlsqm.fitter import (  # noqa: F401
        defs, expert, impl, infra, interp, polyeval, simple,
    )
    from wlsqm.utils import lapackdrivers, ptrwrap  # noqa: F401
    from wlsqm.utils.lapackdrivers import ScalingAlgo  # noqa: F401

    for name in ("fit_1D", "fit_2D", "fit_3D",
                 "fit_1D_many_parallel", "fit_2D_many_parallel",
                 "fit_3D_many_parallel",
                 "ExpertSolver", "interpolate_fit", "lambdify_fit",
                 "WEIGHT_UNIFORM", "WEIGHT_CENTER",
                 "ALGO_BASIC", "ALGO_ITERATIVE",
                 "number_of_dofs", "__version__"):
        assert hasattr(wlsqm, name), "wlsqm.%s missing" % name


def test_reference_readme_example(rng):
    """The README example of the reference: fit f(x,y) = x² + y at (0,0)
    recovering (F, X, Y, X2, XY, Y2) = (f(0,0), 1? ...) — here with our own
    polynomial so the expected DOFs are unambiguous."""
    import wlsqm

    def f(xy):
        x, y = xy[..., 0], xy[..., 1]
        return 1.0 + 2.0 * x + 3.0 * y + 5.0 * x**2 + 2.0 * x * y
    xk = rng.uniform(-1, 1, (30, 2))
    fi = np.zeros(wlsqm.number_of_dofs(2, 2))
    wlsqm.fit_2D(xk=xk, fk=f(xk), xi=np.zeros(2), fi=fi, sens=None,
                 do_sens=False, order=2, knowns=0,
                 weighting_method=wlsqm.WEIGHT_UNIFORM, debug=False)
    np.testing.assert_allclose(
        fi, [1.0, 2.0, 3.0, 10.0, 2.0, 0.0], atol=1e-10)


def test_wlsqm_is_wlsqm_tpu():
    import wlsqm
    import wlsqm_tpu

    assert wlsqm.fit_2D is wlsqm_tpu.fit_2D
    assert wlsqm.ExpertSolver is wlsqm_tpu.ExpertSolver
    assert wlsqm.__version__ == wlsqm_tpu.__version__
