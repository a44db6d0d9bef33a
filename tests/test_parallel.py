"""Parallel-variant equivalence.

In the reference, ``*_many_parallel`` runs the cases in OpenMP threads and a
historic data race made it diverge from the serial path; here both variants
lower to the same batched XLA program, but the API contract (bit-identical
results, ntasks accepted) still deserves a guard.
"""

import numpy as np

import wlsqm_tpu as wt


def _batch_2d(rng, ncases, npts):
    xk = rng.uniform(-1, 1, (ncases, npts, 2))
    fk = np.stack([
        j + (j + 1) * xk[j, :, 0] - 2.0 * xk[j, :, 1] for j in range(ncases)
    ])
    return xk, fk


def _batch_1d(rng, ncases, npts):
    xk = rng.uniform(-1, 1, (ncases, npts))
    fk = np.stack([j + (j + 1) * xk[j] for j in range(ncases)])
    return xk, fk


def test_2d_parallel_equals_serial(rng):
    ncases, npts = 32, 25
    xk, fk = _batch_2d(rng, ncases, npts)
    common = dict(
        nk=np.full(ncases, npts, np.int32), xi=np.zeros((ncases, 2)),
        sens=None, do_sens=False,
        order=np.ones(ncases, np.int32), knowns=np.zeros(ncases, np.int64),
        weighting_method=np.full(ncases, wt.WEIGHT_UNIFORM, np.int32),
        debug=False,
    )
    fi_serial = np.zeros((ncases, 3))
    wt.fit_2D_many(xk=xk, fk=fk, fi=fi_serial, **common)
    fi_par = np.zeros((ncases, 3))
    wt.fit_2D_many_parallel(xk=xk, fk=fk, fi=fi_par, ntasks=4, **common)

    np.testing.assert_allclose(fi_par, fi_serial, atol=1e-14)
    for j in range(ncases):
        assert abs(fi_par[j, 0] - j) < 1e-10
        assert abs(fi_par[j, 1] - (j + 1)) < 1e-10
        assert abs(fi_par[j, 2] + 2.0) < 1e-10


def test_1d_parallel_many_cases(rng):
    """64 cases with per-case distinct lines; each must come back right."""
    ncases, npts = 64, 25
    xk, fk = _batch_1d(rng, ncases, npts)
    fi = np.zeros((ncases, 2))
    wt.fit_1D_many_parallel(
        xk=xk, fk=fk, nk=np.full(ncases, npts, np.int32),
        xi=np.zeros(ncases), fi=fi, sens=None, do_sens=False,
        order=np.ones(ncases, np.int32), knowns=np.zeros(ncases, np.int64),
        weighting_method=np.full(ncases, wt.WEIGHT_UNIFORM, np.int32),
        ntasks=4, debug=False)
    for j in range(ncases):
        assert abs(fi[j, 0] - j) < 1e-10
        assert abs(fi[j, 1] - (j + 1)) < 1e-10


def test_1d_parallel_equals_serial(rng):
    ncases, npts = 20, 30
    xk, fk = _batch_1d(rng, ncases, npts)
    common = dict(
        nk=np.full(ncases, npts, np.int32), xi=np.zeros(ncases),
        sens=None, do_sens=False,
        order=np.full(ncases, 2, np.int32), knowns=np.zeros(ncases, np.int64),
        weighting_method=np.full(ncases, wt.WEIGHT_UNIFORM, np.int32),
        debug=False,
    )
    fi_serial = np.zeros((ncases, 3))
    wt.fit_1D_many(xk=xk, fk=fk, fi=fi_serial, **common)
    fi_par = np.zeros((ncases, 3))
    wt.fit_1D_many_parallel(xk=xk, fk=fk, fi=fi_par, ntasks=4, **common)
    np.testing.assert_allclose(fi_par, fi_serial, atol=1e-14)


def test_iterative_parallel_equals_serial(rng):
    ncases, npts = 16, 25
    xk, fk = _batch_2d(rng, ncases, npts)
    common = dict(
        nk=np.full(ncases, npts, np.int32), xi=np.zeros((ncases, 2)),
        sens=None, do_sens=False,
        order=np.ones(ncases, np.int32), knowns=np.zeros(ncases, np.int64),
        weighting_method=np.full(ncases, wt.WEIGHT_UNIFORM, np.int32),
        max_iter=5, debug=False,
    )
    fi_serial = np.zeros((ncases, 3))
    it_s = wt.fit_2D_iterative_many(xk=xk, fk=fk, fi=fi_serial, **common)
    fi_par = np.zeros((ncases, 3))
    it_p = wt.fit_2D_iterative_many_parallel(
        xk=xk, fk=fk, fi=fi_par, ntasks=4, **common)
    assert it_s == it_p
    np.testing.assert_allclose(fi_par, fi_serial, atol=1e-14)
