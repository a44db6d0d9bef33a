"""The batched linear-algebra driver layer (wlsqm_tpu.utils.lapackdrivers)."""

import numpy as np
import pytest

from wlsqm_tpu.utils.lapackdrivers import (
    ScalingAlgo,
    distribute_items,
    do_rescale,
    general,
    generalfactor,
    generalfactored,
    generals,
    mgeneral,
    rescale_columns,
    rescale_dgeequ,
    rescale_ruiz2001,
    rescale_scalgm,
    rescale_twopass,
    svd,
    symmetric,
    symmetricfactor,
    symmetricfactored,
    tridiag,
)


def test_tridiag():
    a = np.array([0.0, -1.0, -1.0, -1.0])
    b = np.array([2.0, 2.0, 2.0, 2.0])
    c = np.array([-1.0, -1.0, -1.0, 0.0])
    x = np.array([1.0, 0.0, 0.0, 1.0])
    tridiag(a, b, c, x)
    np.testing.assert_allclose(x, [0.625, 0.25, 0.5, 0.75], atol=1e-14)


def test_general_matches_numpy(rng):
    n = 5
    A0 = rng.standard_normal((n, n))
    b0 = rng.standard_normal(n)
    expected = np.linalg.solve(A0, b0)
    A = np.asfortranarray(A0.copy())
    b = b0.copy()
    general(A, b)
    np.testing.assert_allclose(b, expected, atol=1e-12)


def test_general_factor_then_solve(rng):
    n = 6
    A0 = rng.standard_normal((n, n)) + n * np.eye(n)
    b0 = rng.standard_normal(n)
    A = np.asfortranarray(A0.copy())
    ipiv = generalfactor(A)
    b = b0.copy()
    generalfactored(A, ipiv, b)
    np.testing.assert_allclose(b, np.linalg.solve(A0, b0), atol=1e-12)


def test_generals_multi_rhs(rng):
    n, nrhs = 5, 3
    A0 = rng.standard_normal((n, n)) + n * np.eye(n)
    B0 = rng.standard_normal((n, nrhs))
    A = np.asfortranarray(A0.copy())
    B = np.asfortranarray(B0.copy())
    generals(A, B)
    np.testing.assert_allclose(B, np.linalg.solve(A0, B0), atol=1e-12)


def test_mgeneral_batched(rng):
    n, nb = 4, 7
    A0 = rng.standard_normal((n, n, nb)) + n * np.eye(n)[:, :, None]
    b0 = rng.standard_normal((n, nb))
    A = np.asfortranarray(A0.copy())
    b = np.asfortranarray(b0.copy())
    mgeneral(A, b)
    for i in range(nb):
        np.testing.assert_allclose(
            b[:, i], np.linalg.solve(A0[:, :, i], b0[:, i]), atol=1e-10)


def test_symmetric_matches_numpy(rng):
    n = 5
    M = rng.standard_normal((n, n))
    A0 = (M + M.T) / 2 + n * np.eye(n)
    b0 = rng.standard_normal(n)
    A = np.asfortranarray(A0.copy())
    b = b0.copy()
    symmetric(A, b)
    np.testing.assert_allclose(b, np.linalg.solve(A0, b0), atol=1e-12)


def test_symmetric_factor_then_solve(rng):
    n = 5
    M = rng.standard_normal((n, n))
    A0 = (M + M.T) / 2 + n * np.eye(n)
    b0 = rng.standard_normal(n)
    A = np.asfortranarray(A0.copy())
    ipiv = symmetricfactor(A)
    b = b0.copy()
    symmetricfactored(A, ipiv, b)
    np.testing.assert_allclose(b, np.linalg.solve(A0, b0), atol=1e-12)


def test_rescale_columns_unit_norms(rng):
    A = np.asfortranarray(rng.standard_normal((4, 4)) * 100.0)
    rescale_columns(A)
    np.testing.assert_allclose(np.linalg.norm(A, axis=0), 1.0, atol=1e-12)


def test_rescale_twopass_equals_dispatch(rng):
    A0 = rng.standard_normal((4, 4)) * 100.0
    A1 = np.asfortranarray(A0.copy())
    A2 = np.asfortranarray(A0.copy())
    r1, c1 = rescale_twopass(A1)
    r2, c2 = do_rescale(A2, ScalingAlgo.ALGO_TWOPASS)
    np.testing.assert_allclose(r1, r2, atol=1e-14)
    np.testing.assert_allclose(c1, c2, atol=1e-14)
    np.testing.assert_allclose(A1, A2, atol=1e-14)


def test_ruiz_preserves_symmetry(rng):
    n = 4
    M = rng.standard_normal((n, n))
    A = np.asfortranarray((M + M.T) / 2 + n * np.eye(n))
    rescale_ruiz2001(A)
    np.testing.assert_allclose(A, A.T, atol=1e-12)


def test_ruiz_equilibrates_inf_norms(rng):
    A = np.asfortranarray(np.diag([1e8, 1.0, 1e-8]) + 0.1)
    rescale_ruiz2001(A)
    np.testing.assert_allclose(np.abs(A).max(axis=0), 1.0, atol=1e-8)
    np.testing.assert_allclose(np.abs(A).max(axis=1), 1.0, atol=1e-8)


def test_scalgm_equilibrates(rng):
    A = np.asfortranarray(np.diag([1e6, 1.0, 1e-6]) + 0.05)
    rescale_scalgm(A)
    np.testing.assert_allclose(np.abs(A).max(axis=0), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.abs(A).max(axis=1), 1.0, atol=1e-6)


def test_dgeequ_positive_factors():
    A = np.asfortranarray(np.array([[4.0, 1.0], [1.0, 3.0]]))
    r, c = rescale_dgeequ(A.copy(order="F"))
    assert (np.asarray(r) > 0).all() and (np.asarray(c) > 0).all()


def test_dgeequ_singular_raises():
    A = np.asfortranarray(np.array([[1.0, 1.0], [0.0, 0.0]]))
    with pytest.raises(np.linalg.LinAlgError):
        rescale_dgeequ(A)


def test_do_rescale_unknown_algo_raises():
    A = np.asfortranarray(np.eye(3))
    with pytest.raises(ValueError, match="Unknown algorithm"):
        do_rescale(A, 999)


def test_scaling_algo_is_intenum():
    import enum
    assert issubclass(ScalingAlgo, enum.IntEnum)
    assert int(ScalingAlgo.ALGO_DGEEQU) == 6
    assert ScalingAlgo.ALGO_TWOPASS == 3
    assert 3 == ScalingAlgo.ALGO_TWOPASS


def test_svd_descending(rng):
    A0 = rng.standard_normal((5, 5))
    s = svd(np.asfortranarray(A0.copy()))
    assert (np.diff(s) <= 0).all()
    np.testing.assert_allclose(
        s, np.linalg.svd(A0, compute_uv=False), atol=1e-12)


def test_distribute_items():
    bs, bi = distribute_items(10, 3)
    assert bs.sum() == 10
    np.testing.assert_array_equal(bi, [0, 4, 7])
    bs2, _ = distribute_items(2, 4)  # fewer items than tasks
    assert bs2.sum() == 2


# -----------------------------------------------------------------------------
# Batched m* families: one batched XLA program over the (n, n, nbatch) stack
# (reference OpenMP analogue: wlsqm/utils/lapackdrivers.pyx:1088-1354,
# 1551-1723).  Equivalence oracle: per-matrix NumPy solves.
# -----------------------------------------------------------------------------

def _sym_stack(rng, n, nb):
    M = rng.standard_normal((n, n, nb))
    S = (M + np.swapaxes(M, 0, 1)) / 2 + n * np.eye(n)[:, :, None]
    return S


def test_msymmetrize_vectorized(rng):
    from wlsqm_tpu.utils.lapackdrivers import msymmetrize, msymmetrizep

    n, nb = 5, 9
    A0 = rng.standard_normal((n, n, nb))
    A = np.asfortranarray(A0.copy())
    msymmetrize(A)
    for i in range(nb):
        U = np.triu(A0[:, :, i])
        np.testing.assert_array_equal(A[:, :, i], U + np.triu(A0[:, :, i], 1).T)
    A2 = np.asfortranarray(A0.copy())
    msymmetrizep(A2, ntasks=4)
    np.testing.assert_array_equal(A2, A)


def test_msymmetric_batched_equals_loop(rng):
    from wlsqm_tpu.utils.lapackdrivers import msymmetric, msymmetricp

    n, nb = 5, 11
    A0 = _sym_stack(rng, n, nb)
    # only the upper triangle is read (DSYSV contract): poison the lower
    A_in = A0.copy()
    il, jl = np.tril_indices(n, -1)
    A_in[il, jl, :] = 777.0
    b0 = rng.standard_normal((n, nb))
    A = np.asfortranarray(A_in.copy())
    b = np.asfortranarray(b0.copy())
    msymmetric(A, b)
    for i in range(nb):
        np.testing.assert_allclose(
            b[:, i], np.linalg.solve(A0[:, :, i], b0[:, i]), atol=1e-10)
    # *p alias
    A = np.asfortranarray(A_in.copy())
    b2 = np.asfortranarray(b0.copy())
    msymmetricp(A, b2, ntasks=4)
    np.testing.assert_array_equal(b2, b)


def test_msymmetricfactor_factored_pair(rng):
    from wlsqm_tpu.utils.lapackdrivers import (
        msymmetricfactor, msymmetricfactored,
        msymmetricfactorp, msymmetricfactoredp,
    )

    n, nb = 6, 8
    A0 = _sym_stack(rng, n, nb)
    A = np.asfortranarray(A0.copy())
    ipiv = np.zeros((n, nb), np.int32, order="F")
    msymmetricfactor(A, ipiv)
    # factor once, back-substitute twice with different data
    for seed in (1, 2):
        b0 = np.random.default_rng(seed).standard_normal((n, nb))
        b = np.asfortranarray(b0.copy())
        msymmetricfactored(A, ipiv, b)
        for i in range(nb):
            np.testing.assert_allclose(
                b[:, i], np.linalg.solve(A0[:, :, i], b0[:, i]), atol=1e-10)
    # *p aliases
    A2 = np.asfortranarray(A0.copy())
    ipiv2 = np.zeros((n, nb), np.int32, order="F")
    msymmetricfactorp(A2, ipiv2, ntasks=4)
    b0 = np.random.default_rng(1).standard_normal((n, nb))
    b = np.asfortranarray(b0.copy())
    msymmetricfactoredp(A2, ipiv2, b, ntasks=4)
    for i in range(nb):
        np.testing.assert_allclose(
            b[:, i], np.linalg.solve(A0[:, :, i], b0[:, i]), atol=1e-10)


def test_msymmetricfactor_dsytrf_interchange(rng):
    """Batched and single-matrix symmetric factor pairs interchange.

    The reference's msymmetricfactor produces dsytrf-format factors whose
    slices back-substitute through the single-matrix dsytrs pair and vice
    versa (reference: wlsqm/utils/lapackdrivers.pyx:1196-1354); pin the
    same contract here.
    """
    from wlsqm_tpu.utils.lapackdrivers import (
        msymmetricfactor, msymmetricfactored,
        symmetricfactor, symmetricfactored,
    )

    n, nb = 6, 8
    A0 = _sym_stack(rng, n, nb)
    A = np.asfortranarray(A0.copy())
    ipiv = np.zeros((n, nb), np.int32, order="F")
    msymmetricfactor(A, ipiv)
    # a slice of the batched factorization through the single-matrix family
    for i in (0, nb - 1):
        b0 = np.random.default_rng(3 + i).standard_normal(n)
        b = np.ascontiguousarray(b0.copy())
        symmetricfactored(np.asfortranarray(A[:, :, i]),
                          np.ascontiguousarray(ipiv[:, i]), b)
        np.testing.assert_allclose(
            b, np.linalg.solve(A0[:, :, i], b0), atol=1e-10)
    # single-matrix dsytrf factors assembled into the batched family
    Ab = np.asfortranarray(np.zeros_like(A0))
    ipivb = np.zeros((n, nb), np.int32, order="F")
    for i in range(nb):
        Ai = np.asfortranarray(A0[:, :, i].copy())
        ipivb[:, i] = symmetricfactor(Ai)
        Ab[:, :, i] = Ai
    b0 = np.random.default_rng(4).standard_normal((n, nb))
    bb = np.asfortranarray(b0.copy())
    msymmetricfactored(Ab, ipivb, bb)
    for i in range(nb):
        np.testing.assert_allclose(
            bb[:, i], np.linalg.solve(A0[:, :, i], b0[:, i]), atol=1e-10)


def test_mgeneralfactor_factored_pair(rng):
    from wlsqm_tpu.utils.lapackdrivers import (
        mgeneralfactor, mgeneralfactored,
    )

    n, nb = 6, 8
    A0 = rng.standard_normal((n, n, nb)) + n * np.eye(n)[:, :, None]
    A = np.asfortranarray(A0.copy())
    ipiv = np.zeros((n, nb), np.int32, order="F")
    mgeneralfactor(A, ipiv)
    for seed in (3, 4):
        b0 = np.random.default_rng(seed).standard_normal((n, nb))
        b = np.asfortranarray(b0.copy())
        mgeneralfactored(A, ipiv, b)
        for i in range(nb):
            np.testing.assert_allclose(
                b[:, i], np.linalg.solve(A0[:, :, i], b0[:, i]), atol=1e-10)


def test_mgeneralfactor_interops_with_single_matrix_dgetrs(rng):
    """The batched LU pair is dgetrf/dgetrs-format: a single slice of it
    back-substitutes through the scalar generalfactored()."""
    from wlsqm_tpu.utils.lapackdrivers import mgeneralfactor

    n, nb = 5, 4
    A0 = rng.standard_normal((n, n, nb)) + n * np.eye(n)[:, :, None]
    A = np.asfortranarray(A0.copy())
    ipiv = np.zeros((n, nb), np.int32, order="F")
    mgeneralfactor(A, ipiv)
    b0 = rng.standard_normal(n)
    b = b0.copy()
    generalfactored(np.asfortranarray(A[:, :, 2]), ipiv[:, 2].copy(), b)
    np.testing.assert_allclose(b, np.linalg.solve(A0[:, :, 2], b0), atol=1e-10)


def test_batched_timing_sanity(rng):
    """The batched dispatch must not degrade to per-matrix Python-loop cost:
    on a big stack one msymmetric call beats looping scipy per matrix.
    (Generous 'not slower' bound — CI machines vary; the point is catching
    a regression back to an O(nbatch) Python loop.)"""
    import time

    from wlsqm_tpu.utils.lapackdrivers import msymmetric, symmetric

    n, nb = 15, 4096
    A0 = _sym_stack(rng, n, nb)
    b0 = rng.standard_normal((n, nb))

    # warm up, then best-of-3 each way (robust to CI machine load)
    A = np.asfortranarray(A0.copy()); b = np.asfortranarray(b0.copy())
    msymmetric(A, b)

    t_batched = np.inf
    for _ in range(3):
        A = np.asfortranarray(A0.copy()); b = np.asfortranarray(b0.copy())
        t0 = time.perf_counter()
        msymmetric(A, b)
        t_batched = min(t_batched, time.perf_counter() - t0)

    t_loop = np.inf
    for _ in range(3):
        A = np.asfortranarray(A0.copy()); b1 = np.asfortranarray(b0.copy())
        t0 = time.perf_counter()
        for i in range(nb):
            symmetric(A[:, :, i], b1[:, i])
        t_loop = min(t_loop, time.perf_counter() - t0)

    np.testing.assert_allclose(b, b1, atol=1e-10)
    assert t_batched < t_loop * 1.5, (t_batched, t_loop)


def test_rescale_rows_unit_norms(rng):
    from wlsqm_tpu.utils.lapackdrivers import rescale_rows

    A0 = rng.standard_normal((6, 4))
    A = np.asfortranarray(A0.copy())
    rs, cs = rescale_rows(A)
    np.testing.assert_allclose(np.linalg.norm(A, axis=1), 1.0, atol=1e-12)
    # returned factors reproduce the scaling
    np.testing.assert_allclose(A, A0 * rs[:, None] * cs[None, :], atol=1e-14)


# -----------------------------------------------------------------------------
# Remaining compat-surface variants: analytic 2x2, multi-RHS symmetric,
# the *p aliases, copies/symmetrization, and the scaling-vector helpers
# (reference: wlsqm/utils/lapackdrivers.pyx naming scheme at :5-27)
# -----------------------------------------------------------------------------


def test_general2x2_symmetric2x2_analytic(rng):
    from wlsqm_tpu.utils.lapackdrivers import general2x2, symmetric2x2

    A0 = rng.standard_normal((2, 2)) + 2 * np.eye(2)
    b0 = rng.standard_normal(2)
    b = b0.copy()
    general2x2(A0.copy(), b)
    np.testing.assert_allclose(b, np.linalg.solve(A0, b0), atol=1e-13)

    S0 = A0 + A0.T
    b = b0.copy()
    symmetric2x2(S0.copy(), b)
    np.testing.assert_allclose(b, np.linalg.solve(S0, b0), atol=1e-13)


def test_symmetrics_multi_rhs_and_parallel_alias(rng):
    from wlsqm_tpu.utils.lapackdrivers import symmetrics, symmetricsp

    n, nrhs = 5, 3
    A0 = rng.standard_normal((n, n))
    A0 = A0 + A0.T + n * np.eye(n)
    B0 = rng.standard_normal((n, nrhs))
    want = np.linalg.solve(A0, B0)

    B = np.asfortranarray(B0.copy())
    symmetrics(np.asfortranarray(A0.copy()), B)
    np.testing.assert_allclose(B, want, atol=1e-12)

    B = np.asfortranarray(B0.copy())
    symmetricsp(np.asfortranarray(A0.copy()), B, ntasks=4)
    np.testing.assert_allclose(B, want, atol=1e-12)


def test_parallel_aliases_match_serial(rng):
    """The *p entries are API-compat aliases: identical results."""
    from wlsqm_tpu.utils.lapackdrivers import (
        generals, generalsp, mgeneral, mgeneralp,
    )

    n, nrhs, nb = 5, 3, 6
    A0 = rng.standard_normal((n, n)) + n * np.eye(n)
    B0 = rng.standard_normal((n, nrhs))
    B1 = np.asfortranarray(B0.copy())
    B2 = np.asfortranarray(B0.copy())
    generals(np.asfortranarray(A0.copy()), B1)
    generalsp(np.asfortranarray(A0.copy()), B2, ntasks=3)
    np.testing.assert_array_equal(B1, B2)

    Ab0 = rng.standard_normal((n, n, nb)) + n * np.eye(n)[:, :, None]
    bb0 = rng.standard_normal((n, nb))
    b1 = np.asfortranarray(bb0.copy())
    b2 = np.asfortranarray(bb0.copy())
    mgeneral(np.asfortranarray(Ab0.copy()), b1)
    mgeneralp(np.asfortranarray(Ab0.copy()), b2, ntasks=3)
    np.testing.assert_array_equal(b1, b2)


def test_mgeneralfactorp_factoredp_pair(rng):
    from wlsqm_tpu.utils.lapackdrivers import (
        mgeneralfactoredp, mgeneralfactorp,
    )

    n, nb = 5, 6
    A0 = rng.standard_normal((n, n, nb)) + n * np.eye(n)[:, :, None]
    A = np.asfortranarray(A0.copy())
    ipiv = np.zeros((n, nb), np.int32, order="F")
    mgeneralfactorp(A, ipiv, ntasks=4)
    b0 = rng.standard_normal((n, nb))
    b = np.asfortranarray(b0.copy())
    mgeneralfactoredp(A, ipiv, b, ntasks=4)
    for i in range(nb):
        np.testing.assert_allclose(
            b[:, i], np.linalg.solve(A0[:, :, i], b0[:, i]), atol=1e-10)


def test_copies_and_symmetrize(rng):
    from wlsqm_tpu.utils.lapackdrivers import (
        copygeneral, copysymmu, symmetrize,
    )

    n = 4
    I = rng.standard_normal((n, n))
    O = np.zeros((n, n))
    copygeneral(O, I)
    np.testing.assert_array_equal(O, I)

    O = np.full((n, n), 99.0)
    copysymmu(O, I)                 # upper triangle of I into BOTH triangles
    want = np.triu(I) + np.triu(I, 1).T
    np.testing.assert_array_equal(O, want)
    np.testing.assert_array_equal(O, O.T)

    A = I.copy()
    symmetrize(A)                   # in place from the upper triangle
    np.testing.assert_array_equal(A, want)


def test_init_apply_scaling(rng):
    from wlsqm_tpu.utils.lapackdrivers import apply_scaling, init_scaling

    n, m = 3, 4
    rs, cs = init_scaling(n, m)
    np.testing.assert_array_equal(rs, np.ones(n))
    np.testing.assert_array_equal(cs, np.ones(m))

    A0 = rng.standard_normal((n, m))
    A = A0.copy()
    rs = rng.uniform(0.5, 2.0, n)
    cs = rng.uniform(0.5, 2.0, m)
    apply_scaling(A, rs, cs)
    np.testing.assert_allclose(A, A0 * rs[:, None] * cs[None, :],
                               rtol=0, atol=1e-15)
