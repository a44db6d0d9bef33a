"""fit_stream: chunked fitting of clouds larger than device memory.

Covers the slicing/padding/overlap logic the streaming loop adds on top of
fit_many: memmap input, a chunk size that does not divide the batch (the
last chunk is padded with duplicated cases), per-case parameter arrays
sliced along with the geometry, and the in-flight overlap writeback order.
"""

import numpy as np
import pytest

from wlsqm_tpu import api
from wlsqm_tpu.fitter import defs


def _problem(rng, B, K=12, dim=2):
    xi = rng.uniform(-1, 1, (B, dim))
    xk = xi[:, None, :] + rng.uniform(-0.5, 0.5, (B, K, dim))
    fk = np.sin(xk[..., 0]) + 0.5 * xk[..., 1] ** 2
    return xk, fk, xi


def test_stream_equals_fit_many_nondivisible_chunk(rng):
    B = 103   # 3 chunks of 40 + a 23-case partial tail
    xk, fk, xi = _problem(rng, B)
    res_s = api.fit_stream(xk, fk, xi, chunk=40, order=2)
    res_m = api.fit_many(xk, fk, xi, order=2)
    np.testing.assert_array_equal(res_s.fi, np.asarray(res_m.fi))
    assert isinstance(res_s.fi, np.ndarray)
    assert res_s.fi.shape == (B, defs.number_of_dofs(2, 2))


def test_stream_per_case_parameter_arrays(rng):
    """order/knowns/weighting/fi_init arrays must be sliced per chunk in
    lockstep with the geometry — a mis-sliced parameter array would pair
    case i's geometry with case j's order."""
    B = 77
    xk, fk, xi = _problem(rng, B, K=16)
    order = np.where(np.arange(B) % 3 == 0, 1, 2).astype(np.int32)
    knowns = np.where(np.arange(B) % 5 == 0, int(defs.b2_F), 0).astype(np.int64)
    NO = defs.number_of_dofs(2, 2)
    fi_init = np.zeros((B, NO))
    fi_init[:, 0] = np.arange(B) * 0.01   # distinct known F per case
    weighting = np.where(np.arange(B) % 2 == 0, defs.WEIGHT_UNIFORM,
                         defs.WEIGHT_CENTER).astype(np.int32)

    res_s = api.fit_stream(xk, fk, xi, chunk=32, order=order, knowns=knowns,
                           weighting=weighting, fi_init=fi_init, max_order=2)
    res_m = api.fit_many(xk, fk, xi, order=order, knowns=knowns,
                         weighting=weighting, fi_init=fi_init, max_order=2)
    np.testing.assert_array_equal(res_s.fi, np.asarray(res_m.fi))
    # prescribed knowns flow through per case
    kn = np.arange(B) % 5 == 0
    np.testing.assert_array_equal(res_s.fi[kn, 0], fi_init[kn, 0])


def test_stream_memmap_input_and_out(rng, tmp_path):
    B, K = 61, 12
    xk, fk, xi = _problem(rng, B, K=K)
    mm_path = tmp_path / "xk.dat"
    mm = np.memmap(mm_path, dtype=np.float64, mode="w+", shape=(B, K, 2))
    mm[:] = xk
    mm.flush()
    out = np.zeros((B, defs.number_of_dofs(2, 2)))
    res = api.fit_stream(np.memmap(mm_path, dtype=np.float64, mode="r",
                                   shape=(B, K, 2)),
                         fk, xi, chunk=16, order=2, out=out)
    assert res.fi is out
    ref = api.fit_many(xk, fk, xi, order=2)
    np.testing.assert_array_equal(out, np.asarray(ref.fi))


def test_stream_iterative_returns_counts(rng):
    B = 50
    xk, fk, xi = _problem(rng, B, K=14)
    res = api.fit_stream(xk, fk, xi, chunk=24, order=2, iterative=True,
                         max_iter=3)
    ref = api.fit_many(xk, fk, xi, order=2, iterative=True, max_iter=3)
    np.testing.assert_array_equal(res.fi, np.asarray(ref.fi))
    np.testing.assert_array_equal(res.iterations, np.asarray(ref.iterations))
    assert res.iterations.max() >= 1


def test_stream_rejects_do_sens(rng):
    xk, fk, xi = _problem(rng, 8)
    with pytest.raises(ValueError, match="do_sens"):
        api.fit_stream(xk, fk, xi, chunk=4, do_sens=True)


def test_stream_out_shape_validated(rng):
    xk, fk, xi = _problem(rng, 8)
    with pytest.raises(ValueError, match="out must have shape"):
        api.fit_stream(xk, fk, xi, chunk=4, order=2, out=np.zeros((8, 3)))


def _mesh_or_skip():
    import jax
    from wlsqm_tpu.parallel import sharding
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return sharding.make_mesh()


def test_stream_sharded_equals_fit_many(rng):
    """fit_stream(mesh=...) — chunked streaming with each chunk sharded
    over the 8-device mesh — is bit-identical to a single unsharded
    fit_many of the whole cloud under the same plan (the streaming
    analogue of the sharded ≡ single-device equivalence contract)."""
    B = 150   # 4 chunks at step 40 (= ceil(40/8)*8), padded tail of 30
    xk, fk, xi = _problem(rng, B, K=14)
    mesh = _mesh_or_skip()
    plan = api.plan_fit_many(xk, xi, order=2)
    res_s = api.fit_stream(xk, fk, xi, chunk=40, order=2, mesh=mesh,
                           plan=plan)
    res_m = api.fit_many(xk, fk, xi, order=2, plan=plan)
    np.testing.assert_array_equal(res_s.fi, np.asarray(res_m.fi))
    assert isinstance(res_s.fi, np.ndarray)


def test_stream_sharded_heterogeneous_nk_and_counts(rng):
    """Ragged neighbor counts and iteration counts survive the sharded
    stream (the counts are gathered per chunk from every shard)."""
    B, K = 96, 16
    xk, fk, xi = _problem(rng, B, K=K)
    nk = rng.integers(10, K + 1, B).astype(np.int32)
    mesh = _mesh_or_skip()
    plan = api.plan_fit_many(xk, xi, nk=nk, order=2, iterative=True)
    res_s = api.fit_stream(xk, fk, xi, nk=nk, chunk=32, order=2,
                           iterative=True, max_iter=3, mesh=mesh, plan=plan)
    res_m = api.fit_many(xk, fk, xi, nk=nk, order=2, iterative=True,
                         max_iter=3, plan=plan)
    np.testing.assert_array_equal(res_s.fi, np.asarray(res_m.fi))
    np.testing.assert_array_equal(res_s.iterations,
                                  np.asarray(res_m.iterations))
    assert res_s.iterations.max() >= 1


def test_stream_sharded_per_case_arrays(rng):
    """Heterogeneous per-case order/knowns/weighting/fi_init over a mesh:
    the sharded stream groups cases by configuration, streams each group
    through its own compiled shard_map body, and scatters results back —
    bit-identical to one unsharded fit_many of the whole mixed batch."""
    B = 77
    xk, fk, xi = _problem(rng, B, K=16)
    order = np.where(np.arange(B) % 3 == 0, 1, 2).astype(np.int32)
    knowns = np.where(np.arange(B) % 5 == 0, int(defs.b2_F), 0).astype(np.int64)
    NO = defs.number_of_dofs(2, 2)
    fi_init = np.zeros((B, NO))
    fi_init[:, 0] = np.arange(B) * 0.01
    weighting = np.where(np.arange(B) % 2 == 0, defs.WEIGHT_UNIFORM,
                         defs.WEIGHT_CENTER).astype(np.int32)
    mesh = _mesh_or_skip()

    res_s = api.fit_stream(xk, fk, xi, chunk=32, order=order, knowns=knowns,
                           weighting=weighting, fi_init=fi_init, max_order=2,
                           mesh=mesh)
    res_m = api.fit_many(xk, fk, xi, order=order, knowns=knowns,
                         weighting=weighting, fi_init=fi_init, max_order=2)
    np.testing.assert_array_equal(res_s.fi, np.asarray(res_m.fi))
    kn = np.arange(B) % 5 == 0
    np.testing.assert_array_equal(res_s.fi[kn, 0], fi_init[kn, 0])


def test_stream_sharded_mixed_order_iterative_counts(rng):
    """Mixed-order sharded stream with iterative refinement: per-case
    iteration counts must scatter back to the right cases."""
    B = 60
    xk, fk, xi = _problem(rng, B, K=14)
    order = np.where(np.arange(B) % 2 == 0, 2, 1).astype(np.int32)
    mesh = _mesh_or_skip()
    res_s = api.fit_stream(xk, fk, xi, chunk=24, order=order, max_order=2,
                           iterative=True, max_iter=3, mesh=mesh)
    res_m = api.fit_many(xk, fk, xi, order=order, max_order=2,
                         iterative=True, max_iter=3)
    np.testing.assert_array_equal(res_s.fi, np.asarray(res_m.fi))
    np.testing.assert_array_equal(res_s.iterations,
                                  np.asarray(res_m.iterations))
    assert res_s.iterations.max() >= 1
