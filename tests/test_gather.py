"""Pallas window gather == plain ``u[idx]``, bit-exactly (interpret mode).

Throughput on hardware: benchmarks/run_ibvp_multifield.py.
"""

import numpy as np
import pytest

from wlsqm_tpu.ops import gather


def _local_idx(rng, n, B, K, spread=40):
    base = rng.integers(0, n, B)
    base.sort()
    return np.clip(base[:, None] + rng.integers(-spread, spread, (B, K)),
                   0, n - 1).astype(np.int32)


def test_morton_order_localizes_knn():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1, (4096, 2))
    perm = gather.morton_order(pts)
    assert sorted(perm.tolist()) == list(range(len(pts)))
    pts_m = pts[perm]
    # nearest neighbors of Morton-adjacent points are index-close: the
    # median kNN index span collapses vs the unordered cloud
    from wlsqm_tpu.utils.neighbors import knn

    idx_u, _ = knn(pts, pts, 16, backend="host")
    idx_m, _ = knn(pts_m, pts_m, 16, backend="host")
    span_u = np.median(np.ptp(np.asarray(idx_u), axis=1))
    span_m = np.median(np.ptp(np.asarray(idx_m), axis=1))
    assert span_m < span_u / 4


@pytest.mark.parametrize("F,dtype", [(1, np.float64), (3, np.float64),
                                     (2, np.float32)])
def test_gather_rows_bit_exact(F, dtype):
    rng = np.random.default_rng(1)
    n, B, K = 5000, 2048, 28
    idx = _local_idx(rng, n, B, K)
    plan = gather.plan_window_gather(idx, n)
    assert plan is not None
    u = rng.standard_normal((n, F) if F > 1 else n).astype(dtype)
    out = gather.gather_rows(u, idx, plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), u[idx])
    assert np.asarray(out).dtype == dtype


def test_gather_rows_ragged_tail():
    """B not a block multiple: padding cases are dropped exactly."""
    rng = np.random.default_rng(2)
    n, B, K = 3000, gather.BLOCK_T * 3 + 17, 11
    idx = _local_idx(rng, n, B, K, spread=25)
    plan = gather.plan_window_gather(idx, n)
    u = rng.standard_normal(n)
    out = gather.gather_rows(u, idx, plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), u[idx])


def test_plan_rejects_nonlocal_indices():
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 100000, (4096, 20)).astype(np.int32)
    assert gather.plan_window_gather(idx, 100000) is None


def test_plan_window_edge_cases():
    # indices hugging the end of the array: start clamps, n_pad covers
    n, K = 600, 8
    idx = np.full((gather.BLOCK_T, K), n - 1, np.int32)
    plan = gather.plan_window_gather(idx, n)
    assert plan is not None
    u = np.arange(n, dtype=np.float64)
    out = gather.gather_rows(u, idx, plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), u[idx])
