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


def test_dual_window_seam_crossing():
    """Blocks mixing two far-apart index clusters (a space-filling-curve
    seam) are covered by the second DMA window, bit-exactly."""
    rng = np.random.default_rng(9)
    n, B, K = 50000, 1024, 16
    base = rng.integers(0, 400, (B, 1))
    idx = (base + rng.integers(0, 40, (B, K))).astype(np.int32)
    # half of each block's cases read from a far cluster
    far = (45000 + base + rng.integers(0, 40, (B, K))).astype(np.int32)
    sel = rng.random((B, K)) < 0.5
    idx = np.where(sel, far, idx)
    plan = gather.plan_window_gather(idx, n)
    assert plan is not None and plan.coverage == 1.0
    u = rng.standard_normal(n)
    out = gather.gather_rows(u, idx, plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), u[idx])


@pytest.mark.parametrize("F", [1, 2])
def test_gather_rows_pair_exact(F):
    """ds-pair gather: both f32 planes come through bit-exactly."""
    import jax.numpy as jnp

    from wlsqm_tpu.ops import twofloat as tf

    rng = np.random.default_rng(5)
    n, B, K = 5000, 1024, 24
    idx = _local_idx(rng, n, B, K)
    plan = gather.plan_window_gather(idx, n)
    assert plan is not None
    u = rng.standard_normal((n, F) if F > 1 else n)
    up = tf.from_f64(jnp.asarray(u))
    hi, lo = gather.gather_rows_pair(up, idx, plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(up[0])[idx])
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(up[1])[idx])
    assert np.asarray(hi).dtype == np.float32


def test_gather_shape_validation():
    """Mismatched (hi, lo) planes or a u/plan length mismatch raise a
    clear ValueError instead of an opaque kernel-shape error."""
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    n, B, K = 4000, 512, 16
    idx = _local_idx(rng, n, B, K)
    plan = gather.plan_window_gather(idx, n)
    assert plan is not None
    u = jnp.asarray(rng.standard_normal(n))
    with pytest.raises(ValueError, match="identical shapes"):
        gather.gather_rows_pair((u.astype(jnp.float32),
                                 jnp.zeros(n - 1, jnp.float32)),
                                idx, plan, interpret=True)
    with pytest.raises(ValueError, match="rebuild the plan"):
        gather.gather_rows(jnp.zeros(n + 128), idx, plan, interpret=True)
    with pytest.raises(ValueError, match="rebuild the plan"):
        gather.gather_rows_pair((jnp.zeros(n - 8, jnp.float32),
                                 jnp.zeros(n - 8, jnp.float32)),
                                idx, plan, interpret=True)


def test_gather_rows_pair_overflow_fallback():
    """Pair gather merges XLA-fallback rows for overflow blocks exactly."""
    import jax.numpy as jnp

    from wlsqm_tpu.ops import twofloat as tf

    rng = np.random.default_rng(11)
    n, B, K = 60000, 256, 12
    base = rng.integers(0, 200, (B, 1))
    idx = (base + rng.integers(0, 30, (B, K))).astype(np.int32)
    blk = np.arange(B) // gather.BLOCK_T
    three = blk % 4 == 0
    c2 = 30000 + rng.integers(0, 30, (B, K))
    c3 = 59000 + rng.integers(0, 30, (B, K))
    pick = rng.integers(0, 3, (B, K))
    idx = np.where(three[:, None] & (pick == 1), c2, idx)
    idx = np.where(three[:, None] & (pick == 2), c3, idx)
    plan = gather.plan_window_gather(idx.astype(np.int32), n)
    assert plan is not None and plan.bad_blocks
    up = tf.from_f64(jnp.asarray(rng.standard_normal(n)))
    hi, lo = gather.gather_rows_pair(up, idx.astype(np.int32), plan,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(up[0])[idx])
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(up[1])[idx])


def test_overflow_blocks_fall_back_to_xla_rows():
    """A minority of three-cluster blocks routes through the XLA gather
    for exactly their rows; the merged result is still bit-exact."""
    rng = np.random.default_rng(10)
    n, B, K = 60000, 512, 12
    base = rng.integers(0, 200, (B, 1))
    idx = (base + rng.integers(0, 30, (B, K))).astype(np.int32)
    # every 8th block gets indices from THREE far-apart clusters
    blk = np.arange(B) // gather.BLOCK_T
    three = blk % 8 == 0
    c2 = 30000 + rng.integers(0, 30, (B, K))
    c3 = 59000 + rng.integers(0, 30, (B, K))
    pick = rng.integers(0, 3, (B, K))
    idx = np.where(three[:, None] & (pick == 1), c2, idx)
    idx = np.where(three[:, None] & (pick == 2), c3, idx)
    plan = gather.plan_window_gather(idx.astype(np.int32), n)
    assert plan is not None
    assert 0 < len(plan.bad_blocks) < plan.nblk
    u = rng.standard_normal((n, 2))
    out = gather.gather_rows(u, idx.astype(np.int32), plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), u[idx])


def test_pair_gather_bf16_chunks(rng):
    """The TPU fast path's exact 3-chunk bf16 payload encoding selects
    bit-identically to the f32 path (selection by 0/1 never mixes
    values; chunk re-sum is exact)."""
    import jax.numpy as jnp

    from wlsqm_tpu.ops import gather as gth
    from wlsqm_tpu.ops import twofloat as tf

    n, B, K = 4096, 512, 12
    pts = rng.uniform(-1, 1, (n, 2))
    pts = pts[gth.morton_order(pts)]
    idx = np.stack([(np.arange(B) * 7 + k * 3) % n for k in range(K)], 1)
    plan = gth.plan_window_gather(idx, n)
    u = rng.standard_normal(n)
    up = tf.from_f64(jnp.asarray(u))
    ref_hi, ref_lo = (np.asarray(up[0])[idx], np.asarray(up[1])[idx])
    out_hi, out_lo = gth.gather_rows_pair(up, jnp.asarray(idx), plan,
                                          interpret=True, chunk_bf16=True)
    np.testing.assert_array_equal(np.asarray(out_hi), ref_hi)
    np.testing.assert_array_equal(np.asarray(out_lo), ref_lo)
