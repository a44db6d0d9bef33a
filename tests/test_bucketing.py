"""Group-by-order bucketing in ``fit_many(backend="auto")``.

Mixed-order batches are split into homogeneous groups; groups large enough
to fill a kernel TILE route through the fused Pallas path, the remainder
through the masked XLA path, and the results merge back in the caller's
case order.  (The reference handles mixed per-case orders by index
remapping inside one loop — wlsqm/fitter/simple.pyx:606ff; here masking is
the semantics and bucketing is the throughput optimization.)

The fused kernel only runs compiled on accelerators, so these tests stub
``fit_pallas`` with an f64-engine equivalent and fake a non-CPU backend:
that exercises the grouping, padding, scatter and leftover-merge logic
deterministically on the CPU test mesh.
"""

import numpy as np
import jax
import pytest

import wlsqm_tpu as wt
from wlsqm_tpu import api
from wlsqm_tpu.fitter import defs
from wlsqm_tpu.ops import pallas_fit


def _cloud(B, K, seed):
    # O(1)-radius neighborhoods with comfortable overdetermination so the
    # conditioning probe (condprobe.kernel_accuracy_ok) accepts the order-4
    # groups; tighter geometry is exercised in tests/test_autorouting.py
    rng = np.random.default_rng(seed)
    xi = rng.uniform(-1.0, 1.0, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-1.0, 1.0, (B, K, 2))
    fk = np.sin(xk[..., 0]) * np.cos(xk[..., 1])
    return xk, fk, xi


def _stub_fit_pallas(calls):
    """A fit_pallas lookalike backed by the f64 XLA engine."""

    def stub(xk, fk, nk, xi, fi_init=None, *, dimension, order, weighting,
             knowns=0, emit_cond=False, **kw):
        calls.append((int(xk.shape[0]), int(order)))
        res = api.fit_many(xk, fk, xi, nk=nk, order=order, knowns=knowns,
                           fi_init=fi_init, weighting=weighting,
                           backend="xla")
        if emit_cond:
            # all-certified key: the split's tail stays empty, so the
            # grouping/scatter logic under test is unchanged
            import jax.numpy as jnp

            return res.fi, jnp.zeros((xk.shape[0],), jnp.float64)
        return res.fi

    return stub


@pytest.fixture
def fake_tpu(monkeypatch):
    calls = []
    monkeypatch.setattr(pallas_fit, "fit_pallas", _stub_fit_pallas(calls))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    return calls


def test_mixed_order_bucketing_merges(fake_tpu):
    T = pallas_fit.TILE
    B, K = 2 * T + 7, 40  # order-4 NO=15 -> margin needs K >= 22
    xk, fk, xi = _cloud(B, K, 42)
    rng = np.random.default_rng(1)
    order = np.where(rng.random(B) < 0.5, 2, 4).astype(np.int32)
    # make both groups >= TILE
    order[:T] = 2
    order[T:2 * T] = 4

    ref = api.fit_many(xk, fk, xi, order=order, backend="xla")
    got = api.fit_many(xk, fk, xi, order=order, backend="auto")

    assert len(fake_tpu) == 2  # one kernel call per big group
    sizes = sorted(c[0] for c in fake_tpu)
    assert all(s % pallas_fit.TILE == 0 for s in sizes)  # padded to TILE
    np.testing.assert_allclose(np.asarray(got.fi), np.asarray(ref.fi),
                               rtol=0, atol=1e-10)
    # order-2 rows keep inactive high-order DOFs at zero
    no2 = defs.number_of_dofs(2, 2)
    assert np.all(np.asarray(got.fi)[order == 2, no2:] == 0.0)


def test_small_group_falls_back_to_xla(fake_tpu):
    T = pallas_fit.TILE
    B, K = T + 16, 40
    xk, fk, xi = _cloud(B, K, 7)
    order = np.full(B, 4, np.int32)
    order[:16] = 1  # tiny group: below TILE, must go through the XLA pass

    ref = api.fit_many(xk, fk, xi, order=order, backend="xla")
    got = api.fit_many(xk, fk, xi, order=order, backend="auto")

    assert [c[1] for c in fake_tpu] == [4]  # only the big group hit the kernel
    np.testing.assert_allclose(np.asarray(got.fi), np.asarray(ref.fi),
                               rtol=0, atol=1e-10)


def test_margin_guard_keeps_near_determined_on_xla(fake_tpu):
    # K below 1.5*NO: auto must NOT route to the kernel (ds floor visible
    # on near-determined systems)
    B, K = pallas_fit.TILE, 18  # NO=15 -> margin needs 22
    xk, fk, xi = _cloud(B, K, 3)
    got = api.fit_many(xk, fk, xi, order=4, backend="auto")
    assert fake_tpu == []
    assert bool(got.ok.all())


def test_knowns_split_routes_free_cases_to_kernel(fake_tpu):
    """knowns!=0 cases (e.g. Neumann boundary points) go through the masked
    XLA pass; the interior knowns==0 majority still hits the kernel."""
    T = pallas_fit.TILE
    B, K = T + 40, 40
    xk, fk, xi = _cloud(B, K, 11)
    knowns = np.zeros(B, np.int64)
    knowns[-40:] = defs.b2_F  # "boundary" cases with F known
    fi_init = np.zeros((B, defs.number_of_dofs(2, 4)))
    fi_init[-40:, 0] = 0.25   # the known F values

    ref = api.fit_many(xk, fk, xi, order=4, knowns=knowns, fi_init=fi_init,
                       backend="xla")
    got = api.fit_many(xk, fk, xi, order=4, knowns=knowns, fi_init=fi_init,
                       backend="auto")

    assert [c[1] for c in fake_tpu] == [4]   # only the free group
    assert fake_tpu[0][0] % pallas_fit.TILE == 0
    np.testing.assert_allclose(np.asarray(got.fi), np.asarray(ref.fi),
                               rtol=0, atol=1e-10)
    # known F stayed at its prescribed value on the boundary cases
    np.testing.assert_array_equal(np.asarray(got.fi)[-40:, 0], 0.25)
