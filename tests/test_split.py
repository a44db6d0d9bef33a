"""Per-case certified split route (round 5).

The split route serves batches whose conditioning profile certifies most
cases for the fast moments-ds/dsts body while a tail needs ts: the fast
kernel fits ALL cases and emits a per-case certification key
(``emit_cond``), and only the cases whose key exceeds the calibrated
edge are re-solved by the ts kernel (reference counterpart: the
reference runs every case on one path with Ruiz scaling and no
certification at all — wlsqm/fitter/impl.pyx:620-689; the split keeps
its speed AND adds the per-case accuracy contract).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from wlsqm_tpu import api
from wlsqm_tpu.fitter import calibration, condprobe, defs, ladder
from wlsqm_tpu.ops import pallas_fit


def _fake_units(monkeypatch, **kw):
    rec = dict(ds_unit=2e-15, ds_cert_unit=1.25e-14, ts_parity_unit=7e-16,
               beyond_parity_floor=1e-8, kernel_max_floor=1e-3)
    rec.update(kw)
    cal = calibration.DeviceCalibration(**rec, certified=True,
                                        source="measured")
    monkeypatch.setattr(condprobe, "_units", lambda: cal)
    return cal


def test_split_partition_choice_prefers_deeper_dsts(monkeypatch):
    _fake_units(monkeypatch, est_ds_cert_unit_m=2.26e-14,
                est_dsts_cert_unit_m=1.6e-14, est_ts_parity_unit_m=4.9e-16)
    prec, edge = condprobe.split_partition_choice()
    assert prec == "dsts"
    assert edge == pytest.approx(1e-10 / (4 * 1.6e-14))


def test_split_partition_choice_ds_when_dsts_gain_small(monkeypatch):
    # dsts edge only 1.1x the ds edge: not worth its extra sweep cost
    _fake_units(monkeypatch, est_ds_cert_unit_m=1.76e-14,
                est_dsts_cert_unit_m=1.6e-14)
    prec, _ = condprobe.split_partition_choice()
    assert prec == "ds"


def test_split_partition_choice_requires_calibration(monkeypatch):
    _fake_units(monkeypatch)    # no est units recorded
    assert condprobe.split_partition_choice() is None
    cal = _fake_units(monkeypatch, est_dsts_cert_unit_m=1.6e-14)
    monkeypatch.setattr(condprobe, "_units",
                        lambda: dataclasses.replace(cal, certified=False))
    assert condprobe.split_partition_choice() is None


def test_maybe_split_route_upgrades_ts_kernel_route(monkeypatch, rng):
    _fake_units(monkeypatch, est_ds_cert_unit_m=2.26e-14,
                est_dsts_cert_unit_m=1.6e-14)
    # the throughput guard keeps the split dormant at the measured glue
    # cost (r5_split_ablate) — zero it to exercise the upgrade itself;
    # B large enough that the TILE/B window slack stays small
    monkeypatch.setattr(ladder, "SPLIT_GLUE_TS_UNITS", 0.0)
    B, K = 8192, 30
    xk = rng.uniform(-1, 1, (B, K, 2))
    xi = np.zeros((B, 2))
    nk = np.full((B,), K, np.int32)
    edge = 1e-10 / (4 * 1.6e-14)
    # 95% of cases under the edge, 5% beyond
    fake_est = np.where(np.arange(B) % 20 == 0, 10 * edge, 0.5 * edge)
    monkeypatch.setattr(condprobe, "cond_key",
                        lambda *a, **k: jnp.asarray(fake_est))
    base = ladder.Route(path="kernel", kernel_precision="ts",
                        refine_steps=3)
    route = api._maybe_split_route(base, xk, nk, xi, dim=2, K=K, o=4,
                                   kn=0, wm=defs.WEIGHT_CENTER, basic=True)
    assert route.path == "kernel-split"
    assert route.kernel_precision == "dsts"
    assert route.assembly == "moments"
    assert route.split_edge == pytest.approx(edge)
    assert route.tail_refine_steps == 3
    # window: 10% tail * margin + TILE/B slack, capped at 1
    assert 0.1 < route.tail_frac <= 1.0
    # non-ts routes and non-basic batches pass through untouched
    ds = ladder.Route(path="kernel", kernel_precision="ds")
    assert api._maybe_split_route(ds, xk, nk, xi, dim=2, K=K, o=4, kn=0,
                                  wm=defs.WEIGHT_CENTER, basic=True) is ds
    assert api._maybe_split_route(base, xk, nk, xi, dim=2, K=K, o=4, kn=0,
                                  wm=defs.WEIGHT_CENTER, basic=False) is base


def test_split_throughput_guard_keeps_ts(monkeypatch, rng):
    """At the MEASURED glue cost the split composition is slower than
    the plain ts kernel (r5_split_ablate: 6.5 vs 14.5 M fits/s), so the
    upgrade must NOT engage even when the certified fraction is high."""
    _fake_units(monkeypatch, est_ds_cert_unit_m=2.26e-14,
                est_dsts_cert_unit_m=1.6e-14)
    B, K = 64, 30
    xk = rng.uniform(-1, 1, (B, K, 2))
    xi = np.zeros((B, 2))
    nk = np.full((B,), K, np.int32)
    edge = 1e-10 / (4 * 1.6e-14)
    fake_est = np.where(np.arange(B) % 10 == 0, 10 * edge, 0.5 * edge)
    monkeypatch.setattr(condprobe, "cond_key",
                        lambda *a, **k: jnp.asarray(fake_est))
    base = ladder.Route(path="kernel", kernel_precision="ts",
                        refine_steps=3)
    out = api._maybe_split_route(base, xk, nk, xi, dim=2, K=K, o=4,
                                 kn=0, wm=defs.WEIGHT_CENTER, basic=True)
    assert out is base


def test_whole_batch_rungs_upgrade_by_exact_max_key(monkeypatch, rng):
    """When the exact key maximum certifies a faster whole-batch body,
    the ts route upgrades to it directly — no split, no tail."""
    _fake_units(monkeypatch, est_ds_cert_unit_m=2.26e-14,
                est_dsts_cert_unit_m=1.6e-14, est_ts_parity_unit_m=4.9e-16)
    B, K = 64, 30
    xk = rng.uniform(-1, 1, (B, K, 2))
    xi = np.zeros((B, 2))
    nk = np.full((B,), K, np.int32)
    ds_edge = 1e-10 / (4 * 2.26e-14)
    dsts_edge = 1e-10 / (4 * 1.6e-14)
    ts_edge = 1e-10 / (4 * 4.9e-16)
    base = ladder.Route(path="kernel", kernel_precision="ts",
                        refine_steps=3)

    def with_max(mx):
        fake = np.linspace(0.1 * mx, mx, B)
        monkeypatch.setattr(condprobe, "cond_key",
                            lambda *a, **k: jnp.asarray(fake))
        return api._maybe_split_route(base, xk, nk, xi, dim=2, K=K, o=4,
                                      kn=0, wm=defs.WEIGHT_CENTER,
                                      basic=True)

    r = with_max(0.9 * ds_edge)
    assert (r.path, r.kernel_precision, r.assembly) == (
        "kernel", "ds", "moments")
    r = with_max(0.9 * dsts_edge)
    assert (r.path, r.kernel_precision, r.assembly) == (
        "kernel", "dsts", "moments")
    assert r.refine_steps == 3
    # inside the ts envelope: the ts route stands, now per-case sound
    assert with_max(0.9 * ts_edge) is base
    # beyond every envelope with a high certified fraction: the split
    # would be next, but the measured glue keeps it dormant
    assert with_max(10 * ts_edge) is base


def test_whole_batch_rungs_poisoned_by_nan_key(monkeypatch, rng):
    """A single degenerate (NaN-keyed) case must disable every
    whole-batch upgrade rung — NaN certifies nothing."""
    _fake_units(monkeypatch, est_ds_cert_unit_m=2.26e-14,
                est_dsts_cert_unit_m=1.6e-14, est_ts_parity_unit_m=4.9e-16)
    B, K = 64, 30
    xk = rng.uniform(-1, 1, (B, K, 2))
    xi = np.zeros((B, 2))
    nk = np.full((B,), K, np.int32)
    fake = np.full(B, 10.0)
    fake[3] = np.nan
    monkeypatch.setattr(condprobe, "cond_key",
                        lambda *a, **k: jnp.asarray(fake))
    base = ladder.Route(path="kernel", kernel_precision="ts",
                        refine_steps=3)
    out = api._maybe_split_route(base, xk, nk, xi, dim=2, K=K, o=4,
                                 kn=0, wm=defs.WEIGHT_CENTER, basic=True)
    assert out is base


def test_maybe_split_route_needs_majority(monkeypatch, rng):
    _fake_units(monkeypatch, est_dsts_cert_unit_m=1.6e-14)
    B, K = 64, 30
    xk = rng.uniform(-1, 1, (B, K, 2))
    xi = np.zeros((B, 2))
    nk = np.full((B,), K, np.int32)
    edge = 1e-10 / (4 * 1.6e-14)
    fake_est = np.full((B,), 10 * edge)   # nothing certifies
    monkeypatch.setattr(condprobe, "cond_key",
                        lambda *a, **k: jnp.asarray(fake_est))
    base = ladder.Route(path="kernel", kernel_precision="ts",
                        refine_steps=3)
    out = api._maybe_split_route(base, xk, nk, xi, dim=2, K=K, o=4, kn=0,
                                 wm=defs.WEIGHT_CENTER, basic=True)
    assert out is base


def test_cond_key_upper_bounds_cond2(rng):
    """The XLA reference key must upper-bound the exact spectral cond of
    the Jacobi-scaled system for every case (math property the
    calibration leans on)."""
    B, K = 256, 30
    xk, fk, xi = calibration._problem(rng, B, K, 0.3, 2)
    nk = np.full((B,), K, np.int32)
    est = np.asarray(condprobe.cond_key(xk, nk, xi, dimension=2, order=4,
                                        weighting=defs.WEIGHT_CENTER))
    cond, amp = condprobe.probe(xk, nk, xi, 4, defs.WEIGHT_CENTER,
                                dimension=2, sample=B)
    ca = np.asarray(cond * amp)
    r = est / ca
    # f32 arithmetic can nibble at the exact bound; 2% slack
    assert (r > 0.98).all()
    assert np.isfinite(est).all()


def test_cond_key_nan_for_degenerate(rng):
    """Collapsed neighborhoods produce a NaN key, which certifies
    nothing (NaN <= edge is False) and therefore routes to the tail."""
    B, K = 8, 30
    xi = np.zeros((B, 2))
    xk = np.zeros((B, K, 2))    # all neighbors on top of xi
    nk = np.full((B,), K, np.int32)
    est = np.asarray(condprobe.cond_key(xk, nk, xi, dimension=2, order=4,
                                        weighting=defs.WEIGHT_UNIFORM))
    assert not (est <= 1e12).any()


@pytest.mark.full
def test_run_kernel_split_composition(rng):
    """The traceable split equals its composition: the fast kernel's
    result with the over-edge cases (up to the window) overwritten by
    the ts kernel's — bit-identical."""
    B, K = pallas_fit.TILE, 30
    xk, fk, xi = calibration._problem(rng, B, K, 0.4, 2)
    nk = jnp.full((B,), K, jnp.int32)
    prec, edge = ("dsts", 1562.5)
    fi_fast, est = pallas_fit.fit_pallas(
        jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi),
        dimension=2, order=4, weighting=defs.WEIGHT_CENTER, interpret=True,
        precision=prec, assembly="moments", refine_steps=3, emit_cond=True)
    est = np.asarray(est)
    bad = ~(est <= edge)
    assert 0 < bad.sum() < B    # the radius-0.4 family straddles the edge
    tail_frac = float(min(1.0, bad.mean() * 1.6 + 0.05))
    route = ladder.Route(path="kernel-split", kernel_precision=prec,
                         assembly="moments", refine_steps=3,
                         tail_refine_steps=4, split_edge=edge,
                         tail_frac=tail_frac)
    fi_s, iters, sens = api._run_kernel_split(
        jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi), None,
        dim=2, order=4, knowns=0, weighting=defs.WEIGHT_CENTER,
        route=route, interpret=True)
    k = int(np.ceil(tail_frac * B))
    idx = np.nonzero(bad)[0][:k]
    fi_ts = pallas_fit.fit_pallas(
        jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi),
        dimension=2, order=4, weighting=defs.WEIGHT_CENTER, interpret=True,
        precision="ts", assembly="moments", refine_steps=4)
    exp = np.array(fi_fast)
    exp[idx] = np.array(fi_ts)[idx]
    np.testing.assert_array_equal(np.asarray(fi_s), exp)
    assert sens is None and int(np.asarray(iters).max()) == 0


@pytest.mark.full
def test_dsts_moment_kernel_runs(rng):
    """precision='dsts' (pair store + triple sweeps) matches the plain
    ds moment kernel to the ds envelope on a well-conditioned batch and
    rejects the rows assembly."""
    B, K = pallas_fit.TILE, 24
    xk, fk, xi = calibration._problem(rng, B, K, 1.0, 2)
    nk = jnp.full((B,), K, jnp.int32)
    com = dict(dimension=2, order=4, weighting=defs.WEIGHT_UNIFORM,
               interpret=True, assembly="moments")
    fi_ds = pallas_fit.fit_pallas(jnp.asarray(xk), jnp.asarray(fk), nk,
                                  jnp.asarray(xi), precision="ds", **com)
    fi_h = pallas_fit.fit_pallas(jnp.asarray(xk), jnp.asarray(fk), nk,
                                 jnp.asarray(xi), precision="dsts", **com)
    scale = np.abs(np.asarray(fi_ds)).max()
    assert np.abs(np.asarray(fi_h) - np.asarray(fi_ds)).max() / scale < 1e-9
    with pytest.raises(ValueError, match="dsts"):
        pallas_fit.fit_pallas(jnp.asarray(xk), jnp.asarray(fk), nk,
                              jnp.asarray(xi), precision="dsts",
                              dimension=2, order=4,
                              weighting=defs.WEIGHT_UNIFORM,
                              interpret=True, assembly="rows")
