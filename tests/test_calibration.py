"""Per-device calibration store: shipped records, uncalibrated refusal,
persistence, and the measured-harness fit (see
wlsqm_tpu/fitter/calibration.py; reference accuracy motivation:
wlsqm/fitter/impl.pyx:620-689 — the certification gates must not make
v5e-calibrated promises on unswept hardware)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from wlsqm_tpu.fitter import calibration, condprobe, ladder


@pytest.fixture(autouse=True)
def _fresh_cache():
    calibration._reset_cache()
    yield
    calibration._reset_cache()


def _cond_amp(cond, amp=1.0):
    return (np.asarray([float(cond)]), np.asarray([float(amp)]))


def test_shipped_record_on_cpu():
    cal = calibration.active()
    assert cal.certified
    assert cal.source == "shipped"
    assert cal.ds_cert_unit == condprobe.DS_CERT_UNIT
    assert cal.ts_parity_unit == condprobe.TS_PARITY_UNIT


def test_unknown_device_refuses_certification(monkeypatch):
    """No calibration record: the ds/ts certification gates refuse and
    the ladder keeps certified bands off the kernel."""
    monkeypatch.setattr(calibration, "device_kind",
                        lambda: "TPU v9 hypothetical")
    with pytest.warns(UserWarning, match="no accuracy calibration"):
        cal = calibration.active()
    assert not cal.certified and cal.source == "default"

    # a trivially well-conditioned batch would certify on v5e...
    ca = _cond_amp(10.0)
    assert not condprobe.accuracy_ok_from(ca)
    assert not condprobe.ts_accuracy_ok_from(ca)
    # ...so the ladder sends it to an engine rung, not the kernel
    r = ladder.choose(ca)
    assert r.path == "xla"
    # the conditioning-limited regime makes no certification claim and
    # stays on the accuracy-optimal ts kernel
    floor_ca = (ladder.BEYOND_PARITY_FLOOR * 2) / condprobe.DS_UNIT
    r2 = ladder.choose(_cond_amp(floor_ca))
    assert r2.path == "kernel" and r2.kernel_precision == "ts"


def test_unknown_device_warns_once(monkeypatch):
    monkeypatch.setattr(calibration, "device_kind", lambda: "TPU weird")
    with pytest.warns(UserWarning):
        calibration.active()
    # cached: no second warning
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")
        assert not calibration.active().certified


def test_measured_record_roundtrip(tmp_path, monkeypatch):
    """A persisted measured record wins over the uncalibrated default."""
    store = tmp_path / "device_calibration.json"
    monkeypatch.setattr(calibration, "_store_path",
                        lambda: str(store))
    monkeypatch.setattr(calibration, "device_kind", lambda: "TPU v6e")
    cal = calibration.DeviceCalibration(
        ds_unit=3e-15, ds_cert_unit=2e-14, ts_parity_unit=9e-16,
        beyond_parity_floor=1e-8, kernel_max_floor=1e-3,
        certified=True, source="measured")
    calibration._persist("TPU v6e", cal)
    calibration._reset_cache()
    got = calibration.active()
    assert got.certified and got.source == "measured"
    assert got.ds_cert_unit == 2e-14
    # the gates now use the measured unit: ca slightly over the v5e edge
    # but under the measured one still refuses / passes accordingly
    edge = condprobe.AUTO_TOL / (condprobe.SAFETY * 2e-14)
    assert condprobe.accuracy_ok_from(_cond_amp(edge * 0.9))
    assert not condprobe.accuracy_ok_from(_cond_amp(edge * 1.1))


def test_env_override_wins(tmp_path, monkeypatch):
    store = tmp_path / "site_cal.json"
    key = calibration._key("TPU v6e")
    store.write_text(json.dumps({key: dict(
        ds_unit=1e-15, ds_cert_unit=5e-15, ts_parity_unit=5e-16,
        certified=True)}))
    monkeypatch.setenv("WLSQM_TPU_CALIBRATION", str(store))
    monkeypatch.setattr(calibration, "device_kind", lambda: "TPU v6e")
    got = calibration.active()
    assert got.source == "env" and got.ds_cert_unit == 5e-15


def test_corrupt_store_falls_through(tmp_path, monkeypatch):
    store = tmp_path / "device_calibration.json"
    store.write_text("{not json")
    monkeypatch.setattr(calibration, "_store_path", lambda: str(store))
    cal = calibration.active()          # cpu: shipped record still found
    assert cal.certified and cal.source == "shipped"


def test_calibrate_device_fit_logic(monkeypatch, tmp_path):
    """The harness fits per-case envelope units from kernel-vs-oracle
    errors (kernel faked as oracle + a known unit*ca perturbation) and
    persists a certified record."""
    store = tmp_path / "device_calibration.json"
    monkeypatch.setattr(calibration, "_store_path", lambda: str(store))
    monkeypatch.setattr(calibration, "device_kind", lambda: "TPU v6e")

    true_unit = 5e-15
    import wlsqm_tpu.ops.pallas_fit as pf

    real_oracle = calibration._strong_oracle
    state = {}

    def fake_fit(xk, fk, nk, xi, **kw):
        key = (float(np.asarray(xk).sum()), kw.get("precision", "ds"))
        ref = state.get(key)
        if ref is None:
            ref = real_oracle(np.asarray(xk), np.asarray(xi),
                              np.asarray(fk), kw["weighting"], 2)
            state[key] = ref
        unit = true_unit if kw.get("precision", "ds") == "ds" else 1e-16
        # perturb each case by unit * (its own cond*amp) * scale
        ca = state.setdefault(
            ("ca",) + key,
            condprobe.probe(np.asarray(xk), None, np.asarray(xi), 4,
                            kw["weighting"], dimension=2,
                            sample=len(ref))[0])
        pert = (unit * ca)[:, None] * np.abs(ref).max(-1, keepdims=True)
        if kw.get("emit_cond"):
            # fake per-case key: the exact cond with a uniform 1.5x slack
            return ref + pert, jnp.asarray(1.5 * ca)
        return ref + pert

    monkeypatch.setattr(pf, "fit_pallas", fake_fit)
    cal = calibration.calibrate_device(batch=64, radii=(0.3, 1.0),
                                       persist=True)
    assert cal.certified and cal.source == "measured"
    # fitted cert unit: edge-anchored — err = unit*ca crosses tol/HEADROOM
    # beyond the swept ca range here, so the edge clamps to the swept max
    # and the fitted unit lands within a small factor of the true one
    assert true_unit <= cal.ds_cert_unit <= true_unit * 4
    assert cal.ts_parity_unit < cal.ds_cert_unit
    # est-envelope fields fit against the kernel-emitted key: the key's
    # uniform 1.5x slack puts the est unit ~1/1.5x the ca-based one
    assert cal.est_ds_cert_unit_m is not None
    assert cal.est_ds_cert_unit_m < cal.ds_cert_unit * 2
    # persisted and reloadable
    calibration._reset_cache()
    assert calibration.active().source == "measured"
