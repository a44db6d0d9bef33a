"""Per-device calibration of the kernel-routing accuracy model.

The auto ladder's *certification* gates (:mod:`wlsqm_tpu.fitter.condprobe`,
:mod:`wlsqm_tpu.fitter.ladder`) promise that a kernel-routed batch agrees
with any correct f64 implementation to the 1e-10 parity bar.  That promise
rests on hardware-measured unit-roundoff constants — ``DS_UNIT``,
``DS_CERT_UNIT``, ``TS_PARITY_UNIT`` — which were swept on one device
generation (TPU v5e).  A different MXU/VPU generation can have different
pair-arithmetic behavior, and a gate tuned on v5e could silently admit
>1e-10 errors there (the accuracy machinery is the reference's soul:
reference README.md:76-78, wlsqm/fitter/impl.pyx:620-689 — shipping an
unsound gate would betray it).

This module makes the constants a per-device-kind *calibration record*:

* **shipped** records for the device kinds the project has swept on real
  hardware (TPU v5e; CPU, where the kernel runs op-by-op in interpret
  mode and the pair arithmetic is exact IEEE f32 — if anything stricter
  than the TPU's);
* **measured** records produced by :func:`calibrate_device` — a first-use
  harness distilled from ``benchmarks/run_gate_check.py`` /
  ``run_ts_percase.py`` that sweeps the actual kernel against a
  long-double-refined oracle on THIS device and persists the fitted
  units next to the ds-canary verdict (``WLSQM_TPU_COMPILE_CACHE``);
* an **env override** (``WLSQM_TPU_CALIBRATION=/path/to.json``) for
  site-managed fleets.

On hardware with no record of any kind, :func:`active` returns the
shipped v5e units flagged ``certified=False``: the condprobe certification
gates then refuse, so auto routing falls back to the uncertified-ts /
engine rungs (which make no cross-device accuracy claims), and a one-time
warning tells the user to run ``python -m wlsqm_tpu.fitter.calibration``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import warnings

import numpy as np

__all__ = ["DeviceCalibration", "active", "calibrate_device",
           "device_kind"]

#: bump when the calibration methodology changes; persisted records from
#: an older harness must not be trusted.  v3: certification units are
#: EDGE-ANCHORED (unit = tol / (SAFETY * edge) with the edge placed where
#: the measured worst-err envelope still has CERT_HEADROOM to the bar) —
#: the v2 global max(err/ca) fit was dominated by mid-band cases far
#: outside the certified region and produced units 10-30x more
#: pessimistic than the envelope the gate actually relies on at its edge
VERSION = 3


@dataclasses.dataclass(frozen=True)
class DeviceCalibration:
    """Accuracy-model units for one device kind.

    The plain units describe the basis-ROWS kernel; the ``*_m`` variants
    describe the MOMENT-assembly kernel (``assembly="moments"``).  The
    round-4 relaxed pair accumulation made the moment envelope ~30x
    looser (odd/high-moment cancellation inflating the unrenormalized
    lo plane); with the FULL renormalized adds now in the moment chain
    (ops/pallas_fit.py asm_body note) the measured moment envelopes sit
    within ~1.3x of the rows body in ds, and in ts arithmetic the two
    assemblies converge BIT-IDENTICALLY (both refine below f64
    resolution; verified on the 14,336-case round-5 sweep,
    benchmarks/r5_probe.json).  The ladder certifies each assembly
    against ITS units and picks the fastest certified one.

    ``certified`` distinguishes a record backed by a hardware sweep
    (shipped or measured) from the fallback defaults: only certified
    records allow the ds/ts certification gates to pass.
    """

    ds_unit: float            # central ds model unit (regime splits, sweeps)
    ds_cert_unit: float       # per-case worst-case ds envelope (cert gate)
    ts_parity_unit: float     # per-case ts-vs-f64-oracle envelope
    beyond_parity_floor: float  # ds floor above which parity is unattainable
    kernel_max_floor: float   # ds floor beyond which geometry is degenerate
    ds_unit_m: float = 8e-15         # moment-assembly counterparts
    ds_cert_unit_m: float = 1.6e-14
    ts_parity_unit_m: float = 7e-16
    #: split-route envelopes, calibrated against the KERNEL-EMITTED
    #: per-case key (``fit_pallas(..., emit_cond=True)``; reference
    #: implementation :func:`wlsqm_tpu.fitter.condprobe.cond_key`):
    #: err <= est_unit * key, edge-anchored like the ds/ts units.
    #: None disables the split route on this device kind.
    est_ds_cert_unit_m: float | None = None    # moments-ds partition
    est_dsts_cert_unit_m: float | None = None  # moments-dsts partition
    est_ts_parity_unit_m: float | None = None  # ts tail / diagnostics
    certified: bool = True
    source: str = "shipped"   # "shipped" | "measured" | "env" | "default"

    def units_for(self, assembly: str):
        """(central ds, ds envelope, ts envelope) for one kernel assembly."""
        if assembly == "moments":
            return self.ds_unit_m, self.ds_cert_unit_m, self.ts_parity_unit_m
        return self.ds_unit, self.ds_cert_unit, self.ts_parity_unit


#: the TPU v5e sweep values (benchmarks/run_gate_check.py,
#: run_ts_percase.py, run_cond_sweep*.py — see condprobe.py for the
#: provenance of each number).  Moment units refreshed in round 5 from
#: the 14,336-case full-renorm-accumulation sweep
#: (benchmarks/r5_probe.json + run_gate_check.py re-run): ds moment
#: edge ca=1562 (unit 1.6e-14; worst observed certified err 2.49e-11,
#: 4x headroom), ts moment output BIT-IDENTICAL to ts rows across the
#: sweep, hence the same 7e-16 unit (worst err at the 3.57e4 edge
#: 2.38e-11, 4.2x headroom).  The round-4 values (3.9e-13 / 9.1e-15)
#: measured the since-replaced relaxed pair accumulation.
_V5E = dict(ds_unit=2e-15, ds_cert_unit=1.25e-14, ts_parity_unit=7e-16,
            beyond_parity_floor=1e-8, kernel_max_floor=1e-3,
            ds_unit_m=8e-15, ds_cert_unit_m=1.6e-14,
            ts_parity_unit_m=7e-16,
            # per-case key envelopes (benchmarks/run_r5_calsweep.py,
            # 14,336 cases, CERT_HEADROOM=5 edges: ds_mom est-edge 1108,
            # dsts_mom 1560, ts_mom 51300 — worst-at-edge 1.85e-11 /
            # 1.96e-11 / 4.9e-12)
            est_ds_cert_unit_m=2.26e-14, est_dsts_cert_unit_m=1.6e-14,
            est_ts_parity_unit_m=4.9e-16)

#: shipped records, matched by lower-case substring of the device kind
_SHIPPED: tuple[tuple[str, dict], ...] = (
    ("v5 lite", _V5E),
    ("v5e", _V5E),
    ("v5lite", _V5E),
    # CPU: production routing never certifies a kernel route there
    # (plan_fit_many pins on_cpu batches to the f64 engine, api.py) —
    # this record exists so the gate/ladder LOGIC tests, which run the
    # decision functions directly on CPU hosts, exercise the shipped
    # v5e-calibrated behavior deterministically in CI
    ("cpu", _V5E),
)

_ACTIVE: dict[str, DeviceCalibration] = {}
_WARNED: set[str] = set()


def device_kind() -> str:
    """Identifier of the device the kernel would run on, e.g.
    ``'TPU v5 lite'`` or ``'cpu'`` (host platform included for remote
    bridges whose platform name differs from the hardware)."""
    import jax

    try:
        d = jax.devices()[0]
        kind = str(getattr(d, "device_kind", "") or "").strip()
        if not kind:
            kind = str(d)
        plat = str(getattr(d, "platform", "") or "")
        return f"{kind}" if kind.lower() != plat.lower() else plat
    except Exception:  # pragma: no cover - no backend at all
        return "unknown"


def _store_path() -> str | None:
    from wlsqm_tpu import config

    d = config.cache_dir()
    return os.path.join(d, "device_calibration.json") if d else None


def _key(kind: str) -> str:
    return f"v{VERSION}:{kind}"


def _from_record(rec: dict, source: str) -> DeviceCalibration | None:
    try:
        return DeviceCalibration(
            ds_unit=float(rec["ds_unit"]),
            ds_cert_unit=float(rec["ds_cert_unit"]),
            ts_parity_unit=float(rec["ts_parity_unit"]),
            beyond_parity_floor=float(rec.get("beyond_parity_floor",
                                              _V5E["beyond_parity_floor"])),
            kernel_max_floor=float(rec.get("kernel_max_floor",
                                           _V5E["kernel_max_floor"])),
            ds_unit_m=float(rec.get("ds_unit_m", _V5E["ds_unit_m"])),
            ds_cert_unit_m=float(rec.get("ds_cert_unit_m",
                                         _V5E["ds_cert_unit_m"])),
            ts_parity_unit_m=float(rec.get("ts_parity_unit_m",
                                           _V5E["ts_parity_unit_m"])),
            est_ds_cert_unit_m=(None if rec.get("est_ds_cert_unit_m")
                                is None
                                else float(rec["est_ds_cert_unit_m"])),
            est_dsts_cert_unit_m=(None if rec.get("est_dsts_cert_unit_m")
                                  is None
                                  else float(rec["est_dsts_cert_unit_m"])),
            est_ts_parity_unit_m=(None if rec.get("est_ts_parity_unit_m")
                                  is None
                                  else float(rec["est_ts_parity_unit_m"])),
            certified=bool(rec.get("certified", True)),
            source=source)
    except (KeyError, TypeError, ValueError):
        return None


def _load_store(path: str, kind: str, source: str):
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return None
    rec = data.get(_key(kind))
    return _from_record(rec, source) if isinstance(rec, dict) else None


def _persist(kind: str, cal: DeviceCalibration) -> None:
    """Record a measured calibration (atomic replace, best-effort)."""
    path = _store_path()
    if not path:
        return
    import tempfile

    try:
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            data = {}
        rec = dataclasses.asdict(cal)
        rec.pop("source", None)
        data[_key(kind)] = rec
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, path)
    except OSError:  # read-only cache dir: the in-process record stands
        pass


def active() -> DeviceCalibration:
    """The calibration record for the current device kind.

    Resolution order: env override file -> persisted measured record ->
    shipped table -> uncertified defaults (with a one-time warning).
    Cached per device kind for the process.
    """
    kind = device_kind()
    cal = _ACTIVE.get(kind)
    if cal is not None:
        return cal
    low = kind.lower()
    cal = None
    env = os.environ.get("WLSQM_TPU_CALIBRATION")
    if env:
        cal = _load_store(env, kind, "env")
    if cal is None:
        path = _store_path()
        if path:
            cal = _load_store(path, kind, "measured")
    if cal is None:
        for pat, rec in _SHIPPED:
            if pat in low:
                cal = DeviceCalibration(**rec, certified=True,
                                        source="shipped")
                break
    if cal is None:
        cal = DeviceCalibration(**_V5E, certified=False, source="default")
        if kind not in _WARNED:
            _WARNED.add(kind)
            warnings.warn(
                f"no accuracy calibration for device kind {kind!r}: "
                "certified kernel routing is disabled (batches take the "
                "uncertified or engine rungs).  Run `python -m "
                "wlsqm_tpu.fitter.calibration` once on this hardware "
                "(persisted via WLSQM_TPU_COMPILE_CACHE) to enable it.",
                stacklevel=2)
    _ACTIVE[kind] = cal
    return cal


def _reset_cache() -> None:
    """Testing hook: drop the per-process record cache."""
    _ACTIVE.clear()


# ---------------------------------------------------------------- harness

def _problem(rng, B, K, radius, dimension):
    xi = rng.uniform(-1, 1, (B, dimension))
    xk = xi[:, None, :] + rng.uniform(-radius, radius, (B, K, dimension))
    fk = (np.sin(3 * xk[..., 0]) * np.cos(2 * xk[..., -1])
          + 0.3 * xk[..., 0] * xk[..., -1])
    return xk, fk, xi


def _strong_oracle(xk, xi, fk, weighting, dimension, order=4):
    """Radius-scaled f64 normal-equations solve + one long-double-residual
    refinement per case (the gate-check oracle,
    benchmarks/run_ts_percase.py)."""
    from wlsqm_tpu.fitter import defs, tables

    no = defs.number_of_dofs(dimension, order)
    exp = tables.EXPONENTS[dimension][:no]
    invf = tables.INV_FACT[dimension][:no]
    deg = exp.sum(-1)
    d = xk - xi[:, None, :]
    d2 = (d ** 2).sum(-1)
    r = np.sqrt(d2.max(-1))
    t = d / r[:, None, None]
    C = invf[None, None, :] * np.prod(
        t[:, :, None, :] ** exp[None, None, :, :], axis=-1)
    if weighting == defs.WEIGHT_CENTER:
        w = 1e-4 + (1 - 1e-4) * (
            1 - np.sqrt(d2 / d2.max(-1, keepdims=True))) ** 2
    else:
        w = np.ones_like(d2)
    A = np.einsum("bki,bk,bkj->bij", C, w, C)
    b = np.einsum("bkj,bk->bj", C, w * fk)
    x = np.linalg.solve(A, b[..., None])[..., 0]
    Cl = C.astype(np.longdouble)
    wl = w.astype(np.longdouble)
    fl = fk.astype(np.longdouble)
    xl = x.astype(np.longdouble)
    resid = np.einsum("bkj,bk->bj", Cl,
                      wl * (fl - np.einsum("bkj,bj->bk", Cl, xl)))
    dx = np.linalg.solve(A, resid.astype(np.float64)[..., None])[..., 0]
    x = (xl + dx.astype(np.longdouble)).astype(np.float64)
    return x / (r[:, None].astype(np.float64) ** deg[None, :])


#: headroom the certified edge keeps to the parity bar: the edge is the
#: largest swept ca whose running worst-err envelope stays below
#: tol / CERT_HEADROOM.  Mirrors the shipped v5e rows unit's derivation
#: (edge ca=2e3 where the gate-check worst err was 1.81e-11 — 5.5x) and
#: absorbs sweep-to-sweep scatter (the same protocol re-run with a fresh
#: seed moved the ds-rows edge-2000 worst err to 3.8e-11, still sound).
CERT_HEADROOM = 5.0

#: margin applied to the worst measured per-case unit, mirroring the
#: ~1.6x worst under-prediction seen in the v5e gate-soundness runs
CERT_MARGIN = 1.6

#: floor for a fitted unit: a sweep can never certify tighter than the
#: f64 oracle's own arithmetic
UNIT_FLOOR = 1e-16


def calibrate_device(*, batch: int = 1024, seed: int = 20260817,
                     radii=(0.03, 0.05, 0.1, 0.15, 0.3, 0.6, 1.0),
                     persist: bool = True,
                     interpret: bool = False) -> DeviceCalibration:
    """Measure this device's kernel accuracy units and persist them.

    Runs the fused kernel — ds and ts arithmetic, basis-rows AND
    moment assembly — on a 2D order-4 sweep over neighborhood radii and
    both weightings, compares every case against the long-double-refined
    oracle, and fits each variant's certification unit with the
    edge-anchored rule (see ``cert`` below / the VERSION note) plus the
    central batch-max units that drive sweep counts and regime splits.
    Persists the record when the cache dir is enabled
    (``WLSQM_TPU_COMPILE_CACHE``) and installs it for the process either
    way.  Takes ~2-4 min on a TPU chip (one kernel compile per
    arithmetic x assembly).
    """
    import jax.numpy as jnp

    from wlsqm_tpu.fitter import condprobe, defs
    from wlsqm_tpu.ops.pallas_fit import fit_pallas

    rng = np.random.default_rng(seed)
    K = 30
    cas = []
    ests = []
    errs = {k: [] for k in ("ds_rows", "ts_rows", "ds_mom", "dsts_mom",
                            "ts_mom")}
    for weighting in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER):
        for radius in radii:
            xk, fk, xi = _problem(rng, batch, K, radius, 2)
            ref = _strong_oracle(xk, xi, fk, weighting, 2)
            nk = jnp.full((batch,), K, jnp.int32)
            com = dict(dimension=2, order=4, weighting=weighting,
                       interpret=interpret)
            scale = np.abs(ref).max(-1)
            for key, kw in (("ds_rows", dict(assembly="rows")),
                            ("ts_rows", dict(assembly="rows",
                                             precision="ts")),
                            ("ds_mom", dict(assembly="moments",
                                            emit_cond=True)),
                            ("dsts_mom", dict(assembly="moments",
                                              precision="dsts")),
                            ("ts_mom", dict(assembly="moments",
                                            precision="ts"))):
                out = fit_pallas(
                    jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi),
                    **kw, **com)
                if kw.get("emit_cond"):
                    # the split-route envelopes calibrate against the
                    # KERNEL-emitted key — the exact value the runtime
                    # gate will compare against
                    out, est = out
                    ests.append(np.asarray(est))
                fi = np.asarray(out)
                errs[key].append(np.abs(fi - ref).max(-1) / scale)
            cond, amp = condprobe.probe(xk, nk, xi, 4, weighting,
                                        dimension=2, sample=batch)
            cas.append(cond * amp)
    ca = np.concatenate(cas)
    est_all = np.concatenate(ests)
    nbatch = len(cas)
    from wlsqm_tpu.fitter.condprobe import AUTO_TOL, SAFETY

    def cert(key):
        """Edge-anchored certification unit (see VERSION note).

        Find the largest swept ca below which every measured error keeps
        :data:`CERT_HEADROOM` to the parity bar, then return the unit
        that places the gate ``unit * ca * SAFETY <= tol`` exactly at
        that edge.  Sound on the sweep by construction: every case the
        gate would certify has measured err <= tol / CERT_HEADROOM.
        (The shipped v5e rows unit 1.25e-14 = 1e-10 / (4 * 2e3) is this
        fit on the original gate-check sweep.)
        """
        e = np.concatenate(errs[key])
        order_i = np.argsort(ca)
        run = np.maximum.accumulate(e[order_i])
        ok = run <= AUTO_TOL / CERT_HEADROOM
        if not ok.any():
            return AUTO_TOL / SAFETY  # edge ca=1: certifies nothing real
        edge = float(ca[order_i][ok][-1])
        return max(AUTO_TOL / (SAFETY * edge), UNIT_FLOOR)

    def central(key):
        # worst batch-max ratio (the ±4x SAFETY of the routing gate
        # absorbs the scatter around it, as on v5e)
        e = np.concatenate(errs[key])
        return max(max(float(b.max() / c.max())
                       for b, c in zip(np.array_split(e, nbatch),
                                       np.array_split(ca, nbatch))),
                   UNIT_FLOOR)

    def cert_est(key):
        """Edge-anchored unit against the per-case Frobenius key
        (:func:`condprobe.cond_key`) — the split route's gate."""
        e = np.concatenate(errs[key])
        order_i = np.argsort(est_all)
        run = np.maximum.accumulate(e[order_i])
        ok = run <= AUTO_TOL / CERT_HEADROOM
        if not ok.any():
            return AUTO_TOL / SAFETY
        edge = float(est_all[order_i][ok][-1])
        return max(AUTO_TOL / (SAFETY * edge), UNIT_FLOOR)

    cal = DeviceCalibration(
        ds_unit=central("ds_rows"), ds_cert_unit=cert("ds_rows"),
        ts_parity_unit=cert("ts_rows"),
        beyond_parity_floor=_V5E["beyond_parity_floor"],
        kernel_max_floor=_V5E["kernel_max_floor"],
        ds_unit_m=central("ds_mom"), ds_cert_unit_m=cert("ds_mom"),
        ts_parity_unit_m=cert("ts_mom"),
        est_ds_cert_unit_m=cert_est("ds_mom"),
        est_dsts_cert_unit_m=cert_est("dsts_mom"),
        est_ts_parity_unit_m=cert_est("ts_mom"),
        certified=True, source="measured")
    kind = device_kind()
    _ACTIVE[kind] = cal
    if persist:
        _persist(kind, cal)
    return cal


def main() -> None:  # pragma: no cover - thin CLI
    cal = calibrate_device()
    print(f"device kind:  {device_kind()}")
    for f in dataclasses.fields(cal):
        print(f"{f.name:22s} {getattr(cal, f.name)}")
    if _store_path() is None:
        print("NOTE: WLSQM_TPU_COMPILE_CACHE is not set — the record was "
              "not persisted (valid for this process only).")


if __name__ == "__main__":  # pragma: no cover
    main()
