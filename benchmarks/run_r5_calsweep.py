"""Round-5 calibration sweep: moment-variant envelopes + split-route key.

Measures, on the real TPU, per-case errors of five kernel variants
(rows-ds, rows-ts, moments-ds, moments-dsts, moments-ts) against the
long-double-refined strong oracle over the standard 2D order-4 radii
sweep, together with the kernel-emitted per-case certification key
(``emit_cond``), and fits edge-anchored certification units for each
(fitter/calibration.py VERSION 3 rule).  Also records in-session
throughput ratios (plain vs emit_cond vs dsts vs ts) so the split-route
cost model rests on same-session numbers — absolute rates through the
axon bridge swing 2-4x between sessions, ratios do not.

This is the provenance of the round-5 shipped v5e units
(calibration._V5E) and of the dsts rung's envelope.  Writes
benchmarks/r5_calsweep.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


VARIANTS = (
    ("ds_rows", dict(assembly="rows")),
    ("ts_rows", dict(assembly="rows", precision="ts")),
    ("ds_mom", dict(assembly="moments", emit_cond=True)),
    ("dsts_mom", dict(assembly="moments", precision="dsts")),
    ("ts_mom", dict(assembly="moments", precision="ts")),
)


def main():
    from bench import _axon_relay_preflight

    if not _axon_relay_preflight(120):
        log("relay down")
        sys.exit(2)

    import jax
    import jax.numpy as jnp

    import wlsqm_tpu as wt  # noqa: F401
    from wlsqm_tpu.fitter import calibration, condprobe, defs
    from wlsqm_tpu.ops.pallas_fit import fit_pallas

    out = {"device": str(jax.devices()[0])}
    log("device: %s" % out["device"])

    # ---- accuracy sweep --------------------------------------------------
    rng = np.random.default_rng(20260820)
    B, K = 1024, 30
    cas, ests = [], []
    errs = {k: [] for k, _ in VARIANTS}
    for weighting in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER):
        for radius in (0.03, 0.05, 0.1, 0.15, 0.3, 0.6, 1.0):
            xk, fk, xi = calibration._problem(rng, B, K, radius, 2)
            ref = calibration._strong_oracle(xk, xi, fk, weighting, 2)
            scale = np.abs(ref).max(-1)
            nk = jnp.full((B,), K, jnp.int32)
            com = dict(dimension=2, order=4, weighting=weighting)
            for key, kw in VARIANTS:
                o = fit_pallas(jnp.asarray(xk), jnp.asarray(fk), nk,
                               jnp.asarray(xi), **kw, **com)
                if kw.get("emit_cond"):
                    o, est = o
                    ests.append(np.asarray(est))
                errs[key].append(np.abs(np.asarray(o) - ref).max(-1) / scale)
            cond, amp = condprobe.probe(xk, nk, xi, 4, weighting,
                                        dimension=2, sample=B)
            cas.append(np.asarray(cond * amp))
            log("sweep w=%d r=%.2f done" % (weighting, radius))
    ca = np.concatenate(cas)
    est = np.concatenate(ests)
    out["sweep"] = {k: np.concatenate(v).tolist() for k, v in errs.items()}
    out["ca"] = ca.tolist()
    out["est"] = est.tolist()
    out["est_over_ca"] = {
        "min": float((est / ca).min()), "med": float(np.median(est / ca)),
        "max": float((est / ca).max())}
    log("est/ca: %s" % out["est_over_ca"])

    TOL, HEADROOM, SAFETY = 1e-10, 5.0, 4.0

    def edge_fit(e, key_arr):
        i = np.argsort(key_arr)
        run = np.maximum.accumulate(e[i])
        ok = run <= TOL / HEADROOM
        if not ok.any():
            return None
        edge = float(key_arr[i][ok][-1])
        okbar = run <= TOL
        bar = float(key_arr[i][okbar][-1]) if okbar.any() else 0.0
        return dict(edge=edge, unit=TOL / (SAFETY * edge),
                    worst_at_edge=float(run[ok][-1]), bar_crossing=bar)

    out["fits"] = {}
    for k, _ in VARIANTS:
        e = np.concatenate(errs[k])
        out["fits"][k] = dict(vs_ca=edge_fit(e, ca), vs_est=edge_fit(e, est))
        log("%s: vs_ca %s" % (k, out["fits"][k]["vs_ca"]))
        log("%s: vs_est %s" % (k, out["fits"][k]["vs_est"]))

    # ---- in-session throughput ratios -----------------------------------
    CHUNK = 32768
    key = jax.random.PRNGKey(42)
    key, sub = jax.random.split(key)
    k1, k2 = jax.random.split(sub)
    xkb = jax.random.uniform(k1, (CHUNK, K, 2), jnp.float64, -1.0, 1.0)
    fkb = (jnp.sin(3.0 * xkb[..., 0]) * jnp.cos(2.0 * xkb[..., 1])
           + 0.01 * jax.random.normal(k2, (CHUNK, K), jnp.float64))
    nkb = jnp.full((CHUNK,), K, jnp.int32)
    xib = jnp.zeros((CHUNK, 2))
    jax.block_until_ready((xkb, fkb))
    com = dict(dimension=2, order=4, weighting=defs.WEIGHT_CENTER)

    def rate(label, **kw):
        @jax.jit
        def sweep(xk, fk):
            def step(acc, _):
                o = fit_pallas(xk, fk, nkb, xib, **kw, **com)
                fi = o[0] if isinstance(o, tuple) else o
                return acc + fi.sum(), None
            acc, _ = jax.lax.scan(step, jnp.float64(0.0), None, length=8)
            return acc
        t0 = time.perf_counter()
        float(sweep(xkb, fkb))
        c = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(sweep(xkb, fkb))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        r = 8 * CHUNK / ts[len(ts) // 2] / 1e6
        log("%s: %.2f M fits/s (compile %.0fs)" % (label, r, c))
        return r

    out["rates"] = {
        "mom_ds_r2": rate("mom-ds r2", assembly="moments", refine_steps=2),
        "mom_ds_r2_est": rate("mom-ds r2 emit_cond", assembly="moments",
                              refine_steps=2, emit_cond=True),
        "mom_dsts_r3": rate("mom-dsts r3", assembly="moments",
                            precision="dsts", refine_steps=3),
        "mom_dsts_r3_est": rate("mom-dsts r3 emit_cond", assembly="moments",
                                precision="dsts", refine_steps=3,
                                emit_cond=True),
        "mom_ts_r3": rate("mom-ts r3", assembly="moments", precision="ts",
                          refine_steps=3),
    }
    p = out["rates"]["mom_ds_r2"]
    out["ratios"] = {k: v / p for k, v in out["rates"].items()}
    log("ratios vs plain mom-ds: %s" % out["ratios"])

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r5_calsweep.json")
    with open(path, "w") as f:
        json.dump(out, f)
    log("wrote %s" % path)


if __name__ == "__main__":
    main()
