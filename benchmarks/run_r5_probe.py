"""Round-5 diagnostics: public-route gap + moments-ds error structure.

Three measurements on the real TPU:

1. The headline cloud's probed cond*amp distribution and the route the
   public ``plan_fit_many`` picks for it (VERDICT r4 weak #1: the
   recorded headline bypasses the public route).
2. End-to-end throughput of the public route (plan_fit_many ->
   fit_many(plan=)) vs the forced moments-ds kernel on the same data,
   same protocol as the regression gate.
3. Per-case error vs cond*amp for all four (assembly x arithmetic)
   kernel variants across the calibration sweep, dumped to JSON so the
   envelope model can be sharpened (VERDICT r4 next #2: the fitted
   single-slope unit is 30x looser for moments; if the scatter shows an
   absolute floor or a regime split, a 2-parameter model certifies the
   typical band).

Writes benchmarks/r5_probe.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


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

    # ---- 1. headline cloud: ca distribution + chosen route --------------
    CHUNK, K = 32768, 30
    key = jax.random.PRNGKey(42)

    @jax.jit
    def make_chunk(key):
        k1, k2 = jax.random.split(key)
        xk = jax.random.uniform(k1, (CHUNK, K, 2), jnp.float64, -1.0, 1.0)
        fk = jnp.sin(3.0 * xk[..., 0]) * jnp.cos(2.0 * xk[..., 1])
        fk = fk + 0.01 * jax.random.normal(k2, (CHUNK, K), jnp.float64)
        return xk, fk

    key, sub = jax.random.split(key)
    xk, fk = make_chunk(sub)
    nk = jnp.full((CHUNK,), K, jnp.int32)
    xi = jnp.zeros((CHUNK, 2))
    jax.block_until_ready((xk, fk))

    cond, amp = condprobe.probe(np.asarray(xk), np.asarray(nk),
                                np.asarray(xi), 4, defs.WEIGHT_CENTER,
                                dimension=2, sample=2048)
    ca = np.asarray(cond * amp)
    out["headline_ca"] = {
        "max": float(ca.max()), "p99": float(np.quantile(ca, 0.99)),
        "median": float(np.median(ca)), "min": float(ca.min())}
    log("headline ca: %s" % out["headline_ca"])

    plan = wt.plan_fit_many(xk, xi, nk=nk, order=4,
                            weighting=defs.WEIGHT_CENTER)
    out["headline_plan"] = str(plan)
    r = plan.route
    out["headline_route"] = dict(path=r.path, kp=r.kernel_precision,
                                 assembly=r.assembly,
                                 refine_steps=r.refine_steps,
                                 precision=r.precision)
    log("plan: %s" % plan)

    # ---- 2. end-to-end auto vs forced kernel ----------------------------
    def measure(fit_chunk, label, min_timed=0.5):
        def sweep_fn(steps):
            @jax.jit
            def sweep(xk, fk):
                def step(acc, _):
                    return acc + fit_chunk(xk, fk).sum(), None
                acc, _ = jax.lax.scan(step, jnp.float64(0.0), None,
                                      length=steps)
                return acc
            return sweep

        steps = 8
        sweep = sweep_fn(steps)
        t0 = time.perf_counter()
        float(sweep(xk, fk))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(sweep(xk, fk))
        dt = time.perf_counter() - t0
        if dt < min_timed:
            steps = max(steps, int(np.ceil(steps * min_timed / max(dt, 1e-3))))
            sweep = sweep_fn(steps)
            float(sweep(xk, fk))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(sweep(xk, fk))
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        rate = steps * CHUNK / med / 1e6
        log("%s: %.2f M fits/s (compile %.0fs, spread %.1f%%)"
            % (label, rate, compile_s, 100 * (times[-1] - times[0]) / med))
        return rate

    def auto_chunk(xk, fk):
        return wt.fit_many(xk, fk, xi, nk=nk, order=4,
                           weighting=defs.WEIGHT_CENTER, plan=plan).fi

    out["auto_rate_M"] = measure(auto_chunk, "auto (planned)")

    def forced_chunk(xk, fk):
        return fit_pallas(xk, fk, nk, xi, dimension=2, order=4,
                          weighting=defs.WEIGHT_CENTER, refine_steps=2,
                          assembly="moments")

    out["forced_moments_ds_rate_M"] = measure(forced_chunk, "forced mom-ds")
    out["auto_vs_forced"] = out["auto_rate_M"] / out["forced_moments_ds_rate_M"]
    log("auto/forced = %.3f" % out["auto_vs_forced"])

    # ---- 3. per-case error structure over the calibration sweep ---------
    rng = np.random.default_rng(20260820)
    B = 1024
    recs = []
    for weighting in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER):
        for radius in (0.03, 0.05, 0.1, 0.15, 0.3, 0.6, 1.0):
            xk_s, fk_s, xi_s = calibration._problem(rng, B, K, radius, 2)
            ref = calibration._strong_oracle(xk_s, xi_s, fk_s, weighting, 2)
            nk_s = jnp.full((B,), K, jnp.int32)
            scale = np.abs(ref).max(-1)
            com = dict(dimension=2, order=4, weighting=weighting)
            errs = {}
            for kname, kw in (("ds_rows", dict(assembly="rows")),
                              ("ts_rows", dict(assembly="rows",
                                               precision="ts")),
                              ("ds_mom", dict(assembly="moments")),
                              ("ts_mom", dict(assembly="moments",
                                              precision="ts"))):
                fi = np.asarray(fit_pallas(
                    jnp.asarray(xk_s), jnp.asarray(fk_s), nk_s,
                    jnp.asarray(xi_s), **kw, **com))
                errs[kname] = (np.abs(fi - ref).max(-1) / scale)
            cond_s, amp_s = condprobe.probe(xk_s, nk_s, xi_s, 4, weighting,
                                            dimension=2, sample=B)
            ca_s = np.asarray(cond_s * amp_s)
            recs.append(dict(
                weighting=int(weighting), radius=radius,
                ca=ca_s.tolist(),
                **{k: v.tolist() for k, v in errs.items()}))
            log("sweep w=%d r=%.2f: ds_mom worst unit %.2e  ds_rows %.2e"
                % (weighting, radius, float((errs["ds_mom"] / ca_s).max()),
                   float((errs["ds_rows"] / ca_s).max())))
    out["sweep"] = recs

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r5_probe.json")
    with open(path, "w") as f:
        json.dump(out, f)
    log("wrote %s" % path)


if __name__ == "__main__":
    main()
