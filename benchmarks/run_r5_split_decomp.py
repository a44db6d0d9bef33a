"""Round-5 split-route overhead decomposition.

The r5 auto probe recorded the public kernel-split route at 0.21x the
forced moments-ds kernel.  This script isolates where the factor goes on
the headline config (2D order 4, K=30, chunk 32768), measuring with the
regression-gate scan protocol:

  ds_r2            forced moments-ds, 2 sweeps            (the baseline)
  ds_r3            +1 sweep
  ds_r3_cond       +emit_cond (the per-case key emission)
  dsts_r3          triple-single sweeps on the pair store
  dsts_r3_cond     +emit_cond (= the split's fast partition)
  ts_r3            the tail body at full chunk size
  split_auto       fit_many(plan=) end to end (current choice)
  split_ds         the same split forced to the ds partition

Writes benchmarks/r5_split_decomp.json.
"""

import dataclasses
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

    import wlsqm_tpu as wt
    from wlsqm_tpu.fitter import condprobe, defs
    from wlsqm_tpu.ops.pallas_fit import fit_pallas

    out = {"device": str(jax.devices()[0])}
    CHUNK, K = 32768, 30
    key = jax.random.PRNGKey(42)
    key, sub = jax.random.split(key)
    k1, k2 = jax.random.split(sub)
    xk = jax.random.uniform(k1, (CHUNK, K, 2), jnp.float64, -1.0, 1.0)
    fk = (jnp.sin(3.0 * xk[..., 0]) * jnp.cos(2.0 * xk[..., 1])
          + 0.01 * jax.random.normal(k2, (CHUNK, K), jnp.float64))
    nk = jnp.full((CHUNK,), K, jnp.int32)
    xi = jnp.zeros((CHUNK, 2))
    jax.block_until_ready((xk, fk))

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
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(sweep(xk, fk))
        dt = time.perf_counter() - t0
        if dt < min_timed:
            steps = max(steps,
                        int(np.ceil(steps * min_timed / max(dt, 1e-3))))
            sweep = sweep_fn(steps)
            float(sweep(xk, fk))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(sweep(xk, fk))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        rate = steps * CHUNK / ts[len(ts) // 2] / 1e6
        log("%-14s %7.2f M fits/s (compile %.0fs, spread %.1f%%)"
            % (label, rate, comp, 100 * (ts[-1] - ts[0]) / ts[len(ts) // 2]))
        out[label] = round(rate, 3)
        return rate

    def forced(prec, steps, cond):
        def fit(xk, fk):
            r = fit_pallas(xk, fk, nk, xi, dimension=2, order=4,
                           weighting=defs.WEIGHT_CENTER, refine_steps=steps,
                           assembly="moments", precision=prec,
                           emit_cond=cond)
            return r[0] if cond else r
        return fit

    measure(forced("ds", 2, False), "ds_r2")
    measure(forced("ds", 3, False), "ds_r3")
    measure(forced("ds", 3, True), "ds_r3_cond")
    measure(forced("dsts", 3, False), "dsts_r3")
    measure(forced("dsts", 3, True), "dsts_r3_cond")
    measure(forced("ts", 3, False), "ts_r3")

    plan = wt.plan_fit_many(xk, xi, nk=nk, order=4,
                            weighting=defs.WEIGHT_CENTER)
    out["route"] = str(plan.route)
    log("route: %s" % (plan.route,))
    measure(lambda xk, fk: wt.fit_many(xk, fk, xi, nk=nk, order=4,
                                       weighting=defs.WEIGHT_CENTER,
                                       plan=plan).fi,
            "split_auto")

    if plan.route.path == "kernel-split":
        u = condprobe._units()
        ds_edge = (condprobe.AUTO_TOL
                   / (condprobe.SAFETY * u.est_ds_cert_unit_m))
        est = np.asarray(condprobe.cond_key(xk, nk, xi, dimension=2,
                                            order=4, knowns=0,
                                            weighting=defs.WEIGHT_CENTER))
        frac_fast = float((est <= ds_edge).mean())
        from wlsqm_tpu.fitter import ladder
        from wlsqm_tpu.ops import pallas_fit
        tail_frac = float(min(1.0, (1.0 - frac_fast) * ladder.TAIL_MARGIN
                              + pallas_fit.TILE / CHUNK))
        route_ds = dataclasses.replace(
            plan.route, kernel_precision="ds", split_edge=ds_edge,
            refine_steps=condprobe.pick_steps_at_edge(ds_edge),
            tail_frac=tail_frac)
        plan_ds = dataclasses.replace(plan, route=route_ds)
        out["ds_split_frac_fast"] = frac_fast
        out["ds_split_tail_frac"] = tail_frac
        log("ds split: edge=%.0f frac_fast=%.3f tail=%.3f r=%d"
            % (ds_edge, frac_fast, tail_frac, route_ds.refine_steps))
        measure(lambda xk, fk: wt.fit_many(xk, fk, xi, nk=nk, order=4,
                                           weighting=defs.WEIGHT_CENTER,
                                           plan=plan_ds).fi,
                "split_ds")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r5_split_decomp.json")
    with open(path, "w") as f:
        json.dump(out, f)
    log("wrote %s" % path)


if __name__ == "__main__":
    main()
