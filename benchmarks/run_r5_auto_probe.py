"""Round-5 public-route probe: the split-routed auto path, end to end.

1. Plans the headline config through the PUBLIC ``plan_fit_many`` (which
   may upgrade to the per-case split route) and prints the route.
2. Measures, with the regression-gate scan protocol, the end-to-end
   ``fit_many(plan=...)`` throughput against the forced moments-ds
   kernel on the same data — the auto/forced ratio VERDICT r4 asked to
   close (weak #1).
3. Split soundness end-to-end: executes the production split on
   calibration-family batches that straddle the edge and checks every
   CERTIFIED case (kernel key <= edge) against the strong oracle at the
   1e-10 bar, and that tail-window cases match the ts kernel.

Writes benchmarks/r5_auto_probe.json.
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

    import wlsqm_tpu as wt
    from wlsqm_tpu.fitter import calibration, condprobe, defs
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

    plan = wt.plan_fit_many(xk, xi, nk=nk, order=4,
                            weighting=defs.WEIGHT_CENTER)
    r = plan.route
    out["route"] = dict(path=r.path, kp=r.kernel_precision,
                        assembly=r.assembly, refine_steps=r.refine_steps,
                        split_edge=r.split_edge, tail_frac=r.tail_frac,
                        tail_refine_steps=r.tail_refine_steps)
    log("route: %s" % (out["route"],))

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
        log("%s: %.2f M fits/s (compile %.0fs, spread %.1f%%)"
            % (label, rate, comp, 100 * (ts[-1] - ts[0]) / ts[len(ts) // 2]))
        return rate

    out["auto_rate_M"] = measure(
        lambda xk, fk: wt.fit_many(xk, fk, xi, nk=nk, order=4,
                                   weighting=defs.WEIGHT_CENTER,
                                   plan=plan).fi,
        "auto (planned, split)")
    out["forced_mom_ds_rate_M"] = measure(
        lambda xk, fk: fit_pallas(xk, fk, nk, xi, dimension=2, order=4,
                                  weighting=defs.WEIGHT_CENTER,
                                  refine_steps=2, assembly="moments"),
        "forced mom-ds r2")
    out["auto_vs_forced"] = (out["auto_rate_M"]
                             / out["forced_mom_ds_rate_M"])
    log("auto/forced = %.3f" % out["auto_vs_forced"])

    # ---- split soundness end-to-end --------------------------------------
    rng = np.random.default_rng(20260821)
    B = 1024
    sound = []
    for radius in (0.15, 0.3, 0.6):
        xks, fks, xis = calibration._problem(rng, B, K, radius, 2)
        ref = calibration._strong_oracle(xks, xis, fks,
                                         defs.WEIGHT_CENTER, 2)
        scale = np.abs(ref).max(-1)
        nks = jnp.full((B,), K, jnp.int32)
        plan_s = wt.plan_fit_many(jnp.asarray(xks), jnp.asarray(xis),
                                  nk=nks, order=4,
                                  weighting=defs.WEIGHT_CENTER)
        res = wt.fit_many(jnp.asarray(xks), jnp.asarray(fks),
                          jnp.asarray(xis), nk=nks, order=4,
                          weighting=defs.WEIGHT_CENTER, plan=plan_s)
        err = np.abs(np.asarray(res.fi) - ref).max(-1) / scale
        _, est = fit_pallas(jnp.asarray(xks), jnp.asarray(fks), nks,
                            jnp.asarray(xis), dimension=2, order=4,
                            weighting=defs.WEIGHT_CENTER,
                            assembly="moments",
                            precision=(plan_s.route.kernel_precision
                                       if plan_s.route.path == "kernel-split"
                                       else "ds"),
                            refine_steps=plan_s.route.refine_steps or 3,
                            emit_cond=True)
        est = np.asarray(est)
        edge = plan_s.route.split_edge
        if edge is not None:
            cert = est <= edge
            viol = cert & (err > 1e-10)
            sound.append(dict(
                radius=radius, path=plan_s.route.path,
                certified=int(cert.sum()), violations=int(viol.sum()),
                worst_certified=float(err[cert].max()) if cert.any() else 0,
                worst_overall=float(err.max())))
        else:
            sound.append(dict(radius=radius, path=plan_s.route.path,
                              worst_overall=float(err.max())))
        log("soundness r=%.2f: %s" % (radius, sound[-1]))
    out["soundness"] = sound

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r5_auto_probe.json")
    with open(path, "w") as f:
        json.dump(out, f)
    log("wrote %s" % path)


if __name__ == "__main__":
    main()
