"""Ablate the kernel-split glue to find the 3x composition overhead.

r5_split_decomp measured the split's two kernels at 23.3 M (dsts+cond)
and 14.5 M (ts, full chunk) — an expected composed rate of ~18 M — but
fit_many(plan=) delivers 6.1 M.  This script re-times the split with
pieces knocked out one at a time (same scan protocol, same cloud):

  full          _run_kernel_split verbatim (via fit_many(plan=))
  no_scatter    tail kernel runs, result merged with a select instead
                of at[idx].set
  no_gather     tail kernel runs on the chunk's first window (no
                data-dependent gather of the tail cases)
  no_tail       certified partition only (tail kernel + gather +
                scatter all removed)
  nonzero_only  fast kernel + nonzero + gather, tail kernel removed

Writes benchmarks/r5_split_ablate.json.
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
    from wlsqm_tpu.fitter import defs, ladder
    from wlsqm_tpu import api
    from wlsqm_tpu.ops import pallas_fit

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
    route = plan.route
    log("route: %s" % (route,))
    out["route"] = str(route)
    if route.path != "kernel-split":
        log("not a split route; nothing to ablate")
        sys.exit(1)

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
        log("%-13s %7.2f M fits/s (compile %.0fs, spread %.1f%%)"
            % (label, rate, comp, 100 * (ts[-1] - ts[0]) / ts[len(ts) // 2]))
        out[label] = round(rate, 3)
        return rate

    B = CHUNK
    kq = max(1, min(int(np.ceil(route.tail_frac * B)), B))
    ts_route = ladder.Route(path="kernel", kernel_precision="ts",
                            assembly="moments",
                            refine_steps=route.tail_refine_steps)

    def fast_part(xk, fk):
        return pallas_fit.fit_pallas_jit(
            xk, fk, nk, xi, None, dimension=2, order=4,
            weighting=defs.WEIGHT_CENTER, knowns=0, interpret=False,
            precision=route.kernel_precision, assembly="moments",
            refine_steps=route.refine_steps, emit_cond=True)

    def tail_fit(xk_t, fk_t, nk_t, xi_t):
        fi_t, _, _ = api._run_kernel_group(
            xk_t, fk_t, nk_t, xi_t, None, dim=2, order=4, knowns=0,
            weighting=defs.WEIGHT_CENTER, route=ts_route, refine_steps=None,
            do_sens=False, iterative=False, max_iter=0, interpret=False)
        return fi_t

    def full(xk, fk):
        return wt.fit_many(xk, fk, xi, nk=nk, order=4,
                           weighting=defs.WEIGHT_CENTER, plan=plan).fi

    def no_scatter(xk, fk):
        fi_fast, est = fast_part(xk, fk)
        bad = ~(est <= route.split_edge)
        (idx,) = jnp.nonzero(bad, size=kq, fill_value=B)
        idxc = jnp.minimum(idx, B - 1)
        fi_tail = tail_fit(xk[idxc], fk[idxc], nk[idxc], xi[idxc])
        return fi_fast + jnp.pad(fi_tail, ((0, B - kq), (0, 0)))

    def no_gather(xk, fk):
        fi_fast, est = fast_part(xk, fk)
        bad = ~(est <= route.split_edge)
        (idx,) = jnp.nonzero(bad, size=kq, fill_value=B)
        fi_tail = tail_fit(xk[:kq], fk[:kq], nk[:kq], xi[:kq])
        return fi_fast.at[idx].set(fi_tail, mode="drop")

    def no_tail(xk, fk):
        fi_fast, est = fast_part(xk, fk)
        return fi_fast + est[:, None]

    def nonzero_only(xk, fk):
        fi_fast, est = fast_part(xk, fk)
        bad = ~(est <= route.split_edge)
        (idx,) = jnp.nonzero(bad, size=kq, fill_value=B)
        idxc = jnp.minimum(idx, B - 1)
        return fi_fast + xk[idxc].sum() + fk[idxc].sum()

    measure(full, "full")
    measure(no_scatter, "no_scatter")
    measure(no_gather, "no_gather")
    measure(no_tail, "no_tail")
    measure(nonzero_only, "nonzero_only")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r5_split_ablate.json")
    with open(path, "w") as f:
        json.dump(out, f)
    log("wrote %s" % path)


if __name__ == "__main__":
    main()
