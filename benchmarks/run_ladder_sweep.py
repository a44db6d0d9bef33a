"""Validate the precision ladder on real TPU: error + throughput per rung.

For probe-rejected configurations (order-4 fits over small radii — the
round-2 VERDICT's 1000x-cliff scenario), measures against a host
NumPy/LAPACK f64 oracle:

* the plain fused kernel's error (the ds floor the probe predicts),
* the engine rungs' error: fast (adaptive sweeps), mixed, f64,
* end-to-end ``fit_many(backend="auto")`` error and chosen route,
* throughput of kernel / fast / mixed / f64 on a rejected config,
  using the compiled-scan protocol of bench.py (resident chunks, scalar
  checksum sync — naive per-call timing is tunnel-latency-bound).

This run also recorded the refined-kernel dead end (see
fitter/ladder.py docstring): outer data-space refinement over the ds
kernel stalls at ~0.2-0.3x the plain floor (basis-representation-limited),
e.g. radius 0.05 uniform: plain 2.1e-6 -> refined 4.4e-7 (rounds 1 == 2).

Usage: python benchmarks/run_ladder_sweep.py [sweep_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import wlsqm_tpu as wt  # noqa: F401  (enables x64)
from wlsqm_tpu.fitter import condprobe, defs, engine, ladder
from wlsqm_tpu.ops.pallas_fit import TILE, fit_pallas
from benchmarks.run_cond_sweep import host_oracle, jacobi_cond

NO4 = defs.number_of_dofs(2, 4)


def _problem(rng, B, K, radius):
    xi = rng.uniform(-1, 1, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-radius, radius, (B, K, 2))
    fk = (np.sin(3 * xk[..., 0]) * np.cos(2 * xk[..., 1])
          + 0.3 * xk[..., 0] * xk[..., 1])
    return xk, fk, xi


def _oracle_fi(xk, xi, fk, weighting):
    A, c, w = host_oracle(xk, xi, weighting)
    b = np.einsum("bkj,bk,bk->bj", c, w, fk)
    return np.linalg.solve(A, b[..., None])[..., 0], jacobi_cond(A)


def _rel(fi, fi_ref):
    scale = np.abs(fi_ref).max(axis=0)
    return (np.abs(fi - fi_ref) / scale).max()


def _engine(xk, fk, xi, weighting, precision, mixed_steps=None):
    B, K, _ = xk.shape
    args = (jnp.asarray(xk), jnp.asarray(fk), jnp.full((B,), K, jnp.int32),
            jnp.asarray(xi), jnp.zeros((B, NO4)),
            jnp.full((B,), 4, jnp.int32), jnp.zeros((B,), jnp.int64),
            jnp.full((B,), weighting, jnp.int32))
    return np.asarray(engine.fit_batch(
        *args, dimension=2, NO=NO4, precision=precision,
        mixed_steps=mixed_steps)[0])


def accuracy_sweep(rng, K=30):
    print("=== accuracy vs host f64 oracle (order 4, K=%d) ===" % K,
          flush=True)
    print("weighting radius cond_max floor_pred err_kernel err_fast "
          "err_mixed err_f64eng err_auto fast_vs_f64 route", flush=True)
    B = TILE
    for weighting in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER):
        for radius in (0.03, 0.05, 0.1, 0.15, 0.3):
            xk, fk, xi = _problem(rng, B, K, radius)
            fi_ref, cond = _oracle_fi(xk, xi, fk, weighting)
            nk = jnp.full((B,), K, jnp.int32)
            fi_p = np.asarray(fit_pallas(
                jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi),
                dimension=2, order=4, weighting=weighting))
            ca = condprobe.probe(xk, nk, xi, 4, weighting, dimension=2)
            route = ladder.choose(ca, kernel_ok=True)
            floor = float(condprobe.DS_UNIT * (ca[0] * ca[1]).max())
            steps = route.mixed_steps or 6
            fi_fast = _engine(xk, fk, xi, weighting, "fast", steps)
            fi_mixed = _engine(xk, fk, xi, weighting, "mixed", steps)
            fi_f64 = _engine(xk, fk, xi, weighting, "f64")
            res = wt.fit_many(xk, fk, xi, order=4, weighting=weighting)
            plan = wt.plan_fit_many(xk, xi, order=4, weighting=weighting)
            r = plan.route
            rdesc = (r.path if r.path == "kernel"
                     else f"{r.precision}:{r.mixed_steps}")
            print(f"{weighting} {radius} {cond.max():.3g} {floor:.3g} "
                  f"{_rel(fi_p, fi_ref):.3g} {_rel(fi_fast, fi_ref):.3g} "
                  f"{_rel(fi_mixed, fi_ref):.3g} {_rel(fi_f64, fi_ref):.3g} "
                  f"{_rel(np.asarray(res.fi), fi_ref):.3g} "
                  f"{_rel(fi_fast, fi_f64):.3g} {rdesc}",
                  flush=True)


def throughput(rng, sweep_steps=16, K=30, radius=0.1):
    CHUNK = 8 * TILE
    RESIDENT = 2
    print(f"\n=== throughput (compiled scan, chunk={CHUNK}, "
          f"steps={sweep_steps}): rejected config radius={radius} "
          f"(K={K}, order 4, WEIGHT_CENTER) ===", flush=True)
    xk, fk, xi = _problem(rng, RESIDENT * CHUNK, K, radius)
    xks = jnp.asarray(xk).reshape(RESIDENT, CHUNK, K, 2)
    fks = jnp.asarray(fk).reshape(RESIDENT, CHUNK, K)
    xis = jnp.asarray(xi).reshape(RESIDENT, CHUNK, 2)
    nk = jnp.full((CHUNK,), K, jnp.int32)
    fi0 = jnp.zeros((CHUNK, NO4))
    order_a = jnp.full((CHUNK,), 4, jnp.int32)
    knowns_a = jnp.zeros((CHUNK,), jnp.int64)
    wm_a = jnp.full((CHUNK,), defs.WEIGHT_CENTER, jnp.int32)

    ca = condprobe.probe(xk, None, xi, 4, defs.WEIGHT_CENTER, dimension=2)
    route = ladder.choose(ca, kernel_ok=True)
    steps = route.mixed_steps or 6
    print(f"ladder route for this config: {route}", flush=True)

    def kernel_chunk(xk_c, fk_c, xi_c):
        return fit_pallas(xk_c, fk_c, nk, xi_c, dimension=2, order=4,
                          weighting=defs.WEIGHT_CENTER)

    def eng_chunk(precision, mixed_steps=None):
        def f(xk_c, fk_c, xi_c):
            return engine.fit_batch(
                xk_c, fk_c, nk, xi_c, fi0, order_a, knowns_a, wm_a,
                dimension=2, NO=NO4, precision=precision,
                mixed_steps=mixed_steps)[0]
        return f

    variants = [
        ("plain kernel (ds floor %.1e)" % float(
            condprobe.DS_UNIT * (ca[0] * ca[1]).max()), kernel_chunk),
        ("fast rung (%d sweeps)" % steps, eng_chunk("fast", steps)),
        ("mixed rung (%d sweeps)" % steps, eng_chunk("mixed", steps)),
        ("ds engine", eng_chunk("ds")),
        ("f64 engine", eng_chunk("f64")),
    ]
    for name, fit_chunk in variants:
        @jax.jit
        def sweep(xks, fks, xis, fit_chunk=fit_chunk):
            def step(acc, i):
                j = i % RESIDENT
                fi = fit_chunk(xks[j], fks[j], xis[j])
                return acc + fi.sum(), None
            acc, _ = jax.lax.scan(step, jnp.float64(0.0),
                                  jnp.arange(sweep_steps))
            return acc

        t0 = time.perf_counter()
        float(sweep(xks, fks, xis))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(sweep(xks, fks, xis))
            times.append(time.perf_counter() - t0)
        rate = sweep_steps * CHUNK / min(times)
        print(f"{name:34s}: {rate / 1e6:8.3f} M fits/s "
              f"(compile {compile_s:.0f}s)", flush=True)


def main():
    sweep_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.default_rng(20260817)
    accuracy_sweep(rng)
    throughput(rng, sweep_steps)


if __name__ == "__main__":
    main()
