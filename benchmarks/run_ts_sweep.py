"""Calibrate + benchmark the triple-single ("ts") kernel variant on TPU.

Measures, per (weighting, radius) configuration of the ladder sweep:

* the ds kernel's error vs the host NumPy/LAPACK f64 oracle (the known
  floor, model ``DS_UNIT * cond * amp``),
* the ts kernel's error vs the same oracle — expected to be limited by
  the ORACLE's own f64 arithmetic (~``2^-53 * cond * amp``) once the
  triple arithmetic is below it,
* the implied per-config "unit" err / max(cond*amp), whose maximum over
  the sweep calibrates ``condprobe.TS_PARITY_UNIT`` (the ladder's gate
  for routing middle-band batches onto the ts kernel),

and the throughput of ts vs ds kernels with the compiled-scan protocol.

Usage: python benchmarks/run_ts_sweep.py [sweep_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import wlsqm_tpu as wt  # noqa: F401  (enables x64)
from wlsqm_tpu.fitter import condprobe, defs
from wlsqm_tpu.ops.pallas_fit import TILE, fit_pallas
from benchmarks.run_ladder_sweep import _oracle_fi, _problem, _rel

NO4 = defs.number_of_dofs(2, 4)


def accuracy(rng, K=30):
    print("=== ts kernel accuracy vs host f64 oracle (order 4, K=%d) ===" % K,
          flush=True)
    print("wgt radius cond_max ca_max floor_ds err_ds err_ts "
          "unit_ts(err/ca)", flush=True)
    units = []
    B = TILE
    for weighting in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER):
        for radius in (0.03, 0.05, 0.1, 0.15, 0.3, 1.0):
            xk, fk, xi = _problem(rng, B, K, radius)
            fi_ref, cond = _oracle_fi(xk, xi, fk, weighting)
            nk = jnp.full((B,), K, jnp.int32)
            com = dict(dimension=2, order=4, weighting=weighting)
            fi_ds = np.asarray(fit_pallas(
                jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi), **com))
            fi_ts = np.asarray(fit_pallas(
                jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi),
                precision="ts", **com))
            ca = condprobe.probe(xk, nk, xi, 4, weighting, dimension=2)
            ca_max = float((ca[0] * ca[1]).max())
            floor = condprobe.DS_UNIT * ca_max
            e_ds = _rel(fi_ds, fi_ref)
            e_ts = _rel(fi_ts, fi_ref)
            unit = e_ts / ca_max
            units.append(unit)
            print(f"{weighting} {radius} {cond.max():.3g} {ca_max:.3g} "
                  f"{floor:.3g} {e_ds:.3g} {e_ts:.3g} {unit:.3g}",
                  flush=True)
    print(f"max implied ts unit over sweep: {max(units):.3g} "
          f"(f64-oracle own unit ~1.1e-16)", flush=True)


def throughput(rng, sweep_steps=16, K=30, radius=0.1):
    CHUNK = 8 * TILE
    RESIDENT = 2
    print(f"\n=== throughput (compiled scan, chunk={CHUNK}, "
          f"steps={sweep_steps}): radius={radius} "
          f"(K={K}, order 4, WEIGHT_CENTER) ===", flush=True)
    xk, fk, xi = _problem(rng, RESIDENT * CHUNK, K, radius)
    xks = jnp.asarray(xk).reshape(RESIDENT, CHUNK, K, 2)
    fks = jnp.asarray(fk).reshape(RESIDENT, CHUNK, K)
    xis = jnp.asarray(xi).reshape(RESIDENT, CHUNK, 2)
    nk = jnp.full((CHUNK,), K, jnp.int32)

    for name, prec in (("ds kernel", "ds"), ("ts kernel", "ts")):
        def fit_chunk(xk_c, fk_c, xi_c, prec=prec):
            return fit_pallas(xk_c, fk_c, nk, xi_c, dimension=2, order=4,
                              weighting=defs.WEIGHT_CENTER, precision=prec)

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
        print(f"{name:12s}: {rate / 1e6:8.3f} M fits/s "
              f"(compile {compile_s:.0f}s)", flush=True)


def main():
    sweep_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.default_rng(20260817)
    accuracy(rng)
    throughput(rng, sweep_steps)


if __name__ == "__main__":
    main()
