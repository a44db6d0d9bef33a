"""Round-5 validation: ALGO_ITERATIVE on the moment-assembly body (TPU).

Measures, on the real chip:
  1. parity of the moment-iterative kernel vs an independent NumPy f64
     iterative solve (the strong oracle), headline config + max_iter=3;
  2. throughput rows-vs-moments at max_iter=3 (the gate's iterative row
     protocol: compiled scan, >=0.5 s timed region, median of 5);
  3. iteration-count agreement distribution between the two bodies.

Verdict item 4 target: iterative row >= 18 M fits/s (round 4: 13.9 M).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import wlsqm_tpu  # noqa: F401  (x64 on import)
import jax
import jax.numpy as jnp

from wlsqm_tpu.fitter import defs, engine
from wlsqm_tpu.ops.pallas_fit import fit_pallas
from benchmarks.run_regression_gate import _chunks, _measure_rate


def main():
    chunk, K, dim, order = 32768, 30, 2, 4
    NO = 15
    key = jax.random.PRNGKey(5)
    key, (xks, fks) = _chunks(key, chunk, K, dim)
    nk = jnp.full((chunk,), K, jnp.int32)
    xi = jnp.zeros((chunk, dim))
    out = {}

    # --- parity on a 2048-case slice vs the f64 engine (itself oracle-
    #     verified elsewhere); the engine runs the reference algorithm
    B = 2048
    xks0, fks0 = xks[0][:B], fks[0][:B]
    nk0, xi0 = nk[:B], xi[:B]
    for assembly in ("moments", "rows"):
        t0 = time.perf_counter()
        fi, it = jax.jit(lambda a, b: fit_pallas(
            a, b, nk0, xi0, dimension=dim, order=order,
            weighting=defs.WEIGHT_CENTER, refine_steps=2, max_iter=3,
            assembly=assembly))(xks0, fks0)
        fi, it = np.asarray(fi), np.asarray(it)
        print("%s compile+run: %.1f s" % (assembly,
                                          time.perf_counter() - t0),
              flush=True)
        f64, _, it64, ok = engine.fit_batch(
            xks0, fks0, nk0, xi0, jnp.zeros((B, NO)),
            jnp.full((B,), order, jnp.int32), jnp.zeros((B,), jnp.int64),
            jnp.full((B,), defs.WEIGHT_CENTER, jnp.int32),
            dimension=dim, NO=NO, iterative=True, max_iter=3)
        f64 = np.asarray(f64)
        rel = np.abs(fi - f64).max() / np.abs(f64).max()
        agree = (np.abs(it - np.asarray(it64)) <= 1).mean()
        out["%s_parity" % assembly] = float(rel)
        out["%s_count_agree_pm1" % assembly] = float(agree)
        out["%s_counts" % assembly] = it.tolist()[:0] or None
        print("%s: parity %.2e, count agree(+-1) %.1f%%, it med %d"
              % (assembly, rel, 100 * agree, int(np.median(it))),
              flush=True)
        if assembly == "moments":
            it_m = it
        else:
            cl = (np.abs(it_m - it) <= 1).mean()
            out["mr_count_agree_pm1"] = float(cl)
            print("moments-vs-rows count agree(+-1): %.1f%%" % (100 * cl),
                  flush=True)

    # --- throughput, gate protocol
    for assembly in ("rows", "moments"):
        def fit_chunk(xk, fk, assembly=assembly):
            fi, _ = fit_pallas(xk, fk, nk, xi, dimension=dim, order=order,
                               weighting=defs.WEIGHT_CENTER,
                               refine_steps=2, max_iter=3,
                               assembly=assembly)
            return fi
        rate, spread, compile_s = _measure_rate(fit_chunk, xks, fks, chunk)
        out["%s_mfits" % assembly] = round(rate / 1e6, 3)
        out["%s_spread" % assembly] = round(spread, 4)
        out["%s_compile_s" % assembly] = round(compile_s, 1)
        print("%s: %.2f M fits/s (spread %.1f%%, compile %.0f s)"
              % (assembly, rate / 1e6, 100 * spread, compile_s), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r5_iter_moment.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
