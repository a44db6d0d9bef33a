"""Round-5 item 3: the moment body at 3D (big lattices) — compile + perf.

Measures, per config (3D order 3 and order 4, the dim3 gate geometry):
  compile seconds, throughput (gate protocol), parity vs the f64 engine,
for both assemblies.  Baseline before the VMEM-backed register-pressure
rework; re-run after to quantify.

Usage: python benchmarks/run_r5_dim3_moment.py [order] [assembly]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import wlsqm_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from wlsqm_tpu.fitter import defs, engine
from wlsqm_tpu.ops.pallas_fit import fit_pallas
from benchmarks.run_regression_gate import _chunks, _measure_rate


def run(order, assembly, chunk=8192, K=48, dim=3):
    NO = defs.number_of_dofs(dim, order)
    key = jax.random.PRNGKey(7)
    key, (xks, fks) = _chunks(key, chunk, K, dim)
    nk = jnp.full((chunk,), K, jnp.int32)
    xi = jnp.zeros((chunk, dim))
    out = dict(order=order, assembly=assembly)

    def fit_chunk(xk, fk):
        return fit_pallas(xk, fk, nk, xi, dimension=dim, order=order,
                          weighting=defs.WEIGHT_CENTER, refine_steps=2,
                          assembly=assembly)

    rate, spread, compile_s = _measure_rate(fit_chunk, xks, fks, chunk)
    out.update(mfits=round(rate / 1e6, 3), spread=round(spread, 4),
               compile_s=round(compile_s, 1))
    print("3D o%d %s: %.2f M fits/s (spread %.1f%%, compile %.0f s)"
          % (order, assembly, rate / 1e6, 100 * spread, compile_s),
          flush=True)

    B = 1024
    fi = jax.jit(lambda a, b: fit_pallas(
        a, b, nk[:B], xi[:B], dimension=dim, order=order,
        weighting=defs.WEIGHT_CENTER, refine_steps=2,
        assembly=assembly))(xks[0][:B], fks[0][:B])
    f64, _, _, _ = engine.fit_batch(
        xks[0][:B], fks[0][:B], nk[:B], xi[:B], jnp.zeros((B, NO)),
        jnp.full((B,), order, jnp.int32), jnp.zeros((B,), jnp.int64),
        jnp.full((B,), defs.WEIGHT_CENTER, jnp.int32),
        dimension=dim, NO=NO)
    f64 = np.asarray(f64)
    rel = np.abs(np.asarray(fi) - f64).max() / np.abs(f64).max()
    out["parity"] = float(rel)
    print("   parity vs f64 engine: %.2e" % rel, flush=True)
    return out


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    assemblies = ([sys.argv[2]] if len(sys.argv) > 2
                  else ["moments", "rows"])
    res = [run(order, a) for a in assemblies]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r5_dim3_o%d.json" % order)
    existing = []
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    with open(path, "w") as f:
        json.dump(existing + [dict(r, ts=time.time()) for r in res], f,
                  indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
