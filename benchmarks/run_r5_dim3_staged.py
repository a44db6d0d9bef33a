"""Round-5 item 3: staged moment kernel at 3D — compile + perf + parity.

Usage: python benchmarks/run_r5_dim3_staged.py [order] [force_stage(0|1)]
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
from wlsqm_tpu.ops import pallas_fit
from benchmarks.run_regression_gate import _chunks, _measure_rate


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    if len(sys.argv) > 2 and sys.argv[2] == "1":
        pallas_fit._moment_staged = lambda d, o: True
    dim, K, chunk = 3, 48, 8192
    NO = defs.number_of_dofs(dim, order)
    staged = pallas_fit._moment_staged(dim, order)
    print("3D o%d staged=%s NM=%d" % (
        order, staged,
        len(pallas_fit._moment_lattice(dim, 2 * order)[0])), flush=True)
    key = jax.random.PRNGKey(7)
    key, (xks, fks) = _chunks(key, chunk, K, dim)
    nk = jnp.full((chunk,), K, jnp.int32)
    xi = jnp.zeros((chunk, dim))

    def fit_chunk(xk, fk):
        return pallas_fit.fit_pallas(
            xk, fk, nk, xi, dimension=dim, order=order,
            weighting=defs.WEIGHT_CENTER, refine_steps=2,
            assembly="moments")

    rate, spread, compile_s = _measure_rate(fit_chunk, xks, fks, chunk)
    print("moments: %.2f M fits/s (spread %.1f%%, compile %.0f s)"
          % (rate / 1e6, 100 * spread, compile_s), flush=True)

    B = 1024
    fi = jax.jit(lambda a, b: pallas_fit.fit_pallas(
        a, b, nk[:B], xi[:B], dimension=dim, order=order,
        weighting=defs.WEIGHT_CENTER, refine_steps=2,
        assembly="moments"))(xks[0][:B], fks[0][:B])
    f64, _, _, _ = engine.fit_batch(
        xks[0][:B], fks[0][:B], nk[:B], xi[:B], jnp.zeros((B, NO)),
        jnp.full((B,), order, jnp.int32), jnp.zeros((B,), jnp.int64),
        jnp.full((B,), defs.WEIGHT_CENTER, jnp.int32),
        dimension=dim, NO=NO)
    f64 = np.asarray(f64)
    rel = np.abs(np.asarray(fi) - f64).max() / np.abs(f64).max()
    print("parity vs f64 engine: %.2e" % rel, flush=True)
    out = dict(order=order, staged=bool(staged),
               mfits=round(rate / 1e6, 3), spread=round(spread, 4),
               compile_s=round(compile_s, 1), parity=float(rel),
               ts=time.time())
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r5_dim3_staged.json")
    existing = []
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    with open(path, "w") as f:
        json.dump(existing + [out], f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
