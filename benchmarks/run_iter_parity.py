"""ALGO_ITERATIVE iteration-count parity: kernel vs f64 engine (TPU).

The reference returns the refinement iteration count as API surface
(reference: wlsqm/fitter/impl.pyx:1026-1083); a user may branch on it.
The fused kernel computes the stagnation norms in ds/f32, so counts can
stagnate earlier than the f64 engine's.  Round-2 VERDICT (missing #3)
asked to QUANTIFY the divergence distribution — this script measures it
on hardware across radii and orders.

Run: python benchmarks/run_iter_parity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import wlsqm_tpu as wt  # noqa: F401
from wlsqm_tpu.fitter import defs, engine
from wlsqm_tpu.ops.pallas_fit import TILE, fit_pallas


def main():
    rng = np.random.default_rng(77)
    B, K, max_iter = TILE, 30, 10
    print("order radius | engine counts (min/med/max) | kernel counts | "
          "|diff| dist (0,1,2,>2) | dof rel diff", flush=True)
    for order in (2, 4):
        NO = defs.number_of_dofs(2, order)
        for radius in (1.0, 0.3):
            xi = rng.uniform(-1, 1, (B, 2))
            xk = xi[:, None, :] + rng.uniform(-radius, radius, (B, K, 2))
            fk = (np.sin(3 * xk[..., 0]) * np.cos(2 * xk[..., 1])
                  + 0.1 * rng.standard_normal((B, K)))
            args = (jnp.asarray(xk), jnp.asarray(fk),
                    jnp.full((B,), K, jnp.int32), jnp.asarray(xi),
                    jnp.zeros((B, NO)), jnp.full((B,), order, jnp.int32),
                    jnp.zeros((B,), jnp.int64),
                    jnp.full((B,), defs.WEIGHT_CENTER, jnp.int32))
            fi_e, _, it_e, _ = engine.fit_batch(
                *args, dimension=2, NO=NO, precision="f64",
                iterative=True, max_iter=max_iter)
            fi_k, it_k = fit_pallas(
                jnp.asarray(xk), jnp.asarray(fk),
                jnp.full((B,), K, jnp.int32), jnp.asarray(xi),
                dimension=2, order=order, weighting=defs.WEIGHT_CENTER,
                max_iter=max_iter)
            it_e = np.asarray(it_e)
            it_k = np.asarray(it_k)
            d = np.abs(it_e - it_k)
            dist = [(d == 0).mean(), (d == 1).mean(), (d == 2).mean(),
                    (d > 2).mean()]
            fi_e_np, fi_k_np = np.asarray(fi_e), np.asarray(fi_k)
            rel = (np.abs(fi_k_np - fi_e_np).max()
                   / np.abs(fi_e_np).max())
            print("%d %.2f | %d/%d/%d | %d/%d/%d | "
                  "%.2f/%.2f/%.2f/%.2f | %.2e"
                  % (order, radius,
                     it_e.min(), int(np.median(it_e)), it_e.max(),
                     it_k.min(), int(np.median(it_k)), it_k.max(),
                     *dist, rel), flush=True)


if __name__ == "__main__":
    main()
