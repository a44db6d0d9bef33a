"""Decompose the composed IBVP step: gather, relayout, solve — where do
the milliseconds go?

run_ibvp_multifield.py measures the full step at ~6.1 ms (window gather)
vs ~0.69 ms for a standalone gather scan and ~0.3 ms for the solve — so
~5 ms is composition glue.  This script times, on the same cloud and
prepared state, scans of:

  1. gather-only        : pair window gather + trivial pair K-sum update
  2. solve-only         : pair solve on a FIXED fk (no gather)
  3. gather+solve       : the full ds-state step (control; ~6.1 ms)
  4. gather-native-sum  : gather kernel WITHOUT the (B, K, F) relayout —
                          consume the (nblk, F2p, TKp) output directly

Comparing 1 vs 4 isolates the post-kernel relayout; 1 + 2 vs 3 isolates
any remaining composition overhead XLA introduces between the two.

Run on TPU: python benchmarks/profile_ibvp_decompose.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import wlsqm_tpu as wt
from wlsqm_tpu.fitter import engine_ds
from wlsqm_tpu.ops import gather as gth
from wlsqm_tpu.ops import twofloat as tf
from wlsqm_tpu.utils import neighbors

STEPS = 50


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


def main():
    rng = np.random.default_rng(42)
    n, k = 20480, 28
    pts = rng.uniform(0.0, 1.0, (n, 2))
    pts = pts[gth.morton_order(pts)]
    xk_idx, _ = neighbors.knn(pts, pts, k + 1, backend="host")
    xk_idx = np.asarray(xk_idx)[:, 1:]
    idx = jnp.asarray(xk_idx.astype(np.int32))
    gplan = gth.plan_window_gather(xk_idx, n)
    assert gplan is not None
    print("plan coverage %.3f (%d bad blocks)"
          % (gplan.coverage, len(gplan.bad_blocks)), flush=True)
    prep = wt.prepare(jnp.asarray(pts[xk_idx]), jnp.asarray(pts), order=2,
                      weighting=wt.WEIGHT_CENTER, precision="ds",
                      scaling="jacobi", solver="chol_unrolled")
    u0 = jnp.asarray(np.sin(np.pi * pts[:, 0]) * np.sin(np.pi * pts[:, 1]))
    dtnu = tf.from_f64(jnp.float64(1e-6))

    def scan(step):
        @jax.jit
        def run(u):
            up = tf.from_f64(u)
            up, _ = jax.lax.scan(step, up, None, length=STEPS)
            return tf.to_f64(up)
        return run

    # 1. gather + relayout + trivial K-sum update (no solve)
    def step_gather(up, _):
        fkp = gth.gather_rows_pair(up, idx, gplan)       # (B, K) pair
        s = tf.sum_along(fkp, axis=-1)                   # (B,) pair
        return tf.add(up, tf.mul(s, (jnp.broadcast_to(dtnu[0], s[0].shape),
                                     jnp.broadcast_to(dtnu[1], s[0].shape)))), None

    # 2. solve on fixed fk (gather replaced by a constant)
    fk_fixed = tf.from_f64(jnp.asarray(u0)[idx])

    def step_solve(up, _):
        fip = engine_ds.solve_prepared_ds_pair(prep, fk_fixed)
        lap = tf.add((fip[0][:, wt.i2_X2], fip[1][:, wt.i2_X2]),
                     (fip[0][:, wt.i2_Y2], fip[1][:, wt.i2_Y2]))
        return tf.add(up, tf.mul(lap, (jnp.broadcast_to(dtnu[0], lap[0].shape),
                                       jnp.broadcast_to(dtnu[1], lap[0].shape)))), None

    # 3. full step (control)
    def step_full(up, _):
        fkp = gth.gather_rows_pair(up, idx, gplan)
        fip = engine_ds.solve_prepared_ds_pair(prep, fkp)
        lap = tf.add((fip[0][:, wt.i2_X2], fip[1][:, wt.i2_X2]),
                     (fip[0][:, wt.i2_Y2], fip[1][:, wt.i2_Y2]))
        return tf.add(up, tf.mul(lap, (jnp.broadcast_to(dtnu[0], lap[0].shape),
                                       jnp.broadcast_to(dtnu[1], lap[0].shape)))), None

    # 4. gather in the kernel's NATIVE (nblk, F2p, TKp) layout — no
    #    moveaxis/reshape back to (B, K); reduce lanes directly
    def step_native(up, _):
        planes = jnp.stack([up[0], up[1]], axis=1)       # (n, 2)
        pad_n = gplan.n_pad - n
        planes = jnp.concatenate(
            [planes, jnp.zeros((pad_n, 2), jnp.float32)])
        u2t = planes.T
        F2 = u2t.shape[0]
        F2p = -(-F2 // 8) * 8          # sublane pad, same rule as the kernel
        u2t = jnp.concatenate(
            [u2t, jnp.zeros((F2p - F2, gplan.n_pad), jnp.float32)])
        raw = gth._gather_f32(u2t, gth._prep_idx(idx, gplan), gplan)
        # consume in native layout: lane-sum (exact order differs; this is
        # a timing probe, not a numerics path)
        s = raw[:, 0, :].sum() + raw[:, 1, :].sum()
        return (up[0] + 0 * s.astype(jnp.float32), up[1]), None

    for name, step in [("gather+relayout+sum", step_gather),
                       ("solve-only", step_solve),
                       ("full step", step_full),
                       ("gather-native-sum", step_native)]:
        ms = timed(scan(step), u0)
        print("%-22s %7.2f ms/step" % (name, ms), flush=True)


if __name__ == "__main__":
    main()
