"""Reproduce the secondary fused-kernel measurements of benchmarks/README.md.

Three device-resident scans on the default device (TPU):

  1. 3D order-4 (NO=35) throughput at K=48;
  2. in-kernel sensitivities (2D order-4 K=30, fits+sens);
  3. in-kernel ALGO_ITERATIVE (2D order-4 K=30, max_iter=3).

Each prints M fits/s from a best-of-3 timed `lax.scan` with a scalar
checksum (the remote-TPU dispatch path is asynchronous; unsynchronized
timings over-report).  The scan runs 16 steps so the ~35 ms fixed
host-sync cost of the remote tunnel amortizes (fewer steps understate
device throughput noticeably).  The headline DOF-only number is
bench.py.

Run:  python benchmarks/run_kernel_secondary.py  (compiles ~1 min total)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import wlsqm_tpu  # noqa: F401
from wlsqm_tpu.fitter import defs
from wlsqm_tpu.ops.pallas_fit import fit_pallas


def timed_scan(make_step, B, steps=16):
    @jax.jit
    def sweep(bump):
        def step(acc, i):
            out = make_step(bump * i)
            return acc + sum(jnp.sum(o) for o in out), None
        acc, _ = jax.lax.scan(step, jnp.float64(0.0), jnp.arange(steps))
        return acc

    float(sweep(jnp.float64(1e-9)))          # compile + first run
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(sweep(jnp.float64(1e-9)))
        best = min(best, time.perf_counter() - t0)
    return B * steps / best


def cloud(rng, B, K, dim):
    xi = rng.uniform(-1, 1, (B, dim))
    xk = jnp.asarray(xi[:, None, :] + rng.uniform(-1, 1, (B, K, dim)))
    fk = jnp.asarray(np.sin(np.asarray(xk)[..., 0])
                     + 0.3 * np.asarray(xk)[..., -1] ** 2)
    return xk, fk, jnp.full((B,), K, jnp.int32), jnp.asarray(xi)


def main():
    rng = np.random.default_rng(0)
    B = 8192

    xk3, fk3, nk3, xi3 = cloud(rng, B, 48, 3)
    r = timed_scan(lambda eps: (fit_pallas(
        xk3, fk3 + eps, nk3, xi3, dimension=3, order=4,
        weighting=defs.WEIGHT_CENTER),), B)
    print(f"[1] 3D order-4 NO=35 K=48:        {r/1e6:6.2f} M fits/s",
          flush=True)

    xk2, fk2, nk2, xi2 = cloud(rng, B, 30, 2)
    r = timed_scan(lambda eps: fit_pallas(
        xk2, fk2 + eps, nk2, xi2, dimension=2, order=4,
        weighting=defs.WEIGHT_CENTER, do_sens=True), B)
    print(f"[2] 2D order-4 K=30 + sens:       {r/1e6:6.2f} M fits+sens/s",
          flush=True)

    r = timed_scan(lambda eps: fit_pallas(
        xk2, fk2 + eps, nk2, xi2, dimension=2, order=4,
        weighting=defs.WEIGHT_CENTER, max_iter=3), B)
    print(f"[3] 2D order-4 K=30 iterative(3): {r/1e6:6.2f} M fits/s",
          flush=True)


if __name__ == "__main__":
    main()
