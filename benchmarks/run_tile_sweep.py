"""Sublane-count (tile_s) throughput sweep for the fused kernel.

The kernel lays cases on (tile_s, 128) f32 tiles; tile_s=8 is one
hardware vector tile per op, tile_s=16/32 process 2/4 independent tiles
per op — identical per-case arithmetic (bit-identity pinned by
tests/test_pallas_fit.py::test_tile_s_bit_identity) but more
instruction-level parallelism across the Cholesky / refinement
dependency chains, at tile_s/8 x the VMEM footprint.

Headline config: 2D order 4, K=30, WEIGHT_CENTER, refine_steps=2
(the probe-selected production sweep count on the benchmark cloud).
One compiled lax.scan per tile_s, scalar checksum carried through
(remote-bridge timing rules; see bench.py).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 32768
RESIDENT = 4
STEPS = 16
K = 30


def main():
    import jax
    import jax.numpy as jnp

    import wlsqm_tpu  # noqa: F401
    from wlsqm_tpu.fitter import defs
    from wlsqm_tpu.ops.pallas_fit import fit_pallas

    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_chunk(key):
        k1, k2 = jax.random.split(key)
        xk = jax.random.uniform(k1, (CHUNK, K, 2), jnp.float64, -1.0, 1.0)
        fk = jnp.sin(3.0 * xk[..., 0]) * jnp.cos(2.0 * xk[..., 1])
        fk = fk + 0.01 * jax.random.normal(k2, (CHUNK, K), jnp.float64)
        return xk, fk

    xs, fs = [], []
    for _ in range(RESIDENT):
        key, sub = jax.random.split(key)
        xk, fk = make_chunk(sub)
        xs.append(xk)
        fs.append(fk)
    xks, fks = jnp.stack(xs), jnp.stack(fs)
    jax.block_until_ready((xks, fks))
    nk = jnp.full((CHUNK,), K, jnp.int32)
    xi = jnp.zeros((CHUNK, 2))

    rows = []
    for tile_s in (8, 16, 32):
        def fit_chunk(xk, fk, tile_s=tile_s):
            return fit_pallas(xk, fk, nk, xi, dimension=2, order=4,
                              weighting=defs.WEIGHT_CENTER, refine_steps=2,
                              tile_s=tile_s)

        @jax.jit
        def sweep(xks, fks):
            def step(acc, i):
                j = i % RESIDENT
                return acc + fit_chunk(xks[j], fks[j]).sum(), None

            acc, _ = jax.lax.scan(step, jnp.float64(0.0),
                                  jnp.arange(STEPS))
            return acc

        t0 = time.perf_counter()
        chk = float(sweep(xks, fks))
        print("tile_s=%d compile+first: %.1fs checksum=%r"
              % (tile_s, time.perf_counter() - t0, chk), flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(sweep(xks, fks))
            times.append(time.perf_counter() - t0)
        rate = STEPS * CHUNK / min(times)
        rows.append((tile_s, rate, chk))
        print("tile_s=%d  %.2f M fits/s" % (tile_s, rate / 1e6), flush=True)

    print("\n| tile_s | M fits/s |", flush=True)
    print("|---|---|", flush=True)
    for tile_s, rate, _ in rows:
        print("| %d | %.2f |" % (tile_s, rate / 1e6), flush=True)
    checks = {c for _, _, c in rows}
    print("checksums identical:", len(checks) == 1, flush=True)


if __name__ == "__main__":
    main()
