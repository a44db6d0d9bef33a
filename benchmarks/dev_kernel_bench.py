"""Dev harness: time one fit_pallas variant on the headline cloud.

Quick-turnaround companion to bench.py for kernel optimization work:
same cloud/protocol (compiled scan over resident chunks, checksum-synced,
median of reps) but parameterized from the command line so individual
kernel variants can be measured in ~1 min each.

Usage:
    python benchmarks/dev_kernel_bench.py [--steps N] [--reps N]
        [--refine-steps N] [--precision ds|ts] [--order N] [--K N]
        [--weighting uniform|center] [--sens] [--max-iter N] [--dim D]

Prints fits/s and the L-inf relative DOF parity vs the NumPy f64 oracle
(bench.parity_check) on 256 cases.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--refine-steps", type=int, default=2)
    ap.add_argument("--precision", default="ds")
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--K", type=int, default=30)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--weighting", default="center")
    ap.add_argument("--sens", action="store_true")
    ap.add_argument("--max-iter", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--no-parity", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import _axon_relay_preflight, parity_check

    if not _axon_relay_preflight(120):
        print("relay down", file=sys.stderr)
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    import wlsqm_tpu  # noqa: F401
    from wlsqm_tpu.fitter import defs
    from wlsqm_tpu.ops.pallas_fit import fit_pallas

    CHUNK, K, D = args.chunk, args.K, args.dim
    wgt = (defs.WEIGHT_CENTER if args.weighting == "center"
           else defs.WEIGHT_UNIFORM)
    key = jax.random.PRNGKey(42)

    @jax.jit
    def make_chunk(key):
        k1, k2 = jax.random.split(key)
        xk = jax.random.uniform(k1, (CHUNK, K, D), jnp.float64, -1.0, 1.0)
        fk = jnp.sin(3.0 * xk[..., 0]) * jnp.cos(2.0 * xk[..., -1])
        fk = fk + 0.01 * jax.random.normal(k2, (CHUNK, K), jnp.float64)
        return xk, fk

    RES = 2
    xs, fs = [], []
    for _ in range(RES):
        key, sub = jax.random.split(key)
        xk, fk = make_chunk(sub)
        xs.append(xk)
        fs.append(fk)
    xks, fks = jnp.stack(xs), jnp.stack(fs)
    jax.block_until_ready((xks, fks))

    nk = jnp.full((CHUNK,), K, jnp.int32)
    xi = jnp.zeros((CHUNK, D))

    def fit_chunk(xk, fk):
        out = fit_pallas(xk, fk, nk, xi, dimension=D, order=args.order,
                         weighting=wgt, refine_steps=args.refine_steps,
                         do_sens=args.sens, max_iter=args.max_iter,
                         precision=args.precision)
        return out[0] if isinstance(out, tuple) else out

    @jax.jit
    def sweep(xks, fks):
        def step(acc, i):
            fi = fit_chunk(xks[i % RES], fks[i % RES])
            return acc + fi.sum(), None
        acc, _ = jax.lax.scan(step, jnp.float64(0.0),
                              jnp.arange(args.steps))
        return acc

    t0 = time.perf_counter()
    float(sweep(xks, fks))
    print("compile+first: %.1f s" % (time.perf_counter() - t0),
          file=sys.stderr)
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(sweep(xks, fks))
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    fits = args.steps * CHUNK
    spread = (times[-1] - times[0]) / dt
    print("%.3f M fits/s  (%.3f s, spread %.1f%%)"
          % (fits / dt / 1e6, dt, 100 * spread))

    if not args.no_parity and D == 2 and args.order == 4 and wgt == \
            defs.WEIGHT_CENTER:
        NPAR = 256
        fi_dev = np.asarray(fit_chunk(xks[0], fks[0])[:NPAR])
        par = parity_check(np.asarray(xks[0][:NPAR]),
                           np.asarray(fks[0][:NPAR]), fi_dev)
        print("parity L-inf rel: %.3e" % par)


if __name__ == "__main__":
    main()
