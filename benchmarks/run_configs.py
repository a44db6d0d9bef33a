"""Run the BASELINE.json benchmark configurations and report parity + speed.

The five configs (BASELINE.md):
  1. fit_2D order-2 single-neighborhood fit (WEIGHT_UNIFORM)
  2. fit_2D_many batched fits, 100k-point cloud, orders 0-4, WEIGHT_CENTER
  3. fit_1D_many / fit_3D_many with full mixed-derivative readout (order 4)
  4. known-DOF elimination: unknown F at boundary points (Neumann setup)
  5. ExpertSolver prepare-once/solve-many time-stepping loop with sensitivity

Each config checks DOFs against an independent NumPy/LAPACK float64 pipeline
(L∞ relative) and reports wall time.  Run on the default JAX device:

    python benchmarks/run_configs.py [--points 100000]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time
from math import factorial

import numpy as np
import scipy.linalg

import wlsqm_tpu as wt
from wlsqm_tpu.fitter import tables


def log(msg):
    print(msg, flush=True)


def ref_fit(xk, fk, xi, dim, order, weighting, knowns=0, fi_known=None):
    """Independent NumPy float64 reference solve for one case."""
    no = wt.number_of_dofs(dim, order)
    exp = np.asarray(tables.EXPONENTS[dim][:no])
    invf = np.array([1.0 / np.prod([factorial(int(e)) for e in row])
                     for row in exp])
    d = np.atleast_2d(xk) - np.atleast_1d(xi)
    if dim == 1:
        d = d.reshape(-1, 1)
    c = np.prod(d[:, None, :] ** exp[None, :, :], axis=2) * invf
    d2 = (d * d).sum(1)
    if weighting == wt.WEIGHT_CENTER:
        t = 1 - np.sqrt(d2 / d2.max())
        w = 1e-4 + (1 - 1e-4) * t * t
    else:
        w = np.ones_like(d2)
    unknown = [j for j in range(no) if not (knowns >> j) & 1]
    rhs_data = fk.astype(float).copy()
    if fi_known is not None and knowns:
        for j in range(no):
            if (knowns >> j) & 1:
                rhs_data -= fi_known[j] * c[:, j]
    Cu = c[:, unknown]
    A = Cu.T @ (w[:, None] * Cu)
    b = Cu.T @ (w * rhs_data)
    x = scipy.linalg.solve(A, b, assume_a="sym")
    out = np.zeros(no) if fi_known is None else fi_known.astype(float).copy()
    out[unknown] = x
    return out


def config1(rng):
    log("\n[1] fit_2D order-2 single fit, WEIGHT_UNIFORM")
    f = lambda xy: 1 + 2*xy[..., 0] + 3*xy[..., 1] + 4*xy[..., 0]*xy[..., 1]
    xk = rng.uniform(-1, 1, (30, 2))
    fk = f(xk)
    fi = np.zeros(6)
    t0 = time.perf_counter()
    wt.fit_2D(xk=xk, fk=fk, xi=np.zeros(2), fi=fi, sens=None, do_sens=False,
              order=2, knowns=0, weighting_method=wt.WEIGHT_UNIFORM)
    dt = time.perf_counter() - t0
    ref = ref_fit(xk, fk, np.zeros(2), 2, 2, wt.WEIGHT_UNIFORM)
    rel = np.abs(fi - ref).max() / max(1, np.abs(ref).max())
    log(f"    parity {rel:.2e}   wall {dt*1e3:.1f} ms (incl dispatch)")
    return rel


def config2(rng, npts):
    log(f"\n[2] fit_2D_many, {npts//1000}k cases, mixed orders 0-4, WEIGHT_CENTER")
    f = lambda xy: np.sin(xy[..., 0]) * np.cos(xy[..., 1])
    K = 30
    centers = rng.uniform(-1, 1, (npts, 2))
    xk = centers[:, None, :] + rng.uniform(-0.3, 0.3, (npts, K, 2))
    fk = f(xk)
    order = rng.integers(0, 5, npts).astype(np.int32)
    NO = wt.number_of_dofs(2, 4)
    fi = np.zeros((npts, NO))
    args = dict(xk=xk, fk=fk, nk=np.full(npts, K, np.int32), xi=centers,
                fi=fi, sens=None, do_sens=False, order=order,
                knowns=np.zeros(npts, np.int64),
                weighting_method=np.full(npts, wt.WEIGHT_CENTER, np.int32))
    t0 = time.perf_counter()
    wt.fit_2D_many_parallel(**args)
    dt = time.perf_counter() - t0
    worst = 0.0
    for j in rng.choice(npts, 32, replace=False):
        ref = ref_fit(xk[j], fk[j], centers[j], 2, int(order[j]),
                      wt.WEIGHT_CENTER)
        no_j = wt.number_of_dofs(2, int(order[j]))
        worst = max(worst, np.abs(fi[j, :no_j] - ref).max()
                    / max(1, np.abs(ref).max()))
    log(f"    parity {worst:.2e}   wall {dt:.2f} s "
        f"({npts/dt/1e3:.0f}k fits/s incl transfers+compile)")
    return worst


def config3(rng):
    log("\n[3] fit_1D_many / fit_3D_many, order 4, full derivative readout")
    worst = 0.0
    # 1D
    n, K = 4096, 15
    centers = rng.uniform(-1, 1, n)
    xk = centers[:, None] + rng.uniform(-0.5, 0.5, (n, K))
    fk = np.exp(xk)
    fi = np.zeros((n, 5))
    wt.fit_1D_many(xk=xk, fk=fk, nk=np.full(n, K, np.int32), xi=centers,
                   fi=fi, sens=None, do_sens=False,
                   order=np.full(n, 4, np.int32),
                   knowns=np.zeros(n, np.int64),
                   weighting_method=np.full(n, wt.WEIGHT_UNIFORM, np.int32))
    for j in rng.choice(n, 16, replace=False):
        ref = ref_fit(xk[j], fk[j], centers[j], 1, 4, wt.WEIGHT_UNIFORM)
        worst = max(worst, np.abs(fi[j] - ref).max() / np.abs(ref).max())
    # 3D
    n, K = 2048, 60
    centers3 = rng.uniform(-1, 1, (n, 3))
    xk3 = centers3[:, None, :] + rng.uniform(-0.5, 0.5, (n, K, 3))
    fk3 = np.sin(xk3[..., 0]) * xk3[..., 1] + xk3[..., 2]**2
    fi3 = np.zeros((n, 35))
    wt.fit_3D_many(xk=xk3, fk=fk3, nk=np.full(n, K, np.int32), xi=centers3,
                   fi=fi3, sens=None, do_sens=False,
                   order=np.full(n, 4, np.int32),
                   knowns=np.zeros(n, np.int64),
                   weighting_method=np.full(n, wt.WEIGHT_UNIFORM, np.int32))
    for j in rng.choice(n, 8, replace=False):
        ref = ref_fit(xk3[j], fk3[j], centers3[j], 3, 4, wt.WEIGHT_UNIFORM)
        worst = max(worst, np.abs(fi3[j] - ref).max() / np.abs(ref).max())
    log(f"    parity {worst:.2e}")
    return worst


def config4(rng):
    log("\n[4] Neumann setup: F unknown, normal derivative prescribed")
    f = lambda xy: 1 + 2*xy[..., 0] + 3*xy[..., 1] + 0.5*xy[..., 1]**2
    n, K = 1024, 25
    centers = np.stack([rng.uniform(-1, 1, n), np.zeros(n)], -1)  # boundary y=0
    xk = centers[:, None, :] + np.stack(
        [rng.uniform(-0.3, 0.3, (n, K)), rng.uniform(0.0, 0.3, (n, K))], -1)
    fk = f(xk)
    NO = wt.number_of_dofs(2, 2)
    fi = np.zeros((n, NO))
    fi[:, wt.i2_Y] = 3.0   # prescribed normal derivative at y=0
    knowns = np.full(n, wt.b2_Y, np.int64)
    wt.fit_2D_many(xk=xk, fk=fk, nk=np.full(n, K, np.int32), xi=centers,
                   fi=fi, sens=None, do_sens=False,
                   order=np.full(n, 2, np.int32), knowns=knowns,
                   weighting_method=np.full(n, wt.WEIGHT_UNIFORM, np.int32))
    worst = 0.0
    for j in rng.choice(n, 16, replace=False):
        fi_known = np.zeros(NO)
        fi_known[wt.i2_Y] = 3.0
        ref = ref_fit(xk[j], fk[j], centers[j], 2, 2, wt.WEIGHT_UNIFORM,
                      knowns=int(wt.b2_Y), fi_known=fi_known)
        worst = max(worst, np.abs(fi[j] - ref).max() / np.abs(ref).max())
    assert (fi[:, wt.i2_Y] == 3.0).all(), "known DOF modified!"
    log(f"    parity {worst:.2e}   (known DOFs untouched: True)")
    return worst


def config5(rng):
    log("\n[5] ExpertSolver prepare-once / solve-many with sensitivities")
    n, K, steps = 4096, 25, 10
    centers = rng.uniform(-1, 1, (n, 2))
    xk = centers[:, None, :] + rng.uniform(-0.2, 0.2, (n, K, 2))
    es = wt.ExpertSolver(
        dimension=2, nk=np.full(n, K, np.int32),
        order=np.full(n, 2, np.int32), knowns=np.zeros(n, np.int64),
        weighting_method=np.full(n, wt.WEIGHT_CENTER, np.int32),
        do_sens=True)
    t0 = time.perf_counter()
    es.prepare(xi=centers, xk=xk)
    t_prep = time.perf_counter() - t0
    fi = np.zeros((n, 6))
    sens = np.zeros((n, K, 6))
    t0 = time.perf_counter()
    for s in range(steps):
        fk = np.sin(xk[..., 0] + 0.1 * s) * np.cos(xk[..., 1])
        es.solve(fk=fk, fi=fi, sens=sens)
    t_solve = (time.perf_counter() - t0) / steps
    # parity on the last step
    worst = 0.0
    for j in rng.choice(n, 8, replace=False):
        ref = ref_fit(xk[j], fk[j], centers[j], 2, 2, wt.WEIGHT_CENTER)
        worst = max(worst, np.abs(fi[j] - ref).max() / np.abs(ref).max())
    log(f"    parity {worst:.2e}   prepare {t_prep:.2f}s  "
        f"solve {t_solve*1e3:.0f} ms/step ({n/t_solve/1e3:.0f}k solves/s)")
    return worst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=100_000)
    args = ap.parse_args()
    rng = np.random.default_rng(42)
    rels = [config1(rng), config2(rng, args.points), config3(rng),
            config4(rng), config5(rng)]
    worst = max(rels)
    log(f"\nWorst parity across configs: {worst:.2e}")
    if worst >= 1e-10:
        log("    note: the oracle here solves the UNSCALED normal equations,"
            "\n    so on order-4 mixtures the comparison itself is"
            "\n    conditioning-limited — a strict-f64 engine run measures"
            "\n    ~5e-10 against this oracle at the config-2 geometry"
            "\n    (docs/theory.md section 7); the 1e-10 engine-parity bar is"
            "\n    asserted against the f64 engine in the test suite instead.")
    # sanity bound only: far looser than the (test-suite-asserted) engine
    # parity bar, because this oracle is conditioning-limited (note above)
    return 0 if worst < 1e-6 else 1


if __name__ == "__main__":
    sys.exit(main())
