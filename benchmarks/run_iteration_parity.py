"""Quantify ALGO_ITERATIVE iteration-count parity: kernel vs f64 engine.

The reference returns the number of refinement iterations from every
iterative fit as API surface (reference: wlsqm/fitter/impl.pyx:1026-1083,
wlsqm/fitter/simple.pyx:103-105), stopping on EXACT l-inf residual-norm
stagnation.  Both of our paths implement the same rule, but they round
differently — the fused kernel's residual norms are f32 while the engine's
are f64 — so the step at which the norm stops changing can differ.  DOFs
agree to the documented precision envelope either way; this script
quantifies how the *returned counts* differ, per case, across regimes, so
a reference user branching on the count knows the distribution
(round-2 VERDICT "missing" #3).

Extended follow-up to benchmarks/run_iter_parity.py (which produced the
round-3 table in benchmarks/README.md): more configurations (noise
levels, exactly-representable quartics, both weightings) and JSON
aggregate output.  Its TPU run is queued in run_round3_queue.sh behind
the relay outage.

Run on TPU (single client on the axon bridge):

    python benchmarks/run_iteration_parity.py

Prints one table row per configuration and a JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import wlsqm_tpu as wt


def make_batch(rng, B, K, radius, noise, kind):
    xi = rng.uniform(-1.0, 1.0, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-radius, radius, (B, K, 2))
    if kind == "smooth":
        fk = np.sin(xk[..., 0]) * np.cos(xk[..., 1])
    else:  # quartic: exactly representable at order 4
        fk = 1.0 + xk[..., 0] ** 2 + 0.5 * xk[..., 1] ** 4
    if noise:
        fk = fk + noise * rng.standard_normal(fk.shape)
    return xi, xk, fk


def run_config(rng, order, radius, noise, kind, weighting, B=2048, K=30,
               max_iter=10):
    xi, xk, fk = make_batch(rng, B, K, radius, noise, kind)
    kw = dict(xi=xi, order=order, weighting=weighting,
              iterative=True, max_iter=max_iter)
    rk = wt.fit_many(xk, fk, backend="pallas", **kw)
    re = wt.fit_many(xk, fk, backend="xla", precision="f64", **kw)
    ik = np.asarray(rk.iterations)
    ie = np.asarray(re.iterations)
    d = ik - ie
    scale = np.max(np.abs(np.asarray(re.fi)))
    dof = float(np.max(np.abs(np.asarray(rk.fi) - np.asarray(re.fi))) / scale)
    return {
        "order": order, "radius": radius, "noise": noise, "kind": kind,
        "weighting": int(weighting),
        "kernel_mean": float(ik.mean()), "engine_mean": float(ie.mean()),
        "eq_pct": float(np.mean(d == 0) * 100),
        "within1_pct": float(np.mean(np.abs(d) <= 1) * 100),
        "min_d": int(d.min()), "max_d": int(d.max()),
        "dof_rel": dof,
    }


def main():
    rng = np.random.default_rng(20260817)
    configs = [
        # (order, radius, noise, kind, weighting)
        (4, 0.3, 0.0, "quartic", wt.WEIGHT_UNIFORM),
        (4, 0.3, 0.0, "smooth", wt.WEIGHT_CENTER),
        (4, 0.3, 1e-3, "smooth", wt.WEIGHT_CENTER),
        (4, 1.0, 0.0, "smooth", wt.WEIGHT_CENTER),
        (4, 1.0, 1e-3, "smooth", wt.WEIGHT_UNIFORM),
        (2, 0.3, 0.0, "smooth", wt.WEIGHT_CENTER),
        (2, 0.3, 1e-3, "smooth", wt.WEIGHT_UNIFORM),
        (2, 1.0, 1e-3, "smooth", wt.WEIGHT_CENTER),
    ]
    rows = []
    hdr = ("order radius noise   kind     wgt  it_kern it_eng  eq%   |d|<=1%"
           "  d_rng    dof_rel")
    print(hdr, flush=True)
    for order, radius, noise, kind, wgt in configs:
        r = run_config(rng, order, radius, noise, kind, wgt)
        rows.append(r)
        print(f"{order:5d} {radius:6.2f} {noise:7.0e} {kind:8s} "
              f"{'ctr' if wgt == wt.WEIGHT_CENTER else 'uni':4s}"
              f"{r['kernel_mean']:8.2f} {r['engine_mean']:6.2f} "
              f"{r['eq_pct']:5.1f} {r['within1_pct']:8.1f}  "
              f"[{r['min_d']:+d},{r['max_d']:+d}]  {r['dof_rel']:.1e}",
              flush=True)
    agg = {
        "eq_pct_min": min(r["eq_pct"] for r in rows),
        "within1_pct_min": min(r["within1_pct"] for r in rows),
        "max_abs_d": max(max(abs(r["min_d"]), abs(r["max_d"])) for r in rows),
        "dof_rel_max": max(r["dof_rel"] for r in rows),
    }
    print(json.dumps({"iteration_parity": agg, "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
