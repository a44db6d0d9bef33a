"""Per-case calibration of the ds/ts kernel error models on TPU.

The batch-level sweep (run_ts_sweep.py) calibrates units as
``err_max / ca_max`` over a batch, which understates the per-case
constant when the worst error and the worst conditioning land on
different cases.  The routing gates apply the model to ``ca.max()`` of
a *target* batch, so the honest constant is the per-case one:

    unit_i = err_i / (cond_i * amp_i),   err_i = per-case relative DOF err

vs an oracle strengthened beyond plain f64: radius-scaled f64 assembly
+ one long-double iterative-refinement step (oracle unit ~5e-20*cond).

Prints per-config max/99% per-case units for the ds and ts kernels.
Usage: python benchmarks/run_ts_percase.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

import wlsqm_tpu as wt  # noqa: F401  (enables x64)
from wlsqm_tpu.fitter import condprobe, defs, tables
from wlsqm_tpu.ops.pallas_fit import TILE, fit_pallas
from benchmarks.run_ladder_sweep import _problem

NO = defs.number_of_dofs(2, 4)
EXP = tables.EXPONENTS[2][:NO]
INVF = tables.INV_FACT[2][:NO]
DEG = EXP.sum(-1)


def strong_oracle(xk, xi, fk, weighting, dimension=2, order=4):
    """Radius-scaled f64 solve + one long-double refinement per case."""
    no = defs.number_of_dofs(dimension, order)
    exp = tables.EXPONENTS[dimension][:no]
    invf = tables.INV_FACT[dimension][:no]
    deg = exp.sum(-1)
    B, K, _ = xk.shape
    d = xk - xi[:, None, :]
    d2 = (d ** 2).sum(-1)
    r = np.sqrt(d2.max(-1))
    t = d / r[:, None, None]
    C = invf[None, None, :] * np.prod(
        t[:, :, None, :] ** exp[None, None, :, :], axis=-1)
    if weighting == defs.WEIGHT_CENTER:
        w = 1e-4 + (1 - 1e-4) * (1 - np.sqrt(d2 / d2.max(-1, keepdims=True))) ** 2
    else:
        w = np.ones_like(d2)
    A = np.einsum("bki,bk,bkj->bij", C, w, C)
    b = np.einsum("bkj,bk->bj", C, w * fk)
    x = np.linalg.solve(A, b[..., None])[..., 0]
    # one refinement step with long-double residual
    Cl, wl, fl = C.astype(np.longdouble), w.astype(np.longdouble), fk.astype(np.longdouble)
    xl = x.astype(np.longdouble)
    resid = np.einsum("bkj,bk->bj", Cl, wl * (fl - np.einsum("bkj,bj->bk", Cl, xl)))
    dx = np.linalg.solve(A, resid.astype(np.float64)[..., None])[..., 0]
    x = (xl + dx.astype(np.longdouble)).astype(np.float64)
    return x / (r[:, None].astype(np.float64) ** deg[None, :])


def main():
    rng = np.random.default_rng(20260817)
    B, K = TILE, 30
    print("wgt radius  ds:max_unit ds:q99  ts:max_unit ts:q99  "
          "(per-case err/(cond*amp) vs strong oracle)", flush=True)
    all_ds, all_ts = [], []
    for weighting in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER):
        for radius in (0.03, 0.05, 0.1, 0.15, 0.3, 0.6, 1.0):
            xk, fk, xi = _problem(rng, B, K, radius)
            ref = strong_oracle(xk, xi, fk, weighting)
            nk = jnp.full((B,), K, jnp.int32)
            com = dict(dimension=2, order=4, weighting=weighting)
            fi_ds = np.asarray(fit_pallas(
                jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi), **com))
            fi_ts = np.asarray(fit_pallas(
                jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi),
                precision="ts", **com))
            ca = condprobe.probe(xk, nk, xi, 4, weighting, dimension=2,
                                 sample=B)
            assert ca is not None and len(ca[0]) == B
            cai = ca[0] * ca[1]
            scale = np.abs(ref).max(-1)
            e_ds = np.abs(fi_ds - ref).max(-1) / scale
            e_ts = np.abs(fi_ts - ref).max(-1) / scale
            u_ds, u_ts = e_ds / cai, e_ts / cai
            all_ds.append(u_ds); all_ts.append(u_ts)
            print(f"{weighting} {radius:5.2f}  {u_ds.max():.3g} "
                  f"{np.quantile(u_ds, 0.99):.3g}  {u_ts.max():.3g} "
                  f"{np.quantile(u_ts, 0.99):.3g}", flush=True)
    u_ds = np.concatenate(all_ds); u_ts = np.concatenate(all_ts)
    print(f"\nOVERALL per-case units: ds max {u_ds.max():.3g} "
          f"q99.9 {np.quantile(u_ds, 0.999):.3g} | ts max {u_ts.max():.3g} "
          f"q99.9 {np.quantile(u_ts, 0.999):.3g}", flush=True)


if __name__ == "__main__":
    main()
