"""Direct soundness check of the ds/ts certification gates on TPU.

For every case in the sweep, treat it as if the routing gate saw its own
(cond, amp): the ds gate certifies when DS_UNIT*ca*SAFETY <= 1e-10, the
ts gate when TS_PARITY_UNIT*ca*SAFETY <= 1e-10.  A gate is SOUND if no
certified case's true error (vs the strong oracle) exceeds 1e-10.
Reports, per gate: #certified, worst certified err, #violations, and the
err/tol ratio of the worst violation.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

import wlsqm_tpu as wt  # noqa: F401
from wlsqm_tpu.fitter import condprobe, defs
from wlsqm_tpu.ops.pallas_fit import TILE, fit_pallas
from benchmarks.run_ladder_sweep import _problem
from benchmarks.run_ts_percase import strong_oracle

TOL = condprobe.AUTO_TOL


def fine(cai, e_ds, e_ts):
    print("\nfine ds envelope: ca bucket -> worst ds err", flush=True)
    edges = [0, 5e2, 1e3, 2e3, 4e3, 6e3, 9e3, 1.25e4, 2e4, 3.6e4]
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (cai > lo) & (cai <= hi)
        if m.any():
            print(f"({lo:8.0e},{hi:8.0e}]  ds {e_ds[m].max():.3g}  "
                  f"ts {e_ts[m].max():.3g}  ({m.sum()})", flush=True)
    bad = (cai <= 1.25e4) & (e_ds > 1e-10)
    print("ds violations (ca, err):",
          [(f"{c:.3g}", f"{e:.3g}") for c, e in zip(cai[bad], e_ds[bad])],
          flush=True)


def main():
    rng = np.random.default_rng(20260817)
    B = TILE
    rows = []
    dim3 = "--3d" in sys.argv
    if dim3:
        # 3D order-4 (NO=35): the gates must hold beyond the 2D
        # calibration family.  Both K exercise the round-5 staged moment
        # body alongside rows; the round-5 sweep measured the
        # 2D-calibrated moments-ds gate UNSOUND here (8 violations,
        # worst 2.24x), which is why certified routing gates on
        # moment_cert_ok (dim <= 2) while moment_auto_ok still serves
        # the forced/uncertified kernel
        configs = [(3, K, w, r)
                   for K in (64, 48)
                   for w in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER)
                   for r in (0.1, 0.3, 0.6, 1.0)]
    else:
        configs = [(2, 30, w, r)
                   for w in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER)
                   for r in (0.03, 0.05, 0.1, 0.15, 0.3, 0.6, 1.0)]
    for dim, K, weighting, radius in configs:
        xk, fk, xi = _problem(rng, B, K, radius)
        if dim == 3:
            xi = np.concatenate([xi, rng.uniform(-1, 1, (B, 1))], axis=1)
            xk = np.concatenate(
                [xk, xi[:, None, 2:] + rng.uniform(-radius, radius,
                                                   (B, K, 1))], axis=2)
        ref = strong_oracle(xk, xi, fk, weighting, dimension=dim)
        nk = jnp.full((B,), K, jnp.int32)
        com = dict(dimension=dim, order=4, weighting=weighting)
        # every routed (assembly, arithmetic) variant, each gated by its
        # OWN calibrated units (fitter/calibration.py, round 4); moment
        # variants exactly where auto routing can pick them
        from wlsqm_tpu.ops import pallas_fit

        variants = [("rows", "ds"), ("rows", "ts")]
        if pallas_fit.moment_auto_ok(dim, 4, K):
            variants += [("moments", "ds")]
        if pallas_fit.moment_auto_ok(dim, 4, K, nplanes=3):
            variants += [("moments", "ts")]
        errs = {}
        for asm, prec in variants:
            fi = np.asarray(fit_pallas(
                jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi),
                assembly=asm, precision=prec, **com))
            errs[(asm, prec)] = fi
        ca = condprobe.probe(xk, nk, xi, 4, weighting, dimension=dim,
                             sample=B)
        cai = ca[0] * ca[1]
        scale = np.abs(ref).max(-1)
        rows.append((cai, {k: np.abs(v - ref).max(-1) / scale
                           for k, v in errs.items()}))
    cai = np.concatenate([r[0] for r in rows])
    # per-config variant sets may differ (K-dependent VMEM eligibility):
    # evaluate each variant over exactly the configs that ran it
    variants = sorted({k for r in rows for k in r[1]})
    units = condprobe._units()
    for asm, prec in variants:
        du, dcert, tsu = units.units_for(asm)
        unit = dcert if prec == "ds" else tsu
        sub = [r for r in rows if (asm, prec) in r[1]]
        cai_v = np.concatenate([r[0] for r in sub])
        err = np.concatenate([r[1][(asm, prec)] for r in sub])
        cert = unit * cai_v * condprobe.SAFETY <= TOL
        viol = cert & (err > TOL)
        worst = err[cert].max() if cert.any() else 0.0
        print(f"{asm}/{prec}: certified {cert.sum()}/{len(cai_v)}  "
              f"worst certified err {worst:.3g}  violations {viol.sum()}"
              + (f"  worst ratio {(err[viol]/TOL).max():.2f}x"
                 if viol.any() else ""), flush=True)
    e_ds = np.concatenate([r[1][("rows", "ds")] for r in rows])
    e_ts = np.concatenate([r[1][("rows", "ts")] for r in rows])
    fine(cai, e_ds, e_ts)
    # headroom curves: worst err among cases with ca <= threshold
    print("\nca_max_allowed -> worst ds err | worst ts err (empirical)",
          flush=True)
    for camax in (1e3, 1e4, 3e4, 1e5, 3e5, 1e6):
        m = cai <= camax
        if m.any():
            print(f"{camax:8.0e}  {e_ds[m].max():10.3g}  {e_ts[m].max():10.3g}"
                  f"   ({m.sum()} cases)", flush=True)


if __name__ == "__main__":
    main()
