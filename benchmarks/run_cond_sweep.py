"""Calibrate ds-kernel error floor vs Jacobi-scaled cond on real TPU.

Sweeps radius x weighting x K for 2D order-4, measuring the fused kernel's
DOF error against a host NumPy/LAPACK f64 oracle, alongside the sampled
condition number of the Jacobi-scaled normal matrix (the quantity a cheap
routing probe can compute).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

import wlsqm_tpu  # noqa: F401  (enables x64)
from wlsqm_tpu.fitter import defs, tables
from wlsqm_tpu.ops.pallas_fit import TILE, fit_pallas


def host_oracle(xk, xi, weighting, order=4, dim=2):
    NO = defs.number_of_dofs(dim, order)
    exp = tables.EXPONENTS[dim][:NO]
    invf = tables.INV_FACT[dim][:NO]
    delta = xk - xi[:, None, :]
    d2 = (delta ** 2).sum(-1)
    c = np.ones(delta.shape[:2] + (NO,))
    for a in range(dim):
        c = c * delta[..., a:a + 1] ** exp[:, a]
    c = c * invf
    if weighting == defs.WEIGHT_CENTER:
        t = 1 - np.sqrt(d2 / d2.max(-1, keepdims=True))
        w = 1e-4 + (1 - 1e-4) * t * t
    else:
        w = np.ones_like(d2)
    A = np.einsum("bkj,bk,bkm->bjm", c, w, c)
    return A, c, w


def jacobi_cond(A):
    s = 1 / np.sqrt(np.einsum("bjj->bj", A))
    As = A * s[:, :, None] * s[:, None, :]
    return np.linalg.cond(As)


def run(radius, weighting, K, rng, refine_steps):
    B = TILE
    xi = rng.uniform(-1, 1, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-radius, radius, (B, K, 2))
    fk = np.sin(3 * xk[..., 0]) * np.cos(2 * xk[..., 1]) + 0.3 * xk[..., 0] * xk[..., 1]

    A, c, w = host_oracle(xk, xi, weighting)
    cond = jacobi_cond(A)
    b = np.einsum("bkj,bk,bk->bj", c, w, fk)
    fi_ref = np.linalg.solve(A, b[..., None])[..., 0]

    fi_k = np.asarray(fit_pallas(
        jnp.asarray(xk), jnp.asarray(fk), jnp.full((B,), K, jnp.int32),
        jnp.asarray(xi), dimension=2, order=4, weighting=weighting,
        refine_steps=refine_steps))
    scale = np.abs(fi_ref).max(axis=0)  # per-DOF magnitude scale
    err = (np.abs(fi_k - fi_ref) / scale).max(axis=1)  # per-case rel err
    return cond, err


def main():
    refine_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print("refine_steps =", refine_steps, flush=True)
    rng = np.random.default_rng(12345)
    print("weighting K radius cond_med cond_max err_med err_max", flush=True)
    rows = []
    for weighting in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER):
        for K in (24, 30):
            for radius in (0.03, 0.05, 0.1, 0.15, 0.3, 0.5, 1.0):
                cond, err = run(radius, weighting, K, rng, refine_steps)
                print(f"{weighting} {K} {radius} {np.median(cond):.3g} "
                      f"{cond.max():.3g} {np.median(err):.3g} {err.max():.3g}",
                      flush=True)
                rows.append((weighting, K, radius, cond, err))
    # per-case scatter: err vs cond relationship
    allc = np.concatenate([r[3] for r in rows])
    alle = np.concatenate([r[4] for r in rows])
    for lo, hi in [(0, 1e3), (1e3, 1e4), (1e4, 1e5), (1e5, 1e6), (1e6, 1e99)]:
        m = (allc >= lo) & (allc < hi)
        if m.sum():
            print(f"cond [{lo:.0e},{hi:.0e}): n={m.sum()} "
                  f"err_med={np.median(alle[m]):.3g} "
                  f"err_p99={np.quantile(alle[m], 0.99):.3g} "
                  f"err_max={alle[m].max():.3g}", flush=True)


if __name__ == "__main__":
    main()
