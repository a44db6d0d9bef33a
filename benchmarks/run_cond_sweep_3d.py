"""3D validation of the conditioning-probe model on real TPU.

The routing model in wlsqm_tpu.fitter.condprobe was calibrated on 2D
order-4 sweeps (run_cond_sweep.py).  This script validates its 3D
decisions: measure the fused kernel's worst-case DOF error against a
host NumPy/LAPACK f64 oracle for 3D order-2 (probe-accepted geometry)
and 3D order-4 NO=35 (probe-rejected at the 1e-10 bar), and compare
with the probe's predictions.

Run:  python benchmarks/run_cond_sweep_3d.py [--skip-o4]
(the NO=35 Mosaic compile is ~5-8 min, one-time per shape)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

import wlsqm_tpu  # noqa: F401  (enables x64)
from wlsqm_tpu.fitter import condprobe, defs
from wlsqm_tpu.ops.pallas_fit import TILE, fit_pallas

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_cond_sweep import host_oracle  # noqa: E402  (shared oracle)


def run(order, K, radius, weighting, rng):
    dim = 3
    B = TILE
    xi = rng.uniform(-1, 1, (B, dim))
    xk = xi[:, None, :] + rng.uniform(-radius, radius, (B, K, dim))
    fk = (np.sin(2 * xk[..., 0]) * np.cos(xk[..., 1])
          + 0.5 * xk[..., 2] ** 2 + 0.2 * xk[..., 0] * xk[..., 2])

    A, c, w = host_oracle(xk, xi, weighting, order, dim)
    b = np.einsum("bkj,bk,bk->bj", c, w, fk)
    fi_ref = np.linalg.solve(A, b[..., None])[..., 0]

    fi_k = np.asarray(fit_pallas(
        jnp.asarray(xk), jnp.asarray(fk), jnp.full((B,), K, jnp.int32),
        jnp.asarray(xi), dimension=dim, order=order, weighting=weighting))
    scale = np.abs(fi_ref).max(axis=0)
    err = (np.abs(fi_k - fi_ref) / scale).max(axis=1)

    pred = condprobe.ds_floor(xk, None, xi, order, weighting, dimension=dim)
    ok = condprobe.kernel_accuracy_ok(xk, None, xi, order, weighting,
                                      dimension=dim)
    print(f"o{order} K={K} r={radius} w={weighting}: pred={pred:.3g} "
          f"accept={ok} err_med={np.median(err):.3g} err_max={err.max():.3g}"
          + ("   <-- BAD ACCEPT" if ok and err.max() > 1e-10 else ""),
          flush=True)


def main():
    rng = np.random.default_rng(777)
    for weighting in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER):
        for radius in (0.3, 1.0):
            run(2, 20, radius, weighting, rng)
    if "--skip-o4" not in sys.argv:
        run(4, 48, 1.0, defs.WEIGHT_CENTER, rng)
        run(4, 48, 0.3, defs.WEIGHT_CENTER, rng)


if __name__ == "__main__":
    main()
