"""Headline benchmark: 2D order-4 WLSQM fits, k=30 neighbors, f64-grade DOFs.

Measures sustained fits/sec of the batched engine on the BASELINE.json
headline configuration (10M-point-scale 2D order-4 cloud, k=30,
WEIGHT_CENTER) in the ``ds`` precision mode — double-single f32-pair
arithmetic that matches a float64 reference solve to ~1e-12 relative (see
tests/test_precision_modes.py and BASELINE.md) while running every hot op
natively on the TPU's MXU/VPU.

Timing methodology: the remote-TPU dispatch path adds ~25 ms per host
round-trip, so the sweep is one jit-compiled ``lax.scan`` over chunks
resident in HBM, with a scalar checksum carried through every step (a data
dependency the compiler cannot elide) and fetched at the end — wall time
therefore covers the full device execution.

Prints ONE JSON line to stdout; progress goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

CHUNK = 32768
RESIDENT_CHUNKS = 8
# chunks per timed scan (cycled over the residents).  The timed region must
# dwarf the remote bridge's ~25 ms per-dispatch latency: at 32 steps the
# sweep lasted ~65 ms and session-to-session spread reached ±20%
# (BASELINE.md round-3 note); 384 steps push the device-side work to
# ~0.5-1 s so the fixed dispatch cost is <5% and the median-of-5 protocol
# below resolves real kernel regressions.
SWEEP_STEPS = 384
TIMED_REPS = 5             # median-of-N timed sweeps; spread is reported
K = 30
NO = 15                    # 2D order 4
BASELINE_FITS_PER_SEC = 5.0e6   # 64-core OpenMP Cython estimate; BASELINE.md


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _axon_relay_preflight(timeout_s: float = 600.0) -> bool:
    """Wait for the axon remote-TPU relay port before touching jax.

    On this container the TPU is reached through a loopback relay
    (ports 8082/8083); when the relay is down, the first device-touching
    jax call blocks FOREVER (no exception to catch), which would hang
    the whole benchmark run.  If the axon env is present but the port
    never opens within ``timeout_s``, return False so the caller can
    emit an honest error record instead of hanging.
    """
    import os
    import socket
    import time as _t

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True       # no relay in play (plain CPU/TPU runtime)
    deadline = _t.time() + timeout_s
    while _t.time() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", 8083), timeout=3):
                return True
        except OSError:
            _t.sleep(10)
    return False


def main():
    if not _axon_relay_preflight():
        log("axon relay unreachable (port 8083 closed); refusing to hang")
        print(json.dumps({
            "metric": "fits/sec, 2D order-4 k=30 (f64-grade DOFs, 1 chip)",
            "value": 0, "unit": "fits/s", "vs_baseline": 0,
            "error": "axon TPU relay unreachable at bench time",
        }), flush=True)
        return

    import jax
    import jax.numpy as jnp

    import wlsqm_tpu  # noqa: F401  (x64 + matmul precision config)
    from wlsqm_tpu.fitter import defs, engine

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    log("device: %s" % (dev,))

    import os
    backend = os.environ.get("WLSQM_BENCH_BACKEND",
                             "pallas" if on_tpu else "xla")
    precision = "ds" if on_tpu else "f64"
    solver = "chol_unrolled" if on_tpu else "chol"
    scaling = "jacobi" if on_tpu else "ruiz"
    log("backend=%s (fallback: xla %s)" % (backend, precision))

    key = jax.random.PRNGKey(42)

    @jax.jit
    def make_chunk(key):
        k1, k2 = jax.random.split(key)
        xk = jax.random.uniform(k1, (CHUNK, K, 2), jnp.float64, -1.0, 1.0)
        fk = jnp.sin(3.0 * xk[..., 0]) * jnp.cos(2.0 * xk[..., 1])
        fk = fk + 0.01 * jax.random.normal(k2, (CHUNK, K), jnp.float64)
        return xk, fk

    xs, fs = [], []
    for _ in range(RESIDENT_CHUNKS):
        key, sub = jax.random.split(key)
        xk, fk = make_chunk(sub)
        xs.append(xk)
        fs.append(fk)
    xks = jnp.stack(xs)
    fks = jnp.stack(fs)
    jax.block_until_ready((xks, fks))
    log("resident data: %.2f GB" % ((xks.nbytes + fks.nbytes) / 1e9))

    nk = jnp.full((CHUNK,), K, jnp.int32)
    xi = jnp.zeros((CHUNK, 2))
    fi0 = jnp.zeros((CHUNK, NO))
    order = jnp.full((CHUNK,), 4, jnp.int32)
    knowns = jnp.zeros((CHUNK,), jnp.int64)
    weighting = jnp.full((CHUNK,), defs.WEIGHT_CENTER, jnp.int32)

    def fit_chunk_xla(xk, fk):
        fi, _s, _it, _c = engine.fit_batch(
            xk, fk, nk, xi, fi0, order, knowns, weighting,
            dimension=2, NO=NO,
            precision=precision, solver=solver, scaling=scaling,
        )
        return fi

    # production sweep count: the conditioning probe picks the cheapest
    # refine_steps whose predicted error stays under the 1e-10 parity bar
    # (wlsqm_tpu.fitter.condprobe; override with WLSQM_BENCH_REFINE_STEPS)
    rs_env = os.environ.get("WLSQM_BENCH_REFINE_STEPS")
    if rs_env is not None:
        refine_steps = int(rs_env)
    else:
        from wlsqm_tpu.fitter import condprobe

        key, sub = jax.random.split(key)
        xk_probe = np.asarray(jax.random.uniform(
            sub, (512, K, 2), jnp.float64, -1.0, 1.0))
        refine_steps = condprobe.pick_refine_steps(
            xk_probe, None, np.zeros((512, 2)), 4, defs.WEIGHT_CENTER,
            dimension=2)
    log("refine_steps=%s (%s)" % (refine_steps,
        "env override" if rs_env is not None else "probe-selected"))

    def fit_chunk_pallas(xk, fk):
        from wlsqm_tpu.ops.pallas_fit import fit_pallas

        return fit_pallas(xk, fk, nk, xi, dimension=2, order=4,
                          weighting=defs.WEIGHT_CENTER,
                          refine_steps=refine_steps)

    fit_chunk = fit_chunk_pallas if backend == "pallas" else fit_chunk_xla

    def make_sweep(fit_chunk):
        @jax.jit
        def sweep(xks, fks):
            def step(acc, i):
                j = i % RESIDENT_CHUNKS
                fi = fit_chunk(xks[j], fks[j])
                return acc + fi.sum(), None

            acc, _ = jax.lax.scan(
                step, jnp.float64(0.0), jnp.arange(SWEEP_STEPS))
            return acc
        return sweep

    sweep = make_sweep(fit_chunk)

    t0 = time.perf_counter()
    try:
        float(sweep(xks, fks))    # compile + first run (scalar fetch = sync)
    except Exception as e:  # pragma: no cover - robust fallback for the driver
        log("backend %s failed (%s: %s); falling back to xla"
            % (backend, type(e).__name__, str(e)[:200]))
        backend = "xla"
        fit_chunk = fit_chunk_xla
        sweep = make_sweep(fit_chunk)
        float(sweep(xks, fks))
    log("compile+first sweep: %.1f s" % (time.perf_counter() - t0))

    times = []
    for _ in range(TIMED_REPS):
        t0 = time.perf_counter()
        float(sweep(xks, fks))
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]          # median: robust to bridge hiccups
    spread = (times[-1] - times[0]) / dt
    fits = SWEEP_STEPS * CHUNK
    fits_per_sec = fits / dt
    log("%d fits in %.3f s (median of %d; spread %.1f%%) -> %.3f M fits/s"
        % (fits, dt, TIMED_REPS, 100 * spread, fits_per_sec / 1e6))

    # --- parity check vs an independent NumPy/LAPACK float64 pipeline ------
    # round 3: 1024 cases across two distinct chunks (the headline claim
    # should not ride on 64 cases of one chunk; VERDICT r2 weak #8)
    NPAR = 512
    fi_dev = np.concatenate([
        np.asarray(fit_chunk(xks[0], fks[0])[:NPAR]),
        np.asarray(fit_chunk(xks[1], fks[1])[:NPAR])])
    parity = parity_check(
        np.concatenate([np.asarray(xks[0][:NPAR]), np.asarray(xks[1][:NPAR])]),
        np.concatenate([np.asarray(fks[0][:NPAR]), np.asarray(fks[1][:NPAR])]),
        fi_dev)
    log("DOF parity (L-inf rel) vs NumPy f64 reference: %.3e" % parity)

    result = {
        "metric": "fits/sec, 2D order-4 k=30 (f64-grade DOFs, 1 chip)",
        "value": round(fits_per_sec, 1),
        "unit": "fits/s",
        "vs_baseline": round(fits_per_sec / BASELINE_FITS_PER_SEC, 3),
        "parity_linf_rel": float(parity),
        "backend": backend,
        "precision_mode": precision,
        "chunk": CHUNK,
        "sweep_seconds": round(dt, 4),
        "sweep_spread_rel": round(spread, 4),
        "refine_steps": refine_steps,
    }

    # --- the PUBLIC route, end to end (round-5 VERDICT weak #1) ------------
    # plan_fit_many -> fit_many(plan=): probe + ladder + (split) routing,
    # the exact path a user holds.  Recorded alongside the forced kernel
    # so the auto/forced gap is a first-class benchmark output.
    if backend == "pallas":
        try:
            import wlsqm_tpu as wt

            plan = wt.plan_fit_many(xks[0], xi, nk=nk, order=4,
                                    weighting=defs.WEIGHT_CENTER)
            r = plan.route
            log("public route: %s" % (r,))

            def fit_chunk_auto(xk, fk):
                return wt.fit_many(xk, fk, xi, nk=nk, order=4,
                                   weighting=defs.WEIGHT_CENTER,
                                   plan=plan).fi

            sweep_auto = make_sweep(fit_chunk_auto)
            t0 = time.perf_counter()
            float(sweep_auto(xks, fks))
            log("auto sweep compile+first: %.1f s" % (time.perf_counter() - t0))
            times_a = []
            for _ in range(TIMED_REPS):
                t0 = time.perf_counter()
                float(sweep_auto(xks, fks))
                times_a.append(time.perf_counter() - t0)
            times_a.sort()
            dta = times_a[len(times_a) // 2]
            auto_rate = fits / dta
            log("auto (public route): %.3f M fits/s (%.3f of forced)"
                % (auto_rate / 1e6, auto_rate / fits_per_sec))
            result["auto_fits_per_sec"] = round(auto_rate, 1)
            result["auto_vs_forced"] = round(auto_rate / fits_per_sec, 4)
            result["auto_route"] = "%s/%s/%s r%s tail=%.3f" % (
                r.path, r.kernel_precision, r.assembly, r.refine_steps,
                r.tail_frac)
        except Exception as e:  # pragma: no cover - keep the headline alive
            log("auto-route measurement failed (%s: %s)"
                % (type(e).__name__, str(e)[:200]))
            result["auto_error"] = "%s: %s" % (type(e).__name__, str(e)[:120])
    print(json.dumps(result), flush=True)


def parity_check(xk, fk, fi_dev):
    """L∞ relative error of device DOFs vs a NumPy float64 reference solve."""
    from math import factorial

    import scipy.linalg

    ex = np.array([0, 1, 0, 2, 1, 0, 3, 2, 1, 0, 4, 3, 2, 1, 0])
    ey = np.array([0, 0, 1, 0, 1, 2, 0, 1, 2, 3, 0, 1, 2, 3, 4])
    invf = np.array(
        [1.0 / (factorial(a) * factorial(b)) for a, b in zip(ex, ey)]
    )
    worst = 0.0
    for j in range(xk.shape[0]):
        c = (xk[j][:, 0:1] ** ex) * (xk[j][:, 1:2] ** ey) * invf
        d2 = (xk[j] ** 2).sum(1)
        t = 1.0 - np.sqrt(d2 / d2.max())
        w = 1e-4 + (1.0 - 1e-4) * t * t
        A = c.T @ (w[:, None] * c)
        b = c.T @ (w * fk[j])
        ref = scipy.linalg.solve(A, b, assume_a="sym")
        scale = max(np.abs(ref).max(), 1.0)
        worst = max(worst, np.abs(ref - fi_dev[j]).max() / scale)
    return worst


if __name__ == "__main__":
    main()
