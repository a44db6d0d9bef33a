"""Tiered precision ladder: route decisions and the engine rungs.

The ladder (wlsqm_tpu/fitter/ladder.py) replaces round 2's hard fall to
the emulated-f64 engine (~1000x slower than the kernel on TPU) with the
cheapest rung whose predicted error clears the 1e-10 bar.  Decision tests
here run the model directly; hardware error/throughput validation is
benchmarks/run_ladder_sweep.py.
"""

import numpy as np

import jax.numpy as jnp

from wlsqm_tpu.fitter import condprobe, defs, ladder


def _cond_amp(cond, amp=1.0):
    return (np.atleast_1d(np.asarray(cond, np.float64)),
            np.atleast_1d(np.asarray(amp, np.float64)))


class TestChoose:
    def test_well_conditioned_goes_kernel(self):
        # certified kernel routing prefers the triple-single variant
        # (gate soundness: run_gate_check.py, 0 violations 2D+3D)
        r = ladder.choose(_cond_amp(1e3))
        assert r.path == "kernel" and r.kernel_precision == "ts"
        assert r.refine_steps in (3, 4, 5, 6)

    def test_kernel_shape_ineligible_goes_ds_xla(self):
        r = ladder.choose(_cond_amp(1e3), kernel_ok=False)
        assert r == ladder.Route(path="xla", precision="ds")

    def test_middle_band_goes_fast_rung(self):
        # floor = 2e-15 * 1e4 * 10 = 2e-10: rejected by the gate but
        # parity is achievable -> fast rung with adapted sweeps
        r = ladder.choose(_cond_amp(1e4, 10.0))
        assert r.path == "xla" and r.precision == "fast"
        rate = condprobe.F32_UNIT * 1e4
        assert rate ** (r.mixed_steps + 1) <= ladder.SWEEP_TARGET

    def test_beyond_parity_floor_keeps_kernel(self):
        # floor = 2e-15 * 1e4 * 1e3 = 2e-8 > BEYOND_PARITY_FLOOR:
        # conditioning-limited; keep kernel speed, in the accuracy-optimal
        # triple-single arithmetic at the full sweep count
        r = ladder.choose(_cond_amp(1e4, 1e3))
        assert r.path == "kernel" and r.kernel_precision == "ts"
        assert r.refine_steps == condprobe.TS_REFINE_STEPS_FULL
        # without the kernel: the ds engine (same floor, fastest left)
        r2 = ladder.choose(_cond_amp(1e4, 1e3), kernel_ok=False)
        assert r2 == ladder.Route(path="xla", precision="ds")

    def test_ds_cert_edge(self):
        # the ds certification gate uses the per-case envelope
        # DS_CERT_UNIT (run_gate_check.py: the old 2e-15 batch-level gate
        # admitted cases up to 1.74e-10 in 2D, 2.70e-10 in 3D): edge at
        # ca = 2e3.  It governs the ts-VMEM-unfit kernel fallback and
        # the ds XLA rung; ts-fit shapes always prefer ts.
        edge = condprobe.AUTO_TOL / (condprobe.DS_CERT_UNIT
                                     * condprobe.SAFETY)
        assert abs(edge - 2e3) / 2e3 < 0.01
        r = ladder.choose(_cond_amp(edge * 0.99), ts_kernel_ok=False)
        assert r.path == "kernel" and r.kernel_precision == "ds"
        # past the ds edge with no ts planes: the certified fast rung
        r2 = ladder.choose(_cond_amp(edge * 1.5), ts_kernel_ok=False)
        assert r2.path == "xla" and r2.precision == "fast"

    def test_middle_band_kernel_shape_goes_ts(self):
        # floor = 2e-15 * 2e4 = 4e-11 -> x4 safety rejects ds, but the
        # ts parity floor 7e-16 * 2e4 * 4 = 5.6e-11 clears the bar:
        # certified f64-grade at kernel speed
        r = ladder.choose(_cond_amp(2e4, 1.0))
        assert r.path == "kernel" and r.kernel_precision == "ts"
        assert r.refine_steps in (3, 4, 5, 6)
        # the same batch on a kernel-ineligible shape: fast rung
        r2 = ladder.choose(_cond_amp(2e4, 1.0), kernel_ok=False)
        assert r2.path == "xla" and r2.precision == "fast"

    def test_ds_xla_rung_within_ds_cert(self):
        # kernel-ineligible shape inside the ds certification band:
        # the ds XLA engine serves it
        r = ladder.choose(_cond_amp(1e3), kernel_ok=False)
        assert r == ladder.Route(path="xla", precision="ds")

    def test_ts_vmem_ineligible_fallbacks(self):
        # ts band but the triple planes don't fit VMEM: the certified
        # choice is the fast rung, not an uncertified ds kernel
        r = ladder.choose(_cond_amp(2e4, 1.0), ts_kernel_ok=False)
        assert r.path == "xla" and r.precision == "fast"
        # conditioning-limited (uncertified anyway): ds kernel keeps speed
        r2 = ladder.choose(_cond_amp(1e4, 1e3), ts_kernel_ok=False)
        assert r2 == ladder.Route(path="kernel", refine_steps=4)

    def test_fast_sweeps_scale_with_conditioning(self):
        # kernel_ok False keeps the beyond-parity shortcut from firing so
        # the sweep-count adaptation is visible
        r_easy = ladder.choose(_cond_amp(1e2, 3e5), kernel_ok=False,
                               ds_xla_ok=False)
        r_hard = ladder.choose(_cond_amp(1e5, 3e2), kernel_ok=False,
                               ds_xla_ok=False)
        assert r_easy.precision == "fast" and r_hard.precision == "fast"
        assert r_hard.mixed_steps > r_easy.mixed_steps

    def test_high_cond_goes_mixed(self):
        # rate = 6e-8 * 1e6 = 0.06: beyond the fast rung's assembly
        # trust region, inside mixed's (kernel/ds unavailable)
        r = ladder.choose(_cond_amp(1e6, 1e-1), kernel_ok=False,
                          ds_xla_ok=False)
        assert r.path == "xla" and r.precision == "mixed"
        assert r.mixed_steps >= 10

    def test_extreme_conditioning_goes_f64(self):
        r = ladder.choose(_cond_amp(1e8, 1e-1), kernel_ok=False,
                          ds_xla_ok=False)
        assert r == ladder.Route(path="xla", precision="f64")

    def test_degenerate_probe_goes_f64(self):
        r = ladder.choose(None)
        assert r == ladder.Route(path="xla", precision="f64")

    def test_ds_rung_respects_canary(self):
        r = ladder.choose(_cond_amp(1e3), kernel_ok=False, ds_xla_ok=False)
        assert r.path == "xla" and r.precision != "ds"


def test_fast_rung_reaches_f64_grade(rng):
    """The fast rung converges to the f64 engine's own answer: residuals
    through exact f64 basis rows iterate the f32 preconditioner to the
    true fixed point (middle-band geometry: moderate conditioning)."""
    from wlsqm_tpu.fitter import engine

    B, K = 256, 30
    xi = rng.uniform(-1, 1, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-0.4, 0.4, (B, K, 2))
    fk = np.sin(3 * xk[..., 0]) * np.cos(2 * xk[..., 1])
    NO = defs.number_of_dofs(2, 4)
    args = (jnp.asarray(xk), jnp.asarray(fk), jnp.full((B,), K, jnp.int32),
            jnp.asarray(xi), jnp.zeros((B, NO)),
            jnp.full((B,), 4, jnp.int32), jnp.zeros((B,), jnp.int64),
            jnp.full((B,), defs.WEIGHT_CENTER, jnp.int32))
    fi_64 = np.asarray(engine.fit_batch(
        *args, dimension=2, NO=NO, precision="f64")[0])
    fi_f = np.asarray(engine.fit_batch(
        *args, dimension=2, NO=NO, precision="fast", mixed_steps=6)[0])
    rel = np.abs(fi_f - fi_64).max() / np.abs(fi_64).max()
    assert rel < 1e-9


def test_mixed_steps_threads_through_engine(rng):
    """engine.fit_batch honors the ladder's adaptive sweep count: more
    sweeps converge much further on an ill-conditioned batch."""
    from wlsqm_tpu.fitter import engine

    B, K = 128, 30
    xi = rng.uniform(-1, 1, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-0.08, 0.08, (B, K, 2))
    fk = np.sin(3 * xk[..., 0]) * np.cos(2 * xk[..., 1])
    NO = defs.number_of_dofs(2, 4)
    args = (jnp.asarray(xk), jnp.asarray(fk), jnp.full((B,), K, jnp.int32),
            jnp.asarray(xi), jnp.zeros((B, NO)),
            jnp.full((B,), 4, jnp.int32), jnp.zeros((B,), jnp.int64),
            jnp.full((B,), defs.WEIGHT_CENTER, jnp.int32))
    fi_64 = np.asarray(engine.fit_batch(
        *args, dimension=2, NO=NO, precision="f64")[0])

    def rel(steps):
        fi_m = np.asarray(engine.fit_batch(
            *args, dimension=2, NO=NO, precision="mixed",
            mixed_steps=steps)[0])
        return np.abs(fi_m - fi_64).max() / np.abs(fi_64).max()

    r1, r10 = rel(1), rel(10)
    # 10 sweeps reach the f64 rounding floor of this conditioning (exact
    # f64 equality is unobtainable — two correct f64 algorithms differ by
    # ~eps64 * cond here)
    assert r10 < 5e-9
    assert r10 < r1 / 10


def test_near_singular_floor_fails_safe_to_f64():
    """Floors beyond KERNEL_MAX_FLOOR (incl. inf from a singular probe)
    skip the conditioning-limited kernel shortcut and land on f64."""
    r = ladder.choose(_cond_amp(np.inf, 1.0))
    assert r == ladder.Route(path="xla", precision="f64")
    r2 = ladder.choose(_cond_amp(1e10, 1e5))   # floor 2e0 > 1e-3
    assert r2 == ladder.Route(path="xla", precision="f64")
