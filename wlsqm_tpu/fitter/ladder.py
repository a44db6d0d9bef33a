"""Tiered precision routing: no 1000x cliff off the kernel path.

When ``backend="auto"`` cannot put a batch on the fused ds kernel — the
conditioning probe predicts an error above the 1e-10 parity bar, or the
batch shape is ineligible — the round-2 behavior was to drop straight to
the XLA engine at emulated-f64 *default* precision: ~0.014 M fits/s on
TPU v5e, a ~1000x cliff below the kernel's 14+ M (BASELINE.md).  The
reference has no such cliff — ill-conditioned high-order fits are exactly
the case its Ruiz-scaling machinery exists for (reference:
wlsqm/fitter/impl.pyx:620-689, README.md:76-78) and run at full speed.

This module turns the conditioning probe's error model
(:mod:`wlsqm_tpu.fitter.condprobe`) into a *ladder*: the cheapest
execution path whose predicted error clears the accuracy bar.

Rungs, fastest first:

1. **kernel (ds)**: the fused double-single kernel, when the per-case
   certification envelope ``DS_CERT_UNIT * cond2(A_jacobi) *
   inv_s**order`` clears the bar for every case (gate soundness pinned
   by benchmarks/run_gate_check.py; the central ±4x model ``DS_UNIT``
   still drives sweep counts and regime splits).
2. **kernel (ts)**: the same fused kernel in triple-single arithmetic
   (ops/threefloat.py, ``precision="ts"``) at ~1.5x the ds kernel's
   runtime.  Its measured error against an independent f64 oracle is
   ``<= TS_PARITY_UNIT * cond * amp`` with ``TS_PARITY_UNIT ~ 7e-16`` —
   oracle-arithmetic-limited, i.e. f64-grade or better (TPU sweep,
   benchmarks/run_ts_sweep.py).  This rung serves the whole middle band
   at kernel speed (measured 2.28 M fits/s vs the fast rung's 0.04 M on
   the radius-0.1 rejected config).
3. **ds XLA engine**: the pair floor for batches whose *shape* the
   kernel cannot take (too small to tile, VMEM).
4. **fast XLA engine, adaptive sweeps**: f32 assembly + f32 Cholesky used
   as a *preconditioner*; the refinement residual is evaluated through
   the exact f64 basis rows, so the iteration converges to the TRUE f64
   normal-equations solution at rate ``~F32_UNIT * cond`` per sweep
   (engine PRECISION_FAST).  The ladder picks the sweep count from the
   probed conditioning.  Kernel-ineligible middle-band batches land
   here: it pays emulated f64 only in the O(B*K*NO) residual pieces,
   never in the O(NO^3) factorization or O(K*NO^2) assembly.
5. **mixed XLA engine, adaptive sweeps**: f64 assembly + f32 factor —
   same convergence law with a cleaner preconditioner; used when the f32
   *assembly* perturbation gets marginal (high cond).
6. **f64 XLA engine**: bitwise the reference algorithm; the rung of last
   resort (cond beyond f32-preconditioner convergence, or degenerate
   geometry the probe cannot assess).

Regime split (hardware-measured, benchmarks/run_ladder_sweep.py and
run_ts_sweep.py): when the predicted ds floor exceeds
:data:`BEYOND_PARITY_FLOOR`, the problem is conditioning-limited — the
f64 engine itself differs from an independent f64 oracle by the same
magnitude as the kernel does (radius 0.03 order-4: kernel 1.17e-5, f64
engine 1.2e-5), so no algorithm can certify 1e-10 parity against an f64
reference.  Since round 3 the ladder routes this regime to the **ts
kernel**, whose triple-single arithmetic measures BELOW the f64 engine's
own error there (radius 0.03: ts 2.8e-7 vs f64 engine 1.2e-5) at ~140x
its speed — accuracy-optimal AND fast.  In the middle band (floor
between the gate and BEYOND_PARITY_FLOOR) genuine certified f64-grade
parity is achievable: the ts kernel delivers it for kernel-eligible
shapes, the fast rung for the rest.

Measured dead end (TPU v5e, benchmarks/run_ladder_sweep.py, round 3): an
outer data-space iterative refinement over the *kernel* (f64 residual at
the data points + kernel corrective refit) stalls at ~0.2-0.3x the plain
ds floor instead of contracting geometrically.  The ds floor is
*basis-representation-limited*: the kernel's internal basis rows carry a
deterministic ~4e-15 (48-bit pair) perturbation, so the outer iteration
converges to the fixed point of the *perturbed projection*
``C_ds^T W (fk - C x) = 0`` — within O(1) of the plain floor — rather
than the true normal equations.  Reaching below the floor requires exact
f64 residual *projection*, which is precisely rung 3.

The decision is made once per batch/bucket on concrete data (host side)
and returned as a hashable :class:`Route`, so it can also be captured in
a :class:`wlsqm_tpu.api.FitPlan` and replayed inside ``jax.jit`` without
tracing host logic.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from wlsqm_tpu.fitter import condprobe

__all__ = ["Route", "choose"]

#: convergence target of the adaptive sweep counts (well under the 1e-10
#: bar so fast/mixed-routed batches are f64-grade, not borderline)
SWEEP_TARGET = 1e-13

#: the fast rung's f32-assembled preconditioner is trusted while the
#: per-sweep contraction rate F32_UNIT * cond is at most this
FAST_MAX_RATE = 0.03

#: mixed (f64-assembled, f32-factored) extends a bit further
MIXED_MAX_RATE = 0.1

MAX_SWEEPS = 14

#: Above this predicted ds floor the problem is in the *conditioning-
#: limited* regime: the measured f64-engine-vs-oracle error at such
#: configurations is within ~10x of the ds floor itself (TPU sweep,
#: benchmarks/run_ladder_sweep.py — e.g. radius 0.03 order-4: kernel
#: 1.17e-5, f64 engine 1.2e-5, fast rung 3.8e-6 against the same oracle),
#: i.e. NO pair of correct f64-grade algorithms agrees to 1e-10 there,
#: the reference included.  Certifiable parity being unattainable, the
#: ladder takes the fused kernel in its triple-single variant — measured
#: MORE accurate than the f64 engine itself in this regime (radius 0.03:
#: ts 2.8e-7 vs f64 engine 1.2e-5, benchmarks/run_ts_sweep.py) at ~100x
#: its speed; callers who want the reference's exact f64 algorithm pass
#: precision="f64" explicitly.
BEYOND_PARITY_FLOOR = 1e-8

#: ds-floor ceiling for the conditioning-limited kernel shortcut: floors
#: beyond this (or non-finite — singular probe) mean near-degenerate
#: geometry where even the ds result may be garbage; fail safe to the
#: f64 algorithm, matching the reference's behavior on such input
KERNEL_MAX_FLOOR = 1e-3


@dataclasses.dataclass(frozen=True)
class Route:
    """A hashable execution-path decision for one batch or bucket.

    path: "kernel" (fused kernel, in ``kernel_precision`` arithmetic —
    "ds" pairs, "dsts" pair-store + triple sweeps, or "ts" triples),
    "kernel-split" (per-case certified split: the moment kernel in
    ``kernel_precision`` with its per-case ``emit_cond`` key on ALL
    cases, then the ts kernel re-solving the cases whose key exceeds
    ``split_edge`` — up to a ``tail_frac`` window of them, gathered/
    scattered with static shapes so the route traces under
    jit/scan/shard_map),
    or "xla" (the engine at ``precision``, with ``mixed_steps``
    refinement sweeps for the fast/mixed precisions).
    """

    path: str
    refine_steps: int | None = None   # in-kernel sweeps (kernel path)
    precision: str = "f64"            # engine precision (xla path)
    mixed_steps: int | None = None    # adaptive fast/mixed sweeps
    kernel_precision: str = "ds"      # kernel arithmetic (kernel path)
    assembly: str = "rows"            # kernel assembly (rows | moments)
    split_edge: float | None = None   # per-case est gate (kernel-split)
    #: ts-tail window as a fraction of the batch (margin included), so
    #: the static window scales with the traced batch size — e.g. the
    #: per-shard slice under shard_map or a stream's chunk
    tail_frac: float = 0.0
    tail_refine_steps: int | None = None  # ts sweeps for the tail


#: the split route engages only when at least this fraction of the
#: planning batch certifies for the fast partition — below it, the
#: batch-level ts rung is simpler and nearly as fast
SPLIT_MIN_FRAC = 0.5

#: static tail-window slack over the planning batch's measured tail
#: fraction: replayed chunks whose tail outgrows the window leave the
#: overflow on the (uncertified) fast-partition result — the same
#: plan-representativeness contract FitPlan replay already carries
TAIL_MARGIN = 1.6

#: median measured slack of the per-case key over the exact spectral
#: cond (run_r5_calsweep.py: 1.12-2.39, med 1.51) — used only as a perf
#: heuristic to predict the certified fraction from the sampled probe
#: before paying for the key; never in a certification decision
EST_OVER_COND_MED = 1.5

#: measured speed of the moment bodies relative to the ts moment kernel
#: on the same config (TPU v5e, benchmarks/r5_split_decomp.json — 2D
#: order-4 K=30: ds 28.7 / dsts 23.3 / ts 14.5 M fits/s); feeds the
#: split throughput guard only, never a certification decision
SPLIT_SPEED_VS_TS = {"ds": 1.95, "dsts": 1.6}

#: measured cost of the traced split's data-dependent compaction
#: (nonzero window + tail gather + result scatter), in units of one
#: full-batch ts fit per case: r5_split_ablate measured ~3.0 ms of glue
#: on a 32k-case chunk whose plain-ts fit costs 2.25 ms — XLA lowers
#: the dynamic row gather to a serial loop on TPU, so until the
#: compaction gets a native kernel the split pays ~1.3 ts-fits of
#: overhead per case and loses to the plain ts rung it upgrades
SPLIT_GLUE_TS_UNITS = 1.3

#: required predicted speed advantage of the split composition over the
#: plain batch-level ts kernel before the upgrade engages
SPLIT_MIN_GAIN = 1.1


def _sweeps(rate: float) -> int:
    """Smallest n with rate**(n+1) <= SWEEP_TARGET."""
    n = int(np.ceil(np.log(SWEEP_TARGET) / np.log(rate))) - 1
    return max(n, 1)


def choose(cond_amp, *, tol: float = condprobe.AUTO_TOL,
           kernel_ok: bool = True, ds_xla_ok: bool = True,
           ts_kernel_ok: bool | None = None,
           moments_ok: bool = False,
           ts_moments_ok: bool | None = None) -> Route:
    """Pick the cheapest route whose predicted error clears ``tol``.

    ``cond_amp``: a :func:`wlsqm_tpu.fitter.condprobe.probe` result (may
    be None for degenerate geometry — routes to f64).  ``kernel_ok``:
    batch shape is kernel-eligible; ``ds_xla_ok``: the ds XLA engine is
    trustworthy here (False when the pair-fidelity canary fails — see
    :func:`wlsqm_tpu.fitter.engine_ds.ds_backend_ok`);
    ``ts_kernel_ok``: the triple-single variant's 1.5x plane VMEM also
    fits (``pallas_fit.supported(..., precision="ts")``) — defaults to
    ``kernel_ok``; ``moments_ok`` / ``ts_moments_ok``: the
    moment-assembly variant is available for this batch in ds / ts
    arithmetic (basic algorithm, packed-pair VMEM fits —
    ``pallas_fit.moment_vmem_ok`` at 2 / 3 planes; ``ts_moments_ok``
    defaults to ``moments_ok``).  Moment assembly is the fastest kernel
    body (measured +12% ds / +11% ts on v5e, round 4); since the round-5
    accumulation re-sweep its ds envelope sits within ~1.3x of rows and
    its ts output is bit-identical to rows (calibration.py), so the
    moment rungs now serve most certified batches.  Each assembly still
    certifies against its OWN units and the fastest certified one wins.
    """
    if ts_kernel_ok is None:
        ts_kernel_ok = kernel_ok
    if ts_moments_ok is None:
        ts_moments_ok = moments_ok
    if cond_amp is None:
        return Route(path="xla", precision="f64")
    units = condprobe._units()   # per-device calibration record
    cond, amp = cond_amp
    ca_max = float((cond * amp).max())
    floor = units.ds_unit * ca_max
    ds_cert = condprobe.accuracy_ok_from(cond_amp, tol=tol)
    if moments_ok and condprobe.accuracy_ok_from(cond_amp, tol=tol,
                                                 assembly="moments"):
        # fastest certified rung: moment assembly in ds arithmetic —
        # its (loose) envelope still clears the bar for every case
        return Route(path="kernel", assembly="moments",
                     refine_steps=condprobe.pick_from(
                         cond_amp, tol=tol, assembly="moments"))
    if (ts_moments_ok
            and condprobe.ts_accuracy_ok_from(cond_amp, tol=tol,
                                              assembly="moments")):
        # moment assembly in ts arithmetic: still faster than the rows
        # body in either arithmetic (measured 8.9 vs 8.0/10.7-at-ds on
        # the headline config) with a certified f64-grade envelope
        return Route(path="kernel", kernel_precision="ts",
                     assembly="moments",
                     refine_steps=condprobe.pick_ts_from(
                         cond_amp, tol=tol, assembly="moments"))
    if ts_kernel_ok and condprobe.ts_accuracy_ok_from(cond_amp, tol=tol):
        # certified band: ALL certified kernel routing runs the
        # triple-single variant.  The per-case gate-soundness runs
        # (benchmarks/run_gate_check.py, 2D and 3D, strong oracle) show
        # ts with 0 violations and >= 36x headroom, while the ds
        # envelope is marginal even at its tightened DS_CERT_UNIT edge
        # (3D K=64: 2.46e-10 at ca = 1.5e3).  Cost: ~0.9x the ds
        # kernel's throughput — the ds kernel stays available for
        # explicit precision="ds" and for ts-VMEM-unfit shapes below.
        return Route(path="kernel", kernel_precision="ts",
                     refine_steps=condprobe.pick_ts_from(cond_amp, tol=tol))
    if ds_cert:
        # ts planes don't fit this shape (or the ladder was told the
        # kernel is unavailable): fall back per DS_CERT_UNIT
        if kernel_ok:
            return Route(path="kernel",
                         refine_steps=condprobe.pick_from(cond_amp, tol=tol))
        if ds_xla_ok:
            return Route(path="xla", precision="ds")
    elif units.beyond_parity_floor < floor <= units.kernel_max_floor:
        # conditioning-limited regime (see BEYOND_PARITY_FLOOR): take the
        # accuracy-optimal kernel arithmetic at kernel speed — ts beats
        # even the f64 engine here (run_ts_sweep.py).  Near-singular
        # or degenerate geometry (floor beyond KERNEL_MAX_FLOOR, incl.
        # inf from a singular probe) falls through to the f64 fail-safe.
        if ts_kernel_ok:
            return Route(path="kernel", kernel_precision="ts",
                         refine_steps=condprobe.TS_REFINE_STEPS_FULL)
        if kernel_ok:
            # ts planes don't fit VMEM for this shape: the ds kernel at
            # the full sweep count shares the same uncertified floor class
            return Route(path="kernel", refine_steps=4)
        if ds_xla_ok:
            return Route(path="xla", precision="ds")
    rate = float(condprobe.F32_UNIT * cond.max())
    if rate <= FAST_MAX_RATE and _sweeps(max(rate, 1e-12)) <= MAX_SWEEPS:
        return Route(path="xla", precision="fast",
                     mixed_steps=_sweeps(max(rate, 1e-12)))
    if rate <= MIXED_MAX_RATE and _sweeps(rate) <= MAX_SWEEPS:
        return Route(path="xla", precision="mixed", mixed_steps=_sweeps(rate))
    return Route(path="xla", precision="f64")
