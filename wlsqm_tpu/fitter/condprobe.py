"""Cheap host-side accuracy probe for automatic kernel routing.

The fused Pallas kernel (:mod:`wlsqm_tpu.ops.pallas_fit`) computes in
double-single f32 pairs on the radius-prescaled, Jacobi-scaled normal
equations.  Its worst-case relative DOF error against the f64 engine is
empirically (TPU v5e, 2D order-4 sweep over radii 0.03–1.0, both
weightings, K in {24, 30}, 28,672 cases — see benchmarks/README.md):

    err_max  ~=  DS_UNIT * cond2(A_jacobi) * inv_s**order

where ``inv_s = 2**-e`` is the kernel's power-of-two radius prescale
(> 1 for sub-unit neighborhoods) and ``DS_UNIT ~= 2e-15`` with ±4x
scatter.  The two factors are the two distinct error sources:

* ``cond2(A_jacobi)``: the double-single solve/refinement noise floor,
  amplified by the conditioning of the *scaled* system (the quantity the
  Jacobi preconditioner cannot remove).  Note this is invariant under the
  radius prescale (diagonal scalings commute), so it can be probed on the
  raw geometry.
* ``inv_s**order``: the exact power-of-two DOF de-scaling — the solve's
  absolute error in the scaled space lands on a vector whose high-degree
  components are later multiplied by ``inv_s**degree``.

``backend="auto"`` and the compat layer use :func:`kernel_accuracy_ok`
to route batches whose predicted floor (with a 4x safety factor) exceeds
the 1e-10 reference-parity bar to the f64 engine instead.  This replaces
the round-1 geometry-only ``K >= 1.5*NO`` margin guard, which the
VERDICT showed admits cond~1e5 order-4 clouds with ~3.6e-8 ds error
(reference accuracy motivation: README.md:76-78 — ill-conditioned
high-order fits are exactly where the reference's Ruiz scaling earns its
keep, reference: wlsqm/fitter/impl.pyx:646-655).

The probe itself is pure NumPy on a deterministic sample of cases:
assemble the weighted normal matrix, Jacobi-scale, cond via SVD —
~milliseconds for the default 256-case sample, no device round-trip.
"""

from __future__ import annotations

import numpy as np

from wlsqm_tpu.fitter import defs, tables

#: double-single effective unit roundoff of the fused kernel's solve
#: (empirical fit constant, see module docstring).  This is the CENTRAL
#: model constant (regime splits, sweep prediction); the certification
#: gate uses the worst-case per-case envelope :data:`DS_CERT_UNIT`.
DS_UNIT = 2e-15

#: per-case worst-case envelope unit for the ds CERTIFICATION gate.
#: The central model holds on batch maxima, but per-case errors scatter
#: above it: a direct gate-soundness run (benchmarks/run_gate_check.py,
#: TPU v5e, 14,336 cases, radii 0.03-1.0, both weightings, strong
#: long-double-refined oracle) found 9 certified cases up to 1.74e-10
#: under the old 2e-15 gate (edge ca=1.25e4); the empirical worst-err
#: envelope crosses 1e-10 at ca ~3.7e3.  1.25e-14 places the certified
#: edge at ca = 2e3, where the worst observed ds error is 1.81e-11
#: (5.5x headroom).  The (2e3, 3.6e4] band stays kernel-served by the
#: certified triple-single rung (:data:`TS_PARITY_UNIT`).
DS_CERT_UNIT = 1.25e-14

#: routing bar: predicted floor above this routes to the f64 engine
AUTO_TOL = 1e-10

#: multiplier on the predicted floor to absorb the empirical +-4x scatter
SAFETY = 4.0

#: default number of sampled cases per probe
SAMPLE = 256


#: number of screen-selected worst cases appended to the probe sample
#: (per screen criterion)
SCREEN_TOP = 64


def _sample_idx(B: int, sample: int) -> np.ndarray:
    """Deterministic sample covering the batch (first/last included).

    For large batches the sample grows with B (up to 4x the default) so
    the coverage density does not collapse; the worst-case screen
    (:func:`_screen_scalars`) separately pins outliers that any spaced
    sample could miss.
    """
    if B <= sample:
        return np.arange(B)
    sample = max(sample, min(4 * SAMPLE, B // 64))
    return np.unique(np.linspace(0, B - 1, sample).astype(np.int64))


def _screen_math(xp, xk, nk, xi, order_b, dimension: int):
    """Shared screen arithmetic (xp = np or jnp; jit-safe: no linalg ops,
    closed-form determinants — jnp.linalg.det hangs on the axon bridge)."""
    B, K, dim = xk.shape
    nk_a = (xp.full((B,), K, np.int32) if nk is None else nk)
    delta = xk - xi[:, None, :]
    kmask = xp.arange(K)[None, :] < nk_a[:, None]
    delta = xp.where(kmask[:, :, None], delta, 0.0)
    d2 = (delta ** 2).sum(-1)
    h2 = xp.where(kmask, d2, 0.0).max(-1)
    e = xp.ceil(0.5 * xp.log2(xp.where(h2 > 0, h2, 1.0)))
    inv_s = xp.exp2(-e)
    amp = xp.maximum(inv_s, 1.0) ** order_b
    # degenerate-radius cases (all neighbors on top of xi) are caught by
    # the aniso channel: force them to the worst ranking
    u = delta / xp.sqrt(xp.where(h2 > 0, h2, 1.0))[:, None, None]
    denom = xp.maximum(nk_a, 1).astype(np.float64)[:, None, None]
    M = (u[:, :, :, None] * u[:, :, None, :]).sum(axis=1) / denom  # (B,d,d)
    if dim == 1:
        det = M[:, 0, 0]
        tr = M[:, 0, 0]
    elif dim == 2:
        det = M[:, 0, 0] * M[:, 1, 1] - M[:, 0, 1] * M[:, 1, 0]
        tr = (M[:, 0, 0] + M[:, 1, 1]) / 2.0
    else:
        det = (M[:, 0, 0] * (M[:, 1, 1] * M[:, 2, 2]
                             - M[:, 1, 2] * M[:, 2, 1])
               - M[:, 0, 1] * (M[:, 1, 0] * M[:, 2, 2]
                               - M[:, 1, 2] * M[:, 2, 0])
               + M[:, 0, 2] * (M[:, 1, 0] * M[:, 2, 1]
                               - M[:, 1, 1] * M[:, 2, 0]))
        tr = (M[:, 0, 0] + M[:, 1, 1] + M[:, 2, 2]) / 3.0
    aniso = det / xp.maximum(tr, 1e-300) ** dim
    aniso = xp.where(h2 > 0, aniso, 0.0)
    return amp, aniso


def _screen_scalars(xk, nk, xi, order, dimension: int):
    """Full-batch O(B*K) screen: per-case (amp, aniso) NumPy arrays.

    ``amp = max(inv_s, 1)**order`` is the exact radius de-scale
    amplification of the kernel's error (tiny neighborhoods are the #1
    accuracy hazard); ``aniso = det(M) / (trace(M)/dim)**dim`` of the
    mask-normalized neighbor second-moment matrix ``M`` is a scale-free
    degeneracy proxy that approaches 0 for collinear/coplanar
    neighborhoods (which make A near-singular at any radius).  Device
    arrays run ONE jitted program (per-op eager dispatch costs seconds
    per op on the remote-TPU bridge), so only two (B,) vectors ever
    reach the host, never the full geometry.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    B = xk.shape[0]
    if isinstance(xk, jax.Array):
        jit_screen = partial(
            jax.jit, static_argnames=("dimension", "has_nk"))(_screen_jit)
        amp, aniso = jit_screen(
            xk, jnp.zeros((B,), jnp.int32) if nk is None else jnp.asarray(nk),
            jnp.asarray(xi),
            jnp.broadcast_to(jnp.asarray(order, jnp.float64), (B,)),
            dimension=dimension, has_nk=nk is not None)
        return np.asarray(amp), np.asarray(aniso)
    order_b = np.broadcast_to(np.asarray(order, np.float64), (B,))
    xi_np = np.asarray(xi)
    nk_np = None if nk is None else np.asarray(nk)
    amp, aniso = _screen_math(np, np.asarray(xk), nk_np, xi_np, order_b,
                              dimension)
    return np.asarray(amp), np.asarray(aniso)


def _screen_jit(xk, nk, xi, order_b, *, dimension, has_nk):
    import jax.numpy as jnp

    return _screen_math(jnp, xk, nk if has_nk else None, xi, order_b,
                        dimension)


def _screened_idx(xk, nk, xi, order, dimension: int, sample: int):
    """Probe sample = spaced coverage + the screened worst cases.

    The spaced sample alone can miss a sparse subset of pathological
    cases (tiny radius, degenerate geometry) in a large batch; the O(B*K)
    screen ranks ALL cases by the two cheap hazard proxies and appends
    the top :data:`SCREEN_TOP` of each, so the SVD-based gate always sees
    the worst candidates.
    """
    B = xk.shape[0]
    base = _sample_idx(B, sample)
    if B <= len(base):
        return base
    amp, aniso = _screen_scalars(xk, nk, xi, order, dimension)
    ntop = min(SCREEN_TOP, B)
    worst_amp = np.argpartition(amp, -ntop)[-ntop:]
    worst_deg = np.argpartition(aniso, ntop - 1)[:ntop]
    return np.unique(np.concatenate([base, worst_amp, worst_deg]))


#: f32 unit roundoff — the per-sweep contraction rate of the kernel's
#: refinement loop is ~F32_UNIT * cond (an f32 Cholesky preconditioner)
F32_UNIT = 6e-8


def _cond_key_math(xk, nk, xi, *, dimension: int, order: int,
                   knowns: int, weighting: int):
    """Traced body of :func:`cond_key` (jnp arrays in, (B,) f64 out)."""
    import jax.numpy as jnp
    from jax import lax

    from wlsqm_tpu.fitter import engine

    B, K, dim = xk.shape
    NO = defs.number_of_dofs(dimension, order)
    exp = jnp.asarray(tables.EXPONENTS[dimension][:NO])
    invf = jnp.asarray(tables.INV_FACT[dimension][:NO], jnp.float32)

    d = xk - xi[:, None, :]
    kmask = jnp.arange(K)[None, :] < nk[:, None]
    d = jnp.where(kmask[:, :, None], d, 0.0)
    d2 = (d * d).sum(-1)
    h2 = jnp.where(kmask, d2, 0.0).max(-1)
    # the kernel's exact power-of-two radius prescale
    e = jnp.ceil(0.5 * jnp.log2(jnp.where(h2 > 0, h2, 1.0)))
    inv_s = jnp.exp2(-e)
    t = (d * inv_s[:, None, None]).astype(jnp.float32)
    C = invf * jnp.prod(t[:, :, None, :] ** exp[None, None, :, :], axis=-1)
    if weighting == defs.WEIGHT_CENTER:
        w = engine.WEIGHT_ALPHA + engine.WEIGHT_BETA * (
            1.0 - jnp.sqrt(d2 / jnp.where(h2 > 0, h2, 1.0)[:, None])) ** 2
    else:
        w = jnp.ones_like(d2)
    w = jnp.where(kmask, w, 0.0).astype(jnp.float32)
    A = jnp.einsum("bki,bk,bkj->bij", C, w, C)
    if knowns:
        kn = np.array([(int(knowns) >> j) & 1 for j in range(NO)], bool)
        act2 = jnp.asarray(~kn)[None, :, None] & jnp.asarray(~kn)[None, None, :]
        A = jnp.where(act2, A, 0.0) + jnp.where(
            jnp.asarray(~kn)[None, :, None], 0.0,
            jnp.eye(NO, dtype=A.dtype)[None])
    dg = lax.rsqrt(jnp.maximum(jnp.einsum("bii->bi", A), 1e-30))
    As = A * dg[:, :, None] * dg[:, None, :]
    L = lax.linalg.cholesky(As)
    eye = jnp.broadcast_to(jnp.eye(NO, dtype=As.dtype), As.shape)
    Y = lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
    Ai = lax.linalg.triangular_solve(L, Y, left_side=True, lower=True,
                                     transpose_a=True)
    ninf = jnp.abs(As).sum(-1).max(-1)
    nFi = jnp.sqrt((Ai * Ai).sum((1, 2)))
    amp = jnp.maximum(inv_s, 1.0) ** float(order)
    return (ninf * nFi).astype(jnp.float64) * amp


def cond_key(xk, nk, xi, *, dimension: int, order: int, knowns: int = 0,
             weighting: int = defs.WEIGHT_UNIFORM):
    """Reference implementation of the split-route certification key.

    ``est_i = ||A_jac||_inf ||A_jac^{-1}||_F * amp_i  >=  cond_2(A_jac)
    * amp_i`` of case i's Jacobi-scaled normal system (a true upper
    bound of the spectral cond; measured slack on the calibration family
    1.15-2.4x) — the same formula the fused kernel emits per case with
    ``emit_cond=True`` (``ops/pallas_fit._cond_estimate``).  This XLA
    version exists for tests and offline analysis; the HOT path always
    takes the in-kernel value (batched small-matrix Cholesky/
    triangular_solve in XLA measured ~80 ms per 32k chunk on TPU — two
    orders of magnitude off the kernel's budget).  NaN for degenerate
    geometry (safe: NaN compares False against any threshold, so such
    cases never certify).

    The split-route error envelopes are calibrated DIRECTLY against the
    kernel-emitted key (``est_*`` units in
    :mod:`wlsqm_tpu.fitter.calibration`), so the f32 arithmetic noise
    and the bound's slack are part of the calibrated model, never an
    unchecked assumption.
    """
    import jax

    fn = jax.jit(_cond_key_math,
                 static_argnames=("dimension", "order", "knowns",
                                  "weighting"))
    import jax.numpy as jnp

    B, K, _ = np.shape(xk)
    nk_a = (jnp.full((B,), K, jnp.int32) if nk is None
            else jnp.asarray(nk, jnp.int32))
    return fn(jnp.asarray(xk), nk_a, jnp.asarray(xi), dimension=dimension,
              order=int(order), knowns=int(knowns), weighting=int(weighting))


def _cond_amp(xk, nk, xi, order, weighting, *, dimension: int,
              knowns: int = 0, sample: int = SAMPLE):
    """Per-sampled-case (cond2(A_jacobi), inv_s**order) arrays.

    xk (B, K, dim) | nk (B,) or None | xi (B, dim) | order scalar or (B,)
    | weighting scalar or (B,).  The case sample is gathered BEFORE any
    host conversion, so device-resident geometry costs one small
    (sample, K, dim) transfer, never a full-batch copy.  The sample is
    the spaced coverage plus the full-batch screen's worst candidates
    (:func:`_screened_idx`), so sparse pathological cases in a large
    batch cannot fall between sample points.
    """
    B, K, dim = xk.shape
    idx = _screened_idx(xk, nk, xi, order, dimension, sample)

    # fancy-index first (runs on device for jax arrays), convert after
    xk_s = np.asarray(xk[idx], dtype=np.float64)
    xi_s = np.asarray(xi[idx] if hasattr(xi, "__getitem__")
                      else np.asarray(xi)[idx], dtype=np.float64)
    order_a = np.broadcast_to(np.asarray(order, np.int32), (B,))[idx]
    weighting_a = np.broadcast_to(np.asarray(weighting, np.int32), (B,))[idx]
    if nk is None:
        nk_s = np.full(len(idx), K, np.int32)
    else:
        nk_s = np.asarray(nk[idx], dtype=np.int32)

    omax = int(order_a.max())
    NO = defs.number_of_dofs(dimension, omax)
    exp = tables.EXPONENTS[dimension][:NO]            # (NO, dim)
    invf = tables.INV_FACT[dimension][:NO]

    delta = xk_s - xi_s[:, None, :]
    kmask = np.arange(K)[None, :] < nk_s[:, None]
    delta = np.where(kmask[:, :, None], delta, 0.0)
    d2 = (delta ** 2).sum(-1)

    # the kernel's power-of-two radius prescale (engine.radius_pow2_scale)
    h2 = np.where(kmask, d2, 0.0).max(-1)
    e = np.ceil(0.5 * np.log2(np.where(h2 > 0, h2, 1.0)))
    inv_s = np.exp2(-e)                                # (b,)

    c = np.ones(delta.shape[:2] + (NO,))
    for a in range(dim):
        c = c * delta[..., a:a + 1] ** exp[:, a]
    c = c * invf

    # per-case active-DOF mask (lower orders truncate the basis)
    no_per = np.array([defs.number_of_dofs(dimension, int(o))
                       for o in order_a])
    active = np.arange(NO)[None, :] < no_per[:, None]  # (b, NO)
    if knowns:
        kn = np.array([(int(knowns) >> j) & 1 for j in range(NO)], bool)
        active = active & ~kn[None, :]

    from wlsqm_tpu.fitter import engine

    max_d2 = np.where(kmask, d2, 0.0).max(-1, keepdims=True)
    t = 1.0 - np.sqrt(d2 / np.where(max_d2 > 0, max_d2, 1.0))
    w_center = engine.WEIGHT_ALPHA + engine.WEIGHT_BETA * t * t
    w = np.where(weighting_a[:, None] == defs.WEIGHT_CENTER,
                 w_center, 1.0)
    w = np.where(kmask, w, 0.0)

    A = np.einsum("bkj,bk,bkm->bjm", c, w, c)
    # mask inactive/known DOFs to identity rows/cols, like the kernel
    act2 = active[:, :, None] & active[:, None, :]
    eye = np.eye(NO)[None]
    A = np.where(act2, A, 0.0) + np.where(active[:, :, None], 0.0, eye)

    diag = np.einsum("bjj->bj", A)
    s = 1.0 / np.sqrt(np.where(diag > 0, diag, 1.0))
    As = A * s[:, :, None] * s[:, None, :]
    cond = np.linalg.cond(As)

    amp = np.maximum(inv_s, 1.0) ** order_a.astype(np.float64)
    return cond, amp


def probe(xk, nk, xi, order, weighting, *, dimension: int,
          knowns: int = 0, sample: int = SAMPLE):
    """Run the geometry probe once; returns (cond, amp) sample arrays.

    Feed the result to :func:`accuracy_ok_from` / :func:`pick_from` so one
    sampled-SVD pass serves both the routing gate and the sweep-count
    choice.  Returns None on degenerate geometry (singular samples) —
    treat as "route to f64".
    """
    try:
        return _cond_amp(xk, nk, xi, order, weighting, dimension=dimension,
                         knowns=knowns, sample=sample)
    except (ValueError, np.linalg.LinAlgError):
        return None


def _units():
    """Active per-device calibration record (units + regime thresholds).

    The module-level constants above are the shipped TPU-v5e values and
    remain for provenance/back-compat; routing decisions go through the
    calibration store so other device generations use THEIR measured
    units — or, uncalibrated, get the certification gates refused
    (:mod:`wlsqm_tpu.fitter.calibration`).
    """
    from wlsqm_tpu.fitter import calibration

    return calibration.active()


def accuracy_ok_from(cond_amp, tol: float = AUTO_TOL,
                    assembly: str = "rows") -> bool:
    """ds-certification gate on a precomputed :func:`probe` result.

    True means EVERY case's double-single kernel/engine error is
    predicted under ``tol`` by the worst-case per-case envelope
    (:data:`DS_CERT_UNIT`, pinned by benchmarks/run_gate_check.py); the
    ``assembly`` argument selects that kernel variant's own calibrated
    envelope (the moment path's is ~30x looser — calibration.py).
    Always False on hardware without an accuracy calibration record.
    """
    if cond_amp is None:
        return False
    u = _units()
    if not u.certified:
        return False
    _, ds_cert, _ = u.units_for(assembly)
    cond, amp = cond_amp
    return float(ds_cert * (cond * amp).max()) * SAFETY <= tol


#: effective parity unit of the triple-single kernel variant against an
#: independent f64 oracle: err_max ~= TS_PARITY_UNIT * cond * amp.  TPU
#: v5e calibration (benchmarks/run_ts_sweep.py, 2D order-4 K=30, radii
#: 0.03-1.0, both weightings): implied batch-level units 4.8e-17..6.8e-16
#: — dominated by the f64 ORACLE's own arithmetic (~1.1e-16*cond*amp).
#: Gate-soundness check (benchmarks/run_gate_check.py, per-case errors vs
#: a long-double-refined oracle over 14,336 cases): 0 violations among
#: the 5,918 ts-certified cases, worst certified error 2.08e-11 — 4.8x
#: headroom at the certified edge ca = 3.6e4, consistent with the
#: per-case model 7e-16*ca at that edge.
TS_PARITY_UNIT = 7e-16

#: in-kernel ts sweep count used in the conditioning-limited regime and
#: as the pick fallback (matches ops/pallas_fit.TS_REFINE_STEPS; the
#: calibration sweep ran at this setting)
TS_REFINE_STEPS_FULL = 6


def ts_accuracy_ok_from(cond_amp, tol: float = AUTO_TOL,
                        assembly: str = "rows") -> bool:
    """Whether the ts kernel's parity floor clears ``tol`` (middle band).

    The model already measures against an f64 oracle, so "ok" means the
    result is certified f64-grade: any correct f64 implementation (the
    reference included) agrees with it to ``tol``.  Always False on
    hardware without an accuracy calibration record.
    """
    if cond_amp is None:
        return False
    u = _units()
    if not u.certified:
        return False
    _, _, ts_unit = u.units_for(assembly)
    cond, amp = cond_amp
    return float(ts_unit * (cond * amp).max()) * SAFETY <= tol


def pick_ts_from(cond_amp, tol: float = AUTO_TOL,
                 candidates=(3, 4, 5, 6), assembly: str = "rows") -> int:
    """Cheapest ts sweep count with predicted error under ``tol``.

    Same two-regime model as :func:`predicted_error` with the deeper
    triple floor: the f32 preconditioner contracts by ~F32_UNIT*cond per
    sweep toward ``TS_PARITY_UNIT * cond * amp``.
    """
    if cond_amp is None:
        return candidates[-1]
    _, _, ts_unit = _units().units_for(assembly)
    cond, amp = cond_amp
    rate = F32_UNIT * cond
    for n in candidates:
        pred = np.maximum(ts_unit * cond, rate ** (n + 1)) * amp
        if float(pred.max()) * PICK_SAFETY <= tol:
            return n
    return candidates[-1]


def ds_floor(xk, nk, xi, order, weighting, *, dimension: int,
             knowns: int = 0, sample: int = SAMPLE) -> float:
    """Predicted worst-case kernel relative DOF error (converged sweeps)."""
    cond, amp = _cond_amp(xk, nk, xi, order, weighting, dimension=dimension,
                          knowns=knowns, sample=sample)
    return float(_units().ds_unit * (cond * amp).max())


def predicted_error(cond, amp, refine_steps: int, assembly: str = "rows"):
    """Kernel error model at ``refine_steps`` ds sweeps after the solve.

    Two regimes, both TPU-measured (benchmarks/README.md sweeps at 2 and 4
    sweeps): the converged double-single floor ``DS_UNIT * cond``, and the
    not-yet-converged refinement term ``(F32_UNIT * cond)**(n+1)`` (the f32
    preconditioner contracts the error by ~F32_UNIT*cond per sweep, from an
    initial f32-solve error of the same size).  The radius de-scale
    amplifies whichever dominates.
    """
    ds_unit, _, _ = _units().units_for(assembly)
    rate = F32_UNIT * cond
    return np.maximum(ds_unit * cond, rate ** (refine_steps + 1)) * amp


def kernel_accuracy_ok(xk, nk, xi, order, weighting, *, dimension: int,
                       knowns: int = 0, tol: float = AUTO_TOL,
                       sample: int = SAMPLE) -> bool:
    """Whether auto routing may send this batch to the fused kernel with
    a CERTIFIED ≤``tol`` result — in double-single arithmetic (ds gate,
    :data:`DS_CERT_UNIT`) or, failing that, the triple-single variant
    (ts gate, :data:`TS_PARITY_UNIT`).  The ladder picks which."""
    try:
        cond_amp = _cond_amp(xk, nk, xi, order, weighting,
                             dimension=dimension, knowns=knowns,
                             sample=sample)
    except (ValueError, np.linalg.LinAlgError):
        return False  # degenerate geometry: let the f64 engine handle it
    return (accuracy_ok_from(cond_amp, tol=tol)
            or ts_accuracy_ok_from(cond_amp, tol=tol))


#: safety multiplier for the sweep-count choice.  Smaller than the routing
#: gate's SAFETY because the convergence model is anchored on measured
#: points (pred 1.6e-7 vs meas 1.2e-7 at cond 2.3e5 / 2 sweeps; pred
#: 2.5e-12 vs meas 4e-12 at cond 5.7e3 — worst observed under-prediction
#: 1.6x), and because kernel_accuracy_ok (x4 on the converged floor)
#: remains the actual accuracy gate.
PICK_SAFETY = 2.0


def pick_refine_steps(xk, nk, xi, order, weighting, *, dimension: int,
                      knowns: int = 0, tol: float = AUTO_TOL,
                      sample: int = SAMPLE,
                      candidates=(2, 3, 4)) -> int:
    """Cheapest sweep count whose predicted error stays under ``tol``.

    2 sweeps are ~25% faster than the production default of 4 and already
    sit on the ds floor for well-conditioned batches (TPU-measured on the
    headline benchmark cloud: 14.3 M fits/s at parity 1.9e-12 with 2
    sweeps vs 11.5 M at 1.6e-12 with 4, while a cond~2.3e5 sweep case
    degrades from 1.4e-11 at 4 sweeps to 1.2e-7 at 2).  Returns the last
    candidate if none meets ``tol`` (the accuracy gate proper is
    :func:`kernel_accuracy_ok`).
    """
    return pick_from(
        probe(xk, nk, xi, order, weighting, dimension=dimension,
              knowns=knowns, sample=sample),
        tol=tol, candidates=candidates)


def split_partition_choice(tol: float = AUTO_TOL):
    """Fastest certified split-partition variant, or None.

    Returns ``(kernel_precision, est_edge)`` — the moment-kernel
    arithmetic for the certified partition ("dsts" when its calibrated
    est-envelope is deeper, else "ds") and the per-case key threshold
    ``est <= est_edge`` below which that variant's error is certified
    under ``tol``.  None when the device record carries no est-envelope
    calibration (split route disabled).
    """
    u = _units()
    if not u.certified:
        return None
    ds_edge = (tol / (SAFETY * u.est_ds_cert_unit_m)
               if u.est_ds_cert_unit_m else None)
    dsts_edge = (tol / (SAFETY * u.est_dsts_cert_unit_m)
                 if u.est_dsts_cert_unit_m else None)
    if dsts_edge and (ds_edge is None
                      or dsts_edge >= ds_edge * SPLIT_DSTS_MIN_GAIN):
        return ("dsts", dsts_edge)
    if ds_edge:
        return ("ds", ds_edge)
    return None


#: the dsts partition costs ~one extra ds sweep; prefer it over plain ds
#: only when its certified edge is at least this much farther out
SPLIT_DSTS_MIN_GAIN = 1.3


def est_certified_edges(tol: float = AUTO_TOL) -> dict:
    """Per-case est-key certification edges of the moment-kernel bodies.

    ``{"ds": edge, "dsts": edge, "ts": edge}`` — the largest per-case
    certification key (:func:`cond_key` / the kernel's ``emit_cond``
    output, identical formulas) at which each arithmetic's calibrated
    envelope stays under ``tol`` with :data:`SAFETY` applied; ``None``
    entries for uncalibrated variants, ``{}`` when the device record is
    uncertified.  A batch whose exact key maximum sits under an edge is
    per-case certified for that variant as a whole — the routing rungs
    in :func:`wlsqm_tpu.api.plan_fit_many` that close the sampled
    probe's coverage hole (the sampled max can miss the true one
    entirely; the round-5 headline cloud sampled 21,101 vs 50,876).
    """
    u = _units()
    if not u.certified:
        return {}
    return {name: (tol / (SAFETY * unit) if unit else None)
            for name, unit in (("ds", u.est_ds_cert_unit_m),
                               ("dsts", u.est_dsts_cert_unit_m),
                               ("ts", u.est_ts_parity_unit_m))}


def pick_steps_at_edge(ca_edge: float, tol: float = AUTO_TOL,
                       candidates=(2, 3, 4),
                       assembly: str = "moments") -> int:
    """Cheapest sweep count converged for every case under ``ca_edge``.

    The split route's fast partition admits cases up to its certified
    edge; evaluating the two-regime convergence model AT the edge bounds
    every admitted case (cond*amp <= edge, and rate uses cond <= edge —
    conservative since amp >= 1 is folded into the edge).
    """
    ds_unit, _, _ = _units().units_for(assembly)
    rate = F32_UNIT * ca_edge
    for n in candidates:
        pred = max(ds_unit * ca_edge, rate ** (n + 1))
        if pred * PICK_SAFETY <= tol:
            return n
    return candidates[-1]


def pick_from(cond_amp, tol: float = AUTO_TOL, candidates=(2, 3, 4),
              assembly: str = "rows") -> int:
    """Sweep-count choice on a precomputed :func:`probe` result."""
    if cond_amp is None:
        return candidates[-1]
    cond, amp = cond_amp
    for n in candidates:
        pred = predicted_error(cond, amp, n, assembly=assembly)
        if float(pred.max()) * PICK_SAFETY <= tol:
            return n
    return candidates[-1]
