"""Fused Pallas TPU kernel for the WLSQM fit pipeline.

The XLA engine (wlsqm_tpu.fitter.engine / engine_ds) materializes every
elementwise intermediate in HBM; at the benchmark configuration that costs
~6 GB of traffic per 32k-case chunk and bounds throughput near 1M fits/s.
This kernel runs the ENTIRE per-case pipeline — extended-precision basis
rows, weights, radius prescaling, f32 normal-matrix assembly, Jacobi
scaling, unrolled Cholesky, and the residual refinement loop — inside one
`pallas_call`, with all per-case state resident in VMEM.  HBM sees only the
inputs (offsets + data values) and the solved DOFs.

Layout: cases are laid out on the (8, 128) vector tile — a block processes
TILE = 1024 cases, and every per-case scalar is a full (8, 128) f32 tile, so
each of the ~3k fused VPU ops works at 100% lane utilization.  Per-(k, j)
quantities are (K, …, 8, 128) VMEM arrays indexed by `lax.fori_loop`.

Two arithmetic variants share the same kernel body, selected by the static
``precision`` argument:

* ``"ds"`` — double-single (hi, lo) f32 pairs (:mod:`wlsqm_tpu.ops.twofloat`),
  ~48 significant bits; error floor ≈ 2e-15·cond₂(A_jacobi)·inv_s^order
  (the calibrated model in wlsqm_tpu/fitter/condprobe.py).  The default.
* ``"ts"`` — triple-single (p0, p1, p2) f32 triples
  (:mod:`wlsqm_tpu.ops.threefloat`), ~72 representable bits at ~2.5x the
  VPU ops; its deeper floor keeps kernel-speed execution available for the
  precision ladder's middle band (batches whose ds floor exceeds the 1e-10
  parity bar but whose conditioning still admits certified f64-grade
  answers), which previously fell to the XLA engine's materialization-bound
  fast/mixed rungs at ~0.04-0.06 M fits/s.

Two assembly bodies share the surrounding machinery, selected by the
static ``assembly`` argument (see docs/kernel.md "moment-assembly"):

* ``"rows"`` — per-neighbor basis rows; f32 normal matrix as a
  preconditioner, refinement residuals through the (implied) exact
  extended-precision matrix.  Tightest calibrated envelope; required
  for sensitivities and ALGO_ITERATIVE.
* ``"moments"`` — ``A[j,m] = M[exp_j + exp_m]`` via one-multiply-per-
  moment chains and a packed extended-precision normal matrix resident
  in VMEM, making each refinement sweep NO(NO+1)/2 fused ops instead of
  two K×NO basis passes.  ~12% faster (v5e, headline config) with a
  ~30x looser calibrated envelope (moment cancellation); the ladder
  certifies each assembly against its own units
  (wlsqm_tpu/fitter/calibration.py) and picks the fastest certified one.

Scope: homogeneous batches — one static polynomial order, one knowns
bitmask (any value; known DOFs are eliminated in-kernel), WEIGHT_UNIFORM
or WEIGHT_CENTER, ragged nk via masking, optional sensitivities and
ALGO_ITERATIVE refinement.  Heterogeneous batches bucket by
(order, knowns) in the api layer; the engine's masked XLA path covers
everything else.  Accuracy matches the ds engine (~1e-12 vs f64 on
typical clouds); see tests/test_pallas_fit.py.
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wlsqm_tpu.fitter import defs, tables
from wlsqm_tpu.ops import threefloat as tf3
from wlsqm_tpu.ops import twofloat as tf

# the fused kernel traces a few thousand ops; default CPython recursion
# limits can trip during lowering
sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

TILE_S, TILE_L = 8, 128
TILE = TILE_S * TILE_L          # cases per grid step
# total sweeps = refine_steps + 1 (first sweep is the solve).  4 extra
# sweeps reach the ds residual floor (cond × ~1e-13) even on clouds where
# the f32 preconditioner converges slowly (cond ≈ 1e5: measured 1.4e-5 at
# 2 steps vs 3.6e-8 at 4 on a radius-0.57 order-4 K=24 batch); the sweeps
# are VMEM-resident matvecs, a small fraction of the kernel's runtime.
DS_REFINE_STEPS = 4
# the ts floor sits ~2^-12 below ds, so the sweeps must contract further
TS_REFINE_STEPS = 6

#: number system per kernel precision: (module, planes, default sweeps).
#: "dsts" (moment body only) keeps the double-single STORE — 2-plane
#: inputs, moment chain, packed A/b, outputs, same VMEM as ds — but runs
#: the refinement sweeps in triple-single arithmetic, so the converged
#: fixed point drops to the pair-REPRESENTATION floor of the stored
#: system instead of the pair-sweep rounding floor (~cost of one extra
#: ds sweep; see _make_kernel_moment).
_NS = {"ds": (tf, 2, DS_REFINE_STEPS), "ts": (tf3, 3, TS_REFINE_STEPS),
       "dsts": (tf, 2, DS_REFINE_STEPS + 1)}

__all__ = ["fit_pallas", "fit_pallas_diffable", "fit_pallas_jit", "supported"]


def _const_planes(v: float, nplanes: int):
    """Exact f32-plane decomposition of a python float (for constants)."""
    planes = []
    r = np.float64(v)
    for _ in range(nplanes):
        hi = np.float32(r)
        planes.append(float(hi))
        r = r - np.float64(hi)
    return planes


def _vmem_bytes(dimension: int, order: int, K: int, store_basis: bool,
                do_sens: bool = False, nplanes: int = 2,
                tile_s: int = TILE_S) -> int:
    NO = defs.number_of_dofs(dimension, order)
    tile_bytes = tile_s * TILE_L * 4
    # scratch: A (NO,NO) + b planes + w planes (+ stored basis when it
    # fits); the Cholesky factor lives in registers/spills, not a buffer
    scratch = (NO * NO + nplanes * NO + nplanes * K) * tile_bytes
    if store_basis:
        scratch += nplanes * K * NO * tile_bytes
    inputs = (nplanes * K * dimension + nplanes * K + K + 1
              + nplanes * NO + nplanes) * tile_bytes
    outputs = nplanes * NO * tile_bytes
    if do_sens:
        outputs += nplanes * K * NO * tile_bytes
    return scratch + inputs + outputs


def _store_basis(dimension: int, order: int, K: int,
                 do_sens: bool = False, nplanes: int = 2,
                 tile_s: int = TILE_S) -> bool:
    """Store the basis-row planes in VMEM (fast matvecs) when they fit."""
    return _vmem_bytes(dimension, order, K, True, do_sens,
                       nplanes, tile_s) < 12 * 1024 * 1024


def vmem_ok(dimension: int, order: int, K: int,
            do_sens: bool = False, nplanes: int = 2,
            tile_s: int = TILE_S) -> bool:
    """Whether the kernel's per-block state fits in VMEM (~16 MB/core).

    Two variants: basis rows stored in VMEM scratch (fastest), or
    recomputed from the offsets inside each refinement matvec (fits the
    big 3D order-4 NO=35 systems).  Budgeted against ~12 MB to leave room
    for Mosaic's own buffers.
    """
    return _vmem_bytes(dimension, order, K, False, do_sens,
                       nplanes, tile_s) < 12 * 1024 * 1024


def supported(dimension: int, order, knowns, weighting, K: int | None = None,
              do_sens: bool = False, precision: str = "ds") -> bool:
    """Whether the fused kernel covers this configuration.

    Homogeneous batches only: one polynomial order, one weighting, and one
    knowns bitmask (any value — known DOFs are eliminated in-kernel with
    their prescribed values).
    """
    order = np.asarray(order)
    knowns = np.asarray(knowns)
    weighting = np.asarray(weighting)
    nplanes = _NS[precision][1]
    ok = (
        dimension in (1, 2, 3)
        and order.min() == order.max()
        and knowns.min() == knowns.max()
        and weighting.min() == weighting.max()
        and weighting.max() in (defs.WEIGHT_UNIFORM, defs.WEIGHT_CENTER)
    )
    if ok and K is not None:
        ok = vmem_ok(dimension, int(order.max()), K, do_sens, nplanes)
    return bool(ok)


def _basis_cols(ns, delta_cols, exp, invfact_planes=None):
    """Basis values c_j for one neighbor, from per-axis offsets.

    delta_cols: list of per-axis plane tuples (each plane an (8,128) tile).
    Returns a list of NO plane tuples.

    With ``invfact_planes=None`` (the kernel's default since round 4) the
    columns are PLAIN monomials: the 1/m! factorial normalization of the
    reference's baked basis (wlsqm/fitter/impl.pyx:119-157) commutes with
    the whole solve — scaling basis columns by constants scales the
    solution components inversely and the Jacobi preconditioner absorbs
    the normal-matrix change exactly — so it is applied OUTSIDE the
    kernel, folded into the exact-f64 DOF de-scale.  That removes ~11
    extended-precision constant multiplies per neighbor per case at 2D
    order 4.
    """
    dim = len(delta_cols)
    max_pow = int(exp.max()) if exp.size else 0
    # per-axis power ladders
    ladders = []
    for a in range(dim):
        d = delta_cols[a]
        lad = [None, d]
        if max_pow >= 2:
            d2 = ns.mul(d, d)
            lad.append(d2)
            if max_pow >= 3:
                lad.append(ns.mul(d2, d))
                if max_pow >= 4:
                    lad.append(ns.mul(d2, d2))
        ladders.append(lad)
    out = []
    for j in range(exp.shape[0]):
        val = None
        for a in range(dim):
            e = int(exp[j, a])
            if e == 0:
                continue
            term = ladders[a][e]
            val = term if val is None else ns.mul(val, term)
        if val is None:  # constant monomial
            one = jnp.ones_like(delta_cols[0][0])
            zero = jnp.zeros_like(one)
            val = (one,) + (zero,) * (len(delta_cols[0]) - 1)
        if invfact_planes is not None:
            cplanes = invfact_planes[j]
            if cplanes[0] != 1.0 or any(p != 0.0 for p in cplanes[1:]):
                val = ns.mul(val, tuple(jnp.full_like(val[0], p)
                                        for p in cplanes))
        out.append(val)
    return out


# refinement sweeps applied to each sensitivity right-hand side (after
# its direct f32 solve); one sweep reaches ~cond x 1e-13 like the main DOFs
SENS_SWEEPS = {"ds": 1, "ts": 2}


# ---------------------------------------------------------------------------
# Moment-based assembly (round 4)
#
# A[j,m] = sum_k w_k c_kj c_km with PLAIN monomial columns is a weighted
# MOMENT of the scaled offsets: A[j,m] = M[exp_j + exp_m] where
# M[e] = sum_k w_k * prod_a d_ka^e_a.  At 2D order 4 the 120 upper-triangle
# entries collapse onto 45 distinct moments of degree <= 8, and each
# neighbor's contribution to every moment costs ONE extended-precision
# multiply (chained from a lower-degree moment) — vs the rows path's
# per-(k, j, m) work.  The RHS is the same chain rooted at w*f over the
# degree <= order lattice (which IS the DOF exponent set).  Storing the
# Jacobi-scaled normal matrix as a PACKED PAIR in VMEM then turns each
# refinement matvec into NO(NO+1)/2 fused multiply-accumulates instead of
# two K x NO basis-row passes — the 53%-of-budget item in the round-3
# roofline (docs/kernel.md).  Reference correspondence: this fuses
# make_c + make_A + solve of wlsqm/fitter/impl.pyx (47-846) like the rows
# path, just factored through moments.
# ---------------------------------------------------------------------------


def _moment_lattice(dimension: int, maxdeg: int):
    """Degree-graded lattice of multi-indices with chain parents.

    Returns (exps, parents, index) where exps is an (NM, dimension)
    int array ordered by (degree, lex) — so every entry's parent
    (itself minus one unit on its first nonzero axis) appears earlier —
    parents[i] = (parent_index, axis) with parents[0] = (None, None),
    and index maps exponent tuples to positions.
    """
    import itertools

    exps = sorted(
        (e for e in itertools.product(range(maxdeg + 1), repeat=dimension)
         if sum(e) <= maxdeg),
        key=lambda e: (sum(e), e))
    index = {e: i for i, e in enumerate(exps)}
    parents = [(None, None)]
    for e in exps[1:]:
        ax = next(a for a in range(dimension) if e[a] > 0)
        p = list(e)
        p[ax] -= 1
        parents.append((index[tuple(p)], ax))
    return np.asarray(exps, np.int64), parents, index


def _dof_chain(dimension: int, order: int):
    """Chain parents over the DOF exponent rows (reference DOF order).

    The DOF layout is degree-graded (defs.pyx:79-87), so each row's
    parent monomial appears at a smaller index.
    """
    NO = defs.number_of_dofs(dimension, order)
    exp = tables.EXPONENTS[dimension][:NO]
    index = {tuple(int(v) for v in row): j for j, row in enumerate(exp)}
    chain = []
    for j, row in enumerate(exp):
        e = tuple(int(v) for v in row)
        if sum(e) == 0:
            chain.append((None, None))
            continue
        ax = next(a for a in range(dimension) if e[a] > 0)
        p = list(e)
        p[ax] -= 1
        pj = index[tuple(p)]
        assert pj < j, "DOF layout must be degree-graded"
        chain.append((pj, ax))
    return exp, chain


def _moment_vmem_bytes(dimension: int, order: int, K: int,
                       nplanes: int = 2, tile_s: int = TILE_S) -> int:
    NO = defs.number_of_dofs(dimension, order)
    NM = len(_moment_lattice(dimension, 2 * order)[0])
    NTRI = NO * (NO + 1) // 2
    tile_bytes = tile_s * TILE_L * 4
    scratch = nplanes * (NM + max(NTRI, NM) + NO) * tile_bytes
    if _moment_staged(dimension, order):
        scratch += NTRI * tile_bytes          # in-place packed factor
    inputs = (nplanes * K * dimension + nplanes * K + K + 1
              + nplanes * NO + nplanes) * tile_bytes
    outputs = nplanes * NO * tile_bytes
    return scratch + inputs + outputs


#: largest moment-lattice size assembly="auto" will pick the moment body
#: for — since round 5 this covers every 1D/2D/3D order-<=4 config
#: (NM <= 165).  The big-triangle configs run the VMEM-staged kernel
#: form (:func:`_moment_staged`), which brought the 3D order-4 Mosaic
#: compile from >9 min (round 4, all-SSA) to ~2 min and measures
#: 8.8 M fits/s vs the rows body's 7.1 (K = 48); 3D order 3 compiles
#: unstaged in ~1 min at 14.2 vs rows' 11.9 (benchmarks/r5_dim3_*.json).
#: CERTIFIED routing additionally requires :func:`moment_cert_ok`
#: (dim <= 2): the 3D moment envelopes measured unsound in the round-5
#: gate sweep.
MOMENT_AUTO_NM = 165


def moment_vmem_ok(dimension: int, order: int, K: int,
                   nplanes: int = 2, tile_s: int = TILE_S) -> bool:
    """Whether the moment-assembly variant's VMEM state fits (~12 MB).

    Routing callers (the ladder, ExpertSolver) should also respect
    :data:`MOMENT_AUTO_NM`; :func:`moment_auto_ok` combines both.
    """
    return _moment_vmem_bytes(dimension, order, K, nplanes,
                              tile_s) < 12 * 1024 * 1024


def moment_auto_ok(dimension: int, order: int, K: int,
                   nplanes: int = 2, tile_s: int = TILE_S) -> bool:
    """Whether auto routing may pick the moment body for this config."""
    return (moment_vmem_ok(dimension, order, K, nplanes, tile_s)
            and len(_moment_lattice(dimension, 2 * order)[0])
            <= MOMENT_AUTO_NM)


def moment_cert_ok(dimension: int, order: int, K: int,
                   nplanes: int = 2, tile_s: int = TILE_S) -> bool:
    """Whether the LADDER may certify the moment body for this config.

    Stricter than :func:`moment_auto_ok` (which gates the uncertified /
    forced kernel): the moment-assembly error-envelope units are
    calibrated on the 1D/2D sweep family, and the round-5 3D order-4
    gate-soundness sweep (benchmarks/run_gate_check.py --3d) measured
    the 2D-calibrated moments-ds gate UNSOUND there (8 violations,
    worst 2.24x tol, vs rows-ts 0 violations) — the deg-8 three-axis
    moment chains cancel harder than any 2D configuration.  Certified
    3D routing therefore stays on the rows/ts rungs; the moment body
    still serves 3D through explicit ``assembly=`` or forced-kernel
    calls at its measured (uncertified) parity.
    """
    return dimension <= 2 and moment_auto_ok(dimension, order, K,
                                             nplanes, tile_s)


def _moment_staged(dimension: int, order: int) -> bool:
    """Whether the moment kernel stages its big intermediate sets in VMEM.

    At 3D order 4 the fully-SSA kernel holds ~1,600 live (8, 128) f32
    tiles (the Cholesky factor, the scaled matrix, and the per-neighbor
    chain values), and Mosaic's register allocator dominated the round-4
    >9 min compile.  Staging them in VMEM scratch with STATIC indices
    keeps the statement count but collapses the live ranges.  Gated to
    the big-triangle configs so the measured-fast 2D/1D kernels keep
    their tuned all-SSA form.
    """
    NO = defs.number_of_dofs(dimension, order)
    return NO * (NO + 1) // 2 > 256


def _cond_estimate(Asc, L, NO, zero):
    """Per-case conditioning estimate of the Jacobi-scaled system.

    ``||A||_inf * ||A^{-1}||_F  >=  ||A||_2 * ||A^{-1}||_2  =  cond_2(A)``
    (symmetric A: ``||A||_2 <= ||A||_inf``; ``||.||_2 <= ||.||_F``),
    computed from the f32 Cholesky factor already in registers — one
    unrolled forward+backward substitution per unit column, ~NO^3/3
    vector ops that slot into the Cholesky/refinement dependency
    bubbles.  Measured slack vs exact cond_2 on the calibration family:
    1.15-2.4x — the tightest of the factor-reusing bounds (the
    ``||A||_F * ||L^{-1}||_F^2`` variant spreads 1.4-6.8x, which costs
    certified-fraction in the split route).  The f32 noise and the
    bound's slack are absorbed by calibrating the split-route error
    envelopes directly against THIS estimate
    (fitter/calibration.py ``est_*`` fields), never against exact cond_2.
    """
    # ||A||_inf: max absolute row sum over the full symmetric matrix
    rows = [zero] * NO
    for j in range(NO):
        for m in range(j, NO):
            v = jnp.abs(Asc[j][m])
            rows[j] = rows[j] + v
            if m != j:
                rows[m] = rows[m] + v
    ninf = rows[0]
    for j in range(1, NO):
        ninf = jnp.maximum(ninf, rows[j])
    return ninf * jnp.sqrt(_cond_inv_f2(lambda i, kk: L[i][kk], NO, zero))


def _cond_inv_f2(Lrd, NO, zero):
    """``||A^{-1}||_F^2 = sum_i ||A^{-1} e_i||^2`` via L L^T solves.

    ``Lrd(i, kk)`` reads the Cholesky factor (SSA list or VMEM scratch);
    symmetry halves the work: column i contributes rows >= i twice.
    """
    nFi2 = zero
    one = jnp.ones_like(zero)
    for i in range(NO):
        y = [None] * NO
        for r in range(i, NO):
            t = one if r == i else zero
            for kk in range(i, r):
                t = t - Lrd(r, kk) * y[kk]
            y[r] = t / Lrd(r, r)
        x = [None] * NO
        for r in range(NO - 1, i - 1, -1):
            t = y[r]
            for kk in range(r + 1, NO):
                t = t - Lrd(kk, r) * x[kk]
            x[r] = t / Lrd(r, r)
            x2 = x[r] * x[r]
            nFi2 = nFi2 + (x2 if r == i else x2 + x2)
    return nFi2


def _make_kernel_moment(dimension: int, order: int, K: int, weighting: int,
                        refine_steps: int, knowns: int, precision: str,
                        tile_s: int = TILE_S, emit_cond: bool = False,
                        max_iter: int = 0):
    """Moment-assembly kernel: basic + ALGO_ITERATIVE (no sensitivities).

    ``max_iter > 0`` runs the reference's corrective refits
    (wlsqm/fitter/impl.pyx:986-1083) on the moment store: the corrective
    solve is EXACTLY one packed-pair refinement step (the
    normal-equations residual ``b - A x`` equals the data-space
    projection ``sum_k w r_k c_k`` algebraically), so each iteration
    costs one NTRI-MAC sweep plus the per-neighbor data-residual pass
    that drives the exact l-inf stagnation rule — the rows body pays a
    full K x NO RHS re-projection on top.

    ``emit_cond`` appends a per-case f32 output estimating the scaled
    system's conditioning, ``cond_F >= cond_2(A_jacobi)`` via
    ``||A||_F * ||L^-1||_F^2`` from the f32 Cholesky factor the kernel
    already holds — the per-case certification key of the split route
    (fitter/condprobe.py SPLIT_* units; computed for EVERY case, closing
    the sampled probe's coverage hole).

    ``precision="dsts"`` keeps the 2-plane (double-single) store and
    assembly but promotes the refinement sweeps to triple-single
    arithmetic, converging to the stored system's pair-representation
    floor instead of the pair-sweep rounding floor — measured ~4-6x
    deeper error envelope at ~one extra ds sweep's cost.
    """
    ns, NPL, _ = _NS[precision]
    sweep_ts = precision == "dsts"
    NPX = 3 if sweep_ts else NPL     # solution-state planes in the sweep
    NO = defs.number_of_dofs(dimension, order)
    deg = tables.DEGREE[dimension][:NO]
    exp, dof_chain = _dof_chain(dimension, order)
    m_exps, m_parents, m_index = _moment_lattice(dimension, 2 * order)
    NM = len(m_exps)
    KN = [j for j in range(NO) if (knowns >> j) & 1]
    kn_slot = {j: i for i, j in enumerate(KN)}
    UN = [j for j in range(NO) if j not in kn_slot]
    # packed upper triangle over UNKNOWN DOF pairs (known rows are
    # identity rows handled at trace time, as in the rows kernel)
    tri = {}
    for a, j in enumerate(UN):
        for m in UN[a:]:
            tri[(j, m)] = len(tri)
    stage = _moment_staged(dimension, order)

    def m_slot(j, m):
        """Moment index for A[j, m]."""
        return m_index[tuple(int(v) for v in (exp[j] + exp[m]))]

    def take(rest, n):
        return rest[:n], rest[n:]

    def kernel(*refs):
        rest = list(refs)
        d_refs, rest = take(rest, NPL)        # delta planes
        fk_refs, rest = take(rest, NPL)       # data planes
        (kmask_ref, invs_ref), rest = take(rest, 2)
        maxd2 = None
        if weighting == defs.WEIGHT_CENTER:
            md_refs, rest = take(rest, NPL)
            maxd2 = tuple(r[...] for r in md_refs)
        gi_refs = None
        if KN:
            gi_refs, rest = take(rest, NPL)
        x_refs, rest = take(rest, NPL)        # DOF outputs
        itr_ref = None
        if max_iter:
            (itr_ref,), rest = take(rest, 1)
        cond_ref = None
        if emit_cond:
            (cond_ref,), rest = take(rest, 1)
        M_refs, rest = take(rest, NPL)        # moment planes (scratch)
        A_refs, rest = take(rest, NPL)        # packed scaled pair A
        b_refs, rest = take(rest, NPL)        # RHS planes
        L_ref = None
        if stage:                             # in-place packed factor
            (L_ref,), rest = take(rest, 1)
        zero = jnp.zeros((tile_s, TILE_L), jnp.float32)

        def zpad(planes):
            return tuple(planes) + (zero,) * (NPL - len(planes))

        def at(refs_, *idx):
            return tuple(r[idx] for r in refs_)

        inv_s = invs_ref[...]

        for r in M_refs:
            r[...] = jnp.zeros_like(r)
        for r in b_refs:
            r[...] = jnp.zeros_like(r)

        if weighting == defs.WEIGHT_CENTER:
            beta_planes = _const_planes(1.0 - 1e-4, NPL)
            alpha_planes = _const_planes(1e-4, NPL)
            # per-case 1/sqrt(maxd2_scaled), hoisted out of the neighbor
            # loop: turns each neighbor's div+sqrt pair into sqrt+mul
            s2 = inv_s * inv_s
            ms = tuple(p * s2 for p in maxd2)
            ms = (jnp.where(ms[0] > 0, ms[0], 1.0),) + ms[1:]
            if NPL == 2:
                r0 = lax.rsqrt(ms[0])
                irms = (r0, jnp.zeros_like(r0))
                for _ in range(2):      # Newton in pair arithmetic
                    t = ns.mul(ns.mul(ms, irms), irms)
                    e = ns.add_f32(ns.neg(t), jnp.float32(1.0))
                    irms = tf.renorm((irms[0],
                                      irms[1] + irms[0] * (0.5 * e[0])))
            else:
                one_p = zpad((jnp.ones_like(zero),))
                irms = ns.div(one_p, ns.sqrt(ms))

        # chain multiply: presplit the per-axis offset planes (ds only)
        if NPL == 2:
            def chain_mul(v, dpair, dsplit):
                return tf.mul_presplit(v, dpair, dsplit)
        else:
            def chain_mul(v, dpair, dsplit):
                return ns.mul(v, dpair)

        def asm_body(k, _):
            dcols = [ns.mul_f32(at(d_refs, k, a), inv_s)
                     for a in range(dimension)]
            dsplits = [tf.split_hi(d[0]) if NPL == 2 else None
                       for d in dcols]
            # weights — same problem definition as the rows kernel/engine
            if weighting == defs.WEIGHT_CENTER:
                d2 = zpad(())
                for d in dcols:
                    d2 = ns.add(d2, ns.mul(d, d))
                u = ns.mul(ns.sqrt(d2), irms)
                tmp = ns.add_f32(ns.neg(u), jnp.float32(1.0))
                t2 = ns.mul(tmp, tmp)
                w = ns.add(
                    ns.mul(t2, tuple(jnp.full_like(zero, p)
                                     for p in beta_planes)),
                    tuple(jnp.full_like(zero, p) for p in alpha_planes))
            else:
                w = zpad((jnp.ones_like(zero),))
            m = kmask_ref[k]
            w = tuple(jnp.where(m > 0, p, 0.0) for p in w)

            # A-moment chain rooted at w: one extended multiply per moment.
            # Accumulation uses the FULL renormalized add: the relaxed
            # twofloat.acc lets |lo| grow to ~K ulp(hi), whose f32
            # rounding inflated the round-4 calibrated envelope ~30x
            # (3.9e-13 vs rows' 1.25e-14); with full renorm the round-5
            # re-sweep puts moments-ds within ~1.3x of rows and makes
            # ts-moments bit-identical to ts-rows (r5_probe.json).
            # Staged configs route the chain values through the (still
            # unused) packed-A scratch rows instead of ~NM*NPL live SSA
            # tiles — NM <= the A scratch's row count by construction
            # (fit_pallas sizes it max(NTRI, NM) when staged).
            vals = [None] * NM
            for i in range(NM):
                if i == 0:
                    vi = w
                else:
                    pj, ax = m_parents[i]
                    vp = at(A_refs, pj) if stage else vals[pj]
                    vi = chain_mul(vp, dcols[ax], dsplits[ax])
                if stage:
                    for p in range(NPL):
                        A_refs[p][i] = vi[p]
                else:
                    vals[i] = vi
                a = ns.add(at(M_refs, i), vi)
                for p in range(NPL):
                    M_refs[p][i] = a[p]
            # RHS chain rooted at w*f over the DOF exponents
            wf = ns.mul(w, at(fk_refs, k))
            bvals = [None] * NO
            for j in range(NO):
                pj, ax = dof_chain[j]
                bvals[j] = wf if pj is None else chain_mul(
                    bvals[pj], dcols[ax], dsplits[ax])
                bj = ns.add(at(b_refs, j), bvals[j])
                for p in range(NPL):
                    b_refs[p][j] = bj[p]
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(K), asm_body, jnp.int32(0))

        if stage:
            def Mv(i):
                return at(M_refs, i)
        else:
            _M = [at(M_refs, i) for i in range(NM)]

            def Mv(i):
                return _M[i]
        bs = [at(b_refs, j) for j in range(NO)]

        # knowns: algebraic elimination THROUGH the moments — the
        # per-neighbor sum_k w (g_j c_j) c_m is exactly g_j M[e_j + e_m]
        if KN:
            for mcol in UN:
                bm = bs[mcol]
                for j in KN:
                    g = at(gi_refs, kn_slot[j])
                    bm = ns.sub(bm, ns.mul(g, Mv(m_slot(j, mcol))))
                bs[mcol] = bm

        # Jacobi scale from the moment diagonal; known DOFs s = 1
        s = [None] * NO
        for j in range(NO):
            if j in kn_slot:
                s[j] = jnp.ones_like(zero)
                continue
            djj = Mv(m_slot(j, j))[0]
            s[j] = jnp.where(djj > 0,
                             lax.rsqrt(jnp.where(djj > 0, djj, 1.0)), 1.0)

        # UNSCALED pair A into the packed VMEM store (plain copies of the
        # moment planes); the Jacobi factors are applied inside the sweep
        # as exact pair x f32 products.  Scaling the STORED entries by a
        # pre-rounded f32 s_j*s_m would perturb A entry-wise by ~6e-8 and
        # pin the converged solution at the f32 floor (measured: 9e-6 vs
        # 5e-12 on a cond 2e2 case); scaling them with two extended
        # multiplies works but costs 120 x 2 pair ops of trace-time math
        # the sweep formulation gets for free.  The f32 Cholesky PRE-
        # CONDITIONER uses the f32-rounded scaled entries (harmless).
        one = jnp.ones((tile_s, TILE_L), jnp.float32)
        if stage:
            # ---- staged factorization: seed the Jacobi-scaled matrix
            #      into a packed VMEM scratch and Cholesky-factor it IN
            #      PLACE with static indices.  The all-SSA form below
            #      holds ~NO^2 live (8, 128) tiles (Asc + L = 2 x 630 at
            #      NO = 35), which dominated the round-4 >9 min Mosaic
            #      compile via register allocation; here every value's
            #      live range is one statement pair.
            def lt(i, j):                       # packed lower, j <= i
                return i * (i + 1) // 2 + j

            for (j, mcol), t in tri.items():
                mv = Mv(m_slot(j, mcol))
                for p in range(NPL):
                    A_refs[p][t] = mv[p]
                L_ref[lt(mcol, j)] = mv[0] * (s[j] * s[mcol])
            for i in range(NO):
                for j in range(i + 1):
                    if i in kn_slot or j in kn_slot:
                        L_ref[lt(i, j)] = one if i == j else zero
            ninf = None
            if emit_cond:
                # ||A||_inf of the scaled matrix, from the seeds before
                # the in-place factorization consumes them
                rows_acc = [zero] * NO
                for (j, mcol), t in tri.items():
                    v = jnp.abs(L_ref[lt(mcol, j)])
                    rows_acc[j] = rows_acc[j] + v
                    if mcol != j:
                        rows_acc[mcol] = rows_acc[mcol] + v
                for j in KN:
                    rows_acc[j] = rows_acc[j] + one
                ninf = rows_acc[0]
                for j in range(1, NO):
                    ninf = jnp.maximum(ninf, rows_acc[j])
            # left-looking packed Cholesky; the pivot row L[j, :j] is
            # cached in SSA (it is reused NO - j times per column)
            for j in range(NO):
                lj = [L_ref[lt(j, kk)] for kk in range(j)]
                acc_ = L_ref[lt(j, j)]
                for kk in range(j):
                    acc_ = acc_ - lj[kk] * lj[kk]
                dj = jnp.sqrt(jnp.maximum(acc_, 1e-30))
                L_ref[lt(j, j)] = dj
                invd = 1.0 / dj
                for i in range(j + 1, NO):
                    t = L_ref[lt(i, j)]
                    for kk in range(j):
                        t = t - L_ref[lt(i, kk)] * lj[kk]
                    L_ref[lt(i, j)] = t * invd

            def Lrd(i, kk):
                return L_ref[lt(i, kk)]

            if emit_cond:
                cond_ref[...] = ninf * jnp.sqrt(_cond_inv_f2(Lrd, NO,
                                                             zero))
        else:
            Asc = [[None] * NO for _ in range(NO)]
            for (j, mcol), t in tri.items():
                mv = Mv(m_slot(j, mcol))
                for p in range(NPL):
                    A_refs[p][t] = mv[p]
                Asc[j][mcol] = mv[0] * (s[j] * s[mcol])
            for j in KN:
                for mcol in range(j, NO):
                    Asc[j][mcol] = one if mcol == j else zero
                for i in range(j):
                    Asc[i][j] = zero

            L = [[None] * (i + 1) for i in range(NO)]
            for j in range(NO):
                acc_ = Asc[j][j]
                for kk in range(j):
                    acc_ = acc_ - L[j][kk] * L[j][kk]
                dj = jnp.sqrt(jnp.maximum(acc_, 1e-30))
                L[j][j] = dj
                invd = 1.0 / dj
                for i in range(j + 1, NO):
                    t = Asc[j][i]
                    for kk in range(j):
                        t = t - L[i][kk] * L[j][kk]
                    L[i][j] = t * invd

            if emit_cond:
                cond_ref[...] = _cond_estimate(Asc, L, NO, zero)

            def Lrd(i, kk):
                return L[i][kk]

        def chol_solve(rhs):
            y = [None] * NO
            for i in range(NO):
                t = rhs[i]
                for kk in range(i):
                    t = t - Lrd(i, kk) * y[kk]
                y[i] = t / Lrd(i, i)
            x = [None] * NO
            for i in range(NO - 1, -1, -1):
                t = y[i]
                for kk in range(i + 1, NO):
                    t = t - Lrd(kk, i) * x[kk]
                x[i] = t / Lrd(i, i)
            return x

        # initial solve in the scaled space (hoisted; A @ 0 == 0)
        y0 = chol_solve([zero if j in kn_slot else bs[j][0] * s[j]
                         for j in range(NO)])

        # refinement: r_hat_j = s_j (b_j - sum_m A_jm s_m y_m) via the
        # PACKED PAIR matrix — NO(NO+1)/2 fused multiply-accumulates per
        # sweep instead of the rows path's two K x NO basis passes.  The
        # diagonal scalings ride as exact pair x f32 products on the
        # vectors, never on the stored matrix.
        sw = tf3 if sweep_ts else ns     # sweep arithmetic

        def pro(v):
            """Promote a stored value to the sweep's plane count."""
            return tuple(v) + (zero,) * (NPX - len(v))

        def zpadx():
            return (zero,) * NPX

        def refine(_, ys):
            ys_p = [tuple(ys[p][j] for p in range(NPX)) for j in range(NO)]
            sx = [zpadx() if j in kn_slot else sw.mul_f32(ys_p[j], s[j])
                  for j in range(NO)]
            # full renormalized adds: the relaxed mul_add's lo growth sets
            # the converged fixed point ~1e-13*cond (see the assembly note)
            acc_ = {j: zpadx() for j in UN}
            for (j, mcol), t in tri.items():
                a = pro(tuple(A_refs[p][t] for p in range(NPL)))
                acc_[j] = sw.add(acc_[j], sw.mul(a, sx[mcol]))
                if mcol != j:
                    acc_[mcol] = sw.add(acc_[mcol], sw.mul(a, sx[j]))
            out = []
            rh = []
            for j in range(NO):
                if j in kn_slot:
                    rh.append(zero)
                    continue
                rh.append(sw.sub(pro(bs[j]), acc_[j])[0] * s[j])
            dy = chol_solve(rh)
            for j in range(NO):
                if j in kn_slot:
                    out.append(ys_p[j])
                else:
                    out.append(sw.add_f32(ys_p[j], dy[j]))
            return tuple([o[p] for o in out] for p in range(NPX))

        ys = ((y0,) + tuple([zero] * NO for _ in range(NPX - 1)))
        ys = lax.fori_loop(jnp.int32(0), jnp.int32(refine_steps),
                           refine, ys)

        if max_iter:
            # ---- ALGO_ITERATIVE: masked fixed-trip corrective refits
            #      with the reference's exact l-inf stagnation rule
            #      (wlsqm/fitter/impl.pyx:1057-1061).  The data-residual
            #      pass recomputes the DOF-monomial chain per neighbor
            #      (nothing is stored); the corrective refit itself IS
            #      one packed-A refinement step, done-masked.  Same
            #      carry discipline as the rows body: f32 tiles only,
            #      extended (hi, lo) norm.
            one_pair = zpad((jnp.ones_like(zero),))

            def iter_body(_, st):
                ys_pl, done = st[:-4], st[-4]
                prev0, prev1, itn = st[-3], st[-2], st[-1]
                ysl = [tuple(ys_pl[p][j] for p in range(NPX))
                       for j in range(NO)]
                xh = [pro(at(gi_refs, kn_slot[j])) if j in kn_slot
                      else sw.mul_f32(ysl[j], s[j]) for j in range(NO)]

                def k_norm(k, acc):
                    dck = [ns.mul_f32(at(d_refs, k, a), inv_s)
                           for a in range(dimension)]
                    dsk = [tf.split_hi(d[0]) if NPL == 2 else None
                           for d in dck]
                    cv = [None] * NO
                    m = zpadx()
                    for j in range(NO):
                        pj, ax = dof_chain[j]
                        cv[j] = (one_pair if pj is None
                                 else chain_mul(cv[pj], dck[ax], dsk[ax]))
                        m = sw.add(m, sw.mul(pro(cv[j]), xh[j]))
                    r = sw.sub(pro(at(fk_refs, k)), m)
                    valid = kmask_ref[k] > 0
                    r = tuple(jnp.where(valid, p, 0.0) for p in r)
                    sg = jnp.where(r[0] != 0.0, jnp.sign(r[0]),
                                   jnp.sign(r[1]))
                    a0 = r[0] * sg
                    a1 = r[1] * sg
                    c0, c1 = acc
                    take_ = (a0 > c0) | ((a0 == c0) & (a1 > c1))
                    return (jnp.where(take_, a0, c0),
                            jnp.where(take_, a1, c1))

                nrm0, nrm1 = lax.fori_loop(jnp.int32(0), jnp.int32(K),
                                           k_norm, (zero, zero))
                done_now = jnp.maximum(
                    done,
                    ((nrm0 == prev0) & (nrm1 == prev1)).astype(jnp.float32))
                upd = done_now == 0.0
                ys_new = refine(0, ys_pl)
                out = [[] for _ in range(NPX)]
                for j in range(NO):
                    for p in range(NPX):
                        out[p].append(jnp.where(upd, ys_new[p][j],
                                                ys_pl[p][j]))
                itn = itn + upd.astype(jnp.float32)
                return tuple(tuple(o) for o in out) + (done_now, nrm0,
                                                       nrm1, itn)

            st0 = tuple(tuple(ys[p][j] for j in range(NO))
                        for p in range(NPX)) + (
                zero, jnp.full((tile_s, TILE_L), -1.0, jnp.float32), zero,
                zero)
            stN = lax.fori_loop(jnp.int32(0), jnp.int32(max_iter),
                                iter_body, st0)
            ys = tuple(list(stN[p]) for p in range(NPX))
            itr_ref[...] = stN[-1]

        # back to the (radius-scaled) DOF space: x_j = s_j y_j
        for j in range(NO):
            if j in kn_slot:
                v = at(gi_refs, kn_slot[j])
            else:
                v = sw.mul_f32(tuple(ys[p][j] for p in range(NPX)), s[j])
                if NPX > NPL:
                    # collapse the sweep triple to the stored pair: the
                    # dropped bits sit below the pair-representation floor
                    v = tf.renorm((v[0], v[1] + v[2]))
            for p in range(NPL):
                x_refs[p][j] = v[p]

    return kernel, NO, deg, NM, len(tri)


def _make_kernel(dimension: int, order: int, K: int, weighting: int,
                 refine_steps: int, store_basis: bool, do_sens: bool,
                 max_iter: int, knowns: int, precision: str,
                 tile_s: int = TILE_S, emit_cond: bool = False):
    ns, NPL, _ = _NS[precision]
    NO = defs.number_of_dofs(dimension, order)
    exp = tables.EXPONENTS[dimension][:NO]
    deg = tables.DEGREE[dimension][:NO]
    # static knowns bitmask: the reduced system is just index bookkeeping
    # at trace time (reference eliminates algebraically and remaps indices,
    # wlsqm/fitter/impl.pyx:789-818; here known DOFs get identity rows and
    # their prescribed values enter the RHS)
    KN = [j for j in range(NO) if (knowns >> j) & 1]
    kn_slot = {j: i for i, j in enumerate(KN)}

    def take(rest, n):
        return rest[:n], rest[n:]

    def kernel(*refs):
        rest = list(refs)
        d_refs, rest = take(rest, NPL)        # delta planes
        fk_refs, rest = take(rest, NPL)       # data planes
        (kmask_ref, invs_ref), rest = take(rest, 2)
        maxd2 = None
        if weighting == defs.WEIGHT_CENTER:
            # the max squared radius arrives precomputed in exact f64 from
            # the host-side XLA preprocessing (it is a byproduct of the
            # radius-prescale computation there), saving a full K-loop
            # reduction pass in the kernel and matching the f64 engine's
            # weight normalization to the representation floor
            md_refs, rest = take(rest, NPL)
            maxd2 = tuple(r[...] for r in md_refs)
        gi_refs = None
        if KN:
            gi_refs, rest = take(rest, NPL)
        x_refs, rest = take(rest, NPL)        # DOF outputs
        itr_ref = None
        if max_iter:
            (itr_ref,), rest = take(rest, 1)
        if do_sens:
            s_refs, rest = take(rest, NPL)
        cond_ref = None
        if emit_cond:
            (cond_ref,), rest = take(rest, 1)
        (A_ref,), rest = take(rest, 1)
        b_refs, rest = take(rest, NPL)
        w_refs, rest = take(rest, NPL)
        c_refs = None
        if store_basis:
            c_refs, rest = take(rest, NPL)
        zero = jnp.zeros((tile_s, TILE_L), jnp.float32)

        def zpad(planes):
            """Pad a value to the full plane count with zero tiles."""
            return tuple(planes) + (zero,) * (NPL - len(planes))

        def at(refs_, *idx):
            """Gather one multi-plane value from a list of plane refs."""
            return tuple(r[idx] for r in refs_)

        inv_s = invs_ref[...]   # exact power of two, computed host-side so
                                # the f64 de-scaling outside matches exactly

        # ---- assemble A (f32), b (extended) over neighbors ----
        A_ref[...] = jnp.zeros_like(A_ref)
        for r in b_refs:
            r[...] = jnp.zeros_like(r)

        def basis_at(k):
            """Radius-scaled plain-monomial basis row for neighbor k."""
            dcols = []
            for a in range(dimension):
                d = ns.mul_f32(at(d_refs, k, a), inv_s)
                dcols.append(d)
            return dcols, _basis_cols(ns, dcols, exp)

        if weighting == defs.WEIGHT_CENTER:
            beta_planes = _const_planes(1.0 - 1e-4, NPL)
            alpha_planes = _const_planes(1e-4, NPL)

        def asm_body(k, _):
            dcols, c = basis_at(k)
            # weights (extended precision for parity of the problem
            # definition with the f64 engine)
            if weighting == defs.WEIGHT_CENTER:
                d2 = zpad(())
                for d in dcols:
                    d2 = ns.add(d2, ns.mul(d, d))
                # d2 is already radius-scaled; max scales by inv_s^2
                s2 = inv_s * inv_s
                ms = tuple(p * s2 for p in maxd2)
                ms = (jnp.where(ms[0] > 0, ms[0], 1.0),) + ms[1:]
                ratio = ns.div(d2, ms)
                tmp = ns.add_f32(ns.neg(ns.sqrt(ratio)), jnp.float32(1.0))
                t2 = ns.mul(tmp, tmp)
                w = ns.add(
                    ns.mul(t2, tuple(jnp.full_like(zero, p)
                                     for p in beta_planes)),
                    tuple(jnp.full_like(zero, p) for p in alpha_planes))
            else:
                w = zpad((jnp.ones_like(zero),))
            m = kmask_ref[k]
            w = tuple(jnp.where(m > 0, p, 0.0) for p in w)
            fkeff = at(fk_refs, k)
            for j in KN:   # algebraic knowns elimination: move to the RHS
                g = at(gi_refs, kn_slot[j])
                fkeff = ns.sub(fkeff, ns.mul(g, c[j]))
            wf = ns.mul(w, fkeff)
            # store c and w planes for the refinement matvecs (when VMEM
            # allows); otherwise the matvec recomputes the basis row
            if store_basis:
                for j in range(NO):
                    for p in range(NPL):
                        c_refs[p][k, j] = c[j][p]
            for p in range(NPL):
                w_refs[p][k] = w[p]
            # A += w * c cT (f32); b += w * fk * c (extended)
            for j in range(NO):
                wc_hi = w[0] * c[j][0]
                for mcol in range(j, NO):
                    A_ref[j, mcol] += wc_hi * c[mcol][0]
                bj = ns.add(at(b_refs, j), ns.mul(wf, c[j]))
                for p in range(NPL):
                    b_refs[p][j] = bj[p]
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(K), asm_body, jnp.int32(0))

        # known DOFs: identity rows/cols in A, zero RHS (their values are
        # prescribed; the solve only determines the unknowns)
        one = jnp.ones((tile_s, TILE_L), jnp.float32)
        for j in KN:
            for mcol in range(j, NO):
                A_ref[j, mcol] = one if mcol == j else zero
            for i in range(j):
                A_ref[i, j] = zero
            for p in range(NPL):
                b_refs[p][j] = zero

        # ---- Jacobi scale + Cholesky (f32, unrolled) ----
        s = [None] * NO
        for j in range(NO):
            djj = A_ref[j, j]
            s[j] = jnp.where(djj > 0, lax.rsqrt(jnp.where(djj > 0, djj, 1.0)),
                             1.0)
        Asc = [[None] * NO for _ in range(NO)]
        for j in range(NO):
            for mcol in range(j, NO):
                Asc[j][mcol] = A_ref[j, mcol] * (s[j] * s[mcol])

        # the factor stays in traced values (Mosaic registers / spills);
        # a dedicated VMEM buffer would double the NO² footprint for nothing
        L = [[None] * (i + 1) for i in range(NO)]
        for j in range(NO):
            acc = Asc[j][j]
            for kk in range(j):
                acc = acc - L[j][kk] * L[j][kk]
            dj = jnp.sqrt(jnp.maximum(acc, 1e-30))
            L[j][j] = dj
            invd = 1.0 / dj
            for i in range(j + 1, NO):
                t = Asc[j][i]   # upper triangle holds A[j, i] for i > j
                for kk in range(j):
                    t = t - L[i][kk] * L[j][kk]
                L[i][j] = t * invd

        if emit_cond:
            cond_ref[...] = _cond_estimate(Asc, L, NO, zero)

        def chol_solve(rhs):
            """Unrolled f32 solve of (scaled A) x = rhs; rhs list of tiles."""
            y = [None] * NO
            for i in range(NO):
                t = rhs[i]
                for kk in range(i):
                    t = t - L[i][kk] * y[kk]
                y[i] = t / L[i][i]
            x = [None] * NO
            for i in range(NO - 1, -1, -1):
                t = y[i]
                for kk in range(i + 1, NO):
                    t = t - L[kk][i] * x[kk]
                x[i] = t / L[i][i]
            return x

        # ---- direct solve + extended refinement.  The initial solve is
        #      hoisted out of the loop: with x = 0 the loop's matvec pass
        #      would compute A @ 0 — a full K×NO sweep of exact zeros — so
        #      hoisting saves one matvec (bit-identical result, ~15% of the
        #      kernel's flops at refine_steps=4).  The RHS uses the same
        #      extended product as the in-loop sweeps (mul_f32 folds the
        #      low words into the rounding) to keep the bit-identity exact.
        bs = [at(b_refs, j) for j in range(NO)]
        x0 = chol_solve([zero if j in kn_slot
                         else ns.mul_f32(bs[j], s[j])[0]
                         for j in range(NO)])

        # refinement: r = D b - (D A D) x via the stored basis planes ----
        def refine(_, xs):
            xs = [tuple(xs[p][j] for p in range(NPL)) for j in range(NO)]
            # t_k = sum_j c_kj * (s_j x_j)  -> model residual contraction
            sx = [ns.mul_f32(xs[j], s[j]) for j in range(NO)]

            def matvec_body(k, acc):
                if store_basis:
                    c = [at(c_refs, k, j) for j in range(NO)]
                else:
                    _, c = basis_at(k)
                t = zpad(())
                for j in range(NO):
                    t = ns.add(t, ns.mul(c[j], sx[j]))
                t = ns.mul(t, at(w_refs, k))
                new = []
                for j in range(NO):
                    aj = ns.add(tuple(acc[p][j] for p in range(NPL)),
                                ns.mul(c[j], t))
                    new.append(aj)
                return tuple([a[p] for a in new] for p in range(NPL))

            init = tuple([zero] * NO for _ in range(NPL))
            ax = lax.fori_loop(jnp.int32(0), jnp.int32(K), matvec_body, init)
            r = []
            for j in range(NO):
                if j in kn_slot:
                    r.append(zpad(()))  # identity row: no correction
                    continue
                axj = ns.mul_f32(tuple(ax[p][j] for p in range(NPL)), s[j])
                bj = ns.mul_f32(bs[j], s[j])
                r.append(ns.sub(bj, axj))
            dx = chol_solve([rj[0] for rj in r])
            out = [ns.add_f32(xs[j], dx[j]) for j in range(NO)]
            return tuple([o[p] for o in out] for p in range(NPL))

        xs = (x0,) + tuple([zero] * NO for _ in range(NPL - 1))
        xs = lax.fori_loop(jnp.int32(0), jnp.int32(refine_steps),
                           refine, xs)

        # fi in the radius-scaled space: x_hat_j = s_j * y_j; known DOFs
        # carry their prescribed (radius-scaled) values through
        xhat = [at(gi_refs, kn_slot[j]) if j in kn_slot
                else ns.mul_f32(tuple(xs[p][j] for p in range(NPL)), s[j])
                for j in range(NO)]

        if max_iter:
            # ---- ALGO_ITERATIVE: corrective refits with the reference's
            #      exact l-inf norm stagnation rule (reference:
            #      wlsqm/fitter/impl.pyx:986-1083).  Fixed-trip masked loop;
            #      stagnated cases keep their DOFs and stop counting.
            def crow_it(k):
                if store_basis:
                    return [at(c_refs, k, j) for j in range(NO)]
                return basis_at(k)[1]

            def iter_body(_, st):
                xh_pl, done = st[:-4], st[-4]
                prev0, prev1, itn = st[-3], st[-2], st[-1]
                xh = [tuple(xh_pl[p][j] for p in range(NPL))
                      for j in range(NO)]

                # carry NPL uniform lists of f32 tiles (the same carry
                # structure as the refinement matvec, which Mosaic's layout
                # inference handles); slot NO holds the running l-inf
                # residual norm as an EXTENDED (hi, lo) value: the
                # reference's exact-stagnation rule compares f64 norms
                # (wlsqm/fitter/impl.pyx:1057-1061), and an f32-only norm
                # collapses distinct residual levels early, stagnating the
                # count at ~1 where the engine reports 1-10 (round-3
                # iteration-parity table)
                def k_sweep(k, acc):
                    ck = crow_it(k)
                    m = zpad(())
                    for j in range(NO):
                        m = ns.add(m, ns.mul(ck[j], xh[j]))
                    r = ns.sub(at(fk_refs, k), m)
                    valid = kmask_ref[k] > 0
                    r = tuple(jnp.where(valid, p, 0.0) for p in r)
                    wr = ns.mul(r, at(w_refs, k))
                    np_ = [[] for _ in range(NPL)]
                    for j in range(NO):
                        bj = ns.add(tuple(acc[p][j] for p in range(NPL)),
                                    ns.mul(ck[j], wr))
                        for p in range(NPL):
                            np_[p].append(bj[p])
                    # |r| as a pair (sign of the renormalized leading plane
                    # is the sign of the value; lo follows it)
                    sg = jnp.where(r[0] != 0.0, jnp.sign(r[0]),
                                   jnp.sign(r[1] if NPL > 1 else r[0]))
                    a0 = r[0] * sg
                    a1 = (r[1] * sg) if NPL > 1 else zero
                    c0, c1 = acc[0][NO], acc[1][NO] if NPL > 1 else zero
                    take = (a0 > c0) | ((a0 == c0) & (a1 > c1))
                    np_[0].append(jnp.where(take, a0, c0))
                    if NPL > 1:
                        np_[1].append(jnp.where(take, a1, c1))
                    for p in range(2, NPL):
                        np_[p].append(acc[p][NO])
                    return tuple(np_)

                acc0 = tuple([zero] * (NO + 1) for _ in range(NPL))
                bpl = lax.fori_loop(jnp.int32(0), jnp.int32(K), k_sweep, acc0)
                nrm0 = bpl[0][NO]
                nrm1 = bpl[1][NO] if NPL > 1 else zero
                # done carried as a 0/1 f32 tile (Mosaic handles f32 loop
                # carries; vector-of-i1 carries can abort the compiler)
                # .astype keeps the select in f32 — a bare
                # where(pred, 1.0, 0.0) under jax_enable_x64 materializes an
                # f64 vector, which Mosaic's layout inference aborts on
                done_now = jnp.maximum(
                    done,
                    ((nrm0 == prev0) & (nrm1 == prev1)).astype(jnp.float32))
                # zero known-DOF rows of the corrective RHS: the identity
                # row of the masked factor would otherwise return
                # dy_j = bh_j != 0 and drift the prescribed coefficients
                # each iteration (reference updates unknowns only,
                # wlsqm/fitter/impl.pyx:1076-1078)
                dy = chol_solve([zero if j in kn_slot else bpl[0][j] * s[j]
                                 for j in range(NO)])
                upd = done_now == 0.0
                out = [[] for _ in range(NPL)]
                for j in range(NO):
                    if j in kn_slot:
                        for p in range(NPL):
                            out[p].append(xh[j][p])
                        continue
                    nx = ns.add_f32(xh[j], jnp.where(upd, dy[j] * s[j], 0.0))
                    for p in range(NPL):
                        out[p].append(jnp.where(upd, nx[p], xh[j][p]))
                itn = itn + upd.astype(jnp.float32)
                return tuple(out) + (done_now, nrm0, nrm1, itn)

            st0 = tuple([ph[p] for ph in xhat] for p in range(NPL)) + (
                zero,
                jnp.full((tile_s, TILE_L), -1.0, jnp.float32), zero, zero)
            stN = lax.fori_loop(jnp.int32(0), jnp.int32(max_iter),
                                iter_body, st0)
            opl, itn = stN[:-4], stN[-1]
            xhat = [tuple(opl[p][j] for p in range(NPL)) for j in range(NO)]
            itr_ref[...] = itn

        # ---- write out (radius de-scale happens outside, exact powers
        #      of two applied in f64) ----
        for j in range(NO):
            for p in range(NPL):
                x_refs[p][j] = xhat[j][p]

        if not do_sens:
            return

        # ---- sensitivities: one column of A^-1 C^T W per neighbor ----
        # (reference computes these by nk extra back-substitutions on the
        # factored matrix, wlsqm/fitter/impl.pyx:768-846; here each RHS gets
        # the same solve + residual refinement as the DOFs)
        def crow(k):
            if store_basis:
                return [at(c_refs, k, j) for j in range(NO)]
            return basis_at(k)[1]

        def sens_body(k, _):
            ck = crow(k)
            wk = at(w_refs, k)
            bk = [zpad(()) if j in kn_slot
                  else ns.mul_f32(ns.mul(wk, ck[j]), s[j])
                  for j in range(NO)]

            def srefine(_, ys):
                ys_p = [tuple(ys[p][j] for p in range(NPL))
                        for j in range(NO)]
                sy = [ns.mul_f32(ys_p[j], s[j]) for j in range(NO)]

                def mv(k2, acc):
                    c2 = crow(k2)
                    t = zpad(())
                    for j in range(NO):
                        t = ns.add(t, ns.mul(c2[j], sy[j]))
                    t = ns.mul(t, at(w_refs, k2))
                    new = [ns.add(tuple(acc[p][j] for p in range(NPL)),
                                  ns.mul(c2[j], t))
                           for j in range(NO)]
                    return tuple([a[p] for a in new] for p in range(NPL))

                acc0 = tuple([zero] * NO for _ in range(NPL))
                ax = lax.fori_loop(jnp.int32(0), jnp.int32(K), mv, acc0)
                r = []
                for j in range(NO):
                    if j in kn_slot:
                        r.append(zpad(()))
                        continue
                    axj = ns.mul_f32(tuple(ax[p][j] for p in range(NPL)),
                                     s[j])
                    r.append(ns.sub(bk[j], axj))
                dy = chol_solve([rj[0] for rj in r])
                out = [ns.add_f32(ys_p[j], dy[j]) for j in range(NO)]
                return tuple([o[p] for o in out] for p in range(NPL))

            # initial solve hoisted (x = 0 matvec is all zeros, see above)
            y0 = chol_solve([bk[j][0] for j in range(NO)])
            ys0 = (y0,) + tuple([zero] * NO for _ in range(NPL - 1))
            ys = lax.fori_loop(jnp.int32(0),
                               jnp.int32(SENS_SWEEPS[precision]),
                               srefine, ys0)
            for j in range(NO):
                v = ns.mul_f32(tuple(ys[p][j] for p in range(NPL)), s[j])
                for p in range(NPL):
                    s_refs[p][k, j] = v[p]
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(K), sens_body, jnp.int32(0))

    return kernel, NO, deg


@partial(jax.jit, static_argnames=("dimension", "order", "weighting",
                                   "refine_steps", "interpret", "do_sens",
                                   "max_iter", "knowns", "precision",
                                   "tile_s", "assembly", "emit_cond"))
def fit_pallas(xk, fk, nk, xi, fi_init=None, *, dimension: int, order: int,
               weighting: int, refine_steps: int | None = None,
               interpret: bool = False, do_sens: bool = False,
               max_iter: int = 0, knowns: int = 0, precision: str = "ds",
               tile_s: int | None = None, assembly: str = "auto",
               emit_cond: bool = False):
    """Fused-kernel fit of a homogeneous batch (see module docstring).

    xk (B, K, dim) f64 | fk (B, K) f64 | nk (B,) | xi (B, dim) f64.
    B must be a multiple of TILE (pad with duplicate cases if needed).
    max_iter > 0 runs ALGO_ITERATIVE corrective refits (the reference's
    exact-stagnation rule) and appends per-case iteration counts.
    precision: "ds" (double-single pairs, default) or "ts" (triple-single
    — deeper error floor for probe-rejected middle-band batches).
    tile_s: sublanes per case tile (default :data:`TILE_S` = 8).  Larger
    values process ``tile_s/8`` independent (8, 128) hardware tiles per
    vector op — more instruction-level parallelism across the Cholesky
    and refinement dependency chains at ``tile_s``× the VMEM footprint.
    Per-case results are bit-identical for any value (the arithmetic
    never crosses lanes); B must divide by ``tile_s * 128``.
    assembly: "auto" (default — the moment path for basic fits when its
    VMEM state fits, basis rows otherwise), "moments", or "rows".
    Returns fi (B, NO) f64, with iters (B,) i32 appended when max_iter > 0,
    sens (B, K, NO) f64 appended when do_sens, and — when ``emit_cond``
    — a per-case (B,) f64 conditioning-estimate key ``est >= cond_2
    (A_jacobi) * amp`` appended last (see :func:`_cond_estimate`; the
    radius de-scale amplification ``amp`` is folded in here so the key
    feeds the split-route certification gates directly).
    """
    ns, NPL, default_steps = _NS[precision]
    if refine_steps is None:
        refine_steps = default_steps
    ts_ = TILE_S if tile_s is None else int(tile_s)
    tile = ts_ * TILE_L
    B, K, _ = xk.shape
    assert B % tile == 0, "pad the batch to a multiple of %d" % tile
    nblk = B // tile
    if assembly not in ("auto", "moments", "rows"):
        raise ValueError(f"assembly must be auto|moments|rows, got {assembly}")
    # auto: moment assembly for basic fits when its VMEM fits AND the
    # moment lattice stays small — the fully unrolled NM-moment chain
    # makes Mosaic compile time superlinear in NM (3D order-4, NM=165:
    # >9 min vs the rows body's ~23 s), so big-lattice configs keep the
    # rows body unless the caller opts in explicitly
    use_moments = assembly == "moments" or (
        assembly == "auto" and not do_sens
        and moment_vmem_ok(dimension, order, K, NPL, ts_)
        and len(_moment_lattice(dimension, 2 * order)[0]) <= MOMENT_AUTO_NM)
    if use_moments and do_sens:
        raise ValueError("assembly='moments' does not cover sensitivities "
                         "(they need per-(k, j) basis rows); use "
                         "assembly='rows'")
    if precision == "dsts" and not use_moments:
        raise ValueError("precision='dsts' (pair store + triple-single "
                         "sweeps) is a moment-assembly variant; pass "
                         "assembly='moments' or a moment-eligible config")
    if precision == "dsts" and max_iter:
        raise ValueError("precision='dsts' covers the basic algorithm "
                         "only; use 'ds' or 'ts' for ALGO_ITERATIVE")
    store_basis = _store_basis(dimension, order, K, do_sens, NPL, ts_)
    if use_moments:
        kernel, NO, deg, NM, NTRI = _make_kernel_moment(
            dimension, order, K, weighting, refine_steps, knowns,
            precision, ts_, emit_cond, max_iter)
    else:
        kernel, NO, deg = _make_kernel(dimension, order, K, weighting,
                                       refine_steps, store_basis, do_sens,
                                       max_iter, knowns, precision, ts_,
                                       emit_cond)
    KN = [j for j in range(NO) if (knowns >> j) & 1]

    # host-side (XLA) preprocessing: plane split + tile layout
    delta = xk - xi[:, None, :]
    kmask = (jnp.arange(K)[None, :] < nk[:, None])
    delta = jnp.where(kmask[:, :, None], delta, 0.0)
    d_planes = ns.from_f64(delta)
    fkm = jnp.where(kmask, fk, 0.0)
    fk_planes = ns.from_f64(fkm)

    def to_tiles(x):  # (B, K, ...) -> (nblk, K, ..., ts_, 128)
        x = jnp.moveaxis(x.reshape(nblk, ts_, TILE_L, *x.shape[1:]), (1, 2),
                         (-2, -1))
        return x

    # the per-case power-of-two scale, shared exactly with the f64 unscale
    d2m = jnp.where(kmask, jnp.sum(delta * delta, -1), 0.0)
    h2 = d2m.max(axis=-1)
    e_s = jnp.ceil(0.5 * jnp.log2(jnp.where(h2 > 0, h2, 1.0)))
    inv_s = jnp.exp2(-e_s).astype(jnp.float32)

    def to_tiles1(x):  # (B,) -> (nblk, ts_, 128)
        return x.reshape(nblk, ts_, TILE_L)

    args = ([to_tiles(p) for p in d_planes]
            + [to_tiles(p) for p in fk_planes]
            + [to_tiles(kmask.astype(jnp.float32)), to_tiles1(inv_s)])
    if weighting == defs.WEIGHT_CENTER:
        # exact-f64 max squared radius for the weight normalization,
        # already computed for the radius prescale above
        args += [to_tiles1(p) for p in ns.from_f64(h2)]
    # factorial normalization of the reference's baked DOFs, applied
    # outside the kernel (see _basis_cols): fi = y_plain * fact * 2^(-e*deg).
    # Every factor is an exact small integer (≤ 24) so the f64 de-scale
    # still rounds exactly once per DOF.
    from math import factorial

    exp_t = tables.EXPONENTS[dimension][:NO]
    fact = jnp.asarray([float(np.prod([factorial(int(v)) for v in row]))
                        for row in exp_t], jnp.float64)
    if KN:
        # prescribed known DOF values, moved to the kernel's radius-scaled
        # plain-monomial space (y_hat = fi / fact * 2^(e*deg))
        gi = (jnp.zeros((B, NO), jnp.float64) if fi_init is None
              else jnp.asarray(fi_init, jnp.float64))
        degs = jnp.asarray(deg, jnp.float64)[None, :]
        gihat = (gi[:, KN] / fact[None, KN]
                 * jnp.exp2(e_s.astype(jnp.float64)[:, None] * degs[:, KN]))
        args += [to_tiles(p) for p in ns.from_f64(gihat)]
    args = tuple(args)

    grid = (nblk,)
    # None in the leading block dim squeezes it away, so the kernel sees
    # (K, ..., 8, 128) refs directly.  Index-map literals must be i32 —
    # under jax_enable_x64 a plain 0 lowers to i64, which Mosaic rejects.
    z = np.int32(0)
    in_specs = []
    for a in args:
        if a.ndim == 5:
            in_specs.append(pl.BlockSpec(
                (None, a.shape[1], a.shape[2], ts_, TILE_L),
                lambda i: (i, z, z, z, z)))
        elif a.ndim == 4:
            in_specs.append(pl.BlockSpec(
                (None, a.shape[1], ts_, TILE_L),
                lambda i: (i, z, z, z)))
        else:
            in_specs.append(pl.BlockSpec(
                (None, ts_, TILE_L), lambda i: (i, z, z)))

    out_shape = [jax.ShapeDtypeStruct((nblk, NO, ts_, TILE_L), jnp.float32)
                 for _ in range(NPL)]
    out_specs = [pl.BlockSpec((None, NO, ts_, TILE_L),
                              lambda i: (i, z, z, z)) for _ in range(NPL)]
    if max_iter:
        out_shape += [
            jax.ShapeDtypeStruct((nblk, ts_, TILE_L), jnp.float32)]
        out_specs += [
            pl.BlockSpec((None, ts_, TILE_L), lambda i: (i, z, z))]
    if do_sens:
        out_shape += [
            jax.ShapeDtypeStruct((nblk, K, NO, ts_, TILE_L), jnp.float32)
            for _ in range(NPL)]
        out_specs += [
            pl.BlockSpec((None, K, NO, ts_, TILE_L),
                         lambda i: (i, z, z, z, z)) for _ in range(NPL)]
    if emit_cond:
        out_shape += [
            jax.ShapeDtypeStruct((nblk, ts_, TILE_L), jnp.float32)]
        out_specs += [
            pl.BlockSpec((None, ts_, TILE_L), lambda i: (i, z, z))]
    out_shape = tuple(out_shape)
    out_specs = tuple(out_specs)
    if use_moments:
        staged = _moment_staged(dimension, order)
        # staged kernels route the per-neighbor chain values through the
        # A scratch during assembly, so it must hold max(NTRI, NM) rows
        a_rows = max(NTRI, NM if staged else 1, 1)
        scratch = [pltpu.VMEM((NM, ts_, TILE_L), jnp.float32)          # M
                   for _ in range(NPL)]
        scratch += [pltpu.VMEM((a_rows, ts_, TILE_L), jnp.float32)
                    for _ in range(NPL)]                               # A
        scratch += [pltpu.VMEM((NO, ts_, TILE_L), jnp.float32)         # b
                    for _ in range(NPL)]
        if staged:
            scratch += [pltpu.VMEM((NO * (NO + 1) // 2, ts_, TILE_L),
                                   jnp.float32)]                       # L
    else:
        scratch = [pltpu.VMEM((NO, NO, ts_, TILE_L), jnp.float32)]     # A
        scratch += [pltpu.VMEM((NO, ts_, TILE_L), jnp.float32)         # b
                    for _ in range(NPL)]
        scratch += [pltpu.VMEM((K, ts_, TILE_L), jnp.float32)          # w
                    for _ in range(NPL)]
        if store_basis:
            scratch += [pltpu.VMEM((K, NO, ts_, TILE_L), jnp.float32)  # c
                        for _ in range(NPL)]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)

    # back to (B, ...), f64, and undo the radius prescale exactly
    def from_tiles(x):  # (nblk, ..., 8, 128) -> (B, ...)
        mid = x.shape[1:-2]
        return jnp.moveaxis(x, (-2, -1), (1, 2)).reshape((B,) + mid)

    fi_scaled = sum(from_tiles(outs[p]).astype(jnp.float64)
                    for p in range(NPL))
    # exact: fact * 2^m is exactly representable (small-integer mantissa)
    dof_scale = fact[None, :] * jnp.exp2(
        -e_s.astype(jnp.float64)[:, None]
        * jnp.asarray(deg, jnp.float64)[None, :])
    fi = fi_scaled * dof_scale
    if KN:
        # the planes carry finitely many bits; restore the prescribed
        # values bit-exactly (the engine copies them through untouched)
        src = (jnp.zeros((B, NO), jnp.float64) if fi_init is None
               else jnp.asarray(fi_init, jnp.float64))
        fi = fi.at[:, jnp.asarray(KN)].set(src[:, jnp.asarray(KN)])
    res = [fi]
    nxt = NPL
    if max_iter:
        res.append(from_tiles(outs[nxt]).astype(jnp.int32))
        nxt += 1
    if do_sens:
        sens = sum(from_tiles(outs[nxt + p]).astype(jnp.float64)
                   for p in range(NPL))           # (B, K, NO)
        sens = sens * dof_scale[:, None, :]
        if KN:
            # NaN for known DOFs (reference: wlsqm/fitter/impl.pyx:775-779)
            sens = sens.at[:, :, jnp.asarray(KN)].set(jnp.nan)
        res.append(sens)
        nxt += NPL
    if emit_cond:
        # certification key: in-kernel cond_F-style estimate x the exact
        # radius de-scale amplification (matches condprobe's amp factor)
        amp = jnp.maximum(inv_s.astype(jnp.float64), 1.0) ** float(order)
        est = from_tiles(outs[nxt]).astype(jnp.float64) * amp
        res.append(est)
    return res[0] if len(res) == 1 else tuple(res)


# jit-cached entry for EAGER call sites (ExpertSolver.solve, fit_many's
# dispatch): fit_pallas builds ~15 XLA preprocessing ops around the
# pallas_call, and eager per-op dispatch costs whole round trips on
# remote backends.  Keyed on the current module attribute so test spies
# that monkeypatch ``fit_pallas`` keep working.
_JIT_CACHE = {}

_STATIC = ("dimension", "order", "weighting", "refine_steps", "interpret",
           "do_sens", "max_iter", "knowns", "precision", "tile_s",
           "assembly", "emit_cond")


def fit_pallas_jit(*args, **kwargs):
    """:func:`fit_pallas` through a cached ``jax.jit`` wrapper."""
    import jax

    fn = globals()["fit_pallas"]
    jitted = _JIT_CACHE.get(fn)
    if jitted is None:
        jitted = jax.jit(fn, static_argnames=_STATIC)
        _JIT_CACHE[fn] = jitted
    return jitted(*args, **kwargs)


# -----------------------------------------------------------------------------
# Reverse-mode differentiable wrapper (adjoints at kernel speed)
# -----------------------------------------------------------------------------
#
# The basic-algorithm fit is LINEAR in the data: fi = M(geometry) fk
# (+ the prescribed-knowns contribution, constant w.r.t. fk), and the
# Jacobian dfi/dfk is exactly the sensitivity array the kernel already
# computes (reference: wlsqm/fitter/impl.pyx:768-846).  So the VJP w.r.t.
# fk is one einsum against sens — no differentiating through the Pallas
# body, no engine fallback.  Geometry (xk/xi) and fi_init gradients are
# NOT provided here: they are stopped explicitly, and callers who need
# them use the engine path (tests/test_autodiff.py).


def _zero_ct(x):
    """A zero cotangent matching ``x`` (float0 for non-inexact dtypes)."""
    if x is None:
        return None
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fit_pallas_lin(statics, xk, fk, nk, xi, gi):
    kw = dict(statics)
    return fit_pallas(xk, fk, nk, xi, gi, **kw)


def _fit_pallas_lin_fwd(statics, xk, fk, nk, xi, gi):
    kw = dict(statics)
    fi, sens = fit_pallas(xk, fk, nk, xi, gi, do_sens=True, **kw)
    # primals ride along only to shape the zero cotangents; DCE removes them
    return fi, (sens, xk, nk, xi, gi)


def _fit_pallas_lin_bwd(statics, res, g):
    sens, xk, nk, xi, gi = res
    # known DOFs carry NaN sens rows (constants w.r.t. fk): exactly zero grad
    s = jnp.nan_to_num(sens)
    dfk = jnp.einsum("bkj,bj->bk", s, g)
    return (_zero_ct(xk), dfk, _zero_ct(nk), _zero_ct(xi), _zero_ct(gi))


_fit_pallas_lin.defvjp(_fit_pallas_lin_fwd, _fit_pallas_lin_bwd)


def fit_pallas_diffable(xk, fk, nk, xi, fi_init=None, *, dimension: int,
                        order: int, weighting: int,
                        refine_steps: int | None = None,
                        interpret: bool = False, knowns: int = 0,
                        precision: str = "ds",
                        tile_s: int | None = None):
    """:func:`fit_pallas` (basic algorithm), reverse-mode differentiable
    in ``fk`` — adjoints at kernel speed.

    ``jax.grad``/``jacrev``/``jax.vjp`` through this function backprop via
    the kernel's own sensitivity array (the exact Jacobian of the
    linear-in-data fit), so an adjoint IBVP loop or a data-side inverse
    problem runs both passes at fused-kernel throughput instead of
    falling back to the XLA engine.  The reverse pass costs one
    ``do_sens`` kernel launch plus an einsum; accuracy is the kernel's
    (~1e-12-grade for ds; see docs/theory.md §7).

    Gradients w.r.t. the geometry (``xk``/``xi``) and ``fi_init`` are
    STOPPED (exact zeros) — the kernel has no geometry-AD rules; use the
    engine path (``backend="xla"``) for those (tests/test_autodiff.py).
    ALGO_ITERATIVE is not offered here: its corrective refits make the
    map piecewise in ``fk``, and the initial-solve sens is not its exact
    Jacobian — use ``engine.fit_batch(..., fixed_trip=True)`` instead.
    """
    if not supported(dimension, np.full((1,), order, np.int64),
                     np.full((1,), knowns, np.int64),
                     np.full((1,), weighting, np.int64), K=xk.shape[1],
                     do_sens=True, precision=precision):
        raise ValueError(
            "fit_pallas_diffable: configuration unsupported by the fused "
            "kernel with sensitivities (VMEM budget or feature set); use "
            "the engine path (wlsqm_tpu.fitter.engine.fit_batch).")
    statics = (("dimension", dimension), ("order", order),
               ("weighting", weighting), ("refine_steps", refine_steps),
               ("interpret", interpret), ("knowns", knowns),
               ("precision", precision), ("tile_s", tile_s))
    xk = lax.stop_gradient(xk)
    xi = lax.stop_gradient(xi)
    gi = None if fi_init is None else lax.stop_gradient(fi_init)
    return _fit_pallas_lin(statics, xk, fk, nk, xi, gi)
