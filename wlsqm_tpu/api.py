"""Functional JAX-native API for wlsqm_tpu.

This is the idiomatic entry point for TPU users: pure functions over device
arrays, composable with ``jax.jit`` / ``vmap`` / ``shard_map``.  The
compatibility layer (:mod:`wlsqm_tpu.fitter.simple`,
:class:`wlsqm_tpu.fitter.expert.ExpertSolver`) is built on the same engine.

Typical flow::

    import wlsqm_tpu as wt

    res = wt.fit_many(xk, fk, xi, order=2)        # batched fit
    res.fi                                         # (B, NO) derivative DOFs

    prep = wt.prepare(xk, xi, order=4)             # IBVP time stepping:
    for step in range(nsteps):                     # prepare once,
        fi, _ = wt.solve(prep, fk)                 # solve many times

    vals = wt.interpolate(fi_b, xi_b, x, dimension=2, order=2, diff=wt_i2_X)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wlsqm_tpu.fitter import defs, engine
from wlsqm_tpu.fitter.interp import eval_fit
from wlsqm_tpu.ops import solve as solve_ops

__all__ = ["FitResult", "fit", "fit_many", "fit_stream", "prepare",
           "solve", "interpolate"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("fi", "sens", "iterations", "cond_scaled"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class FitResult:
    """Result of a batched fit.

    fi          : (B, NO) solved DOFs (function value + derivatives at xi)
    sens        : (B, K, NO) sensitivities d fi / d fk, or None
    iterations  : (B,) refinement iterations taken (0 for the basic algorithm)
    cond_scaled : (B,) 2-norm condition numbers of the scaled matrices
                  (NaN unless debug=True)
    """

    fi: jax.Array
    sens: jax.Array | None
    iterations: jax.Array
    cond_scaled: jax.Array

    @property
    def ok(self) -> jax.Array:
        """(B,) per-case success flags: all solved DOFs finite.

        The reference silently ignores LAPACK failures inside its OpenMP
        regions (reference: TODO_DEFERRED.md:5-22); surfacing a per-case
        status array is the batched improvement suggested in SURVEY §5.
        """
        return jnp.isfinite(self.fi).all(axis=-1)


def _broadcast_case_param(value, B, dtype):
    arr = jnp.asarray(value, dtype)
    if arr.ndim == 0:
        arr = jnp.full((B,), arr)
    return arr


def _canon_geometry(xk, xi):
    """Coerce (B,K)/(B,) 1D layouts to (B,K,1)/(B,1); infer dimension."""
    xk = jnp.asarray(xk)
    if xk.ndim == 2:
        xk = xk[..., None]
    B, K, dim = xk.shape
    if xi is None:
        xi = jnp.zeros((B, dim), xk.dtype)
    else:
        xi = jnp.asarray(xi, xk.dtype)
        if xi.ndim == 1 and dim == 1:
            xi = xi[:, None]
    return xk, xi, B, K, dim


def fit_many(
    xk,
    fk,
    xi=None,
    *,
    nk=None,
    order=2,
    knowns=0,
    weighting=defs.WEIGHT_UNIFORM,
    fi_init=None,
    do_sens: bool = False,
    iterative: bool = False,
    max_iter: int = 10,
    max_order: int | None = None,
    debug: bool = False,
    precision: str | None = None,
    ruiz_max_iter: int = 100,
    scaling: str = "ruiz",
    solver: str = solve_ops.SOLVER_CHOLESKY,
    backend: str = "auto",
    refine_steps: int | None = None,
) -> FitResult:
    """Fit a batch of local surrogate models (JAX-native).

    xk: (B, K, dim) neighbor coordinates ((B, K) accepted for 1D)
    fk: (B, K) data values at the neighbors
    xi: (B, dim) fit origins; defaults to zeros
    nk: (B,) valid neighbor counts; defaults to K for every case
    order / knowns / weighting: scalars or (B,) arrays (scalars broadcast)
    fi_init: (B, NO) initial DOF array carrying the known values; zeros if None
    precision: None (default — the engine path runs "f64", and auto kernel
        routing stays allowed), "f64" (explicit reference-exact contract:
        ``backend="auto"`` will never route through the ds kernel), or
        "mixed"/"fast"/"ds" — see :mod:`wlsqm_tpu.fitter.engine`; the
        non-f64 modes keep ~1e-12 agreement with the f64 path while
        avoiding slow emulated-f64 factorization on TPU.

    backend: "auto" (default — the fused Pallas kernel when the batch is
        eligible on an accelerator AND the conditioning probe
        (:mod:`wlsqm_tpu.fitter.condprobe`) predicts f64-grade (<= 1e-10)
        agreement; masked XLA otherwise), "pallas" (force the fused
        VMEM-resident kernel — fastest on TPU; homogeneous batches only:
        one order, one weighting, one knowns bitmask (any value — known
        DOFs are eliminated in-kernel); ``do_sens`` and ``iterative`` are
        supported in-kernel; no accuracy guard), or "xla" (the masked
        batched-XLA engine at the selected ``precision``).
    refine_steps: kernel-backend speed/accuracy dial — number of ds
        residual sweeps after the direct solve (default
        pallas_fit.DS_REFINE_STEPS = 4; 2 is ~20% faster and fine for
        well-conditioned clouds).  Ignored by the XLA backend.

    Returns a :class:`FitResult`.  This function is jit-compiled; wrap it in
    ``shard_map`` over the case axis for multi-chip execution (see
    :func:`wlsqm_tpu.parallel.sharded_fit_many`).
    """
    if backend not in ("auto", "pallas", "xla"):
        raise ValueError(
            "backend must be 'auto', 'pallas' or 'xla'; got %r" % (backend,))
    if precision not in (None, engine.PRECISION_F64, engine.PRECISION_MIXED,
                         engine.PRECISION_FAST, engine.PRECISION_DS):
        raise ValueError(
            "precision must be None, 'f64', 'mixed', 'fast' or 'ds'; "
            "got %r" % (precision,))

    xk, xi, B, K, dim = _canon_geometry(xk, xi)
    fk = jnp.asarray(fk, xk.dtype)
    if fk.shape != (B, K):
        raise ValueError(
            "fk must have shape (B, K) = (%d, %d) matching xk; got %s"
            % (B, K, fk.shape))
    nk = (jnp.full((B,), K, jnp.int32) if nk is None
          else jnp.asarray(nk, jnp.int32))
    if nk.shape != (B,):
        raise ValueError(
            "nk must have shape (B,) = (%d,); got %s" % (B, nk.shape))
    order_a = _broadcast_case_param(order, B, jnp.int32)
    knowns_a = _broadcast_case_param(knowns, B, jnp.int64)
    weighting_a = _broadcast_case_param(weighting, B, jnp.int32)

    if max_order is None:
        max_order = int(np.max(np.asarray(order)))
    NO = defs.number_of_dofs(dim, max_order)
    if fi_init is not None:
        fi_init = jnp.asarray(fi_init)
        if fi_init.ndim != 2 or fi_init.shape[0] != B or fi_init.shape[1] < NO:
            raise ValueError(
                "fi_init must have shape (B, >=NO) = (%d, >=%d); got %s"
                % (B, NO, fi_init.shape))

    # an explicit precision="f64" is an accuracy contract: auto routing must
    # not substitute the ds-grade kernel (explicit backend="pallas" wins)
    strict_f64 = precision == engine.PRECISION_F64
    if precision is None:
        precision = engine.PRECISION_F64

    if backend in ("pallas", "auto"):
        from wlsqm_tpu.fitter import condprobe
        from wlsqm_tpu.ops import pallas_fit

        on_cpu = jax.default_backend() == "cpu"
        # auto additionally demands overdetermination margin AND an
        # f64-grade prediction from the conditioning probe: the ds floor is
        # ~cond(A_jacobi) * inv_s**order * 2e-15 (condprobe docstring), so
        # ill-conditioned or tiny-radius high-order batches go to f64.
        # One probe (sampled SVD) serves both the gate and the sweep pick.
        margin_ok = K >= (3 * NO) // 2
        cond_amp = None
        eligible = (
            pallas_fit.supported(dim, np.asarray(order), np.asarray(knowns),
                                 np.asarray(weighting), K=K, do_sens=do_sens)
            and not debug
        )
        if eligible and backend != "pallas":
            # on CPU the kernel only runs interpreted (slow); auto avoids it
            eligible = not on_cpu and margin_ok and not strict_f64
            if eligible:
                cond_amp = condprobe.probe(
                    xk, nk, xi, np.asarray(order), np.asarray(weighting),
                    dimension=dim, knowns=int(np.max(np.asarray(knowns))))
                eligible = condprobe.accuracy_ok_from(cond_amp)
        if eligible:
            pad = (-B) % pallas_fit.TILE
            xk_p = jnp.concatenate([xk, xk[:1].repeat(pad, 0)]) if pad else xk
            fk_p = jnp.concatenate([fk, fk[:1].repeat(pad, 0)]) if pad else fk
            nk_p = jnp.concatenate([nk, nk[:1].repeat(pad, 0)]) if pad else nk
            xi_p = jnp.concatenate([xi, xi[:1].repeat(pad, 0)]) if pad else xi
            if refine_steps is None and backend == "auto":
                # adaptive sweep count: well-conditioned batches reach the
                # ds floor at 2 sweeps (~20% faster); the probe keeps the
                # predicted error under the 1e-10 bar either way
                refine_steps = condprobe.pick_from(cond_amp)
            rs = (dict(refine_steps=refine_steps)
                  if refine_steps is not None else {})
            # the kernel solves dofs(order) DOFs; the caller's fi layout has
            # NO = dofs(max_order) columns — embed the kernel result and
            # keep fi_init's values on the inactive trailing DOFs
            no_g = defs.number_of_dofs(dim, int(np.max(np.asarray(order))))
            fi0_p = None
            if fi_init is not None:
                fi0_p = jnp.asarray(fi_init)[:, :no_g]
                if pad:
                    fi0_p = jnp.concatenate([fi0_p, fi0_p[:1].repeat(pad, 0)])
            out = pallas_fit.fit_pallas(
                xk_p, fk_p, nk_p, xi_p, fi0_p, dimension=dim,
                order=int(np.max(np.asarray(order))),
                weighting=int(np.max(np.asarray(weighting))),
                interpret=on_cpu, do_sens=do_sens,
                knowns=int(np.max(np.asarray(knowns))),
                max_iter=(max_iter if iterative else 0), **rs)
            if not (iterative or do_sens):
                out = (out,)
            fi = out[0][:B]
            nxt = 1
            iters = jnp.zeros((B,), jnp.int32)
            if iterative:
                iters = out[nxt][:B]
                nxt += 1
            sens = out[nxt][:B] if do_sens else None
            if no_g < NO:
                tail = (jnp.zeros((B, NO - no_g), fi.dtype)
                        if fi_init is None
                        else jnp.asarray(fi_init, fi.dtype)[:, no_g:NO])
                fi = jnp.concatenate([fi, tail], axis=1)
                if sens is not None:
                    sens = jnp.concatenate(
                        [sens, jnp.zeros(sens.shape[:2] + (NO - no_g,),
                                         sens.dtype)], axis=2)
            nanv = jnp.full((B,), jnp.nan, fi.dtype)
            return FitResult(fi=fi, sens=sens, iterations=iters,
                             cond_scaled=nanv)
        # heterogeneous batches: group-by-(order, knowns) bucketing
        # (SURVEY §7 — masking is the semantics, bucketing is the
        # optimization).  Every homogeneous group big enough to fill a TILE
        # goes through the fused kernel (known DOFs are eliminated
        # in-kernel); small groups fall through to the masked XLA path and
        # results merge in the caller's case order.
        order_np = np.broadcast_to(np.asarray(order), (B,))
        knowns_np = np.broadcast_to(np.asarray(knowns), (B,))
        fi_init_np = None if fi_init is None else np.asarray(fi_init)
        if (backend == "auto" and not on_cpu
                and not do_sens and not iterative and not debug
                and not strict_f64
                and np.asarray(weighting).min() == np.asarray(weighting).max()
                and K >= (3 * NO) // 2
                and pallas_fit.vmem_ok(dim, int(order_np.max()), K)):
            # start from fi_init so inactive trailing DOFs of lower-order
            # cases keep the caller's values (reference in/out fi semantics)
            fi_out = (jnp.zeros((B, NO), xk.dtype) if fi_init_np is None
                      else jnp.asarray(fi_init_np[:, :NO], xk.dtype))
            leftover = np.ones(B, bool)
            pairs = {(int(o), int(kn))
                     for o, kn in zip(order_np.tolist(), knowns_np.tolist())}
            for o, kn in sorted(pairs):
                sel = np.nonzero((order_np == o) & (knowns_np == kn))[0]
                if len(sel) < pallas_fit.TILE:
                    continue  # too small to amortize; leave for the XLA pass
                if not condprobe.kernel_accuracy_ok(
                        np.asarray(xk)[sel], np.asarray(nk)[sel],
                        np.asarray(xi)[sel], int(o),
                        int(np.max(np.asarray(weighting))),
                        dimension=dim, knowns=int(kn)):
                    continue  # predicted ds floor above the parity bar
                pad = (-len(sel)) % pallas_fit.TILE
                idx = np.concatenate([sel, sel[:1].repeat(pad)])
                rs = (dict(refine_steps=refine_steps)
                      if refine_steps is not None else {})
                fi0_g = None
                if kn and fi_init_np is not None:
                    fi0_g = jnp.asarray(fi_init_np[idx])
                fi_g = pallas_fit.fit_pallas(
                    xk[idx], fk[idx], nk[idx], xi[idx], fi0_g, dimension=dim,
                    order=int(o), knowns=kn,
                    weighting=int(np.asarray(weighting).max()),
                    **rs)[:len(sel)]
                no_g = defs.number_of_dofs(dim, int(o))
                fi_out = fi_out.at[jnp.asarray(sel), :no_g].set(fi_g)
                leftover[sel] = False
            if not leftover.any():
                zeros = jnp.zeros((B,), jnp.int32)
                nanv = jnp.full((B,), jnp.nan, fi_out.dtype)
                return FitResult(fi=fi_out, sens=None, iterations=zeros,
                                 cond_scaled=nanv)
            if leftover.sum() < B:
                rest = np.nonzero(leftover)[0]
                rest_res = fit_many(
                    xk[rest], fk[rest], xi[rest], nk=nk[rest],
                    order=order_np[rest], knowns=knowns_np[rest],
                    weighting=np.asarray(weighting).max(),
                    fi_init=(None if fi_init_np is None
                             else fi_init_np[rest]),
                    max_order=max_order, backend="xla",
                    precision=precision, ruiz_max_iter=ruiz_max_iter,
                    scaling=scaling, solver=solver)
                fi_out = fi_out.at[jnp.asarray(rest)].set(rest_res.fi)
                zeros = jnp.zeros((B,), jnp.int32)
                nanv = jnp.full((B,), jnp.nan, fi_out.dtype)
                return FitResult(fi=fi_out, sens=None, iterations=zeros,
                                 cond_scaled=nanv)

        if backend == "pallas":
            raise ValueError(
                "backend='pallas' requires a homogeneous batch (single "
                "order/weighting/knowns-mask) without debug; "
                "use backend='auto' or 'xla'")

    fi0 = (jnp.zeros((B, NO), xk.dtype) if fi_init is None
           else jnp.asarray(fi_init, xk.dtype))

    fi, sens, iters, cond = engine.fit_batch(
        xk, fk, nk, xi, fi0, order_a, knowns_a, weighting_a,
        dimension=dim, NO=NO, do_sens=do_sens, iterative=iterative,
        max_iter=max_iter, debug=debug,
        precision=precision, ruiz_max_iter=ruiz_max_iter,
        scaling=scaling, solver=solver,
    )
    return FitResult(
        fi=fi,
        sens=sens if do_sens else None,
        iterations=iters,
        cond_scaled=cond,
    )


def fit_stream(xk, fk, xi=None, *, nk=None, chunk: int = 65536,
               out=None, **kwargs) -> FitResult:
    """Fit a cloud larger than device memory, streaming fixed-size chunks.

    Host arrays (NumPy, including ``np.memmap``) are uploaded one
    ``chunk`` at a time, fitted with :func:`fit_many`, and the solved DOFs
    land in a host-side output array — only ~two chunks of geometry are
    ever resident in HBM, so the cloud size is bounded by host storage,
    not device memory.  The loop keeps one chunk in flight: while chunk i
    computes (dispatch is asynchronous), chunk i-1's results transfer back,
    overlapping compute with PCIe/ICI traffic.  The last partial chunk is
    padded to the full chunk size so every step reuses one compiled
    program.  (The reference streams nothing — its OpenMP loop assumes the
    whole problem set fits in RAM; reference: wlsqm/fitter/simple.pyx:953ff.)

    xk (B, K, dim) | fk (B, K) | xi (B, dim) | nk (B,) — host array-likes.
    chunk: cases per device batch (default 65536).
    out: optional preallocated (B, NO) f64 array for the DOFs.
    kwargs: forwarded to :func:`fit_many` (order, weighting, backend, ...);
    per-case parameter arrays are sliced along with the geometry.
    ``do_sens``/``debug`` are not supported here (their outputs would not
    stream); use :func:`fit_many` on a chunk directly.

    Returns a :class:`FitResult` whose fields are host NumPy arrays.
    """
    if kwargs.get("do_sens") or kwargs.get("debug"):
        raise ValueError("fit_stream does not support do_sens/debug; "
                         "call fit_many on individual chunks instead")
    xk = np.asarray(xk)
    if xk.ndim == 2:
        xk = xk[:, :, None]
    B, K, dim = xk.shape
    fk = np.asarray(fk)
    xi_np = None if xi is None else np.asarray(xi)
    nk_np = None if nk is None else np.asarray(nk)
    per_case = {}
    for key in ("order", "knowns", "weighting", "fi_init"):
        v = kwargs.get(key)
        if v is not None and np.ndim(v) >= 1:
            per_case[key] = np.asarray(v)

    order = kwargs.get("order", 2)
    max_order = kwargs.get("max_order") or int(np.max(np.asarray(order)))
    NO = defs.number_of_dofs(dim, max_order)
    kwargs.setdefault("max_order", max_order)

    fi_out = out if out is not None else np.empty((B, NO), np.float64)
    if fi_out.shape != (B, NO):
        raise ValueError("out must have shape (%d, %d)" % (B, NO))
    iters_out = np.zeros((B,), np.int32)

    def run(lo, hi):
        n = hi - lo
        pad = chunk - n
        def padded(a):
            if a is None:
                return None
            sl = a[lo:hi]
            if pad:
                sl = np.concatenate([sl, np.repeat(sl[:1], pad, axis=0)])
            return sl
        kw = dict(kwargs)
        for key, v in per_case.items():
            kw[key] = padded(v)
        return fit_many(padded(xk), padded(fk), padded(xi_np),
                        nk=padded(nk_np), **kw)

    pending = None  # (lo, hi, FitResult) — one chunk in flight
    for lo in range(0, B, chunk):
        hi = min(lo + chunk, B)
        res = run(lo, hi)
        if pending is not None:
            plo, phi, pres = pending
            fi_out[plo:phi] = np.asarray(pres.fi)[: phi - plo]
            iters_out[plo:phi] = np.asarray(pres.iterations)[: phi - plo]
        pending = (lo, hi, res)
    if pending is not None:
        plo, phi, pres = pending
        fi_out[plo:phi] = np.asarray(pres.fi)[: phi - plo]
        iters_out[plo:phi] = np.asarray(pres.iterations)[: phi - plo]

    return FitResult(fi=fi_out, sens=None, iterations=iters_out,
                     cond_scaled=np.full((B,), np.nan))


def fit(xk, fk, xi=None, **kwargs) -> FitResult:
    """Single-neighborhood convenience wrapper: a batch of one.

    xk: (K, dim) or (K,) for 1D; fk: (K,); xi: (dim,) or scalar.
    The returned FitResult has its leading batch axis squeezed away.
    """
    xk = jnp.asarray(xk)
    if xk.ndim == 1:
        xk = xk[:, None]
    if xi is None:
        xi_b = None
    else:
        xi_arr = jnp.asarray(xi, xk.dtype).reshape(-1)
        xi_b = xi_arr[None, :]
    fi_init = kwargs.pop("fi_init", None)
    if fi_init is not None:
        fi_init = jnp.asarray(fi_init)[None, :]
    res = fit_many(xk[None], jnp.asarray(fk)[None], xi_b,
                   fi_init=fi_init, **kwargs)
    return FitResult(
        fi=res.fi[0],
        sens=None if res.sens is None else res.sens[0],
        iterations=res.iterations[0],
        cond_scaled=res.cond_scaled[0],
    )


def prepare(
    xk,
    xi=None,
    *,
    nk=None,
    order=2,
    knowns=0,
    weighting=defs.WEIGHT_UNIFORM,
    max_order: int | None = None,
    solver: str = solve_ops.SOLVER_CHOLESKY,
    debug: bool = False,
    precision: str = engine.PRECISION_F64,
    ruiz_max_iter: int = 100,
    scaling: str = "ruiz",
) -> engine.Prepared:
    """Prepare geometry for repeated solves (JAX-native expert mode).

    Returns a :class:`wlsqm_tpu.fitter.engine.Prepared` pytree — pass it to
    :func:`solve`.  Being an ordinary pytree, it can be donated, checkpointed,
    or shared between fields (the reference's "guest mode",
    reference: wlsqm/fitter/expert.pyx:110-124, is simply object reuse here).
    """
    xk, xi, B, K, dim = _canon_geometry(xk, xi)
    if xi.shape[0] != B:
        raise ValueError(
            "xi must have shape (B, dim) = (%d, %d) matching xk; got %s"
            % (B, dim, xi.shape))
    nk = (jnp.full((B,), K, jnp.int32) if nk is None
          else jnp.asarray(nk, jnp.int32))
    if nk.shape != (B,):
        raise ValueError(
            "nk must have shape (B,) = (%d,); got %s" % (B, nk.shape))
    order_a = _broadcast_case_param(order, B, jnp.int32)
    knowns_a = _broadcast_case_param(knowns, B, jnp.int64)
    weighting_a = _broadcast_case_param(weighting, B, jnp.int32)
    if max_order is None:
        max_order = int(np.max(np.asarray(order)))
    NO = defs.number_of_dofs(dim, max_order)
    return partial(
        jax.jit,
        static_argnames=("dimension", "NO", "solver", "debug",
                     "ruiz_max_iter", "ruiz_eps", "precision", "scaling"),
    )(engine.prepare)(
        xk, nk, xi, order_a, knowns_a, weighting_a,
        dimension=dim, NO=NO, solver=solver, debug=debug,
        precision=precision, ruiz_max_iter=ruiz_max_iter, scaling=scaling,
    )


def solve(
    prep: engine.Prepared,
    fk,
    fi_init=None,
    *,
    do_sens: bool = False,
    iterative: bool = False,
    max_iter: int = 10,
):
    """Solve prepared systems against data ``fk``.

    fk (B, K) solves one field; fk (F, B, K) solves F fields against the
    same prepared geometry in one call (factorizations reused, neighbor
    gathers amortized — the batched form of the reference's guest-solver
    pattern).  Returns (fi, sens) for the basic algorithm, or
    (fi, sens, iterations) with ``iterative=True``; outputs carry the
    leading field axis when fk does.
    """
    fk = jnp.asarray(fk)
    B_p, K_p = prep.c.shape[0], prep.c.shape[1]
    if fk.shape[-2:] != (B_p, K_p) or fk.ndim not in (2, 3):
        raise ValueError(
            "fk must have shape (B, K) = (%d, %d) matching the prepared "
            "geometry (or (F, B, K) for multi-field); got %s"
            % (B_p, K_p, fk.shape))
    if fk.ndim == 3:
        # multi-field: fk (F, B, K) — one call solves every field against
        # the same prepared geometry (the reference handles this with guest
        # solvers sharing factored matrices, reference:
        # wlsqm/fitter/expert.pyx:110-124; here it is a vmap over fields,
        # amortizing the neighbor gather and reusing one factorization)
        fi0 = (jnp.zeros((fk.shape[0], prep.ncases, prep.no_max), fk.dtype)
               if fi_init is None else jnp.asarray(fi_init, fk.dtype))
        if iterative:
            fn = jax.vmap(
                lambda fk_f, fi_f: engine.solve_iterative_prepared(
                    prep, fk_f, fi_f, max_iter=max_iter, do_sens=do_sens))
        else:
            fn = jax.vmap(
                lambda fk_f, fi_f: engine.solve_prepared(
                    prep, fk_f, fi_f, do_sens=do_sens))
        return jax.jit(fn)(fk, fi0)
    fi0 = (jnp.zeros((prep.ncases, prep.no_max), fk.dtype)
           if fi_init is None else jnp.asarray(fi_init, fk.dtype))

    def run():
        if iterative:
            return jax.jit(
                engine.solve_iterative_prepared,
                static_argnames=("max_iter", "do_sens"),
            )(prep, fk, fi0, max_iter=max_iter, do_sens=do_sens)
        return jax.jit(
            engine.solve_prepared, static_argnames=("do_sens",)
        )(prep, fk, fi0, do_sens=do_sens)

    try:
        return run()
    except ValueError as e:  # pragma: no cover - jit-cache defect workaround
        # Re-executing a cached executable against a structurally identical
        # but freshly materialized Prepared (e.g. loaded from a checkpoint)
        # can trip a pjit argument-pruning mismatch ("Execution supplied N
        # buffers..."). Clearing the caches and recompiling is safe.
        if "buffers" not in str(e):
            raise
        jax.clear_caches()
        return run()


def interpolate(fi, xi, x, *, dimension: int, order: int, diff: int = 0):
    """Evaluate fitted models (or their derivatives) at query points.

    Thin alias of :func:`wlsqm_tpu.fitter.interp.eval_fit`; batch axes of
    fi/xi/x broadcast.
    """
    return eval_fit(fi, xi, x, dimension=dimension, order=order, diff=diff)
