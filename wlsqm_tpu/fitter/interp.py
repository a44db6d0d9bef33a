"""Interpolation of a fitted surrogate model and its derivatives.

Replaces the reference's ~600 lines of hand-written derivative
coefficient-shift tables (reference: wlsqm/fitter/interp.pyx:316-932) with a
single static projection: because the baked basis satisfies
``∂^m (d**e/e!) = d**(e-m)/(e-m)!``, the ``diff``-th derivative of the model
is just the baked basis contracted with a 0/1-projected coefficient vector
(:func:`wlsqm_tpu.fitter.tables.diff_projection`).  Derivatives of order
higher than the model order are identically zero, matching the reference's
special case (reference: wlsqm/fitter/interp.pyx:686-692).

``interpolate_fit`` / ``lambdify_fit`` mirror the reference's Python API
(reference: wlsqm/fitter/interp.pyx:34-239); ``interpolate_many`` is the
batched JAX-native entry used by :class:`wlsqm_tpu.fitter.expert.ExpertSolver`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wlsqm_tpu.fitter import defs, tables
from wlsqm_tpu.fitter.engine import basis

__all__ = ["interpolate_fit", "lambdify_fit", "eval_fit", "interpolate_many",
           "interpolate_continuous"]


@partial(jax.jit, static_argnames=("dimension", "order", "diff"))
def eval_fit(fi, xi, x, *, dimension: int, order: int, diff: int = 0):
    """Evaluate the ``diff``-th derivative of a fitted model at points ``x``.

    fi: (..., no) baked coefficients; xi: (..., dim) origin; x: (..., n, dim)
    query points ((..., n) in 1D is handled by the callers).  Batch axes of
    fi/xi/x broadcast.  Returns (..., n) values.
    """
    no = defs.number_of_dofs(dimension, order)
    P = tables.diff_projection(dimension, diff)[:no, :no]   # static 0/1
    fi = jnp.asarray(fi)
    coeff = fi[..., :no] @ jnp.asarray(P.T, fi.dtype)       # (..., no)
    delta = jnp.asarray(x) - jnp.asarray(xi)[..., None, :]
    c = basis(delta, dimension, no)                         # (..., n, no)
    return jnp.einsum("...nj,...j->...n", c, coeff)


def interpolate_many(fi, xi, x, *, dimension: int, order: int, diff: int = 0):
    """Batched per-case interpolation: case b's model evaluated at x[b].

    fi (B, no), xi (B, dim), x (B, n, dim) -> (B, n).
    """
    return eval_fit(fi, xi, x, dimension=dimension, order=order, diff=diff)


@partial(jax.jit, static_argnames=("dimension", "order", "diff",
                                   "block_q", "block_b"))
def interpolate_continuous(fi, xi, x, r, *, dimension: int, order: int,
                           diff: int = 0, valid=None,
                           block_q: int = 256, block_b: int = 2048):
    """Continuous patched-model interpolation, fully on device.

    Blends every local model whose origin lies within radius ``r`` of the
    query point, weighted by ``(1 - sqrt(d²/r²))²`` (zero at r), matching
    the reference's 'continuous' mode (reference:
    wlsqm/fitter/expert.pyx:898-986) — but with no host k-d tree: the
    radius test is a mask over a blocked brute-force distance sweep, so the
    whole evaluation jits and shards (see
    :func:`wlsqm_tpu.parallel.sharded_interpolate_continuous`).

    fi (B, no) | xi (B, dim) | x (Q, dim) | r scalar.
    valid: optional (B,) bool — models to include (lets callers pad B).
    Returns (num, den): the weighted sum and total weight per query; the
    blended value is ``num / den`` (NaN where no model is in range, as in
    the host path).  Returning the pair keeps the function psum-friendly.
    """
    no = defs.number_of_dofs(dimension, order)
    P = tables.diff_projection(dimension, diff)[:no, :no]
    fi = jnp.asarray(fi)
    coeff = fi[..., :no] @ jnp.asarray(P.T, fi.dtype)       # (B, no)
    xi = jnp.asarray(xi)
    x = jnp.asarray(x)
    B, Q = xi.shape[0], x.shape[0]
    vmask = (jnp.ones((B,), bool) if valid is None
             else jnp.asarray(valid, bool))

    pad_q = (-Q) % block_q
    pad_b = (-B) % block_b
    xq = jnp.concatenate([x, jnp.zeros((pad_q, x.shape[1]), x.dtype)])
    xib = jnp.concatenate([xi, jnp.zeros((pad_b, xi.shape[1]), xi.dtype)])
    cb = jnp.concatenate([coeff, jnp.zeros((pad_b, no), coeff.dtype)])
    vb = jnp.concatenate([vmask, jnp.zeros((pad_b,), bool)])

    nq, nb = xq.shape[0] // block_q, xib.shape[0] // block_b
    xq_blocks = xq.reshape(nq, block_q, -1)
    xi_blocks = xib.reshape(nb, block_b, -1)
    c_blocks = cb.reshape(nb, block_b, no)
    v_blocks = vb.reshape(nb, block_b)
    r2 = jnp.asarray(r, x.dtype) ** 2

    def q_step(xq_blk):
        def b_step(acc, blk):
            xi_blk, c_blk, v_blk = blk
            delta = xq_blk[:, None, :] - xi_blk[None, :, :]
            c = basis(delta, dimension, no)                 # (bq, bb, no)
            vals = jnp.einsum("qbj,bj->qb", c, c_blk)
            d2 = jnp.sum(delta * delta, -1)
            t = 1.0 - jnp.sqrt(jnp.minimum(d2 / r2, 1.0))
            w = jnp.where(v_blk[None, :], t * t, 0.0)
            num, den = acc
            return (num + jnp.sum(w * vals, -1), den + jnp.sum(w, -1)), None

        z = jnp.zeros((block_q,), x.dtype)
        (num, den), _ = jax.lax.scan(
            b_step, (z, z), (xi_blocks, c_blocks, v_blocks))
        return num, den

    num, den = jax.lax.map(q_step, xq_blocks)
    return num.reshape(-1)[:Q], den.reshape(-1)[:Q]


def interpolate_fit(xi, fi, dimension: int, order: int, x, diff: int = 0):
    """Interpolate the fit (or one of its derivatives) to given points.

    Drop-in equivalent of the reference API
    (reference: wlsqm/fitter/interp.pyx:34-143).

    xi   : fit origin — (x0,y0[,z0]) array in 2D/3D, scalar in 1D
    fi   : fit coefficients as output by the fitting functions
    order: surrogate polynomial order used in the fit
    x    : query points, (n, dim) in 2D/3D or (n,)/scalar in 1D
    diff : i1_*/i2_*/i3_* DOF constant selecting which derivative to evaluate

    Returns a rank-1 NumPy array of values at each x.
    """
    if dimension not in (1, 2, 3):
        raise ValueError("dimension must be 1, 2 or 3; got %s" % (dimension,))
    if order not in (0, 1, 2, 3, 4):
        raise ValueError("order must be 0, 1, 2, 3 or 4; got %s" % (order,))
    size = tables.EXPONENTS[dimension].shape[0]
    if not (0 <= diff < size):
        raise ValueError("invalid diff %s for dimension %d" % (diff, dimension))

    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    if dimension == 1:
        xq = x.reshape(-1, 1)
        xi_arr = np.array([np.float64(xi)])
    else:
        xq = x.reshape(-1, dimension)
        xi_arr = np.asarray(xi, dtype=np.float64)[:dimension]

    vals = eval_fit(
        jnp.asarray(np.asarray(fi, dtype=np.float64)),
        jnp.asarray(xi_arr),
        jnp.asarray(xq),
        dimension=dimension,
        order=order,
        diff=diff,
    )
    return np.asarray(vals)


def lambdify_fit(xi, fi, dimension, order, diff=0):
    """Create a vectorized Python lambda interpolating a fitted model.

    Mirrors the reference API (reference: wlsqm/fitter/interp.pyx:146-239):
    3D -> model(x, y, z); 2D -> model(x, y); 1D -> model(x).  Arguments may
    be scalars or same-shaped arrays (scalars broadcast).
    """
    if dimension not in (1, 2, 3):
        raise ValueError("dimension must be 1, 2 or 3; got %s" % (dimension,))
    if order not in (0, 1, 2, 3, 4):
        raise ValueError("order must be 0, 1, 2, 3 or 4; got %s" % (order,))

    if dimension == 1:
        def model(x):
            return np.asarray(
                interpolate_fit(xi, fi, 1, order, np.atleast_1d(x), diff)
            )
        return model

    def model(*coords):
        if len(coords) != dimension:
            raise ValueError(
                "model() expects %d coordinate arguments, got %d"
                % (dimension, len(coords))
            )
        arrs = np.broadcast_arrays(*[np.atleast_1d(c) for c in coords])
        shp = arrs[0].shape
        pts = np.stack([a.reshape(-1) for a in arrs], axis=-1)
        return np.reshape(
            interpolate_fit(xi, fi, dimension, order, pts, diff), shp
        )

    return model
