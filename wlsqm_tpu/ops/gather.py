"""Pallas window gather: beating XLA's TPU gather on neighbor lookups.

The IBVP stepping loop's cost is dominated by the neighbor-value gather
``u[idx]`` — XLA's TPU gather runs ~60 M indices/s regardless of index
dtype or payload width (measured round 2, benchmarks/README.md), i.e.
9.7 ms of a 9.78 ms heat-equation step.  The reference has no such cost:
its per-case C loops read neighbor values through pointers at memory
speed (reference: wlsqm/fitter/impl.pyx:731-846 reads fk[k] directly).

This kernel exploits the *spatial locality* of neighbor indices: after
ordering the cloud by a space-filling curve (:func:`morton_order`), the K
nearest neighbors of a case lie within a narrow index window, and a
*block* of T consecutive cases shares one window of width W.  The gather
then becomes, per block:

1. one contiguous DMA ``u[start : start+W]`` from HBM into VMEM, and
2. a one-hot matmul ``onehot(idx - start) @ window`` on the MXU —
   selection by a 0/1 matrix is EXACT in any float precision, so f64
   payloads ride as THREE f32 planes (24+24+5 mantissa bits covers the
   53-bit f64 significand) bit-exactly.

Contiguous DMA + MXU selection replaces XLA's per-element index walk;
the measured speedup on the IBVP config is recorded in
benchmarks/run_ibvp_multifield.py.

Usage::

    plan = plan_window_gather(idx, n)     # once per neighborhood structure
    out  = gather_rows(u, idx, plan)      # every step; == u[idx]

``plan_window_gather`` returns None when the index structure is not
local enough (window overflow) — callers fall back to ``u[idx]``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["morton_order", "plan_window_gather", "gather_rows",
           "GatherPlan"]

#: cases per block (grid step); T*K index rows are padded to a sublane
#: multiple
BLOCK_T = 64

#: window width (rows of u DMA'd per block); must be a lane multiple
WINDOW = 1024


def morton_order(pts) -> np.ndarray:
    """Permutation ordering points along a Morton (Z-order) curve.

    Sorting the cloud with this permutation makes kNN neighbor indices
    spatially local, which is what :func:`plan_window_gather` needs.
    Returns ``perm`` such that ``pts[perm]`` is Morton-ordered.
    """
    pts = np.asarray(pts)
    if pts.ndim == 1:
        return np.argsort(pts, kind="stable")
    lo = pts.min(axis=0)
    span = np.maximum(pts.max(axis=0) - lo, 1e-300)
    bits = 21 if pts.shape[1] <= 2 else 16
    q = ((pts - lo) / span * ((1 << bits) - 1)).astype(np.uint64)
    code = np.zeros(len(pts), np.uint64)
    for b in range(bits):
        for a in range(pts.shape[1]):
            code |= ((q[:, a] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                b * pts.shape[1] + a)
    return np.argsort(code, kind="stable")


@dataclasses.dataclass(frozen=True)
class GatherPlan:
    """Static window layout for :func:`gather_rows` (hashable leaves)."""

    starts: tuple      # (nblk,) int window starts, as a tuple (hashable)
    nblk: int
    T: int             # cases per block
    TKp: int           # padded T*K rows per block
    K: int
    n_pad: int         # padded u rows (>= max(start) + WINDOW)
    window: int


def plan_window_gather(idx, n: int, *, block_t: int = BLOCK_T,
                       window: int = WINDOW) -> GatherPlan | None:
    """Precompute per-block windows; None if any block's span overflows.

    idx: (B, K) int array of row indices into a length-``n`` array.
    Cheap (O(B*K) host work); do it once per neighborhood structure.
    """
    idx = np.asarray(idx)
    B, K = idx.shape
    assert block_t % 8 == 0, "block_t must be a sublane multiple"
    pad_b = (-B) % block_t
    if pad_b:
        idx = np.concatenate([idx, np.repeat(idx[-1:], pad_b, axis=0)])
    nblk = idx.shape[0] // block_t
    blocks = idx.reshape(nblk, block_t * K)
    lo = blocks.min(axis=1)
    hi = blocks.max(axis=1)
    if int((hi - lo).max()) >= window:
        return None
    starts = np.minimum(lo, max(n - window, 0)).astype(np.int32)
    # ensure start + window stays within the padded array
    n_pad = max(n, int(starts.max()) + window)
    # T*K is a sublane multiple by construction (T % 8 == 0), so kernel
    # rows need no padding and the output reshapes back with zero copies
    return GatherPlan(starts=tuple(int(s) for s in starts), nblk=nblk,
                      T=block_t, TKp=block_t * K, K=K, n_pad=n_pad,
                      window=window)


def _gather_kernel(starts_ref, idx_ref, u_hbm, out_ref, win, sem, *,
                   window, F2):
    b = pl.program_id(0)
    s = starts_ref[b]
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(s, window), :], win, sem)
    dma.start()
    loc = idx_ref[...] - s                                # (TKp, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (loc.shape[0], window), 1)
    onehot = (loc == col).astype(jnp.float32)             # (TKp, W)
    dma.wait()
    out_ref[...] = jnp.dot(onehot, win[...],
                           preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("plan", "interpret"))
def _gather_f32(u2, idx_t, plan: GatherPlan, interpret: bool = False):
    """u2 (n_pad, F2) f32, idx_t (nblk, TKp, 1) int32 -> (nblk, TKp, F2)."""
    F2 = u2.shape[1]
    starts = jnp.asarray(np.asarray(plan.starts, np.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.nblk,),
        in_specs=[
            pl.BlockSpec((None, plan.TKp, 1), lambda b, s: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, plan.TKp, F2), lambda b, s: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((plan.window, F2), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        partial(_gather_kernel, window=plan.window, F2=F2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nblk, plan.TKp, F2),
                                       jnp.float32),
        interpret=interpret,
    )(starts, idx_t, u2)


def _prep_idx(idx, plan: GatherPlan):
    idx = jnp.asarray(idx, jnp.int32)
    B, K = idx.shape
    pad_b = (-B) % plan.T
    if pad_b:
        idx = jnp.concatenate([idx, jnp.repeat(idx[-1:], pad_b, axis=0)])
    return idx.reshape(plan.nblk, plan.T * K)[..., None]


def gather_rows(u, idx, plan: GatherPlan, *, interpret: bool = False):
    """``u[idx]`` through the window kernel; u (n, F) or (n,), idx (B, K).

    f64 payloads are carried as three f32 planes (hi, mid, lo; the f64
    significand needs 53 bits and each one-hot selection is exact), so
    the result is bit-identical to ``u[idx]``.  Returns the same
    shape/dtype as ``u[idx]``.
    """
    u = jnp.asarray(u)
    idx = jnp.asarray(idx, jnp.int32)
    B, K = idx.shape
    squeeze = u.ndim == 1
    u2d = u[:, None] if squeeze else u
    F = u2d.shape[1]
    is_f64 = u2d.dtype == jnp.float64
    if is_f64:
        hi = u2d.astype(jnp.float32)
        r1 = u2d - hi.astype(jnp.float64)
        mid = r1.astype(jnp.float32)
        lo = (r1 - mid.astype(jnp.float64)).astype(jnp.float32)
        planes = jnp.concatenate([hi, mid, lo], axis=1)  # (n, 3F)
    else:
        planes = u2d.astype(jnp.float32)
    pad_n = plan.n_pad - planes.shape[0]
    if pad_n > 0:
        planes = jnp.concatenate(
            [planes, jnp.zeros((pad_n, planes.shape[1]), jnp.float32)])
    out = _gather_f32(planes, _prep_idx(idx, plan), plan,
                      interpret=interpret)                # (nblk, T*K, F2)
    out = out.reshape(plan.nblk * plan.T, K, -1)[:B]      # drop case padding
    if is_f64:
        # hi + (mid + lo): both sums exact in f64 (see plane split above)
        res = (out[..., :F].astype(jnp.float64)
               + (out[..., F:2 * F].astype(jnp.float64)
                  + out[..., 2 * F:].astype(jnp.float64)))
    else:
        res = out.astype(u2d.dtype)
    return res[..., 0] if squeeze else res
