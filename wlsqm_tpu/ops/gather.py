"""Pallas window gather: beating XLA's TPU gather on neighbor lookups.

The IBVP stepping loop's cost is dominated by the neighbor-value gather
``u[idx]`` — XLA's TPU gather runs ~60 M indices/s regardless of index
dtype or payload width (measured round 2, benchmarks/README.md), i.e.
9.7 ms of a 9.78 ms heat-equation step.  The reference has no such cost:
its per-case C loops read neighbor values through pointers at memory
speed (reference: wlsqm/fitter/impl.pyx:731-846 reads fk[k] directly).

This kernel exploits the *spatial locality* of neighbor indices: after
ordering the cloud by a space-filling curve (:func:`morton_order`), the K
nearest neighbors of a block of T consecutive cases cluster into at most
two index ranges (the local run, plus one far cluster when the block
straddles a curve seam).  Per block the gather becomes:

1. TWO contiguous DMA windows ``u[s1:s1+W]``, ``u[s2:s2+W]`` (split at
   the block's largest index gap) from HBM into VMEM, and
2. a one-hot matmul ``onehot(local_idx) @ windows`` on the MXU —
   selection by a 0/1 matrix is EXACT in any float precision, so f64
   payloads ride as THREE f32 planes (24+24+5 mantissa bits cover the
   53-bit significand) bit-exactly.

Blocks whose two windows still overflow (measured ~4% of blocks on a
20k-point Morton-ordered kNN cloud at T=16, W=1024) fall back to the
plain XLA gather for THEIR rows only; the merge is planned statically.

Usage::

    perm = morton_order(pts); pts = pts[perm]   # once, at setup
    plan = plan_window_gather(idx, n)           # once per neighborhood set
    out  = gather_rows(u, idx, plan)            # every step; == u[idx]
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

#: cases per block (grid step); must be a multiple of 8 so T*K rows tile
BLOCK_T = 16

#: width of EACH of the two DMA windows per block (lane multiple)
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

    meta: tuple        # flattened (s1, s2, thr) per block, tuple of ints
    bad_blocks: tuple  # block ids whose rows use the XLA fallback
    nblk: int
    T: int             # cases per block
    K: int
    n_pad: int         # padded u rows (>= max(start) + WINDOW)
    window: int

    @property
    def coverage(self) -> float:
        """Fraction of blocks served by the kernel."""
        return 1.0 - len(self.bad_blocks) / max(self.nblk, 1)


def plan_window_gather(idx, n: int, *, block_t: int = BLOCK_T,
                       window: int = WINDOW,
                       max_bad_frac: float = 0.25) -> GatherPlan | None:
    """Precompute per-block dual windows; None if too many blocks overflow.

    idx: (B, K) int array of row indices into a length-``n`` array.
    Cheap (O(B*K log K) host work); do it once per neighborhood structure.
    """
    idx = np.asarray(idx)
    B, K = idx.shape
    assert block_t % 8 == 0, "block_t must be a sublane multiple"
    pad_b = (-B) % block_t
    if pad_b:
        idx = np.concatenate([idx, np.repeat(idx[-1:], pad_b, axis=0)])
    nblk = idx.shape[0] // block_t
    blocks = np.sort(idx.reshape(nblk, block_t * K), axis=1)
    gaps = np.diff(blocks, axis=1)
    gpos = gaps.argmax(axis=1)
    r = np.arange(nblk)
    left_hi = blocks[r, gpos]
    right_lo = blocks[r, np.minimum(gpos + 1, blocks.shape[1] - 1)]
    lo = blocks[:, 0]
    hi = blocks[:, -1]
    left_span = left_hi - lo
    right_span = hi - right_lo
    bad = np.maximum(left_span, right_span) >= window
    if bad.mean() > max_bad_frac:
        return None
    cap = max(n - window, 0)
    s1 = np.minimum(lo, cap).astype(np.int32)
    s2 = np.minimum(right_lo, cap).astype(np.int32)
    thr = right_lo.astype(np.int32)        # idx >= thr -> window 2
    # single-cluster blocks: route everything through window 1
    single = hi - lo < window
    thr = np.where(single, np.int32(n + window), thr)
    s2 = np.where(single, s1, s2)
    n_pad = max(n, int(max(s1.max(initial=0), s2.max(initial=0))) + window)
    meta = np.stack([s1, s2, thr], axis=1).astype(np.int32)
    return GatherPlan(meta=tuple(int(v) for v in meta.ravel()),
                      bad_blocks=tuple(int(b) for b in np.nonzero(bad)[0]),
                      nblk=nblk, T=block_t, K=K, n_pad=n_pad, window=window)


def _gather_kernel(meta_ref, idx_ref, u_hbm, out_ref, win, sem, *,
                   window, F2):
    b = pl.program_id(0)
    s1 = meta_ref[b, 0]
    s2 = meta_ref[b, 1]
    thr = meta_ref[b, 2]
    d1 = pltpu.make_async_copy(
        u_hbm.at[pl.ds(s1, window), :], win.at[pl.ds(0, window), :],
        sem.at[0])
    d2 = pltpu.make_async_copy(
        u_hbm.at[pl.ds(s2, window), :], win.at[pl.ds(window, window), :],
        sem.at[1])
    d1.start()
    d2.start()
    raw = idx_ref[...]                                    # (TK, 1)
    loc = jnp.where(raw >= thr, raw - s2 + window, raw - s1)
    col = jax.lax.broadcasted_iota(jnp.int32, (loc.shape[0], 2 * window), 1)
    onehot = (loc == col).astype(jnp.float32)             # (TK, 2W)
    d1.wait()
    d2.wait()
    out_ref[...] = jnp.dot(onehot, win[...],
                           preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("plan", "interpret"))
def _gather_f32(u2, idx_t, plan: GatherPlan, interpret: bool = False):
    """u2 (n_pad, F2) f32, idx_t (nblk, T*K, 1) int32 -> (nblk, T*K, F2)."""
    F2 = u2.shape[1]
    TK = plan.T * plan.K
    meta = jnp.asarray(
        np.asarray(plan.meta, np.int32).reshape(plan.nblk, 3))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.nblk,),
        in_specs=[
            pl.BlockSpec((None, TK, 1), lambda b, s: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, TK, F2), lambda b, s: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2 * plan.window, F2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_gather_kernel, window=plan.window, F2=F2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nblk, TK, F2), jnp.float32),
        interpret=interpret,
    )(meta, idx_t, u2)


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
    the result is bit-identical to ``u[idx]``.  Rows of overflow blocks
    come from the plain XLA gather (statically planned).  Returns the
    same shape/dtype as ``u[idx]``.
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
    if plan.bad_blocks:
        # overflow blocks: their cases read through the XLA gather
        rows = np.concatenate([
            np.arange(b * plan.T, min((b + 1) * plan.T, B))
            for b in plan.bad_blocks]).astype(np.int32)
        rows_j = jnp.asarray(rows)
        res = res.at[rows_j].set(u2d[idx[rows_j]])
    return res[..., 0] if squeeze else res
