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
   the block's largest index gap, starts rounded down to the 128-lane
   alignment Mosaic requires) from HBM into VMEM, and
2. a one-hot matmul ``windows @ onehot(local_idx)^T`` on the MXU —
   selection by a 0/1 matrix is EXACT.  Payload encoding depends on what
   the backend can do exactly:

   * where f64 bitcasts lower (CPU, interpret mode): 16-bit integer
     chunks lifted to f32 (0..65535 is exact in f32 and in the MXU's
     highest-precision passes) — ANY bit pattern survives bit-exactly;
   * on the axon TPU bridge, f64 bitcasts don't lower AND the emulated
     f64 *arithmetic* itself keeps only ~48 bits (measured: the residual
     ``u - f64(f32(u))`` loses the sub-2^-48 tail), so f64 payloads ride
     as a float (hi, lo) pair: fidelity 2^-48 relative — exactly the
     device's own f64 arithmetic floor, i.e. nothing is lost relative to
     any other computation on this hardware.  f32 payloads stay exact.

   The planes travel feature-major ``(F2p, n)`` so the window slice runs
   along the lane dimension.

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
           "gather_rows_pair", "gather_local", "GatherPlan"]

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
    n: int             # rows of the cloud the plan was built for
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
    # Mosaic requires dynamic lane-dimension slice STARTS aligned to 128:
    # round starts down, and judge overflow against the FINAL aligned
    # starts (no separate span heuristic, so alignment/capping slack is
    # accounted exactly)
    s1 = ((lo // 128) * 128).astype(np.int64)
    s2 = ((right_lo // 128) * 128).astype(np.int64)
    left_ok = left_hi - s1 < window
    right_ok = hi - s2 < window
    bad = ~(left_ok & right_ok)
    if bad.mean() > max_bad_frac:
        return None
    thr = right_lo.astype(np.int32)        # idx >= thr -> window 2
    # single-cluster blocks: route everything through window 1
    single = hi - s1 < window
    thr = np.where(single, np.int32(n + window), thr)
    s2 = np.where(single, s1, s2)
    n_pad = int(max(n, max(s1.max(initial=0), s2.max(initial=0)) + window))
    n_pad = -(-n_pad // 128) * 128
    meta = np.stack([s1.astype(np.int32), s2.astype(np.int32), thr],
                    axis=1)
    return GatherPlan(meta=tuple(int(v) for v in meta.ravel()),
                      bad_blocks=tuple(int(b) for b in np.nonzero(bad)[0]),
                      nblk=nblk, T=block_t, K=K, n=int(n), n_pad=n_pad,
                      window=window)


#: in-flight window buffers: the per-block DMA pair's latency is hidden
#: behind the one-hot construction/matmul of earlier blocks.  Round-3
#: measured the unpipelined kernel at 6.1 ms per 1280-block step — the
#: serial start/wait per block left the DMA engine idle during compute
#: and vice versa; 4 slots keep ~3 block DMAs in flight.
NBUF = 4


def _gather_kernel(meta_ref, idx_ref, u_hbm, out_ref, win, sem, *,
                   window, F2p, TKp, nblk, nbuf=NBUF):
    # all index literals must be i32: under jax_enable_x64 a bare python
    # int lowers to i64, which Mosaic's memref_slice verifier rejects
    z = np.int32(0)
    one = np.int32(1)
    b = pl.program_id(0)

    def dmas(blk, slot):
        s1 = meta_ref[blk, z]
        s2 = meta_ref[blk, one]
        # the plan aligns starts to 128 (lane tiling); Mosaic needs proof
        s1a = pl.multiple_of(s1, 128)
        s2a = pl.multiple_of(s2, 128)
        d1 = pltpu.make_async_copy(
            u_hbm.at[:, pl.ds(s1a, window)],
            win.at[slot, :, pl.ds(z, window)], sem.at[slot, z])
        d2 = pltpu.make_async_copy(
            u_hbm.at[:, pl.ds(s2a, window)],
            win.at[slot, :, pl.ds(np.int32(window), window)],
            sem.at[slot, one])
        return d1, d2

    # cross-block pipelining: block b's compute overlaps the window DMAs
    # of blocks b+1 .. b+nbuf-1 (scratch persists across TPU grid steps)
    @pl.when(b == 0)
    def _():
        for i in range(min(nbuf - 1, nblk)):
            d1, d2 = dmas(np.int32(i), np.int32(i % nbuf))
            d1.start()
            d2.start()

    ahead = np.int32(nbuf - 1)
    @pl.when(b + ahead < np.int32(nblk))
    def _():
        blk = b + ahead
        d1, d2 = dmas(blk, jax.lax.rem(blk, np.int32(nbuf)))
        d1.start()
        d2.start()

    s1 = meta_ref[b, z]
    s2 = meta_ref[b, one]
    thr = meta_ref[b, np.int32(2)]
    raw = idx_ref[...]                                    # (1, TKp)
    loc = jnp.where(raw >= thr, raw - s2 + window, raw - s1)
    row = jax.lax.broadcasted_iota(jnp.int32, (2 * window, TKp), 0)
    dt = win.dtype
    ohT = (row == loc).astype(dt)                         # (2W, TKp)
    slot = jax.lax.rem(b, np.int32(nbuf))
    d1, d2 = dmas(b, slot)
    d1.wait()
    d2.wait()
    # precision: selection by a 0/1 matrix is exact when the payload
    # plane dtype survives the MXU pass.  bf16 payload chunks (the TPU
    # fast path — each f32 plane split into three exact bf16 chunks by
    # the caller) run ONE default pass; f32 planes (bit-exact CPU/
    # interpret path) need HIGHEST so the MXU does not truncate them.
    prec = (jax.lax.Precision.DEFAULT if dt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    out_ref[...] = jax.lax.dot_general(
        win[slot], ohT, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)


def _tkp(plan: GatherPlan) -> int:
    """Kernel row count: T*K padded to the 128-lane width."""
    return -(-plan.T * plan.K // 128) * 128


@partial(jax.jit, static_argnames=("window", "nblk", "TKp", "interpret"))
def _gather_sel(u2t, idx_t, meta, *, window: int, nblk: int, TKp: int,
                interpret: bool = False):
    """The dual-window one-hot selection kernel, meta as a RUNTIME array.

    u2t (F2p, n_pad) f32|bf16, idx_t (nblk, 1, TKp) i32,
    meta (nblk, 3) i32 -> (nblk, F2p, TKp) f32.  Split from the
    plan-static wrapper so shard_map can feed per-shard meta/idx slices
    through one compiled program (parallel/sharding.py).
    """
    F2p = u2t.shape[0]
    # index-map literals must be i32: under jax_enable_x64 a plain 0
    # lowers to i64, which Mosaic rejects (same pitfall as ops/pallas_fit)
    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((None, 1, TKp), lambda b, s: (b, z, z)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, F2p, TKp), lambda b, s: (b, z, z)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, F2p, 2 * window), u2t.dtype),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    return pl.pallas_call(
        partial(_gather_kernel, window=window, F2p=F2p, TKp=TKp,
                nblk=nblk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, F2p, TKp), jnp.float32),
        interpret=interpret,
    )(meta, idx_t, u2t)


def _gather_f32(u2t, idx_t, plan: GatherPlan, interpret: bool = False):
    """u2t (F2p, n_pad) f32|bf16, idx_t (nblk, 1, TKp) int32
    -> (nblk, F2p, TKp) f32."""
    meta = jnp.asarray(
        np.asarray(plan.meta, np.int32).reshape(plan.nblk, 3))
    return _gather_sel(u2t, idx_t, meta, window=plan.window,
                       nblk=plan.nblk, TKp=_tkp(plan), interpret=interpret)


def _prep_idx(idx, plan: GatherPlan):
    idx = jnp.asarray(idx, jnp.int32)
    B, K = idx.shape
    pad_b = (-B) % plan.T
    if pad_b:
        idx = jnp.concatenate([idx, jnp.repeat(idx[-1:], pad_b, axis=0)])
    flat = idx.reshape(plan.nblk, plan.T * K)
    pad_r = _tkp(plan) - plan.T * plan.K
    if pad_r:
        # -1 sentinel: matches no window row, so padded columns stay zero
        flat = jnp.concatenate(
            [flat, jnp.full((plan.nblk, pad_r), -1, jnp.int32)], axis=1)
    return flat[:, None, :]


#: keep sign + exponent + top 7 mantissa bits — exactly a (truncating)
#: bf16, but produced by BIT MASKING so XLA cannot fuse the
#: cast-subtract chain away.  A plain ``x - f32(bf16(x))`` split is
#: algebraically simplified to zero by XLA inside larger traces
#: (measured: exact standalone, bf16-grade inside a lax.scan step) —
#: the same hazard ops/twofloat.py documents for Dekker splits.
_BF16_MASK = np.uint32(0xFFFF0000)


def _bf16_chunk(x):
    v = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32) & _BF16_MASK,
        jnp.float32)
    return v.astype(jnp.bfloat16), x - v


def _split_bf16(x):
    """Exact 3-chunk bf16 split of f32 planes: (n, F) -> (n, 3F) bf16.

    f32's 24 significand bits fit three 8-bit bf16 chunks exactly (same
    exponent range), so ``c0+c1+c2 == x`` bit-exactly in f32 arithmetic —
    modulo bf16 subnormal flushing below ~1e-38, well inside the TPU
    pair path's documented 2^-48 relative fidelity.  Chunks are produced
    by mantissa masking (see :data:`_BF16_MASK`), never by bare casts.
    """
    b0, r = _bf16_chunk(x)
    b1, r2 = _bf16_chunk(r)
    b2 = r2.astype(jnp.bfloat16)   # <= 8 significand bits left: exact
    return jnp.stack([b0, b1, b2], axis=-1).reshape(x.shape[0], -1)


def _gather_planes(planes, idx, plan: GatherPlan, interpret: bool,
                   chunk_bf16: bool = False):
    """Gather f32 planes ``planes[idx]``: (n, F2) -> (B, K, F2).

    ``chunk_bf16``: split each f32 plane into three exact bf16 chunks so
    the one-hot selection matmul runs ONE default-precision MXU pass
    instead of HIGHEST's six — the extra planes ride the M-padding slack
    of the skinny payload for free (measured ~2x on the F=1 IBVP step).
    """
    B, K = idx.shape
    n = planes.shape[0]
    pad_n = plan.n_pad - n
    if pad_n > 0:
        planes = jnp.concatenate(
            [planes, jnp.zeros((pad_n, planes.shape[1]), jnp.float32)])
    F0 = planes.shape[1]
    if chunk_bf16:
        planes = _split_bf16(planes)
    dt = planes.dtype
    F2 = planes.shape[1]
    # sublane-pad the feature-major planes (16 for bf16 tiling, 8 for f32)
    sub = 16 if dt == jnp.bfloat16 else 8
    F2p = -(-F2 // sub) * sub
    u2t = planes.T
    if F2p > F2:
        u2t = jnp.concatenate(
            [u2t, jnp.zeros((F2p - F2, u2t.shape[1]), dt)])
    out = _gather_f32(u2t, _prep_idx(idx, plan), plan,
                      interpret=interpret)                # (nblk, F2p, TKp)
    TK = plan.T * plan.K
    out = out[:, :F2, :TK]                                # strip padding
    out = jnp.moveaxis(out, 1, 2).reshape(plan.nblk * plan.T, K, F2)[:B]
    if chunk_bf16:
        c = out.reshape(B, K, F0, 3)
        out = (c[..., 0] + c[..., 1]) + c[..., 2]   # exact chunk re-sum
    return out


def gather_rows_pair(u_pair, idx, plan: GatherPlan, *,
                     interpret: bool = False,
                     chunk_bf16: bool | None = None):
    """``u[idx]`` for a double-single (hi, lo) f32 pair — no f64 ops at all.

    For ds-resident state (e.g. an IBVP field kept as an f32 pair across
    steps, :mod:`wlsqm_tpu.ops.twofloat`), :func:`gather_rows` would round
    through f64 — paying emulated-f64 elementwise ops on the (B, K) result
    every step.  This variant feeds both planes straight through the
    one-hot selection matmul, which is exact for any FINITE f32 payload (a
    0/1 matrix never mixes values; NaN/Inf payloads would poison the zero
    products — use :func:`gather_rows` for those).  u_pair: (hi, lo), each
    (n,) or (n, F) f32.  Returns the gathered pair with the same
    trailing-axis convention as ``u[idx]``.
    """
    hi = jnp.asarray(u_pair[0], jnp.float32)
    lo = jnp.asarray(u_pair[1], jnp.float32)
    if hi.shape != lo.shape:
        raise ValueError(
            "gather_rows_pair: (hi, lo) planes must have identical shapes, "
            f"got {hi.shape} vs {lo.shape}")
    if hi.shape[0] != plan.n:
        raise ValueError(
            f"gather_rows_pair: u has {hi.shape[0]} rows but the GatherPlan "
            f"was built for n={plan.n}; rebuild the plan for this cloud")
    idx = jnp.asarray(idx, jnp.int32)
    squeeze = hi.ndim == 1
    hi2 = hi[:, None] if squeeze else hi
    lo2 = lo[:, None] if squeeze else lo
    F = hi2.shape[1]
    planes = jnp.concatenate([hi2, lo2], axis=1)          # (n, 2F)
    if chunk_bf16 is None:
        chunk_bf16 = not interpret and jax.default_backend() != "cpu"
    out = _gather_planes(planes, idx, plan, interpret,
                         chunk_bf16=chunk_bf16)           # (B, K, 2F)
    res_hi, res_lo = out[..., :F], out[..., F:]
    if plan.bad_blocks:
        B = idx.shape[0]
        rows = np.concatenate([
            np.arange(b * plan.T, min((b + 1) * plan.T, B))
            for b in plan.bad_blocks]).astype(np.int32)
        rows_j = jnp.asarray(rows)
        res_hi = res_hi.at[rows_j].set(hi2[idx[rows_j]])
        res_lo = res_lo.at[rows_j].set(lo2[idx[rows_j]])
    if squeeze:
        return res_hi[..., 0], res_lo[..., 0]
    return res_hi, res_lo


@partial(jax.jit, static_argnames=("window", "TKp", "n_pad", "T",
                                   "interpret"))
def gather_local(v_all, idx_s, meta_s, bad_s, *, window: int, TKp: int,
                 n_pad: int, T: int, interpret: bool = False):
    """Shard-local window gather against a replicated value array.

    The shard_map-composable form of :func:`gather_rows`: the per-block
    window metadata arrives as a RUNTIME array (``meta_s``, the shard's
    slice of the global plan), and rows of overflow blocks patch through
    a dynamic plain gather (``bad_s`` — shard-local case rows, padded
    with 0: row 0 is simply rewritten with its correct value).  Used by
    :func:`wlsqm_tpu.parallel.sharding.sharded_gather_values`.

    v_all (n, F)|(n,) f32/f64 — the all-gathered cloud values;
    idx_s (Bs, K) i32 with ``Bs == meta_s.shape[0] * T``.
    Returns the shard's ``v_all[idx_s]`` (f64 at the TPU pair path's
    2^-48 fidelity; f32 exact).
    """
    squeeze = v_all.ndim == 1
    v2 = v_all[:, None] if squeeze else v_all
    F = v2.shape[1]
    if v2.dtype == jnp.float64:
        hi = v2.astype(jnp.float32)
        lo = (v2 - hi.astype(jnp.float64)).astype(jnp.float32)
        planes = jnp.concatenate([hi, lo], axis=1)
    else:
        planes = v2.astype(jnp.float32)
    F0 = planes.shape[1]
    pad_n = n_pad - v2.shape[0]
    if pad_n > 0:
        planes = jnp.concatenate(
            [planes, jnp.zeros((pad_n, F0), jnp.float32)])
    planes = _split_bf16(planes)
    F2 = planes.shape[1]
    F2p = -(-F2 // 16) * 16
    u2t = planes.T
    if F2p > F2:
        u2t = jnp.concatenate(
            [u2t, jnp.zeros((F2p - F2, u2t.shape[1]), planes.dtype)])
    Bs, K = idx_s.shape
    nblk_s = meta_s.shape[0]
    flat = jnp.asarray(idx_s, jnp.int32).reshape(nblk_s, T * K)
    pad_r = TKp - T * K
    if pad_r:
        flat = jnp.concatenate(
            [flat, jnp.full((nblk_s, pad_r), -1, jnp.int32)], axis=1)
    out = _gather_sel(u2t, flat[:, None, :], jnp.asarray(meta_s, jnp.int32),
                      window=window, nblk=nblk_s, TKp=TKp,
                      interpret=interpret)
    out = out[:, :F2, :T * K]
    out = jnp.moveaxis(out, 1, 2).reshape(Bs, K, F2)
    c = out.reshape(Bs, K, F0, 3)
    out = (c[..., 0] + c[..., 1]) + c[..., 2]
    if v2.dtype == jnp.float64:
        res = (out[..., :F].astype(jnp.float64)
               + out[..., F:].astype(jnp.float64))
    else:
        res = out.astype(v2.dtype)
    bad = jnp.asarray(bad_s, jnp.int32)
    res = res.at[bad].set(v2[idx_s[bad]])
    return res[..., 0] if squeeze else res


def gather_rows(u, idx, plan: GatherPlan, *, interpret: bool = False):
    """``u[idx]`` through the window kernel; u (n, F) or (n,), idx (B, K).

    Bit-identical to ``u[idx]`` on backends with exact bitcasts (CPU /
    interpret); on the axon TPU bridge f64 payloads carry 48 bits
    (~2^-48 relative — the device's own f64 arithmetic floor, see the
    module docstring) and f32 payloads stay exact.  Rows of overflow
    blocks come from the plain XLA gather (statically planned).  Returns
    the same shape/dtype as ``u[idx]``.
    """
    u = jnp.asarray(u)
    idx = jnp.asarray(idx, jnp.int32)
    B, K = idx.shape
    squeeze = u.ndim == 1
    u2d = u[:, None] if squeeze else u
    F = u2d.shape[1]
    n = u2d.shape[0]
    if n != plan.n:
        raise ValueError(
            f"gather_rows: u has {n} rows but the GatherPlan was built "
            f"for n={plan.n}; rebuild the plan for this cloud")
    itemsize = u2d.dtype.itemsize
    if itemsize not in (4, 8):
        raise TypeError("gather_rows supports 4- and 8-byte dtypes; got %s"
                        % (u2d.dtype,))
    # exact-bit path (CPU/interpret): 16-bit integer chunks as f32 planes.
    # The axon TPU bridge cannot lower f64 bitcasts, so f64 rides as a
    # float (hi, lo) pair there (2^-48 fidelity = the device's own f64
    # arithmetic floor); f32 payloads are exact either way.
    bit_exact = jax.default_backend() == "cpu" or interpret
    W = itemsize // 4
    if bit_exact:
        words = jax.lax.bitcast_convert_type(u2d, jnp.uint32)
        if itemsize == 4:
            words = words[..., None]
        halves = jnp.stack([words & jnp.uint32(0xFFFF),
                            words >> jnp.uint32(16)], axis=-1)  # (n,F,W,2)
        planes = halves.astype(jnp.float32).reshape(n, F * W * 2)
    elif itemsize == 8:
        if u2d.dtype != jnp.float64:
            raise TypeError(
                "8-byte integer payloads need exact bitcasts, which this "
                "backend cannot lower; gather on a 4-byte view instead")
        hi = u2d.astype(jnp.float32)
        lo = (u2d - hi.astype(jnp.float64)).astype(jnp.float32)
        planes = jnp.concatenate([hi, lo], axis=1)              # (n, 2F)
    else:
        if u2d.dtype.kind != "f":
            raise TypeError(
                "4-byte integer payloads need exact bitcasts, which this "
                "backend cannot lower; use a float view")
        planes = u2d.astype(jnp.float32)                        # (n, F)
    out = _gather_planes(planes, idx, plan, interpret,
                         chunk_bf16=not bit_exact)        # (B, K, F2)
    if bit_exact:
        halves_out = out.reshape(B, K, F, W, 2).astype(jnp.uint32)
        words_out = (halves_out[..., 0]
                     | (halves_out[..., 1] << jnp.uint32(16)))
        if itemsize == 8:
            res = jax.lax.bitcast_convert_type(words_out, u2d.dtype)
        else:
            res = jax.lax.bitcast_convert_type(words_out[..., 0], u2d.dtype)
    elif itemsize == 8:
        res = (out[..., :F].astype(jnp.float64)
               + out[..., F:].astype(jnp.float64))
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
