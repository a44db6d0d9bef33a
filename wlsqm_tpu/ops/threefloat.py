"""Triple-single ("three-float") arithmetic on f32 triples.

The double-single pairs of :mod:`wlsqm_tpu.ops.twofloat` carry ~48
significant bits, which caps the fused kernel's accuracy floor at
``2e-15 * cond2(A_jacobi) * inv_s**order`` (the calibrated ds error
model, wlsqm_tpu/fitter/condprobe.py).  Batches whose conditioning puts
that floor above the 1e-10 parity bar — the "middle band" of the
precision ladder — used to fall back to the XLA engine's fast/mixed
rungs at ~0.04-0.06 M fits/s on TPU (emulated-f64 residual sweeps are
materialization-bound; measured table in benchmarks/README.md).

This module extends the same error-free-transformation machinery to
(p0, p1, p2) float32 triples: ≈ 72 representable bits, operation error
O(u³) ≈ 2⁻⁶⁰ relative, at ~2.5-3x the flop count of the pair ops.  It
exists so the fused Pallas kernel can run a triple-single variant for
middle-band batches at kernel speed instead of dropping to the XLA
engine (see ops/pallas_fit.py ``precision="ts"``).

Robustness: like twofloat, every split is mantissa bit-masking via
bitcast (FMA contraction cannot break it) and the sums use only adds;
see the twofloat module docstring for the XLA:CPU fusion caveat (ts is
TPU-targeted for the same reason).

Values are (p0, p1, p2) tuples of equally-shaped f32 arrays with
``value = p0 + p1 + p2``, kept renormalized (|p1| ≤ ulp(p0)/2,
|p2| ≤ ulp(p1)/2).
"""

from __future__ import annotations

import jax.numpy as jnp

from wlsqm_tpu.ops.twofloat import quick_two_sum, two_prod, two_sum

__all__ = [
    "from_f64", "to_f64", "from_f32",
    "renorm", "add", "sub", "neg", "add_f32", "acc", "mul_add",
    "mul", "mul_f32", "div", "sqrt",
]


def from_f64(x):
    """Split a float64 array into an exact (p0, p1, p2) f32 triple.

    Exact: f64 carries 53 mantissa bits ≤ 3 x 24, so the residual after
    two f32 roundings is itself f32-representable.
    """
    p0 = x.astype(jnp.float32)
    r = x - p0.astype(x.dtype)
    p1 = r.astype(jnp.float32)
    p2 = (r - p1.astype(x.dtype)).astype(jnp.float32)
    return p0, p1, p2


def from_f32(x):
    """Lift an f32 array into the triple representation (exact)."""
    z = jnp.zeros_like(x)
    return x, z, z


def to_f64(t):
    p0, p1, p2 = t
    return (p0.astype(jnp.float64) + p1.astype(jnp.float64)
            + p2.astype(jnp.float64))


def renorm(a0, a1, a2):
    """Renormalize a decreasing-magnitude triple (two quick_two_sum passes)."""
    s1, s2 = quick_two_sum(a1, a2)
    r0, t = quick_two_sum(a0, s1)
    r1, r2 = quick_two_sum(t, s2)
    return r0, r1, r2


def neg(x):
    return -x[0], -x[1], -x[2]


def add(x, y):
    """Triple + triple; error O(u³)."""
    s0, e0 = two_sum(x[0], y[0])
    s1, e1 = two_sum(x[1], y[1])
    t1, t2 = two_sum(s1, e0)
    r = (x[2] + y[2]) + (e1 + t2)
    return renorm(s0, t1, r)


def sub(x, y):
    return add(x, neg(y))


def acc(a, x):
    """Accumulate ``a + x`` (full-precision; the ts counterpart of
    twofloat.acc — the triple add is already the cheapest safe form)."""
    return add(a, x)


def mul_add(a, x, y):
    """Fused ``a + x*y`` (full-precision composition for ts)."""
    return add(a, mul(x, y))


def add_f32(x, a):
    """Triple + plain f32."""
    s0, e0 = two_sum(x[0], a)
    t1, t2 = two_sum(x[1], e0)
    return renorm(s0, t1, x[2] + t2)


def mul(x, y):
    """Triple * triple; error O(u³).

    Exact leading product, compensated second-order terms, plain-f32
    third-order terms (their rounding is already O(u³) of the result).
    """
    p, q = two_prod(x[0], y[0])
    pa, qa = two_prod(x[0], y[1])
    pb, qb = two_prod(x[1], y[0])
    t, e1 = two_sum(pa, pb)
    t, e2 = two_sum(t, q)
    r = (x[1] * y[1] + (x[0] * y[2] + x[2] * y[0])) + ((qa + qb) + (e1 + e2))
    return renorm(p, t, r)


def mul_f32(x, a):
    """Triple * plain f32."""
    p, q = two_prod(x[0], a)
    pa, qa = two_prod(x[1], a)
    t, e = two_sum(q, pa)
    return renorm(p, t, x[2] * a + (qa + e))


def div(x, y):
    """Triple / triple by f32 long division (3 quotient words)."""
    q0 = x[0] / y[0]
    r1 = sub(x, mul_f32(y, q0))
    q1 = r1[0] / y[0]
    r2 = sub(r1, mul_f32(y, q1))
    q2 = r2[0] / y[0]
    return renorm(q0, q1, q2)


def sqrt(x):
    """Triple sqrt: f32 estimate + two Newton corrections.

    Guarded for zero (returns exact zero), matching twofloat.sqrt.
    """
    s0 = jnp.sqrt(x[0])
    safe = jnp.where(s0 > 0, s0, 1.0)
    s = (s0, jnp.zeros_like(s0), jnp.zeros_like(s0))
    for _ in range(2):
        e = sub(x, mul(s, s))
        corr = jnp.where(s0 > 0, e[0] * (0.5 / safe), 0.0)
        s = add_f32(s, corr)
    return s
