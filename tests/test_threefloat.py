"""Triple-single arithmetic: beyond-f64 effective precision on f32 triples.

Oracle: numpy longdouble (x86-64: 80-bit extended, 64-bit mantissa) —
enough headroom to certify errors below the f64 unit.
"""

import numpy as np
import jax.numpy as jnp

from wlsqm_tpu.ops import threefloat as tf3


def _rand(rng, shape, scale=1.0):
    x64 = rng.standard_normal(shape) * scale
    return x64, tf3.from_f64(jnp.asarray(x64))


def _val_ld(t):
    """Exact longdouble value of a triple (planes are exact binary values)."""
    return (np.asarray(t[0], np.longdouble) + np.asarray(t[1], np.longdouble)
            + np.asarray(t[2], np.longdouble))


def test_split_exact_roundtrip(rng):
    x64, t = _rand(rng, (512,), scale=1e3)
    # the 3-way split represents the f64 input EXACTLY
    np.testing.assert_array_equal(_val_ld(t).astype(np.float64), x64)


def test_renormalized_invariant(rng):
    _, a = _rand(rng, (256,))
    _, b = _rand(rng, (256,))
    for t in (tf3.add(a, b), tf3.mul(a, b)):
        p0, p1, p2 = (np.asarray(p, np.float64) for p in t)
        ulp0 = np.spacing(np.abs(np.asarray(t[0])).astype(np.float32))
        ulp1 = np.spacing(np.abs(np.asarray(t[1])).astype(np.float32))
        assert np.all(np.abs(p1) <= ulp0.astype(np.float64))
        assert np.all(np.abs(p2) <= ulp1.astype(np.float64))


def test_add_mul_beyond_f64(rng):
    a64, a = _rand(rng, (512,))
    b64, b = _rand(rng, (512,))
    al, bl = a64.astype(np.longdouble), b64.astype(np.longdouble)

    err_add = np.abs(_val_ld(tf3.add(a, b)) - (al + bl))
    err_mul = np.abs(_val_ld(tf3.mul(a, b)) - (al * bl))
    # f64 unit is ~1.1e-16; the triple ops must land well below it
    assert float(err_add.max()) < 1e-18
    assert float(err_mul.max()) < 1e-18


def test_mul_f32_add_f32(rng):
    a64, a = _rand(rng, (256,))
    c = np.float32(1.7330000400543213)
    al = a64.astype(np.longdouble)
    cl = np.longdouble(float(c))
    err_m = np.abs(_val_ld(tf3.mul_f32(a, jnp.float32(c))) - al * cl)
    err_a = np.abs(_val_ld(tf3.add_f32(a, jnp.float32(c))) - (al + cl))
    assert float(err_m.max()) < 1e-18
    assert float(err_a.max()) < 1e-18


def test_div_sqrt_beyond_f64(rng):
    a64 = np.abs(rng.standard_normal(256)) + 0.5
    b64 = np.abs(rng.standard_normal(256)) + 0.5
    a = tf3.from_f64(jnp.asarray(a64))
    b = tf3.from_f64(jnp.asarray(b64))
    al, bl = a64.astype(np.longdouble), b64.astype(np.longdouble)

    err_d = np.abs(_val_ld(tf3.div(a, b)) - al / bl)
    err_s = np.abs(_val_ld(tf3.sqrt(a)) - np.sqrt(al))
    assert float(err_d.max()) < 1e-17
    assert float(err_s.max()) < 1e-17


def test_sqrt_zero_guard():
    z = tf3.from_f64(jnp.zeros(8))
    out = tf3.sqrt(z)
    np.testing.assert_array_equal(np.asarray(tf3.to_f64(out)), 0.0)


def test_dot_chain_beyond_f64(rng):
    """A K-term accumulation (the kernel's matvec pattern) stays ~2^-60."""
    K = 32
    c64 = rng.standard_normal(K)
    x64 = rng.standard_normal(K)
    acc = tf3.from_f64(jnp.zeros(()))
    c = tf3.from_f64(jnp.asarray(c64))
    x = tf3.from_f64(jnp.asarray(x64))
    for k in range(K):
        ck = tuple(p[k] for p in c)
        xk = tuple(p[k] for p in x)
        acc = tf3.add(acc, tf3.mul(ck, xk))
    ref = np.dot(c64.astype(np.longdouble), x64.astype(np.longdouble))
    err = abs(float(_val_ld(acc) - ref))
    assert err < 5e-18  # ~30x under the f64 unit at this magnitude


def test_cancellation_beats_ds(rng):
    """Catastrophic cancellation where ds (48-bit) visibly truncates."""
    from wlsqm_tpu.ops import twofloat as tf

    x64 = 1.0 + 1e-13 * rng.standard_normal(128)
    y64 = -np.ones(128)
    xl = x64.astype(np.longdouble)
    ref = xl + np.longdouble(-1.0)

    t = tf3.add(tf3.from_f64(jnp.asarray(x64)), tf3.from_f64(jnp.asarray(y64)))
    d = tf.add(tf.from_f64(jnp.asarray(x64)), tf.from_f64(jnp.asarray(y64)))
    err_ts = np.abs(_val_ld(t) - ref).max()
    err_ds = np.abs(np.asarray(tf.to_f64(d), np.longdouble) - ref).max()
    assert float(err_ts) < 1e-21          # exact to the triple's width
    assert float(err_ts) <= float(err_ds)
