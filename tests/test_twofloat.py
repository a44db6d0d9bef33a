"""Double-single arithmetic: ~1e-14 effective precision on f32 pairs."""

import numpy as np
import jax.numpy as jnp

from wlsqm_tpu.ops import twofloat as tf


def _rand_pair(rng, shape, scale=1.0):
    x64 = rng.standard_normal(shape) * scale
    return jnp.asarray(x64), tf.from_f64(jnp.asarray(x64))


def test_split_roundtrip(rng):
    x64, d = _rand_pair(rng, (128,), scale=1e3)
    back = np.asarray(tf.to_f64(d))
    assert np.abs(back - np.asarray(x64)).max() / 1e3 < 1e-14


def test_add_mul_precision(rng):
    a64, a = _rand_pair(rng, (256,))
    b64, b = _rand_pair(rng, (256,))
    s = np.asarray(tf.to_f64(tf.add(a, b)))
    p = np.asarray(tf.to_f64(tf.mul(a, b)))
    np.testing.assert_allclose(s, np.asarray(a64 + b64), rtol=1e-13, atol=1e-14)
    np.testing.assert_allclose(p, np.asarray(a64 * b64), rtol=1e-13, atol=1e-14)


def test_two_prod_exactness(rng):
    # the masked-split product must capture the f32 rounding error exactly
    a = jnp.asarray(rng.standard_normal(512), jnp.float32)
    b = jnp.asarray(rng.standard_normal(512), jnp.float32)
    p, e = tf.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_dot_cancellation(rng):
    """An ill-conditioned dot product where plain f32 loses everything."""
    n = 64
    big = rng.uniform(1.0, 2.0, n) * 1e6
    x64 = np.concatenate([big, -big, rng.standard_normal(n)])
    y64 = np.ones(3 * n)
    ref = float(np.dot(x64, y64))  # = sum of the small tail

    x = tf.from_f64(jnp.asarray(x64))
    y = tf.from_f64(jnp.asarray(y64))
    got = float(np.asarray(tf.to_f64(tf.dot(x, y, axis=0))))
    f32_naive = float(np.dot(x64.astype(np.float32), y64.astype(np.float32)))

    assert abs(got - ref) < 1e-6 * max(1.0, abs(ref))
    assert abs(f32_naive - ref) > abs(got - ref)  # and it beats plain f32


def test_sum_along_matches_f64(rng):
    x64 = rng.standard_normal((33, 17))
    d = tf.from_f64(jnp.asarray(x64))
    s = np.asarray(tf.to_f64(tf.sum_along(d, axis=0)))
    np.testing.assert_allclose(s, x64.sum(axis=0), rtol=1e-13, atol=1e-13)
