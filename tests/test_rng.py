"""Counter RNG: numpy/jnp agreement, uniformity, independence."""

import numpy as np
import jax.numpy as jnp

from raytracinginoneweekendincuda_tpu.core import rng


def _np_u32(x):
    return np.asarray(x, np.uint32)


def test_pcg4d_numpy_jnp_bitwise_identical():
    n = 4096
    rs = np.random.default_rng(0)
    counters = [rs.integers(0, 2**32, n, dtype=np.uint32) for _ in range(4)]
    with np.errstate(over="ignore"):
        np_out = rng.pcg4d(*[_np_u32(c) for c in counters])
    jnp_out = rng.pcg4d(*[jnp.asarray(c) for c in counters])
    for a, b in zip(np_out, jnp_out):
        np.testing.assert_array_equal(np.asarray(a, np.uint32), np.asarray(b, np.uint32))


def test_uniform_range_and_mean():
    n = 1 << 16
    pix = jnp.arange(n, dtype=jnp.uint32)
    zeros = jnp.zeros(n, jnp.uint32)
    u0, u1, u2, u3 = rng.uniform4(pix, zeros, zeros, zeros, float_dtype=jnp.float32)
    for u in (u0, u1, u2, u3):
        u = np.asarray(u)
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 5e-3
        assert abs(u.std() - (1.0 / 12.0) ** 0.5) < 5e-3


def test_uniform_open_is_positive():
    n = 1 << 12
    pix = jnp.arange(n, dtype=jnp.uint32)
    zeros = jnp.zeros(n, jnp.uint32)
    us = rng.uniform_open4(pix, zeros, zeros, zeros, float_dtype=jnp.float32)
    for u in us:
        u = np.asarray(u)
        assert u.min() > 0.0 and u.max() <= 1.0


def test_streams_are_decorrelated():
    n = 1 << 14
    pix = jnp.arange(n, dtype=jnp.uint32)
    zeros = jnp.zeros(n, jnp.uint32)
    a = rng.uniform4(pix, zeros, jnp.full(n, rng.CAMERA_STREAM, jnp.uint32), zeros,
                     float_dtype=jnp.float32)[0]
    b = rng.uniform4(pix, zeros, jnp.full(n, rng.SCATTER_STREAM, jnp.uint32), zeros,
                     float_dtype=jnp.float32)[0]
    corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
    assert abs(corr) < 0.02


def test_same_counter_same_draw():
    c = [jnp.asarray([7], jnp.uint32)] * 4
    x = rng.uniform4(*c, float_dtype=jnp.float32)
    y = rng.uniform4(*c, float_dtype=jnp.float32)
    for a, b in zip(x, y):
        assert np.asarray(a) == np.asarray(b)
