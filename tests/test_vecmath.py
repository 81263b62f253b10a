"""Vector math vs numpy ground truth; reflect/refract physics checks."""

import numpy as np
import jax.numpy as jnp

from raytracinginoneweekendincuda_tpu.core import vecmath as vm
from raytracinginoneweekendincuda_tpu.core import samplers


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape)


def test_dot_cross_unit():
    u = _rand((128, 3), 1)
    v = _rand((128, 3), 2)
    np.testing.assert_allclose(np.asarray(vm.dot(jnp.asarray(u), jnp.asarray(v))),
                               (u * v).sum(-1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vm.cross(jnp.asarray(u), jnp.asarray(v))),
                               np.cross(u, v), rtol=1e-6)
    un = np.asarray(vm.unit_vector(jnp.asarray(u)))
    np.testing.assert_allclose(np.linalg.norm(un, axis=-1), 1.0, rtol=1e-6)
    # numpy path (oracle) gives the same results
    np.testing.assert_allclose(vm.cross(u, v, xp=np), np.cross(u, v), rtol=1e-12)


def test_reflect_preserves_length_and_flips_normal_component():
    v = vm.unit_vector(jnp.asarray(_rand((64, 3), 3)))
    n = vm.unit_vector(jnp.asarray(_rand((64, 3), 4)))
    r = vm.reflect(v, n)
    np.testing.assert_allclose(np.asarray(vm.length(r)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm.dot(r, n)), -np.asarray(vm.dot(v, n)), atol=1e-6)


def test_refract_snell():
    # incoming unit vector at 45 degrees onto +z plane, eta ratio 1/1.5
    d = jnp.asarray([[np.sin(np.pi / 4), 0.0, -np.cos(np.pi / 4)]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    eta = jnp.asarray([1.0 / 1.5])
    out = np.asarray(vm.refract(d, n, eta))[0]
    sin_out = np.linalg.norm(out[:2])
    np.testing.assert_allclose(sin_out, np.sin(np.pi / 4) / 1.5, atol=1e-6)
    assert out[2] < 0  # continues into the surface


def test_near_zero():
    v = jnp.asarray([[1e-9, -1e-9, 1e-9], [1e-9, 1e-7, 0.0]])
    assert np.asarray(vm.near_zero(v)).tolist() == [True, False]


def test_unit_ball_distribution():
    n = 1 << 15
    rs = np.random.default_rng(5)
    u = rs.random((3, n))
    p = np.asarray(samplers.unit_ball(jnp.asarray(u[0]), jnp.asarray(u[1]), jnp.asarray(u[2])))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # radius CDF is r^3 -> E[r] = 3/4; direction is isotropic -> component means 0
    assert abs(r.mean() - 0.75) < 5e-3
    assert np.all(np.abs(p.mean(0)) < 6e-3)
    # fraction within r<1/2 should be 1/8
    assert abs((r < 0.5).mean() - 0.125) < 5e-3


def test_unit_disk_distribution():
    n = 1 << 15
    rs = np.random.default_rng(6)
    p = np.asarray(samplers.unit_disk(jnp.asarray(rs.random(n)), jnp.asarray(rs.random(n))))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    assert abs((r < 0.5).mean() - 0.25) < 6e-3  # area ratio
    assert np.all(np.abs(p.mean(0)) < 6e-3)
