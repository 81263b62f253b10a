"""Gradient correctness: reverse-mode pixels vs central finite differences.

The differentiable path (`trace(differentiable=True)`: scan + per-bounce
rematerialization) must produce d(pixel)/d(param) matching finite
differences on smooth parameters — sphere center/radius, albedo, metal
fuzz, dielectric IOR, camera origin (BASELINE.json: "image+grad allclose").

What "smooth" means for THIS integrator (faithful to the reference,
kernel.cu:65-98: radiance = product of albedos terminated by a constant
background or emitter): pathwise gradients flow only through channels that
vary continuously along a path — hit positions and scatter directions
feeding a *continuously varying* texture (Perlin marble), and texture/
emission values themselves.  In an all-solid-color scene radiance is
piecewise constant in geometry (moving a sphere changes only discrete
path outcomes), so the probe scene uses a marble ground: every bounce off
it turns positional changes into smooth radiance changes.  Discrete events
(visibility, the Schlick reflect/refract lottery, checker cells,
nearest-neighbor texels) have zero pathwise gradient a.e., as in standard
differentiable-path-tracing practice (SURVEY.md §7.4).

Every case asserts its finite difference is NONZERO — vacuous 0==0
comparisons don't count as coverage.

Runs in f64 on CPU so finite differences are trustworthy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.integrator import trace
from raytracinginoneweekendincuda_tpu.ops.raygen import generate_rays
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.scene.api import (
    Dielectric, Lambertian, Metal, NoiseTexture, SceneDesc, Sphere,
)
from raytracinginoneweekendincuda_tpu.core.camera import Camera

W, H, SPP, BOUNCES = 12, 8, 4, 6


def _probe_scene():
    desc = SceneDesc()
    desc.add(
        Sphere((0.0, 0.0, -1.0), 0.5, Lambertian((0.6, 0.3, 0.2))),
        Sphere((-1.0, 0.0, -1.0), 0.45, Metal((0.8, 0.8, 0.8), 0.3)),
        Sphere((1.0, 0.0, -1.0), 0.45, Dielectric(1.5)),
        # marble ground: continuous texture -> geometry gradients exist
        Sphere((0.0, -100.5, -1.0), 100.0,
               Lambertian(NoiseTexture(2.0, table_seed=3))),
    )
    desc.camera = Camera(lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov=90.0,
                         focus_dist=1.0, background=(0.7, 0.8, 1.0))
    scene, meta = compile_scene(desc, W, H, dtype=np.float64)
    return jax.tree.map(jnp.asarray, scene), meta


import functools


@functools.partial(jax.jit, static_argnames=("meta",))
def _image_sum(scene, meta):
    """Differentiable scalar objective: sum of linear radiance (jitted —
    the eager scan re-traces per call otherwise, ~10 s per loss eval)."""
    pix = jnp.arange(W * H, dtype=jnp.int32)

    def one_sample(acc, s):
        o, d, time, pc = generate_rays(scene.camera, pix, s, W, H, 1984)
        return acc + trace(scene, meta, o, d, time, pc, s,
                           max_bounces=BOUNCES, t_min=1e-3,
                           differentiable=True), None

    # scan (not a python sum): one traced sample body instead of SPP
    # inlined copies — the scan+checkpoint graph is compile-bound and this
    # cuts the jit time ~SPPx (scan, unlike fori_loop, reverse-differentiates)
    img, _ = jax.lax.scan(one_sample, jnp.zeros((W * H, 3), jnp.float64),
                          jnp.arange(SPP, dtype=jnp.uint32))
    return (img / SPP).sum()


# h = 1e-6: the marble texture's curvature makes larger steps truncation-
# dominated (FD at h=1e-5 was 3% off; it converges to AD as h -> 0)
slow = pytest.mark.slow


@pytest.mark.parametrize("field,idx,h", [
    ("sph_c0", (0, 0), 1e-6),       # diffuse sphere center x (fast smoke)
    ("tex_c0", (0, 1), 1e-6),       # albedo green channel (fast smoke)
    pytest.param("sph_c0", (0, 2), 1e-6, marks=slow),   # center z
    pytest.param("sph_rad", (0,), 1e-6, marks=slow),    # radius
    pytest.param("mat_fuzz", (1,), 1e-6, marks=slow),   # metal fuzz
    pytest.param("mat_ior", (2,), 1e-6, marks=slow),    # dielectric IOR
])
def test_scene_param_grads_match_fd(field, idx, h):
    scene, meta = _probe_scene()

    def loss_wrt(val):
        arr = jnp.asarray(getattr(scene, field)).at[idx].set(val)
        return _image_sum(scene._replace(**{field: arr}), meta)

    v0 = float(np.asarray(getattr(scene, field))[idx])
    g_ad = float(jax.grad(loss_wrt)(jnp.float64(v0)))
    g_fd = float((loss_wrt(v0 + h) - loss_wrt(v0 - h)) / (2 * h))
    assert abs(g_fd) > 1e-6, f"{field}[{idx}]: vacuous probe (FD ~ 0)"
    np.testing.assert_allclose(g_ad, g_fd, rtol=5e-3, atol=1e-5,
                               err_msg=f"{field}[{idx}]")


@pytest.mark.slow
def test_camera_origin_grad_matches_fd():
    scene, meta = _probe_scene()
    h = 1e-6

    def loss_wrt(dx):
        cam = scene.camera._replace(
            origin=scene.camera.origin + jnp.array([dx, 0.0, 0.0]))
        return _image_sum(scene._replace(camera=cam), meta)

    g_ad = float(jax.grad(loss_wrt)(jnp.float64(0.0)))
    g_fd = float((loss_wrt(h) - loss_wrt(-h)) / (2 * h))
    assert abs(g_fd) > 1e-6, "vacuous camera probe"
    np.testing.assert_allclose(g_ad, g_fd, rtol=5e-3, atol=1e-4)


def test_grad_is_deterministic():
    scene, meta = _probe_scene()
    g = jax.grad(lambda r: _image_sum(
        scene._replace(sph_rad=jnp.asarray(scene.sph_rad).at[0].set(r)), meta))
    a = float(g(jnp.float64(0.5)))
    b = float(g(jnp.float64(0.5)))
    assert a == b
