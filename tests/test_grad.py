"""Gradient correctness: reverse-mode pixels vs central finite differences.

The differentiable path (`trace(differentiable=True)`: scan + per-bounce
rematerialization) must produce d(pixel)/d(param) matching finite
differences on smooth parameters — sphere center/radius, albedo, metal
fuzz, dielectric IOR, camera origin (BASELINE.json: "image+grad allclose").
Visibility discontinuities are excluded by construction of the probe scenes
(gradients are averaged over pixels whose paths don't cross silhouettes at
the probe step size).

Runs in f64 on CPU so finite differences are trustworthy (h=1e-5).
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
    Dielectric, Lambertian, Metal, SceneDesc, Sphere,
)
from raytracinginoneweekendincuda_tpu.core.camera import Camera

W, H, SPP, BOUNCES = 12, 8, 4, 6


def _probe_scene():
    desc = SceneDesc()
    desc.add(
        Sphere((0.0, 0.0, -1.0), 0.5, Lambertian((0.6, 0.3, 0.2))),
        Sphere((-1.0, 0.0, -1.0), 0.45, Metal((0.8, 0.8, 0.8), 0.3)),
        Sphere((1.0, 0.0, -1.0), 0.45, Dielectric(1.5)),
        Sphere((0.0, -100.5, -1.0), 100.0, Lambertian((0.5, 0.5, 0.5))),
    )
    desc.camera = Camera(lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov=90.0,
                         focus_dist=1.0, background=(0.7, 0.8, 1.0))
    scene, meta = compile_scene(desc, W, H, dtype=np.float64)
    return jax.tree.map(jnp.asarray, scene), meta


def _image_sum(scene, meta, weights=None):
    """Differentiable scalar objective: weighted sum of linear radiance."""
    pix = jnp.arange(W * H, dtype=jnp.int32)

    def one_sample(s):
        o, d, time, pc = generate_rays(scene.camera, pix, jnp.uint32(s), W, H, 1984)
        return trace(scene, meta, o, d, time, pc, jnp.uint32(s),
                     max_bounces=BOUNCES, t_min=1e-3, differentiable=True)

    img = sum(one_sample(s) for s in range(SPP)) / SPP
    if weights is None:
        return img.sum()
    return (img * weights).sum()


@pytest.mark.parametrize("field,idx,h", [
    ("sph_c0", (0, 0), 1e-5),       # diffuse sphere center x
    ("sph_c0", (0, 2), 1e-5),       # center z
    ("sph_rad", (0,), 1e-5),        # radius
    ("tex_c0", (0, 1), 1e-4),       # albedo green channel
    ("mat_fuzz", (1,), 1e-4),       # metal fuzz
    ("mat_ior", (2,), 1e-4),        # dielectric IOR
])
def test_scene_param_grads_match_fd(field, idx, h):
    scene, meta = _probe_scene()

    def loss_wrt(val):
        arr = jnp.asarray(getattr(scene, field)).at[idx].set(val)
        return _image_sum(scene._replace(**{field: arr}), meta)

    v0 = float(np.asarray(getattr(scene, field))[idx])
    g_ad = float(jax.grad(loss_wrt)(jnp.float64(v0)))
    g_fd = float((loss_wrt(v0 + h) - loss_wrt(v0 - h)) / (2 * h))
    assert g_fd != 0.0 or abs(g_ad) < 1e-6
    np.testing.assert_allclose(g_ad, g_fd, rtol=2e-3, atol=1e-5,
                               err_msg=f"{field}[{idx}]")


def test_camera_origin_grad_matches_fd():
    scene, meta = _probe_scene()
    h = 1e-6

    def loss_wrt(dx):
        cam = scene.camera._replace(
            origin=scene.camera.origin + jnp.array([dx, 0.0, 0.0]))
        return _image_sum(scene._replace(camera=cam), meta)

    g_ad = float(jax.grad(loss_wrt)(jnp.float64(0.0)))
    g_fd = float((loss_wrt(h) - loss_wrt(-h)) / (2 * h))
    np.testing.assert_allclose(g_ad, g_fd, rtol=5e-3, atol=1e-4)


def test_grad_is_deterministic():
    scene, meta = _probe_scene()
    g = jax.grad(lambda r: _image_sum(
        scene._replace(sph_rad=jnp.asarray(scene.sph_rad).at[0].set(r)), meta))
    a = float(g(jnp.float64(0.5)))
    b = float(g(jnp.float64(0.5)))
    assert a == b
