"""Material shading: emission + scatter.

The reference's virtual `Material::Emitted/Scatter` five-way dispatch
(Material.h:27-44 and subclasses) becomes branchless evaluation of every
scatter model followed by kind-tag selects — on a vector machine computing
all five (a few dozen FLOPs each) and masking is far cheaper than divergent
control flow.

All material/texture parameters come pre-gathered in the HitRecord's packed
``mrow`` (ops/hit.py `Derived`): shading itself performs zero dynamic
gathers except the optional Perlin/image lookups, which only exist in
programs whose scene uses them (SceneMeta flags).

Draw budget per bounce: one 4-uniform hash block (SCATTER_STREAM | bounce):
u1,u2,u3 feed the shared unit-ball/unit-direction sample, u4 the dielectric
reflectance lottery (Dielectric.h:41).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import vecmath as vm
from ..core.samplers import unit_ball, unit_sphere_surface
from ..scene.compiler import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    SceneArrays,
)
from .textures import texture_value_rows


class ScatterResult(NamedTuple):
    emitted: jnp.ndarray      # [B,3]
    direction: jnp.ndarray    # [B,3] new ray direction
    attenuation: jnp.ndarray  # [B,3]
    scattered: jnp.ndarray    # [B] bool (False = absorbed / pure emitter)


def shade(scene: SceneArrays, meta, rec, d_in, u1, u2, u3, u4) -> ScatterResult:
    """Evaluate emission + scatter for hit records ``rec`` (ops/hit.HitRecord)."""
    dt = d_in.dtype
    mrow = rec.mrow
    kind = mrow[:, 0].astype(jnp.int32)
    fuzz = mrow[:, 1]
    ior = mrow[:, 2]

    texv = texture_value_rows(scene, meta, mrow, rec.u, rec.v, rec.p)

    is_light = kind == MAT_DIFFUSE_LIGHT
    emitted = jnp.where(is_light[:, None], texv, 0.0)   # Material.h:114-117

    d_len = vm.length(d_in)[:, None]
    unit_d = d_in / jnp.where(d_len > 0, d_len, 1.0)
    ball = unit_ball(u1, u2, u3)

    # Lambertian: normal + ball sample, near-zero fallback (Material.h:75-79)
    lamb_dir = rec.normal + ball
    lamb_dir = jnp.where(vm.near_zero(lamb_dir)[:, None], rec.normal, lamb_dir)

    # Metal: mirror + fuzz*ball; absorbed below surface (Metal.h:25-29)
    refl = vm.reflect(unit_d, rec.normal)
    metal_dir = refl + fuzz[:, None] * ball
    metal_ok = vm.dot(metal_dir, rec.normal) > 0.0

    # Dielectric (Dielectric.h:18-55)
    ratio = jnp.where(rec.front, 1.0 / ior, ior)
    cos_t = jnp.minimum(vm.dot(-unit_d, rec.normal), 1.0)
    sin_sq = 1.0 - cos_t * cos_t
    sin_pos = sin_sq > 0.0
    sin_t = jnp.where(sin_pos, jnp.sqrt(jnp.where(sin_pos, sin_sq, 1.0)), 0.0)
    cannot_refract = ratio * sin_t > 1.0
    r0 = (1.0 - ratio) / (1.0 + ratio)
    r0 = r0 * r0
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5   # Schlick, h:63-68
    do_reflect = cannot_refract | (reflectance > u4)
    # NaN-safe refract: at total internal reflection the refracted branch is
    # discarded, but its sqrt(|1-...|) has an infinite derivative exactly at
    # the boundary (0 cotangent x inf = NaN in reverse mode) — feed it a
    # safe ratio there (any value: the where() discards the result).
    ratio_safe = jnp.where(cannot_refract, 0.0, ratio)
    diel_dir = jnp.where(
        do_reflect[:, None], refl, vm.refract(unit_d, rec.normal, ratio_safe)
    )

    # Isotropic: uniform direction, same (u1,u2) mapping as the ball sample
    # (UnitVector(ball) has exactly this direction) (Material.h:160)
    iso_dir = unit_sphere_surface(u1, u2)

    direction = jnp.where((kind == MAT_LAMBERTIAN)[:, None], lamb_dir, unit_d)
    direction = jnp.where((kind == MAT_METAL)[:, None], metal_dir, direction)
    direction = jnp.where((kind == MAT_DIELECTRIC)[:, None], diel_dir, direction)
    direction = jnp.where((kind == MAT_ISOTROPIC)[:, None], iso_dir, direction)

    attenuation = jnp.where((kind == MAT_DIELECTRIC)[:, None], dt.type(1.0), texv)

    scattered = jnp.where(kind == MAT_METAL, metal_ok, True)
    scattered = jnp.where(is_light, False, scattered)   # Material.h:120-128
    return ScatterResult(
        emitted=emitted, direction=direction, attenuation=attenuation, scattered=scattered
    )
