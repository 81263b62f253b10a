"""Batched texture evaluation: the reference's virtual Texture::Value
(Texture.h:24-176) as tag-dispatched selects.

Static scene flags (`SceneMeta.has_*`) gate whole texture families out of
the compiled program — a scene without noise textures never pays for the
56-gather turbulence evaluation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.compiler import (
    SceneArrays,
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NOISE,
)
from . import perlin

DEBUG_CYAN = (0.0, 1.0, 1.0)  # missing image fallback, Texture.h:112-114


def texture_value(scene: SceneArrays, meta, tex_id, u, v, p):
    """Color [B,3] of texture ``tex_id`` [B] at surface coords (u, v, p)."""
    dt = p.dtype
    tid = jnp.clip(tex_id, 0, meta.n_textures - 1 if meta.n_textures else 0)
    kind = scene.tex_kind[tid]
    val = scene.tex_c0[tid]  # TEX_SOLID (Texture.h:48-51)

    if meta.has_checker:
        inv_scale = scene.tex_inv_scale[tid]
        cell = jnp.floor(inv_scale[:, None] * p).astype(jnp.int32)
        is_even = (cell.sum(-1) % 2) == 0                 # Texture.h:74-78
        checker = jnp.where(is_even[:, None], scene.tex_c0[tid], scene.tex_c1[tid])
        val = jnp.where((kind == TEX_CHECKER)[:, None], checker, val)

    if meta.has_noise:
        nid = jnp.clip(scene.tex_noise[tid], 0, scene.perlin_vec.shape[0] - 1)
        turb = perlin.turbulence(
            scene.perlin_vec, scene.perlin_px, scene.perlin_py, scene.perlin_pz, nid, p
        )
        # marble: 0.5*(1 + sin(scale*z + 10*turb)) (Texture.h:163-164)
        scale = scene.tex_scale[tid]
        marble = dt.type(0.5) * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * turb))
        val = jnp.where((kind == TEX_NOISE)[:, None], marble[:, None], val)

    if meta.has_image:
        img_id = scene.tex_image[tid]
        iid = jnp.clip(img_id, 0, scene.img_data.shape[0] - 1)
        w = scene.img_w[iid]
        h = scene.img_h[iid]
        uu = jnp.clip(u, 0.0, 1.0)                        # Texture.h:117-118
        vv = 1.0 - jnp.clip(v, 0.0, 1.0)
        ix = jnp.minimum((uu * w).astype(jnp.int32), w - 1)  # Texture.h:120-125
        iy = jnp.minimum((vv * h).astype(jnp.int32), h - 1)
        texel = scene.img_data[iid, iy, ix]
        cyan = jnp.asarray(DEBUG_CYAN, dt)
        texel = jnp.where((img_id >= 0)[:, None], texel, cyan)
        val = jnp.where((kind == TEX_IMAGE)[:, None], texel, val)

    return val
