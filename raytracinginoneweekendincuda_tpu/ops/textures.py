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


def texture_value_rows(scene: SceneArrays, meta, mrow, u, v, p):
    """Color [B,3] from pre-gathered material rows (ops/hit.Derived layout:
    cols 3 tex_kind, 4:7 c0, 7:10 c1, 10 inv_scale, 11 scale, 12 noise_id,
    13 image_id).  Zero dynamic gathers except Perlin/image lookups, which
    are compiled in only for scenes that use them."""
    dt = p.dtype
    kind = mrow[:, 3].astype(jnp.int32)
    c0 = mrow[:, 4:7]
    val = c0  # TEX_SOLID (Texture.h:48-51)

    if meta.has_checker:
        inv_scale = mrow[:, 10]
        cell = jnp.floor(inv_scale[:, None] * p).astype(jnp.int32)
        is_even = (cell.sum(-1) % 2) == 0                 # Texture.h:74-78
        checker = jnp.where(is_even[:, None], c0, mrow[:, 7:10])
        val = jnp.where((kind == TEX_CHECKER)[:, None], checker, val)

    if meta.has_noise:
        nid = jnp.clip(mrow[:, 12].astype(jnp.int32), 0,
                       scene.perlin_vec.shape[0] - 1)
        turb = perlin.turbulence(
            scene.perlin_vec, scene.perlin_px, scene.perlin_py, scene.perlin_pz, nid, p
        )
        # marble: 0.5*(1 + sin(scale*z + 10*turb)) (Texture.h:163-164)
        scale = mrow[:, 11]
        marble = dt.type(0.5) * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * turb))
        val = jnp.where((kind == TEX_NOISE)[:, None], marble[:, None], val)

    if meta.has_image:
        img_id = mrow[:, 13].astype(jnp.int32)
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
